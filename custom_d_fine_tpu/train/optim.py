"""Optimizer: 4-group AdamW + OneCycle schedule + clipping + accumulation.

Parity targets:
- build_optimizer 4 param groups (reference src/d_fine/dfine.py:87-124):
  1. backbone non-norm          (backbone_lr, weight decay)
  2. backbone norm              (backbone_lr, no decay)
  3. encoder/decoder norm+bias  (base_lr, no decay)
  4. rest                       (base_lr, weight decay)
- OneCycleLR max_lr = 2x base, per-group list for l/x/segment
  (reference src/dl/train.py:203-221) -> optax.cosine_onecycle_schedule.
- clip_grad_norm(0.1) + b_accum_steps (reference train.py:512-535) ->
  optax.clip_by_global_norm + optax.MultiSteps.
- backbone freezing (reference hgnetv2.py:481-485) -> optax.set_to_zero() on
  'frozen'-labeled leaves instead of requires_grad surgery.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax

from ..configs.registry import ModelConfig

NORM_TOKENS = ("norm", "bn", "gn")


def label_params(params, model_cfg: ModelConfig):
    """Assign each param leaf one of: backbone / backbone_norm /
    encdec_norm_bias / rest / frozen."""
    b = model_cfg.backbone

    def label(path) -> str:
        parts = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(parts)
        if "backbone" in parts:
            # freeze policy first (reference hgnetv2.py:481-485)
            if b.freeze_at >= 0:
                sub = parts[parts.index("backbone") + 1]
                if sub == "stem":
                    return "frozen"
                if not b.freeze_stem_only and sub.startswith("stages_"):
                    if int(sub.split("_")[1]) <= b.freeze_at:
                        return "frozen"
            if any(t in joined for t in NORM_TOKENS):
                return "backbone_norm"
            return "backbone"
        if any(t in joined for t in NORM_TOKENS) or parts[-1] == "bias":
            return "encdec_norm_bias"
        return "rest"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def onecycle(max_lr: float, total_steps: int, pct_start: float) -> optax.Schedule:
    """torch OneCycleLR(cos) equivalent: div_factor=25, final_div_factor=1e4.

    Guard: optax's cosine_onecycle divides by the warmup interval length —
    if pct_start * total_steps < 1 (tiny runs/tests) the schedule is NaN and
    one optimizer step silently destroys the params. Clamp both phases to at
    least one step."""
    total_steps = max(int(total_steps), 2)
    pct = min(max(pct_start, 1.0 / total_steps), 1.0 - 1.0 / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def build_optimizer(
    params,
    model_cfg: ModelConfig,
    *,
    base_lr: float,
    backbone_lr: float,
    weight_decay: float = 0.000125,
    betas=(0.9, 0.999),
    total_steps: int = 10000,
    pct_start: float = 0.1,
    use_scheduler: bool = True,
    clip_max_norm: float = 0.1,
    b_accum_steps: int = 1,
    enable_mask_head: bool = False,
) -> optax.GradientTransformation:
    labels = label_params(params, model_cfg)

    # per-group peak LRs (reference train.py:205-212): for l/x/segment the
    # backbone groups cycle around backbone_lr, others around base_lr. For
    # smaller sizes torch passes a single max_lr (2*base) to all groups but
    # group base lr stays per-group only until the scheduler overrides it —
    # OneCycleLR with scalar max_lr drives ALL groups to the same peak.
    big = model_cfg.name in ("l", "x") or enable_mask_head
    peak_backbone = 2 * backbone_lr if big else 2 * base_lr
    peak_base = 2 * base_lr

    def group_tx(peak_lr: float, group_base_lr: float, wd: float):
        sched = onecycle(peak_lr, total_steps, pct_start) if use_scheduler else group_base_lr
        return optax.adamw(sched, b1=betas[0], b2=betas[1], weight_decay=wd)

    tx = optax.multi_transform(
        {
            "backbone": group_tx(peak_backbone, backbone_lr, weight_decay),
            "backbone_norm": group_tx(peak_backbone, backbone_lr, 0.0),
            "encdec_norm_bias": group_tx(peak_base, base_lr, 0.0),
            "rest": group_tx(peak_base, base_lr, weight_decay),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    chain = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    if b_accum_steps > 1:
        chain = optax.MultiSteps(chain, every_k_schedule=b_accum_steps)
    return chain
