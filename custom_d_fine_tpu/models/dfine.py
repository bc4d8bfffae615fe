"""DFINE model assembly: backbone -> encoder -> decoder, plus torch-parity
parameter initialization.

Parity target: reference src/d_fine/dfine.py:19-124 (DFINE, build_model) and
the _reset_parameters blocks in dfine_decoder.py:100-117 (deformable offsets
grid bias), :258-264 (Gate zero init), :298-305 (LQE zero last layer),
:709-731 (head bias/zero inits). Flax initializes params generically; the
reference's special inits are applied afterwards as a pure pytree transform
(`apply_reference_init`) so every head starts from the same operating point
as the torch model.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from ..configs.registry import ModelConfig
from .decoder import DFINETransformer
from .hgnetv2 import HGNetv2
from .hybrid_encoder import HybridEncoder
from .layers import bias_init_with_prob


class DFINE(nn.Module):
    """backbone -> hybrid encoder -> decoder (reference dfine.py:19-41)."""

    cfg: ModelConfig
    num_classes: int = 80
    msda_impl: str = "xla"
    stem_impl: str = "conv"  # "dots": tap-dot stem convs in train graphs;
    # "s2d"/"s2d_all": space-to-depth rewrite of the k3/s2 stem convs
    fast_topk: bool = False  # serving: approx_max_k query selection
    deploy: bool = False  # reparam-fused inference graph (deploy/reparam.py)
    stem_external: bool = False  # serving: input is the precomputed stem output
    dtype: Optional[Any] = None
    # Per-stage compute-dtype overrides (fall back to `dtype`). Used by the
    # serving builder to run individual stages in bf16 where it measures faster.
    backbone_dtype: Optional[Any] = None
    encoder_dtype: Optional[Any] = None
    decoder_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, targets=None, train: bool = False):
        b, e, d = self.cfg.backbone, self.cfg.encoder, self.cfg.decoder
        feats = HGNetv2(
            arch=b.name, return_idx=b.return_idx, use_lab=b.use_lab,
            freeze_norm=b.freeze_norm,
            stem_external=self.stem_external, stem_impl=self.stem_impl,
            dtype=self.backbone_dtype or self.dtype, name="backbone",
        )(x, train=train)
        feats = HybridEncoder(
            in_channels=e.in_channels, feat_strides=e.feat_strides,
            hidden_dim=e.hidden_dim, nhead=e.nhead, dim_feedforward=e.dim_feedforward,
            enc_act=e.enc_act, use_encoder_idx=e.use_encoder_idx,
            num_encoder_layers=e.num_encoder_layers, pe_temperature=e.pe_temperature,
            expansion=e.expansion, depth_mult=e.depth_mult, act=e.act,
            deploy=self.deploy, dtype=self.encoder_dtype or self.dtype,
            name="encoder",
        )(feats, train=train)
        return DFINETransformer(
            num_classes=self.num_classes, hidden_dim=d.hidden_dim,
            num_queries=d.num_queries, feat_channels=d.feat_channels,
            feat_strides=d.feat_strides, num_levels=d.num_levels,
            num_points=d.num_points, nhead=d.nhead, num_layers=d.num_layers,
            dim_feedforward=d.dim_feedforward, activation=d.activation,
            num_denoising=d.num_denoising, dn_max_gt=self.cfg.dn_max_gt,
            label_noise_ratio=d.label_noise_ratio, box_noise_scale=d.box_noise_scale,
            eval_idx=d.eval_idx, eps=d.eps, reg_max=d.reg_max, reg_scale=d.reg_scale,
            cross_attn_method=d.cross_attn_method,
            query_select_method=d.query_select_method,
            enable_mask_head=d.enable_mask_head, mask_dim=d.mask_dim,
            msda_impl=self.msda_impl, fast_topk=self.fast_topk,
            dtype=self.decoder_dtype or self.dtype, name="decoder",
        )(feats, targets=targets, train=train)


def _msda_offset_bias(num_heads: int, num_points: Sequence[int]) -> np.ndarray:
    """Grid-shaped sampling-offset bias (reference dfine_decoder.py:100-113)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [h, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    P = sum(num_points)
    grid = np.tile(grid.reshape(num_heads, 1, 2), (1, P, 1))
    scaling = np.concatenate([np.arange(1, n + 1, dtype=np.float32) for n in num_points])
    grid = grid * scaling.reshape(1, -1, 1)
    return grid.reshape(-1)


def apply_torch_default_init(params: Dict, rng: jax.Array) -> Dict:
    """Redraw generic kernels/biases with the torch reference's DEFAULT init
    distributions (before the special-init surgery below).

    Flax defaults (lecun_normal kernels, zero biases) differ from torch's
    (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) kernels, U(+-1/sqrt(
    fan_in)) biases) by a ~sqrt(3) kernel-std factor and nonzero biases —
    measurably different short-run training dynamics when training from
    scratch. Distribution map (reference file:line):
    - nn.Linear / nn.Conv2d defaults -> U(+-1/sqrt(fan_in)) kernel AND bias
      (torch nn/modules/linear.py reset_parameters; conv fan_in = kh*kw*in).
    - decoder FFN linear1/linear2 -> xavier_uniform (dfine_decoder.py:224-225;
      the encoder's AIFI FFN has NO such reset and keeps torch defaults).
    - enc_output[0], query_pos_head.layers[0,1], 1x1 input_proj convs ->
      xavier_uniform (dfine_decoder.py:724-731).
    - nn.MultiheadAttention -> xavier_uniform on the COMBINED (3d,d) in-proj
      (bound sqrt(6/(4d)) per q/k/v matrix), zero in-proj bias; out_proj
      torch-Linear-default kernel with ZERO bias (torch activation.py
      MultiheadAttention._reset_parameters).
    - MaskDecoder up_conv -> kaiming_normal fan_out (dfine_decoder.py:351).
    Norm scales/biases (1/0) and embeddings are identical in both frameworks
    and left untouched; head-specific constants are applied afterwards by
    apply_reference_init and override these draws.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
    nprng = np.random.default_rng(seed)

    def fans(shape):
        if len(shape) == 2:  # dense [in, out]
            return shape[0], shape[1]
        rf = int(np.prod(shape[:-2]))  # conv [kh, kw, in, out]
        return rf * shape[-2], rf * shape[-1]

    def uniform(bound, shape):
        return nprng.uniform(-bound, bound, shape).astype(np.float32)

    new = {}
    for key, val in flat.items():
        parts = key.split("/")
        leaf, mod = parts[-1], (parts[-2] if len(parts) > 1 else "")
        if leaf == "kernel" and val.ndim in (2, 4):
            fan_in, fan_out = fans(val.shape)
            if mod in ("q_proj", "k_proj", "v_proj"):
                d = val.shape[0]
                new[key] = uniform(math.sqrt(6.0 / (4.0 * d)), val.shape)
            elif (
                (mod in ("linear1", "linear2") and parts[0] == "decoder")
                or mod == "enc_output_proj"
                or ("query_pos_head" in parts and mod in ("layers_0", "layers_1"))
                or (mod.startswith("input_proj") and mod.endswith("conv")
                    and val.ndim == 4 and val.shape[0] == 1 and val.shape[1] == 1)
            ):
                new[key] = uniform(math.sqrt(6.0 / (fan_in + fan_out)), val.shape)
            elif mod == "up_conv":
                new[key] = nprng.normal(
                    0.0, math.sqrt(2.0 / fan_out), val.shape).astype(np.float32)
            else:
                new[key] = uniform(1.0 / math.sqrt(fan_in), val.shape)
        elif leaf == "bias":
            if mod in ("q_proj", "k_proj", "v_proj", "out_proj"):
                continue  # torch MHA zeroes these; flax default is already 0
            sib = "/".join(parts[:-1] + ["kernel"])
            if sib in flat and flat[sib].ndim in (2, 4):
                fan_in, _ = fans(flat[sib].shape)
                new[key] = uniform(1.0 / math.sqrt(fan_in), val.shape)

    for key, val in new.items():
        assert flat[key].shape == val.shape, key
        flat[key] = jnp.asarray(val, flat[key].dtype)
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def apply_reference_init(params: Dict, cfg: ModelConfig, num_classes: int) -> Dict:
    """Post-init surgery replicating the reference's special initializations."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy (dicts rebuilt)
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    cls_bias = bias_init_with_prob(0.01)
    gate_bias = bias_init_with_prob(0.5)
    d = cfg.decoder

    def setval(key, val):
        assert key in flat, key
        assert flat[key].shape == val.shape, (key, flat[key].shape, val.shape)
        flat[key] = jnp.asarray(val, flat[key].dtype)

    dec = "decoder"
    for key in list(flat.keys()):
        parts = key.split("/")
        # classification heads: constant bias (reference :710-719)
        if parts[-1] == "bias" and any(
            p.startswith("enc_score_head") or p.startswith("dec_score_head") for p in parts
        ):
            setval(key, np.full(flat[key].shape, cls_bias, np.float32))
        # box/corner-head last layers: zeros (reference :712-716, :720-722)
        if ("enc_bbox_head" in parts or "pre_bbox_head" in parts or
                any(p.startswith("dec_bbox_head_") for p in parts)):
            if "layers_2" in parts:
                setval(key, np.zeros(flat[key].shape, np.float32))
        # Gate: zero weight, sigmoid(0.0)=0.5-centered bias (reference :258-264)
        if "gateway" in parts and "gate" in parts:
            if parts[-1] == "kernel":
                setval(key, np.zeros(flat[key].shape, np.float32))
            elif parts[-1] == "bias":
                setval(key, np.full(flat[key].shape, gate_bias, np.float32))
        # LQE reg_conf last layer: zeros (reference :298-305)
        if "reg_conf" in parts and "layers_1" in parts:
            setval(key, np.zeros(flat[key].shape, np.float32))
        # MSDA: zero offsets weight w/ grid bias; zero attention weights (:100-117)
        if "cross_attn" in parts and "sampling_offsets" in parts:
            if parts[-1] == "kernel":
                setval(key, np.zeros(flat[key].shape, np.float32))
            else:
                setval(key, _msda_offset_bias(d.nhead, d.num_points))
        if "cross_attn" in parts and "attention_weights" in parts:
            setval(key, np.zeros(flat[key].shape, np.float32))
        # denoising class embedding: normal(0,1) except zero padding row (:631-634)
        if "denoising_class_embed" in parts and parts[-1] == "embedding":
            emb = np.array(
                jax.random.normal(jax.random.PRNGKey(42), flat[key].shape), np.float32
            )
            emb[-1] = 0.0
            setval(key, emb)

    return flax.traverse_util.unflatten_dict(flat, sep="/")


def build_model(
    cfg: ModelConfig,
    num_classes: int,
    img_size: Tuple[int, int],
    rng: Optional[jax.Array] = None,
    train_batch: int = 2,
    msda_impl: str = "xla",
    stem_impl: str = "conv",
    dtype: Optional[Any] = None,
):
    """Construct model + fully initialized variables (reference dfine.py:51-70).

    Init always runs in train mode with dummy targets so the full parameter set
    (all heads, denoising embed) is created regardless of later usage.
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    model = DFINE(cfg=cfg, num_classes=num_classes, msda_impl=msda_impl,
                  stem_impl=stem_impl, dtype=dtype)
    H, W = img_size
    dummy_x = jnp.zeros((train_batch, H, W, 3), jnp.float32)
    G = cfg.max_gt
    dummy_targets = {
        "labels": jnp.zeros((train_batch, G), jnp.int32),
        "boxes": jnp.full((train_batch, G, 4), 0.5, jnp.float32),
        "valid": jnp.zeros((train_batch, G), bool).at[:, 0].set(True),
    }
    p_rng, dn_rng = jax.random.split(rng)
    # jit the init: one XLA compile instead of per-op eager dispatch (the
    # latter is ~10x slower, especially on low-core hosts)
    init_fn = jax.jit(lambda r, x, t: model.init(r, x, targets=t, train=True))
    variables = init_fn({"params": p_rng, "dn": dn_rng}, dummy_x, dummy_targets)
    variables = dict(variables)
    variables["params"] = apply_torch_default_init(variables["params"], p_rng)
    variables["params"] = apply_reference_init(variables["params"], cfg, num_classes)
    return model, variables
