"""Canonical serving forward: one place that assembles the deployed graph.

Reference counterpart: the ExportWrapper + per-backend runtimes
(src/dl/export.py:103-115, src/infer/*_model.py) — here a single jittable
function covers every consumer (bench, JaxModel, jax.export artifact,
__graft_entry__).

Graph: uint8 image -> on-device normalize -> [Pallas fused stem on TPU,
ops/pallas/stem.py] -> backbone stages/encoder/decoder (with the serving MSDA
kernel) -> fused top-K postprocessor. The fused stem is used only on TPU for
supported sizes (H % 32 == 0, W % 4 == 0) and can be disabled explicitly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.postprocess import topk_detections


def build_serving(
    size: str = "m",
    num_classes: int = 80,
    img_size: Tuple[int, int] = (640, 640),
    **serving_kw,
):
    """One-call flagship serving graph: registry config -> build -> deploy
    reparam -> make_serving_forward. Shared by bench.py, __graft_entry__ and
    tools so the compile gate, the perf gate and the export artifact all
    exercise the SAME graph. Returns (forward_fn, model, variables); wrap
    forward_fn in jax.jit at the call site."""
    from ..configs import get_model_config
    from ..models.dfine import build_model
    from ..ops.deform_attn import resolve_impl
    from .reparam import convert_to_deploy

    cfg = get_model_config(size)
    model, variables = build_model(
        cfg, num_classes=num_classes, img_size=tuple(img_size), train_batch=1,
        msda_impl=resolve_impl("serve"),
    )
    model, variables = convert_to_deploy(model, variables)
    fn = make_serving_forward(model, variables, tuple(img_size), **serving_kw)
    return fn, model, variables


def make_serving_forward(
    model,
    variables,
    img_size: Tuple[int, int],
    num_top: int = 300,
    use_fused_stem: Optional[bool] = None,
    fast_topk: bool = True,
    quantize_int8: bool = False,
):
    """(deploy model, variables) -> fn(images_u8 [B,H,W,3]) -> detections.

    `model`/`variables` should already be deploy-converted
    (deploy/reparam.convert_to_deploy). Returns an un-jitted callable; wrap
    in jax.jit at the call site (so callers control donation/sharding).

    quantize_int8=True stores all conv/dense kernels as per-channel symmetric
    int8 (deploy/quantize.py) and dequantizes inside the jitted graph: weight
    HBM traffic drops 4x (the reference's NNCF INT8 path, ov_int8.py:18-163).
    The fused stem keeps f32 folded weights either way (they are tiny and the
    fold happens on host before quantization).
    """
    H, W = img_size
    if quantize_int8:
        from .quantize import dequantize_params, quantize_params

        qparams, _ = quantize_params(variables["params"])
        batch_stats = variables["batch_stats"]

        def _apply(m, x):
            p = dequantize_params(qparams)
            return m.apply({"params": p, "batch_stats": batch_stats}, x,
                           train=False)
    else:

        def _apply(m, x):
            return m.apply(variables, x, train=False)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    fused = (on_tpu and H % 32 == 0 and W % 4 == 0
             if use_fused_stem is None else use_fused_stem)
    if fast_topk:
        model = model.clone(fast_topk=True)

    if fused:
        from ..ops.pallas.stem import fold_stem_weights, fused_stem

        fw = fold_stem_weights(
            variables["params"]["backbone"]["stem"],
            variables["batch_stats"]["backbone"]["stem"],
        )
        stem_model = model.clone(stem_external=True)

        def forward(images_u8):
            x = images_u8.astype(jnp.float32)  # raw 0..255; /255 is folded
            stem_out = fused_stem(x, fw, fast=True)
            out = _apply(stem_model, stem_out)
            return topk_detections(out["pred_logits"], out["pred_boxes"],
                                   num_top, (H, W),
                                   pred_masks=out.get("pred_masks"),
                                   approx=fast_topk)
    else:

        def forward(images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            out = _apply(model, x)
            return topk_detections(out["pred_logits"], out["pred_boxes"],
                                   num_top, (H, W),
                                   pred_masks=out.get("pred_masks"),
                                   approx=fast_topk)

    return forward


def jit_serving_on_mesh(forward, mesh=None, axis: str = "data"):
    """Fleet serving: jit a serving forward with the image batch sharded
    over a device mesh (data parallelism over ICI). Weights are closure
    constants — GSPMD replicates them onto every chip; per-image compute is
    independent (eval-mode BN uses running stats), so detections equal the
    single-device graph. Batch size must be a multiple of the mesh size
    (pad at the caller, e.g. trainer._pad_to_mesh). On a multi-HOST mesh,
    pass a global array (jax.make_array_from_process_local_data with each
    host's stripe — see trainer._put_global), not a host-local one.

    The reference has no multi-GPU inference at all; this is the TPU-native
    scale-out path for `make bench`-style offline eval on a pod slice.
    Returns (jitted_fn, mesh)."""
    from ..parallel.mesh import make_mesh, shard_batch_spec

    mesh = mesh if mesh is not None else make_mesh()
    spec = shard_batch_spec(mesh, axis)
    return jax.jit(forward, in_shardings=(spec,)), mesh
