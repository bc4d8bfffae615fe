"""Int8 weight quantization + accuracy-control loop."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_d_fine_tpu.deploy.quantize import (
    dequantize_params,
    make_quantized_apply,
    quantize_leaf,
    quantize_params,
    quantize_with_accuracy_control,
)
from custom_d_fine_tpu.models.dfine import build_model

from helpers import tiny_config

IMG = 160


def test_quantize_leaf_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_leaf(w)
    assert q.dtype == np.int8
    deq = q.astype(np.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.02


def test_quantized_model_outputs_close():
    """Backbone (conv-only) path: int8 weight quantization shifts features only
    slightly. (The full random-init detector is ill-conditioned through its
    LayerNorm chain — see tools/parity_check.py — so the well-conditioned conv
    stack is the meaningful numeric check; the decoder is covered by the
    finiteness assert.)"""
    from custom_d_fine_tpu.models.hgnetv2 import HGNetv2

    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=1)
    qparams, quantized = quantize_params(variables["params"])
    assert len(quantized) > 50

    b = cfg.backbone
    bb = HGNetv2(arch=b.name, return_idx=b.return_idx, use_lab=b.use_lab,
                 freeze_norm=b.freeze_norm)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, IMG, IMG, 3)), jnp.float32)
    from custom_d_fine_tpu.deploy.quantize import dequantize_params as dq
    ref = bb.apply({"params": variables["params"]["backbone"],
                    "batch_stats": variables["batch_stats"]["backbone"]}, x, train=False)
    got = jax.jit(lambda qp, x: bb.apply(
        {"params": dq(qp), "batch_stats": variables["batch_stats"]["backbone"]},
        x, train=False))(qparams["backbone"], x)
    for r, g in zip(ref, got):
        rel = np.abs(np.asarray(r) - np.asarray(g)).max() / (np.abs(np.asarray(r)).max() + 1e-9)
        assert rel < 0.15, rel

    # full detector still runs and stays finite under full quantization
    apply_q = jax.jit(make_quantized_apply(model, variables["batch_stats"]))
    out = apply_q(qparams, x)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_accuracy_control_reverts_until_budget():
    rng = np.random.default_rng(1)
    # toy "model": params = 3 kernels; metric penalizes error on kernel 'a'
    params = {
        "a": {"kernel": rng.normal(size=(8, 8)).astype(np.float32) * 100},
        "b": {"kernel": rng.normal(size=(8, 8)).astype(np.float32)},
        "c": {"bias": rng.normal(size=(8,)).astype(np.float32)},
    }

    def validate(p):
        flat_a = p["a"]
        if "kernel@q" in flat_a:  # quantized 'a' -> big metric drop
            return 0.5
        return 0.9

    qparams, report = quantize_with_accuracy_control(params, validate, max_drop=0.02)
    assert report["baseline_metric"] == 0.9
    assert report["n_reverted"] >= 1
    assert report["drop"] <= 0.02
    # 'a' reverted (raw kernel), 'b' still quantized
    assert "kernel" in qparams["a"] and "kernel@q" not in qparams["a"]
    assert "kernel@q" in qparams["b"]


def test_int8_serving_graph_detections_close():
    """The serving builder's quantize_int8 path (JaxModel dtype='int8',
    reference ov_int8.py equivalent) must produce detections close to f32."""
    from custom_d_fine_tpu.deploy.serving import make_serving_forward

    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(160, 160),
                                   train_batch=1)
    f32 = jax.jit(make_serving_forward(model, variables, (160, 160),
                                       use_fused_stem=False))
    i8 = jax.jit(make_serving_forward(model, variables, (160, 160),
                                      use_fused_stem=False, quantize_int8=True))
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 160, 160, 3)), jnp.uint8)
    d32, d8 = f32(x), i8(x)
    s32 = np.sort(np.asarray(d32["scores"][0]))[-20:]
    s8 = np.sort(np.asarray(d8["scores"][0]))[-20:]
    assert np.abs(s32 - s8).max() < 0.02
    assert np.isfinite(np.asarray(d8["boxes"])).all()


def test_jaxmodel_runtime_smoke(tmp_path):
    """JaxModel end-to-end on a BGR image (now routed through the canonical
    serving builder): constructor smoke test + detection dict contract."""
    from custom_d_fine_tpu.infer.model import JaxModel

    # 320^2: the smallest canvas where 'n' has >= num_queries anchors
    # (the torch reference decoder has the same topk constraint)
    m = JaxModel(None, "n", num_classes=4, img_size=(320, 320),
                 conf_thresh=0.0, deploy=True, smoke_test=True)
    img = np.random.default_rng(0).integers(0, 255, (200, 300, 3)).astype(np.uint8)
    dets = m(img)
    assert len(dets) == 1
    d = dets[0]
    assert {"boxes", "labels", "scores"} <= set(d)
    assert np.isfinite(d["boxes"]).all()
    # boxes are in original-image coordinates
    if len(d["boxes"]):
        assert d["boxes"][:, [0, 2]].max() <= 300.5
        assert d["boxes"][:, [1, 3]].max() <= 200.5
