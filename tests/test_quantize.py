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
