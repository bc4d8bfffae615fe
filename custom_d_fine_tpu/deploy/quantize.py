"""Weight int8 post-training quantization with accuracy control.

Parity target: reference src/dl/ov_int8.py:18-163 (NNCF
quantize_with_accuracy_control on the OpenVINO IR: calibrate, quantize,
validate with the full F1 pipeline, revert until the F1 drop fits the
max_drop budget).

TPU redesign: weights are quantized to per-output-channel symmetric int8 and
stored as int8 in HBM; dequantization happens inside the jitted graph
(`w.astype(f32) * scale`), so weight HBM traffic drops 4x and XLA fuses the
dequant into the consuming matmul/conv. Measured on the v5e (D-FINE-m 640^2
bs=1 serving graph): 2.755 ms int8 vs 2.772 ms f32 — latency-neutral, because
this workload is fusion/compute-bound rather than weight-bandwidth-bound; the
win is the 4x smaller resident weight footprint (the reference's 2.6x NNCF
speedup is a CPU/OpenVINO bandwidth effect, README.md:116). The accuracy-control loop reverts the
most quantization-sensitive layers (ranked by relative weight error) until the
validation metric is within `max_drop` of the float baseline — the same
contract as the reference's NNCF loop, metric-agnostic.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import flax

QUANT_LEAF_NAMES = ("kernel",)  # conv + dense kernels; embeddings/bias stay f32


def _iter_quantizable(flat: Dict[str, np.ndarray]) -> List[str]:
    out = []
    for k, v in flat.items():
        if k.split("/")[-1] in QUANT_LEAF_NAMES and getattr(v, "ndim", 0) >= 2:
            out.append(k)
    return out


def quantize_leaf(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel (last axis) symmetric int8 quantization."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def quantization_error(w: np.ndarray) -> float:
    q, s = quantize_leaf(w)
    deq = q.astype(np.float32) * s
    denom = float(np.abs(w).mean()) + 1e-12
    return float(np.abs(deq - np.asarray(w, np.float32)).mean()) / denom


def quantize_params(params, skip: Optional[Set[str]] = None):
    """Returns (qparams pytree with int8 kernels replaced by
    {"q": int8, "scale": f32}, list of quantized paths)."""
    skip = skip or set()
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    quantized = []
    out = {}
    for k, v in flat.items():
        if k in skip or k.split("/")[-1] not in QUANT_LEAF_NAMES or getattr(v, "ndim", 0) < 2:
            out[k] = v
            continue
        q, s = quantize_leaf(np.asarray(v))
        out[k + "@q"] = q
        out[k + "@scale"] = s
        quantized.append(k)
    return flax.traverse_util.unflatten_dict(out, sep="/"), quantized


def dequantize_params(qparams):
    """Inverse transform, usable INSIDE jit: int8 kernels -> f32 on the fly."""
    flat = flax.traverse_util.flatten_dict(qparams, sep="/")
    out = {}
    for k, v in flat.items():
        if k.endswith("@q"):
            base = k[:-2]
            scale = flat[base + "@scale"]
            out[base] = v.astype(jnp.float32) * scale
        elif k.endswith("@scale"):
            continue
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out, sep="/")


def make_quantized_apply(model, batch_stats):
    """apply_fn(qparams, x) running the model with on-the-fly dequantization."""

    def apply_fn(qparams, x):
        params = dequantize_params(qparams)
        return model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)

    return apply_fn


def quantize_with_accuracy_control(
    params,
    validate_fn: Callable[[Dict], float],  # qparams-or-params pytree -> metric
    max_drop: float = 0.02,
    max_reverts: int = 20,
):
    """Greedy accuracy-controlled quantization (reference ov_int8.py:18-163):
    quantize everything, then un-quantize the highest-error layers until the
    metric drop fits the budget. validate_fn receives a params pytree where
    quantized kernels appear as {"@q", "@scale"} pairs (use
    make_quantized_apply / dequantize_params to consume it).

    Returns (qparams, report dict).
    """
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    candidates = _iter_quantizable(flat)
    baseline = float(validate_fn(params))

    skip: Set[str] = set()
    errors = {k: quantization_error(np.asarray(flat[k])) for k in candidates}
    order = sorted(errors, key=lambda k: -errors[k])  # most sensitive first

    qparams, quantized = quantize_params(params, skip)
    metric = float(validate_fn(qparams))
    reverted: List[str] = []
    while baseline - metric > max_drop and len(reverted) < max_reverts and order:
        worst = order.pop(0)
        skip.add(worst)
        reverted.append(worst)
        qparams, quantized = quantize_params(params, skip)
        metric = float(validate_fn(qparams))

    report = {
        "baseline_metric": baseline,
        "quantized_metric": metric,
        "drop": baseline - metric,
        "n_quantized": len(quantized),
        "n_reverted": len(reverted),
        "reverted": reverted,
    }
    return qparams, report
