"""AOT export: serialize the inference graph (model + fused postprocessor)
as a StableHLO artifact via jax.export.

Parity target: reference src/dl/export.py:131-275 (ONNX/OpenVINO/TensorRT
exporters). On TPU the deployment artifact is the XLA/StableHLO program
itself: jax.export serializes the traced graph + weights-free signature; the
weights ride along as closed-over constants (like the reference's fused
postprocessor graph, export.py:20-100). fp16 conversion maps to a bfloat16
compute-dtype variant.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def export_inference_artifact(
    model,
    variables,
    img_size: Tuple[int, int],
    out_path: Path,
    batch_size: int = 1,
    num_top: int = 300,
) -> Path:
    """Serialize the jitted inference fn to <out_path> (.stablehlo bytes)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .serving import make_serving_forward

    H, W = img_size
    # canonical serving graph (fused Pallas stem on TPU, two-stage top-K);
    # the artifact is platform-targeted, like the reference's per-backend
    # ONNX/TRT/OV engines
    infer = make_serving_forward(model, variables, (H, W), num_top=num_top)

    spec = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer))(spec)
    data = exported.serialize()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(data)
    return out_path


def load_inference_artifact(path: Path):
    """Deserialize and return a callable (roundtrip check for exports)."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xyxy boxes [N,4] x [M,4] -> [N,M]."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), -1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), -1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def export_and_verify(model, variables, img_size, out_path, batch_size=1,
                      top_check=50):
    """Export + consistency check between the artifact and a live forward
    (stands in for the reference's cross-backend F1 consistency test,
    bench.py:236-267).

    The check is SET-based, like the reference's (which compares detection
    metrics across Torch/ONNX/TRT, not raw tensors): two independent XLA
    compilations of the same graph reorder float reductions, which shifts
    scores at the ~5e-3 level and permutes near-tied entries in the sorted
    top-K — elementwise tensor comparison would flag every permuted slot even
    though the detection SETS agree to sub-pixel. So: sorted score curves must
    match closely, and each of the live model's top detections must have a
    same-label, high-IoU, close-score counterpart in the artifact's output."""
    import jax
    import jax.numpy as jnp

    path = export_inference_artifact(model, variables, img_size, out_path, batch_size)
    fn = load_inference_artifact(path)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (batch_size, *img_size, 3)), jnp.uint8)

    from ..ops.postprocess import topk_detections

    H, W = img_size

    def ref(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, x, train=False)
        return topk_detections(out["pred_logits"], out["pred_boxes"], 300, (H, W))

    a = fn(img)
    b = ref(img)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        for k in ("boxes", "scores", "labels"):
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       rtol=1e-5, atol=1e-5)
        return path

    sa, sb = np.asarray(a["scores"]), np.asarray(b["scores"])
    ba, bb = np.asarray(a["boxes"]), np.asarray(b["boxes"])
    la, lb = np.asarray(a["labels"]), np.asarray(b["labels"])
    np.testing.assert_allclose(np.sort(sa, -1), np.sort(sb, -1), atol=2e-2,
                               err_msg="score curves of artifact vs live diverge")
    n_bad, total = 0, 0
    for i in range(sa.shape[0]):
        k = min(top_check, sb.shape[1])
        order = np.argsort(-sb[i])[:k]  # live model's top detections
        iou = _iou_matrix(bb[i][order], ba[i])  # vs ALL artifact detections
        same = lb[i][order][:, None] == la[i][None, :]
        close = np.abs(sb[i][order][:, None] - sa[i][None, :]) < 2e-2
        matched = ((iou >= 0.5) & same & close).any(1)
        n_bad += int((~matched).sum())
        total += k
    frac = n_bad / max(total, 1)
    assert frac <= 0.05, (
        f"exported artifact diverges: {n_bad}/{total} top detections have no "
        f"same-label IoU>=0.5 counterpart within score tol")
    return path
