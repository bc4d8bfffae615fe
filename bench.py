"""Benchmark: D-FINE-m 640x640 end-to-end inference latency on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md north star): <= 3 ms p50/image on one v5e chip.
vs_baseline = baseline_ms / measured_ms (>1.0 means faster than target).

The timed region matches the reference's definition (README.md:100-103 /
bench.py:113-120): preprocessing (normalize, on device) -> model -> fused
top-K postprocess, per image, after warmup.
"""

import json
import time

import numpy as np

BASELINE_P50_MS = 3.0


def main():
    import jax
    import jax.numpy as jnp

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.models.dfine import build_model
    from custom_d_fine_tpu.ops.postprocess import topk_detections

    cfg = get_model_config("m")
    model, variables = build_model(cfg, num_classes=80, img_size=(640, 640), train_batch=1)

    @jax.jit
    def infer(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, x, train=False)
        return topk_detections(out["pred_logits"], out["pred_boxes"], 300, (640, 640))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, 640, 640, 3)), jnp.uint8)

    # warmup (compile + 10 runs, reference bench.py:81-86)
    det = infer(img)
    jax.block_until_ready(det)
    for _ in range(10):
        det = infer(img)
    jax.block_until_ready(det)

    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        det = infer(img)
        jax.block_until_ready(det)
        times.append((time.perf_counter() - t0) * 1000)

    p50 = float(np.percentile(times, 50))
    p95 = float(np.percentile(times, 95))

    print(json.dumps({
        "metric": "dfine_m_640_e2e_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 3),
        "p95_ms": round(p95, 3),
        "throughput_img_s": round(1000.0 / p50, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
