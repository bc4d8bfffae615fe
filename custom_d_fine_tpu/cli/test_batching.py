"""Batch-size throughput sweep (reference src/dl/test_batching.py:16-60):
sweeps batch 1..32 over N images, reports throughput + latency/image.
Usage: python -m custom_d_fine_tpu.cli.test_batching [--config cfg] [k=v ...]
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--n-images", type=int, default=512)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..configs.registry import get_model_config
    from ..models.dfine import build_model
    from ..ops.postprocess import topk_detections
    from ..utils.config import load_config, resolve_experiment_dir
    from ..utils.logging import logger

    cfg = load_config(args.config, args.overrides)
    t = cfg["train"]
    t["path_to_save"] = resolve_experiment_dir(t["path_to_save"])
    H, W = tuple(t["img_size"])
    num_classes = len(t["label_to_name"])
    mc = get_model_config(cfg["model_name"])
    model, variables = build_model(mc, num_classes=num_classes, img_size=(H, W),
                                   train_batch=1)
    if args.weights:
        from ..infer.model import JaxModel  # reuse its loader
        variables = JaxModel(
            args.weights, cfg["model_name"], num_classes, img_size=(H, W),
            smoke_test=False,
        ).variables

    rng = np.random.default_rng(0)
    rows = []
    for bs in (1, 2, 4, 8, 16, 32):
        @jax.jit
        def infer(images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            out = model.apply(variables, x, train=False)
            return topk_detections(out["pred_logits"], out["pred_boxes"], 300, (H, W))

        imgs = jnp.asarray(rng.integers(0, 255, (bs, H, W, 3)), jnp.uint8)
        d = infer(imgs)
        np.asarray(d["scores"])  # compile + sync
        n_batches = max(args.n_images // bs, 1)
        t0 = time.perf_counter()
        out = None
        for _ in range(n_batches):
            out = infer(imgs)
        np.asarray(out["scores"])
        dt = time.perf_counter() - t0
        n_imgs = n_batches * bs
        rows.append({
            "batch_size": bs,
            "throughput_img_s": round(n_imgs / dt, 1),
            "latency_ms_per_img": round(dt / n_imgs * 1000, 2),
        })
        logger.info(str(rows[-1]))

    out_csv = Path(t["path_to_save"]) / "batching.csv"
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    try:
        from tabulate import tabulate

        print(tabulate([list(r.values()) for r in rows], headers=list(rows[0].keys())))
    except ImportError:
        print(rows)


if __name__ == "__main__":
    main()
