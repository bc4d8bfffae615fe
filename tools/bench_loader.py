"""Host data-pipeline throughput: the other half of the training-step budget.

The jitted train step consumes batches from the threaded Loader
(data/loader.py); on a host with few cores the decode+letterbox+augment
pipeline — not the TPU — can be the wall. This tool measures sustained
loader img/s on a synthetic on-disk YOLO dataset (JPEG decode included),
train mode (full aug stack + mosaic off/on) and val mode, and reports the
per-chip batch cadence it can sustain vs the device step time.

Counterpart of the reference's torch DataLoader worker tuning
(src/dl/dataset.py:560-600 num_workers/prefetch); one JSON line like the
other bench tools.

Usage: python tools/bench_loader.py [n_images] [batch] [workers] [size_px]
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np


def make_dataset(root: Path, n: int, rng: np.random.Generator,
                 src_hw=(720, 1280)) -> None:
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    h, w = src_hw
    names = []
    # realistic JPEG content (noise compresses badly): smooth gradients +
    # random rectangles
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (xx * 255 / w), (yy * 255 / h),
            ((xx + yy) * 255 / (h + w))], -1).astype(np.uint8)
        for _ in range(8):
            x0, y0 = rng.integers(0, w - 60), rng.integers(0, h - 60)
            dw, dh = rng.integers(40, 200), rng.integers(40, 160)
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv2.rectangle(img, (int(x0), int(y0)),
                          (int(min(x0 + dw, w - 1)), int(min(y0 + dh, h - 1))),
                          color, -1)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / "images" / name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        lines = []
        for _ in range(12):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            bw, bh = rng.uniform(0.05, 0.3, 2)
            lines.append(f"{int(rng.integers(0, 10))} {cx:.4f} {cy:.4f} "
                         f"{bw:.4f} {bh:.4f}")
        (root / "labels" / f"img_{i}.txt").write_text("\n".join(lines) + "\n")
        names.append(name)
    for split in ("train", "val"):
        (root / f"{split}.csv").write_text("\n".join(names) + "\n")


def run_epochs(loader, split: str, epochs: int = 1) -> float:
    """Sustained img/s: one UNTIMED warmup epoch (OS page cache + thread
    pool), then `epochs` timed epochs — every mode is measured warm."""
    for _ in loader.epoch_iterator(split, epoch=0):
        pass
    n_img = 0
    t0 = time.perf_counter()
    for e in range(1, epochs + 1):
        for batch in loader.epoch_iterator(split, epoch=e):
            n_img += batch["images"].shape[0]
    return n_img / (time.perf_counter() - t0)


def main(n_images=256, batch=16, workers=4, size_px=640):
    from custom_d_fine_tpu.data.augs import AugConfig
    from custom_d_fine_tpu.data.loader import Loader
    from custom_d_fine_tpu.data.mosaic import MosaicConfig

    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    try:
        rng = np.random.default_rng(0)
        make_dataset(tmp, n_images, rng)

        def build(mosaic_prob):
            return Loader(
                root_path=tmp, img_size=(size_px, size_px), batch_size=batch,
                num_workers=workers, max_gt=100,
                aug_cfg=AugConfig(),
                mosaic_cfg=MosaicConfig(mosaic_prob=mosaic_prob),
                seed=0,
            )

        loader = build(0.0)
        val_ips = run_epochs(loader, "val")
        train_ips = run_epochs(loader, "train")
        mosaic_ips = run_epochs(build(0.5), "train")

        import os
        row = {
            "metric": f"loader_{size_px}_img_per_s",
            "value": round(train_ips, 1),
            "unit": "img/s",
            "val_img_s": round(val_ips, 1),
            "train_mosaic50_img_s": round(mosaic_ips, 1),
            "batch": batch,
            "workers": workers,
            "host_cpus": os.cpu_count(),
        }
        print(json.dumps(row))
        return row
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a[:4]))
