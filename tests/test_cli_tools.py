"""CLI tool smoke tests on a synthetic dataset (split, infer, check_errors
argument plumbing; ETL CLI equivalents are covered in test_etl.py)."""

import cv2
import numpy as np
import pytest

from custom_d_fine_tpu.cli.split import split_dataset


@pytest.fixture()
def raw_dataset(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(20):
        img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"a{i}.jpg"), img)
        if i % 4:  # some negatives
            (tmp_path / "labels" / f"a{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")
    return tmp_path


def test_split_dataset(raw_dataset):
    splits = split_dataset(raw_dataset, train_split=0.7, val_split=0.2, seed=1)
    assert len(splits["train"]) == 14
    assert len(splits["val"]) == 4
    assert len(splits["test"]) == 2
    assert (raw_dataset / "train.csv").exists()
    # no overlap
    all_names = splits["train"] + splits["val"] + splits["test"]
    assert len(set(all_names)) == 20


def test_split_ignore_negatives(raw_dataset):
    splits = split_dataset(raw_dataset, train_split=0.8, val_split=0.2,
                           ignore_negatives=True, seed=1)
    n = len(splits["train"]) + len(splits["val"]) + len(splits["test"])
    assert n == 15  # 5 negatives dropped


def test_check_errors_matching_logic():
    from custom_d_fine_tpu.cli.check_errors import find_errors

    pred = {
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60], [90, 90, 95, 95]],
                          np.float32),
        "labels": np.array([0, 1, 0]),
    }
    gt = {
        "boxes": np.array([[1, 1, 11, 11], [50, 50, 60, 60]], np.float32),
        "labels": np.array([0, 0]),  # second gt has DIFFERENT class than pred 1
    }
    fp, fn = find_errors(pred, gt, 0.5)
    # pred 0 matches gt 0 (same class, IoU>0.5); pred 1 overlaps gt 1 but class
    # differs -> both unmatched; pred 2 matches nothing
    assert fp == [1, 2]
    assert fn == [1]


def test_infer_pad_box():
    from custom_d_fine_tpu.cli.infer import _pad_box

    # float padding = fraction of box size
    assert _pad_box((10, 10, 30, 30), 0.1, 0.5, 100, 100) == (8, 0, 32, 40)
    # int padding = pixels
    assert _pad_box((10, 10, 30, 30), 5, 5, 100, 100) == (5, 5, 35, 35)
    # clipped at image border
    assert _pad_box((0, 0, 30, 30), 10, 10, 100, 100) == (0, 0, 40, 40)


def test_resolve_experiment_dir(tmp_path):
    """Latest-experiment resolution (reference dl/utils.py:789-806): a
    nonexistent exp_YYYY-MM-DD path resolves to the newest sibling run."""
    import os
    import time

    from custom_d_fine_tpu.utils.config import resolve_experiment_dir

    base = tmp_path / "models"
    base.mkdir()
    old = base / "myexp_2026-08-01"
    new = base / "myexp_2026-08-10"
    old.mkdir()
    time.sleep(0.01)
    new.mkdir()
    got = resolve_experiment_dir(str(base / "myexp_2026-08-17"))
    assert got == str(new)
    # existing dir passes through untouched
    assert resolve_experiment_dir(str(old)) == str(old)
    # no siblings: unchanged
    assert resolve_experiment_dir(str(base / "other_2026-08-17")) == str(
        base / "other_2026-08-17")


def test_bench_loader_tool_smoke():
    """tools/bench_loader.py end-to-end at tiny scale: dataset synthesis,
    all three loader modes, one JSON row — and it must never initialize an
    accelerator backend (the loader resolves process info lazily). Runs in
    a fresh subprocess so the no-backend-init property is actually asserted
    (this test process already has a backend up)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from tools import bench_loader\n"
        "row = bench_loader.main(n_images=6, batch=2, workers=2, size_px=320)\n"
        "assert row['value'] > 0 and row['val_img_s'] > 0\n"
        "assert row['train_mosaic50_img_s'] > 0\n"
        "jax = sys.modules.get('jax')\n"
        "if jax is not None:\n"
        "    from jax._src import xla_bridge as xb\n"
        "    assert not xb._backends, 'loader initialized a backend'\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
