"""Data pipeline tests on a synthetic YOLO-format dataset."""

import numpy as np
import pytest
import cv2

from custom_d_fine_tpu.data.augs import AugConfig, hflip, rotate90
from custom_d_fine_tpu.data.dataset import DFineDataset
from custom_d_fine_tpu.data.letterbox import (
    letterbox_boxes_abs,
    letterbox_image,
    letterbox_params,
    unletterbox_boxes_abs,
)
from custom_d_fine_tpu.data.loader import Loader
from custom_d_fine_tpu.data.mosaic import MosaicConfig, box_candidates, clip_polygon_to_rect
from custom_d_fine_tpu.data.yolo import parse_yolo_label_file


@pytest.fixture(scope="module")
def yolo_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / "images" / name), img)
        lines = []
        for _ in range(int(rng.integers(0, 4))):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.1, 0.25, 2)
            cls = int(rng.integers(0, 3))
            lines.append(f"{cls} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        # one polygon row on even images
        if i % 2 == 0:
            poly = "0 0.2 0.2 0.5 0.2 0.5 0.5 0.2 0.5"
            lines.append(poly)
        (root / "labels" / f"img_{i}.txt").write_text("\n".join(lines) + "\n")
        names.append(name)
    for split in ("train", "val", "test"):
        (root / f"{split}.csv").write_text("\n".join(names) + "\n")
    return root


def test_yolo_parser_boxes_and_polys(yolo_dataset):
    boxes, polys = parse_yolo_label_file(yolo_dataset / "labels" / "img_0.txt")
    assert boxes.shape[1] == 5
    assert len(polys) == len(boxes)
    # polygon row produced a bbox from extents
    assert polys[-1].shape == (4, 2)
    np.testing.assert_allclose(boxes[-1, 1:], [0.35, 0.35, 0.3, 0.3], atol=1e-6)


def test_letterbox_roundtrip():
    p = letterbox_params(300, 400, 640, 640, scaleup=True)
    assert p["new_w"] == 640 and p["new_h"] == 480
    assert p["pad_top"] + p["pad_bottom"] + p["new_h"] == 640
    boxes = np.array([[10, 20, 100, 200]], np.float32)
    fwd = letterbox_boxes_abs(boxes, p)
    back = unletterbox_boxes_abs(fwd, p, 300, 400)
    np.testing.assert_allclose(back, boxes, atol=1e-3)


def test_letterbox_rounding_matches_reference():
    # odd padding split: the +-0.1 rounding must put the extra pixel on the
    # bottom/right (reference dl/utils.py:874-878)
    p = letterbox_params(199, 640, 640, 640, scaleup=True)
    assert p["pad_top"] + p["pad_bottom"] == 640 - p["new_h"]
    assert p["pad_bottom"] >= p["pad_top"]


def test_dataset_samples_static_shapes(yolo_dataset):
    ds = DFineDataset(
        root_path=yolo_dataset, names=[f"img_{i}.jpg" for i in range(8)],
        img_size=(160, 160), mode="train", max_gt=10,
        mosaic_cfg=MosaicConfig(mosaic_prob=0.5),
    )
    for i in range(8):
        s = ds[i]
        assert s["image"].shape == (160, 160, 3)
        assert s["image"].dtype == np.uint8
        assert s["boxes"].shape == (10, 4)
        assert s["labels"].shape == (10,)
        assert s["valid"].shape == (10,)
        assert (s["boxes"] >= 0).all() and (s["boxes"] <= 1).all()
        assert s["valid"].sum() <= 10


def test_mosaic_samples_skip_photometric_augs(yolo_dataset, monkeypatch):
    """The reference applies the photometric/geometric aug stack ONLY on the
    non-mosaic path (dataset.py:420-447 self.transform); mosaic samples get
    normalize alone (dataset.py:341). Found by the aug-ON convergence A/B:
    augmenting mosaic outputs too skews 80% of the training diet."""
    import custom_d_fine_tpu.data.dataset as ds_mod

    calls = []
    real = ds_mod.apply_train_augs
    monkeypatch.setattr(ds_mod, "apply_train_augs",
                        lambda s, cfg, rng: calls.append(1) or real(s, cfg, rng))
    ds = DFineDataset(
        root_path=yolo_dataset, names=[f"img_{i}.jpg" for i in range(8)],
        img_size=(160, 160), mode="train", max_gt=10,
        mosaic_cfg=MosaicConfig(mosaic_prob=1.0),
    )
    for i in range(4):
        ds[i]
    assert not calls, "mosaic samples must not pass through apply_train_augs"
    ds.mosaic_prob = 0.0
    for i in range(4):
        ds[i]
    assert len(calls) == 4, "non-mosaic train samples must be augmented"


def test_segment_task_masks(yolo_dataset):
    ds = DFineDataset(
        root_path=yolo_dataset, names=["img_0.jpg"], img_size=(160, 160),
        mode="val", max_gt=10, task="segment",
    )
    s = ds[0]
    assert s["masks"].shape == (10, 40, 40)
    # the polygon instance must have rasterized to a non-empty mask
    assert s["masks"].sum() > 0


def test_loader_batches(yolo_dataset):
    loader = Loader(
        root_path=yolo_dataset, img_size=(160, 160), batch_size=4,
        num_workers=2, max_gt=10, label_to_name={0: "a", 1: "b", 2: "c"},
    )
    batches = list(loader.epoch_iterator("train", epoch=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 160, 160, 3)
    assert b["boxes"].shape == (4, 10, 4)
    assert b["valid"].dtype == bool
    # val keeps remainder
    val_batches = list(loader.epoch_iterator("val"))
    assert sum(len(v["paths"]) for v in val_batches) == 8


def test_multiscale_collate(yolo_dataset):
    loader = Loader(
        root_path=yolo_dataset, img_size=(160, 160), batch_size=8,
        num_workers=1, max_gt=10, multiscale_prob=1.0, seed=0,
    )
    b = next(iter(loader.epoch_iterator("train", epoch=0)))
    assert b["images"].shape[1] in (96, 128, 192, 224)


def test_hflip_box_math():
    img = np.zeros((10, 20, 3), np.uint8)
    s = {"image": img, "boxes": np.array([[2, 1, 6, 4]], np.float32),
         "labels": np.array([0])}
    hflip(s, np.random.default_rng(0))
    np.testing.assert_allclose(s["boxes"], [[14, 1, 18, 4]])


def test_rot90_box_math():
    img = np.zeros((10, 20, 3), np.uint8)
    s = {"image": img, "boxes": np.array([[2, 1, 6, 4]], np.float32),
         "labels": np.array([0])}
    rotate90(s, np.random.default_rng(0))
    assert s["image"].shape[:2] == (20, 10)
    np.testing.assert_allclose(s["boxes"], [[1, 14, 4, 18]])


def test_polygon_clip():
    tri = np.array([[-5, 0], [5, 0], [5, 10]], np.float32)
    out = clip_polygon_to_rect(tri, 10, 10)
    assert len(out) >= 3
    assert (out[:, 0] >= 0).all() and (out[:, 0] <= 10).all()
    gone = clip_polygon_to_rect(np.array([[-5, -5], [-1, -5], [-1, -1]], np.float32), 10, 10)
    assert gone.shape == (0, 2)


def test_box_candidates_filters_degenerate():
    box1 = np.array([[0, 0, 100, 100], [0, 0, 100, 100]], np.float32).T
    box2 = np.array([[0, 0, 50, 50], [0, 0, 1, 100]], np.float32).T
    keep = box_candidates(box1, box2)
    assert keep.tolist() == [True, False]


def test_multiscale_custom_deltas_and_mask_rethreshold(yolo_dataset):
    """Configurable multiscale_deltas reach the collate, and GT masks are
    resized + re-thresholded to the new canvas (reference dataset.py:667-694)."""
    loader = Loader(
        root_path=yolo_dataset, img_size=(160, 160), batch_size=8,
        num_workers=1, max_gt=10, multiscale_prob=1.0,
        multiscale_deltas=(32,), seed=0, task="segment",
    )
    b = next(iter(loader.epoch_iterator("train", epoch=0)))
    assert b["images"].shape[1] == 192  # only +32 allowed
    md = loader.datasets["train"].mask_downsample
    assert b["masks"].shape[2] == 192 // md
    assert set(np.unique(b["masks"])) <= {0, 1}
