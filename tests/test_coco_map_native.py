"""Differential tests: native C++ COCOeval matcher vs the numpy oracle.

The native backend (native/cocomatch.cpp via eval/cocomatch_native.py) must
reproduce the pure-Python coco_map path bit-for-bit on randomized inputs with
crowds, ties, area buckets, empty images, and both IoU types.
"""

import numpy as np
import pytest

from custom_d_fine_tpu.eval import cocomatch_native
from custom_d_fine_tpu.eval.coco_map import coco_map

pytestmark = pytest.mark.skipif(
    not cocomatch_native.available(), reason="g++/native build unavailable")


def _rand_dataset(rng, n_img, n_cls, max_gt=12, max_dt=30, masks=False,
                  quantize=None):
    preds, gts = [], []
    for _ in range(n_img):
        ng = int(rng.integers(0, max_gt + 1))
        nd = int(rng.integers(0, max_dt + 1))

        def boxes(n):
            xy = rng.uniform(0, 400, (n, 2))
            wh = rng.uniform(2, 150, (n, 2))
            return np.concatenate([xy, xy + wh], 1).astype(np.float32)

        g = {"labels": rng.integers(0, n_cls, (ng,)),
             "boxes": boxes(ng),
             "iscrowd": rng.uniform(size=ng) < 0.25}
        p = {"labels": rng.integers(0, n_cls, (nd,)),
             "boxes": boxes(nd),
             "scores": rng.uniform(0.01, 1.0, (nd,)).astype(np.float32)}
        if quantize:  # force score/IoU ties to exercise tie-breaks
            p["scores"] = np.round(p["scores"] * quantize) / quantize
            g["boxes"] = np.round(g["boxes"] / 8) * 8
            p["boxes"] = np.round(p["boxes"] / 8) * 8
        if masks:
            H = W = 48
            def to_masks(b):
                m = np.zeros((len(b), H, W), bool)
                for i, bb in enumerate(b):
                    x0, y0, x1, y1 = (bb / 10).astype(int)
                    m[i, max(y0, 0):max(y1, 1), max(x0, 0):max(x1, 1)] = True
                return m
            g["masks"] = to_masks(g.pop("boxes"))
            p["masks"] = to_masks(p.pop("boxes"))
        preds.append(p)
        gts.append(g)
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_numpy_bbox(seed):
    rng = np.random.default_rng(seed)
    preds, gts = _rand_dataset(rng, n_img=12, n_cls=5,
                               quantize=8 if seed % 2 else None)
    a = coco_map(preds, gts, native=False)
    b = coco_map(preds, gts, native=True)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=0.0), k


def test_native_matches_numpy_segm():
    rng = np.random.default_rng(7)
    preds, gts = _rand_dataset(rng, n_img=8, n_cls=3, masks=True)
    a = coco_map(preds, gts, iou_type="segm", native=False)
    b = coco_map(preds, gts, iou_type="segm", native=True)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=0.0), k


def test_native_single_range_and_empty_images():
    rng = np.random.default_rng(11)
    preds, gts = _rand_dataset(rng, n_img=6, n_cls=4)
    # empty detections everywhere for one class + fully empty image pair
    preds.append({"labels": np.zeros((0,), int), "boxes": np.zeros((0, 4)),
                  "scores": np.zeros((0,))})
    gts.append({"labels": np.zeros((0,), int), "boxes": np.zeros((0, 4))})
    a = coco_map(preds, gts, area_ranges=("all",), native=False)
    b = coco_map(preds, gts, area_ranges=("all",), native=True)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=0.0), k
