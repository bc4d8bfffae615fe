"""ETL converter + hygiene tests."""

import json

import cv2
import numpy as np
import pytest

from custom_d_fine_tpu.etl.converters import (
    coco_to_yolo,
    csv_split_to_ultralytics,
    png_masks_to_yolo,
    polys_to_bboxes,
    ultralytics_to_csv_split,
    yolo_to_coco,
)
from custom_d_fine_tpu.etl.hygiene import (
    clean_csv,
    create_test_csv,
    find_near_duplicates,
    remove_class,
)


@pytest.fixture()
def yolo_ds(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"a{i}.jpg"), img)
        lines = [f"{i % 2} 0.5 0.5 0.2 0.3"]
        if i == 0:
            lines.append("1 0.1 0.1 0.4 0.1 0.4 0.4 0.1 0.4")
        (tmp_path / "labels" / f"a{i}.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "train.csv").write_text("a0.jpg\na1.jpg\n")
    (tmp_path / "val.csv").write_text("a2.jpg\na3.jpg\n")
    return tmp_path


def test_yolo_coco_roundtrip(yolo_ds, tmp_path):
    out_json = tmp_path / "coco.json"
    n = yolo_to_coco(yolo_ds / "images", yolo_ds / "labels", out_json, {0: "x", 1: "y"})
    assert n == 5
    data = json.loads(out_json.read_text())
    assert len(data["images"]) == 4
    segs = [a for a in data["annotations"] if "segmentation" in a]
    assert len(segs) == 1

    out_labels = tmp_path / "labels2"
    m = coco_to_yolo(out_json, out_labels)
    assert m == 4
    from custom_d_fine_tpu.data.yolo import parse_yolo_label_file

    b0, p0 = parse_yolo_label_file(out_labels / "a0.txt")
    assert len(b0) == 2
    # roundtripped box close to original
    orig, _ = parse_yolo_label_file(yolo_ds / "labels" / "a0.txt")
    np.testing.assert_allclose(
        sorted(b0[:, 1].tolist()), sorted(orig[:, 1].tolist()), atol=1e-4
    )


def test_png_masks_to_yolo(tmp_path):
    mdir = tmp_path / "masks"
    mdir.mkdir()
    m = np.zeros((80, 80), np.uint8)
    cv2.rectangle(m, (10, 20), (50, 60), 255, -1)
    cv2.imwrite(str(mdir / "m0.png"), m)
    out = tmp_path / "labels"
    n = png_masks_to_yolo(mdir, out)
    assert n == 1
    from custom_d_fine_tpu.data.yolo import parse_yolo_label_file

    boxes, polys = parse_yolo_label_file(out / "m0.txt")
    assert len(polys[0]) >= 3
    np.testing.assert_allclose(boxes[0, 1], (10 + 50) / 2 / 80, atol=0.03)


def test_polys_to_bboxes(yolo_ds, tmp_path):
    out = tmp_path / "bbox_labels"
    polys_to_bboxes(yolo_ds / "labels", out)
    txt = (out / "a0.txt").read_text().strip().splitlines()
    assert all(len(l.split()) == 5 for l in txt)


def test_ultralytics_roundtrip(yolo_ds, tmp_path):
    ul = tmp_path / "ul"
    csv_split_to_ultralytics(yolo_ds, ul, {0: "x", 1: "y"})
    assert (ul / "dataset.yaml").exists()
    assert (ul / "images" / "train" / "a0.jpg").exists()
    back = tmp_path / "back"
    ultralytics_to_csv_split(ul, back)
    assert (back / "train.csv").read_text().strip().splitlines() == ["a0.jpg", "a1.jpg"]


def test_remove_class(yolo_ds):
    n = remove_class(yolo_ds / "labels", 0)
    assert n >= 1
    from custom_d_fine_tpu.data.yolo import parse_yolo_label_file

    b, _ = parse_yolo_label_file(yolo_ds / "labels" / "a1.txt")
    assert (b[:, 0] == 0).all()  # class 1 remapped to 0


def test_clean_csv_and_test_csv(yolo_ds):
    (yolo_ds / "images" / "a1.jpg").unlink()
    dropped = clean_csv(yolo_ds)
    assert dropped["train"] == 1
    n = create_test_csv(yolo_ds / "images", yolo_ds / "test2.csv")
    assert n == 3


def test_near_duplicates(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    cv2.imwrite(str(d / "x0.jpg"), base)
    cv2.imwrite(str(d / "x1.jpg"), np.clip(base.astype(int) + 2, 0, 255).astype(np.uint8))
    cv2.imwrite(str(d / "y0.jpg"), rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    groups = find_near_duplicates(d)
    assert len(groups) == 1 and len(groups[0]) == 2
