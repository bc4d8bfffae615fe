"""Multi-host helpers (parallel/multihost.py + loader process sharding).

The multi-process branch of gather_objects and the loader's per-process
striding are exercised with a mocked process topology (no real multi-host
slice exists in CI) — the mocks replace exactly the two primitives JAX
provides on a real slice: process_count/process_index and
multihost_utils.process_allgather.
"""

import pickle

import cv2
import numpy as np
import pytest

import custom_d_fine_tpu.parallel.multihost as mh
from custom_d_fine_tpu.data.loader import Loader
from custom_d_fine_tpu.parallel.multihost import gather_objects, is_main_process


def test_gather_objects_single_process_identity():
    items = [{"boxes": np.zeros((2, 4)), "labels": np.array([1, 2])}]
    out = gather_objects(items)
    assert out is items  # no copy on the single-process fast path
    assert is_main_process()


def test_gather_objects_multiprocess_branch(monkeypatch):
    """Run the REAL gather_objects code for each simulated process, with
    process_allgather mocked to return what a 2-process slice would: first
    the [P,1] size gather, then the [P,max_n] padded payload gather."""
    per_process = [
        [{"a": np.arange(3)}, {"b": "x"}],
        [{"c": 1.5}],
    ]
    payloads = [np.frombuffer(pickle.dumps(p), np.uint8) for p in per_process]
    sizes = np.asarray([[p.size] for p in payloads], np.int64)
    max_n = int(sizes.max())
    padded = np.stack([np.pad(p, (0, max_n - p.size)) for p in payloads])

    def fake_allgather(x):
        x = np.asarray(x)
        if x.ndim == 1 and x.dtype == np.int64:     # the size gather
            assert int(x[0]) in sizes, "local payload size not in expected set"
            return sizes
        assert x.shape == (max_n,)                  # the payload gather
        return padded

    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    # every process must reconstruct the SAME full list, in process order
    for p in range(2):
        out = gather_objects(per_process[p])
        assert len(out) == 3
        np.testing.assert_array_equal(out[0]["a"], np.arange(3))
        assert out[1]["b"] == "x"
        assert out[2]["c"] == 1.5


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    names = []
    for i in range(7):  # odd count: exercises wrap-pad + unequal eval shards
        img = np.full((64, 64, 3), i * 30, np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / "images" / name), img)
        (root / "labels" / f"img_{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        names.append(name)
    for split in ("train", "val"):
        (root / f"{split}.csv").write_text("\n".join(names) + "\n")
    return root


def test_loader_process_sharding(small_dataset):
    """2-process simulation: the eval split is covered EXACTLY once across
    processes (no duplicate predictions -> no P-scaled metric counts), and
    train epochs wrap-pad to equal per-process lengths (reference
    DistributedSampler, dataset.py:562-568)."""
    loader = Loader(root_path=small_dataset, img_size=(64, 64), batch_size=2,
                    num_workers=1, max_gt=5)

    # ---- eval: exact cover, no padding
    seen = []
    for p in range(2):
        it = loader.epoch_iterator("val", shuffle=False, drop_last=False,
                                   process_index=p, process_count=2)
        for b in it:
            seen.extend(b["paths"])
    assert len(seen) == 7, "eval split must be covered exactly once"
    assert len(set(seen)) == 7

    # ---- train: identical shuffle on both processes, wrap-pad to equal len
    orders = []
    for p in range(2):
        it = loader.epoch_iterator("train", epoch=3, drop_last=False,
                                   process_index=p, process_count=2)
        paths = [pp for b in it for pp in b["paths"]]
        orders.append(paths)
    assert len(orders[0]) == len(orders[1]) == 4  # ceil(7/2) with wrap-pad
    union = set(orders[0]) | set(orders[1])
    assert len(union) == 7  # every image appears on some process

    # ---- train with shuffle=False: STILL wrap-padded to lockstep length
    # (the jitted global train step is a collective; the pad gate is on the
    # SPLIT, not on shuffle)
    lens = []
    for p in range(2):
        it = loader.epoch_iterator("train", shuffle=False, drop_last=False,
                                   process_index=p, process_count=2)
        lens.append(sum(b["images"].shape[0] for b in it))
    assert lens[0] == lens[1] == 4


def test_loader_single_process_unchanged(small_dataset):
    loader = Loader(root_path=small_dataset, img_size=(64, 64), batch_size=4,
                    num_workers=1, max_gt=5)
    n = sum(len(b["paths"]) for b in loader.epoch_iterator(
        "val", shuffle=False, drop_last=False))
    assert n == 7
