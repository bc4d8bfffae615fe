"""Multi-host helpers (parallel/multihost.py): single-process identity path +
payload codec parity with the multi-process protocol."""

import numpy as np

from custom_d_fine_tpu.parallel.multihost import gather_objects, is_main_process


def test_gather_objects_single_process_identity():
    items = [{"boxes": np.zeros((2, 4)), "labels": np.array([1, 2])}]
    out = gather_objects(items)
    assert out is items  # no copy on the single-process fast path
    assert is_main_process()


def test_gather_objects_codec_roundtrip():
    """The pickle+pad+unpickle protocol must reconstruct per-process lists
    exactly (simulated without a real multi-host slice)."""
    import pickle

    per_process = [
        [{"a": np.arange(3)}, {"b": "x"}],
        [{"c": 1.5}],
    ]
    payloads = [np.frombuffer(pickle.dumps(p), np.uint8) for p in per_process]
    sizes = [p.size for p in payloads]
    max_n = max(sizes)
    gathered = np.stack([np.pad(p, (0, max_n - p.size)) for p in payloads])
    out = []
    for i in range(len(per_process)):
        out.extend(pickle.loads(gathered[i, : sizes[i]].tobytes()))
    assert len(out) == 3
    np.testing.assert_array_equal(out[0]["a"], np.arange(3))
    assert out[2]["c"] == 1.5
