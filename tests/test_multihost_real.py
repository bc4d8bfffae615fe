"""REAL 2-process multi-host execution (VERDICT round-3 item 4).

Unlike test_multihost.py (mocked topology), this launches two actual JAX
processes with jax.distributed.initialize on localhost — 4 virtual CPU
devices each, one 8-device global mesh — and runs the real Trainer through
them via tools/multihost_smoke.py: real process_allgather (Gloo), real
make_array_from_process_local_data, real lockstep eval with a filler launch,
real collective orbax save. Reference counterpart: torchrun smoke of
dist_utils.py:13-49,127-193.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def mh_dataset(tmp_path_factory):
    """9 train / 9 val images: odd counts so the train split exercises the
    wrap-pad (9 % 2 == 1) and the val split's stride shards differ in length
    (5 vs 4), forcing the lockstep filler launch at batch_size=4."""
    root = tmp_path_factory.mktemp("mhds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(3)
    names = []
    for i in range(18):
        img = rng.integers(0, 120, (160, 160, 3)).astype(np.uint8)
        x1, y1 = rng.integers(10, 80, 2)
        w, h = rng.integers(30, 60, 2)
        img[y1:y1 + h, x1:x1 + w] = [255, 40, 40]
        name = f"im{i}.jpg"
        cv2.imwrite(str(root / "images" / name), img)
        cx, cy = (x1 + w / 2) / 160, (y1 + h / 2) / 160
        (root / "labels" / f"im{i}.txt").write_text(
            f"0 {cx:.4f} {cy:.4f} {w / 160:.4f} {h / 160:.4f}\n")
        names.append(name)
    (root / "train.csv").write_text("\n".join(names[:9]) + "\n")
    (root / "val.csv").write_text("\n".join(names[9:]) + "\n")
    return root


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(run_dir, mh_dataset):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "/root/repo/tools/multihost_smoke.py",
             str(pid), "2", str(port), str(mh_dataset), str(run_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host smoke timed out")
        outs.append(out)
    return procs, outs


def test_two_process_trainer(mh_dataset, tmp_path):
    run_dir = tmp_path / "a"
    run_dir.mkdir()
    procs, outs = _launch(run_dir, mh_dataset)
    if any(p.returncode != 0 for p in procs) and any(
            "Gloo context initialization failed" in o for o in outs):
        # known 1-core-host flake: even with the smoke's file barriers, a
        # >30s CPU-starvation stall INSIDE a phase can outlast Gloo's
        # rendezvous window when unrelated load spikes. One clean retry.
        run_dir = tmp_path / "b"
        run_dir.mkdir()
        procs, outs = _launch(run_dir, mh_dataset)
    tmp_path = run_dir
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-4000:]}"

    r0 = json.loads((tmp_path / "result_p0.json").read_text())
    r1 = json.loads((tmp_path / "result_p1.json").read_text())

    # exactly one main process
    assert r0["is_main"] and not r1["is_main"]
    # train wrap-pad: 9 images pad to 10, 5 per process
    assert r0["n_train_local"] == r1["n_train_local"] == 5
    # val stride (no pad): 5 / 4
    assert {r0["n_val_local"], r1["n_val_local"]} == {5, 4}
    # gather_objects returned the FULL val set on both processes
    assert r0["n_gathered_preds"] == r1["n_gathered_preds"] == 9
    assert r0["n_gathered_gts"] == r1["n_gathered_gts"] == 9
    # replicated host control flow: both processes computed identical metrics
    assert r0["metrics"] == r1["metrics"]
    assert r0["train_loss_finite"] and r1["train_loss_finite"]

    # rank-0 gating wrote the host artifacts once, under the shared run dir
    run = tmp_path / "run"
    assert (run / "train_log.txt").exists()
    assert (run / "metrics.csv").exists()
    # collective orbax save completed (both 'last' and best 'model')
    assert (run / "last").exists()
