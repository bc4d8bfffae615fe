"""Benchmark: D-FINE-m 640x640 end-to-end inference on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md north star): <= 3 ms p50/image on one v5e chip.
vs_baseline = baseline_ms / measured_ms (>1.0 means faster than target).

Protocol note: this TPU is reached through a tunnel whose host<->device data
fetch costs ~29 ms regardless of payload, and block_until_ready returns before
execution completes. The headline metric is therefore the steady-state
pipelined per-image latency (issue N calls back-to-back on the device stream,
one final fetch), which is the standard accelerator serving measure; the
fetch-synced p50 is also reported. Timed region per image = on-device
normalize -> model -> fused top-K postprocess (matches the reference's
preprocess->infer->postprocess definition, README.md:100-103).
"""

import json
import time

import numpy as np

BASELINE_P50_MS = 3.0


def guard_fast_topk():
    """On-device exactness check of the serving approx top-K.

    The serving graph relies on lax.approx_max_k (TPU PartialReduce,
    recall_target 0.99) being EXACT at its two shapes: decoder query selection
    (N=8400, k=300) and final detection top-K (N=24000, k=300). That holds
    because the partial reduce keeps >=k candidates per 1050/3000-wide chunk,
    but it is a backend behavior the CPU suite can't see — so assert set
    equality against lax.top_k here, on the real chip, once per bench run."""
    import jax
    import jax.numpy as jnp

    from custom_d_fine_tpu.ops.postprocess import fast_topk

    rng = np.random.default_rng(7)
    for n in (8400, 24000):
        x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
        _, ia = jax.jit(fast_topk, static_argnums=1)(x, 300)
        _, ie = jax.lax.top_k(x, 300)
        ia, ie = np.asarray(ia), np.asarray(ie)
        for b in range(x.shape[0]):
            missed = set(ie[b]) - set(ia[b])
            assert not missed, (
                f"fast_topk dropped {len(missed)} of top-300 at N={n}: "
                f"approx_max_k recall regressed on this backend")
    import sys

    print("fast_topk guard: exact at serving shapes", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    guard_fast_topk()

    from custom_d_fine_tpu.deploy.serving import build_serving

    # canonical serving graph — the same builder __graft_entry__.entry(),
    # JaxModel and the export artifact use
    fn, _, _ = build_serving("m", num_classes=80, img_size=(640, 640))
    infer = jax.jit(fn)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, 640, 640, 3)), jnp.uint8)

    # warmup: compile + settle
    det = infer(img)
    np.asarray(det["scores"])
    for _ in range(30):
        det = infer(img)
    np.asarray(det["scores"])

    # headline: pipelined steady-state latency per image — median of three
    # 300-call windows (the tunnel's scheduling jitter moves single windows
    # by ~5%; the median is the stable p50-style figure)
    windows = []
    for _ in range(3):
        N = 300
        t0 = time.perf_counter()
        out = None
        for _ in range(N):
            out = infer(img)
        np.asarray(out["scores"])  # single stream: all prior calls completed
        windows.append((time.perf_counter() - t0) * 1000 / N)
    pipelined_ms = float(np.median(windows))

    # secondary: per-call latency including one host fetch round-trip
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        d = infer(img)
        np.asarray(d["scores"])
        ts.append((time.perf_counter() - t0) * 1000)
    fetch_p50 = float(np.percentile(ts, 50))

    row = {
        "metric": "dfine_m_640_e2e_pipelined_latency",
        "value": round(pipelined_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / pipelined_ms, 3),
        "fetch_synced_p50_ms": round(fetch_p50, 3),
        "throughput_img_s": round(1000.0 / pipelined_ms, 1),
        "device": str(jax.devices()[0]),
    }

    # Secondary: train throughput (BASELINE.md tracks img/s/chip train+infer).
    # Same production graph tools/bench_train.py measures, at the throughput-
    # optimal batch (16 since the separable MSDA bwd kernel: 92.0 img/s vs
    # 72.2 at bs=8 and 87.3 at bs=32, 2026-08-17); the bf16 compile is in the
    # persistent cache, so this adds ~1 min, not a fresh 640x640 train
    # compile. Failure degrades to the inference-only row.
    import os
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            import importlib.util
            spec = importlib.util.spec_from_file_location(
                "bench_train", "/root/repo/tools/bench_train.py")
            bt = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(bt)
            tr = bt.main(16, "m", "bfloat16")
            row["train_img_s_bs16_bf16"] = tr["value"]
            row["train_ms_per_step"] = tr["ms_per_step"]
        except Exception as e:  # noqa: BLE001 — keep the inference row alive
            import sys
            row["train_error"] = repr(e)
            print(f"bench: train row failed: {e!r}", file=sys.stderr)

    print(json.dumps(row))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient tunnel/runtime hiccup: one retry
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print("bench: transient failure, retrying once", file=sys.stderr)
        time.sleep(10)
        main()
