"""Batched serving throughput sweep on the real TPU (pipelined protocol).

Reference counterpart: the README batched-inference table
(/root/reference/README.md:163-170, BASELINE.md "Batched Torch inference" —
bs sweep 1..32, optimum 138.1 img/s at bs=4 on RTX 5070 Ti). This measures
the same quantity for THIS framework's canonical serving graph
(deploy/serving.build_serving: uint8 -> normalize -> fused Pallas stem ->
model -> fused top-K) at several batch sizes on one v5e chip.

Protocol per batch size: jit once, settle 10 calls, then median of 3
pipelined windows (W calls back-to-back on the device stream, ONE host fetch
at the end — block_until_ready does not block on the axon runtime). W is
scaled so a window is ~1 s of device time. Same transient guard as bench.py:
extra windows when the spread exceeds 15%.

Usage: python tools/bench_serve_batch.py [bs1,bs2,...]   (default 1,2,4,8,16)
Appends a JSON line per batch size to stderr and a summary table to stdout.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ("1", "2", "4", "8", "16"))]
    import os

    from custom_d_fine_tpu.deploy.serving import build_serving

    kw = {}
    if os.environ.get("SERVE_FUSED_STEM") == "0":
        kw["use_fused_stem"] = False  # A/B: XLA's batched conv emitter
        log("A/B: fused stem DISABLED (SERVE_FUSED_STEM=0)")
    forward, _model, _variables = build_serving("m", 80, (640, 640), **kw)
    if os.environ.get("SERVE_BF16_STAGES"):
        # A/B: per-stage bf16 compute (batch-1 measured no win — XLA already
        # runs conv passes in bf16 internally; batched may differ)
        import jax.numpy as jnp
        from custom_d_fine_tpu.deploy.serving import make_serving_forward
        stages = os.environ["SERVE_BF16_STAGES"]
        ov = {}
        if "b" in stages:
            ov["backbone_dtype"] = jnp.bfloat16
        if "e" in stages:
            ov["encoder_dtype"] = jnp.bfloat16
        if "d" in stages:
            ov["decoder_dtype"] = jnp.bfloat16
        log(f"A/B: bf16 stage overrides {sorted(ov)} (SERVE_BF16_STAGES={stages})")
        forward = make_serving_forward(_model.clone(**ov), _variables,
                                       (640, 640), **kw)
    infer = jax.jit(forward)
    rng = np.random.default_rng(0)
    rows = []
    for bs in sizes:
        img = jax.device_put(
            rng.integers(0, 256, (bs, 640, 640, 3), np.uint8))
        t0 = time.time()
        det = infer(img)
        np.asarray(det["scores"])
        log(f"bs={bs}: compiled+first call in {time.time() - t0:.1f}s")
        for _ in range(10):
            det = infer(img)
        np.asarray(det["scores"])

        def window(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = infer(img)
            np.asarray(out["scores"])
            return (time.perf_counter() - t0) * 1000 / (n * bs)

        n = max(1000 // (bs * 3), 20)  # ~1 s of device time per window
        ws = [window(n) for _ in range(3)]
        while max(ws) / min(ws) > 1.15 and len(ws) < 9:
            ws.append(window(n))
        ms = float(np.median(ws))
        row = {"batch_size": bs, "ms_per_img": round(ms, 3),
               "img_per_s": round(1000.0 / ms, 1),
               "windows": [round(w, 3) for w in ws]}
        rows.append(row)
        log(json.dumps(row))

    best = max(rows, key=lambda r: r["img_per_s"])
    print(f"{'bs':>4} {'ms/img':>8} {'img/s':>8}")
    for r in rows:
        mark = "  <- optimum" if r is best else ""
        print(f"{r['batch_size']:>4} {r['ms_per_img']:>8} {r['img_per_s']:>8}{mark}")
    print(json.dumps({"metric": "dfine_m_640_serving_batched_optimum",
                      "value": best["ms_per_img"], "unit": "ms",
                      "batch_size": best["batch_size"],
                      "img_per_s": best["img_per_s"]}))


if __name__ == "__main__":
    main()
