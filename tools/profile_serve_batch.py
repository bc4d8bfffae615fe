"""Per-op profile of the batched serving graph (default bs=16).

Usage: python tools/profile_serve_batch.py [bs] [n_calls]
Prints the top device ops with total ms over N calls and ms/batch.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    from custom_d_fine_tpu.deploy.serving import build_serving
    from custom_d_fine_tpu.utils.profiling import trace

    forward, _m, _v = build_serving("m", 80, (640, 640))
    infer = jax.jit(forward)
    img = jax.device_put(
        np.random.default_rng(0).integers(0, 256, (bs, 640, 640, 3), np.uint8))
    det = infer(img)
    np.asarray(det["scores"])  # compile + settle
    for _ in range(5):
        det = infer(img)
    np.asarray(det["scores"])

    def run():
        out = None
        for _ in range(n):
            out = infer(img)
        np.asarray(out["scores"])  # block_until_ready doesn't block on axon
        return out

    _, top = trace(run, trace_dir="/tmp/serve_trace", top_k=30)
    total = sum(ms for _, ms in top)
    print(f"bs={bs}, {n} calls; top-30 ops total {total:.1f} ms "
          f"({total / n:.3f} ms/batch, {total / n / bs * 1000:.0f} us/img)")
    for name, ms in top:
        print(f"{ms / n:8.3f} ms/batch  {name[:110]}")


if __name__ == "__main__":
    main()
