"""Training throughput benchmark: D-FINE-m 640x640 full train step on TPU.

Counterpart to bench.py's inference metric (BASELINE.md tracks train+infer
images/sec/chip). Prints one JSON line.

Usage: python tools/bench_train.py [batch] [size] [dtype] [msda_impl]

msda_impl: 'fast' (default; bf16 single-pass Pallas separable kernel —
the production Trainer default, trainer.py:158-170), 'auto' (exact
f32-HIGHEST fwd), or 'xla'. Measured 2026-08-17 bs=8 bf16 same-session:
fast 62.4 img/s, auto 56.1, xla 28.8 (the tool previously defaulted to
'xla', which caused round-2's phantom 'tunnel drift').
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(batch=8, size="m", dtype=None, msda_impl="fast"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.models.dfine import build_model
    from custom_d_fine_tpu.train.criterion import DFINECriterion
    from custom_d_fine_tpu.train.optim import build_optimizer
    from custom_d_fine_tpu.train.train_step import create_train_state, make_train_step

    B, IMG, NC = batch, 640, 80
    cfg = get_model_config(size)
    import jax.numpy as _jnp
    compute_dtype = _jnp.bfloat16 if dtype == "bfloat16" else None
    from custom_d_fine_tpu.ops.deform_attn import resolve_impl

    model, variables = build_model(cfg, num_classes=NC, img_size=(IMG, IMG), train_batch=2,
                                   dtype=compute_dtype,
                                   msda_impl=resolve_impl(msda_impl))
    criterion = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=NC,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(variables["params"], cfg, base_lr=1.5e-4, backbone_lr=2e-5,
                         total_steps=1000)
    state = create_train_state(variables, tx, use_ema=True)
    step_fn = jax.jit(make_train_step(model, criterion, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    G = cfg.max_gt
    batch_data = {
        "images": jnp.asarray(rng.uniform(0, 1, (B, IMG, IMG, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, NC, (B, G)), jnp.int32),
        "boxes": jnp.asarray(np.concatenate(
            [rng.uniform(0.2, 0.8, (B, G, 2)), rng.uniform(0.05, 0.3, (B, G, 2))],
            -1), jnp.float32),
        "valid": jnp.asarray(np.arange(G)[None] < 12).repeat(B, 0),
    }
    state, m = step_fn(state, batch_data, jax.random.PRNGKey(0))
    _ = float(m["total_loss"])
    N = 20
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step_fn(state, batch_data, jax.random.PRNGKey(i))
    t_dispatch = time.perf_counter() - t0  # dispatch-only wall: no fetch, and
    # block_until_ready doesn't block on this runtime — if this approaches dt,
    # the HOST dispatch path (1 core, big pytrees) is the throughput ceiling
    loss = float(m["total_loss"])  # host fetch = real sync on this runtime
    dt = time.perf_counter() - t0
    from custom_d_fine_tpu.utils.profiling import device_memory_stats

    mem = device_memory_stats()[0]
    return {
        "metric": f"dfine_{size}_640_train_throughput" + ("_bf16" if dtype else ""),
        "value": round(B * N / dt, 2),
        "unit": "img/s",
        "ms_per_step": round(dt / N * 1000, 1),
        "dispatch_ms_per_step": round(t_dispatch / N * 1000, 1),
        "batch": B,
        "msda_impl": resolve_impl(msda_impl),
        "loss": round(loss, 3),
        "hbm_peak_mb": round(mem.get("peak_bytes_mb", 0)),
        "hbm_limit_mb": round(mem.get("bytes_limit_mb", 0)),
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = sys.argv[2] if len(sys.argv) > 2 else "m"
    dt = sys.argv[3] if len(sys.argv) > 3 else None
    impl = sys.argv[4] if len(sys.argv) > 4 else "fast"
    print(json.dumps(main(b, s, dt, impl)))
