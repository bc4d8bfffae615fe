"""Per-op profile of the training step on the real TPU.

Runs N train steps inside one jax.profiler.trace (host fetch at the end,
per the axon timing protocol in CLAUDE.md), then prints the top-K XLA ops
by total device time / N, with a rough category split.

Usage: python tools/profile_train.py [batch] [size] [dtype] [N] [msda_impl] [top_k]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CATEGORIES = (
    ("conv", ("convolution", "conv")),
    ("dot", ("dot",)),
    ("pallas", ("custom-call", "tpu_custom_call")),
    ("copy", ("copy", "bitcast", "transpose")),
    ("reduce", ("reduce", "all-reduce")),
    ("scatter_gather", ("scatter", "gather", "dynamic")),
    ("fusion", ("fusion",)),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def main(batch=8, size="m", dtype="bfloat16", n=8, top_k=40, msda_impl="fast",
         stem_impl="conv"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.models.dfine import build_model
    from custom_d_fine_tpu.train.criterion import DFINECriterion
    from custom_d_fine_tpu.train.optim import build_optimizer
    from custom_d_fine_tpu.train.train_step import create_train_state, make_train_step
    from custom_d_fine_tpu.utils.profiling import summarize_trace

    B, IMG, NC = batch, 640, 80
    cfg = get_model_config(size)
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    from custom_d_fine_tpu.ops.deform_attn import resolve_impl

    model, variables = build_model(cfg, num_classes=NC, img_size=(IMG, IMG),
                                   train_batch=2, dtype=compute_dtype,
                                   msda_impl=resolve_impl(msda_impl),
                                   stem_impl=stem_impl)
    criterion = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=NC,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(variables["params"], cfg, base_lr=1.5e-4,
                         backbone_lr=2e-5, total_steps=1000)
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
    _ = float(m["total_loss"])  # compile + settle

    trace_dir = "/tmp/jax_trace_train"
    with jax.profiler.trace(trace_dir):
        for i in range(n):
            state, m = step_fn(state, batch_data, jax.random.PRNGKey(i + 1))
        _ = float(m["total_loss"])  # sync

    top = summarize_trace(trace_dir, top_k=300)
    per_cat = {}
    total = 0.0
    rows = []
    for name, ms in top:
        per_step = ms / n
        total += per_step
        per_cat[categorize(name)] = per_cat.get(categorize(name), 0.0) + per_step
        rows.append((round(per_step, 3), name[:110]))
    print(json.dumps({"batch": B, "dtype": dtype,
                      "sum_top_ops_ms_per_step": round(total, 1),
                      "per_category_ms": {k: round(v, 1) for k, v in
                                          sorted(per_cat.items(), key=lambda kv: -kv[1])}}))
    for ms, name in rows[:top_k]:
        print(f"{ms:9.3f} ms  {name}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = sys.argv[2] if len(sys.argv) > 2 else "m"
    dt = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    impl = sys.argv[5] if len(sys.argv) > 5 else "fast"
    tk = int(sys.argv[6]) if len(sys.argv) > 6 else 40
    stem = sys.argv[7] if len(sys.argv) > 7 else "conv"
    main(b, s, dt, n, top_k=tk, msda_impl=impl, stem_impl=stem)
