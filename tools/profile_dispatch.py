"""Where does the per-step HOST dispatch time go? (VERDICT round-3 item 2)

At bs16 the device train step is ~155-192 ms while dispatching ONE step from
Python costs ~76-148 ms of host wall (tools/bench_train.py
dispatch_ms_per_step) — the 1-core host is about to become the training wall.
This tool cProfiles N dispatches of the cached jitted train step with a
device-resident batch (no transfers, no fetches: pure argument-processing +
launch path) and prints the top self-time functions, then A/Bs the dispatch
wall against the scan-of-K multi-step (train_step.py:make_train_multi_step).

Run on the real TPU: python tools/profile_dispatch.py [batch] [k]
"""

import cProfile
import io
import json
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np


def main(batch=16, k=8, n=30):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.models.dfine import build_model
    from custom_d_fine_tpu.ops.deform_attn import resolve_impl
    from custom_d_fine_tpu.train.criterion import DFINECriterion
    from custom_d_fine_tpu.train.optim import build_optimizer
    from custom_d_fine_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    B, IMG, NC = batch, 640, 80
    cfg = get_model_config("m")
    model, variables = build_model(cfg, num_classes=NC, img_size=(IMG, IMG),
                                   train_batch=2, dtype=jnp.bfloat16,
                                   msda_impl=resolve_impl("fast"))
    criterion = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=NC,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(variables["params"], cfg, base_lr=1.5e-4,
                         backbone_lr=2e-5, total_steps=1000)
    state = create_train_state(variables, tx, use_ema=True)
    n_leaves = len(jax.tree_util.tree_leaves(state))
    print(f"TrainState leaves: {n_leaves}", flush=True)

    step_fn = jax.jit(make_train_step(model, criterion, tx),
                      donate_argnums=(0,))
    rng = np.random.default_rng(0)
    G = cfg.max_gt
    batch_data = {
        "images": jnp.asarray(rng.uniform(0, 1, (B, IMG, IMG, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, NC, (B, G)), jnp.int32),
        "boxes": jnp.asarray(np.concatenate(
            [rng.uniform(0.2, 0.8, (B, G, 2)),
             rng.uniform(0.05, 0.3, (B, G, 2))], -1), jnp.float32),
        "valid": jnp.asarray(np.arange(G)[None] < 12).repeat(B, 0),
    }
    state, m = step_fn(state, batch_data, jax.random.PRNGKey(0))
    _ = float(m["total_loss"])  # sync: compile done

    # ---- cProfile the pure dispatch path (no fetch inside the window) ----
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for i in range(n):
        state, m = step_fn(state, batch_data, jax.random.PRNGKey(i + 1))
    prof.disable()
    wall = time.perf_counter() - t0
    _ = float(m["total_loss"])  # drain the queue before the next phase
    print(f"\nsingle-step dispatch: {wall / n * 1000:.1f} ms/step "
          f"({n} dispatches, no fetch)", flush=True)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("tottime").print_stats(18)
    print("\n".join(line for line in s.getvalue().splitlines()
                    if line.strip()), flush=True)

    row = {"metric": "train_dispatch_ms_per_step", "batch": B,
           "state_leaves": n_leaves,
           "k1_dispatch_ms": round(wall / n * 1000, 2)}

    # ---- A/B: scan-of-K multi-step dispatch wall ----
    if k > 1:
        from custom_d_fine_tpu.train.train_step import make_train_multi_step

        multi_fn = jax.jit(make_train_multi_step(model, criterion, tx),
                           donate_argnums=(0,))
        stacked = dict(batch_data)
        stacked["images"] = jnp.asarray(
            rng.integers(0, 256, (k, B, IMG, IMG, 3)), jnp.uint8)
        for kk in ("labels", "boxes", "valid"):
            stacked[kk] = jnp.broadcast_to(
                stacked[kk][None], (k,) + stacked[kk].shape)
        state, mm = multi_fn(state, stacked, jax.random.PRNGKey(0))
        _ = float(mm["total_loss"][-1])  # compile + drain
        nd = max(4, n // k)
        t0 = time.perf_counter()
        for i in range(nd):
            state, mm = multi_fn(state, stacked, jax.random.PRNGKey(i + 1))
        wall_k = time.perf_counter() - t0
        _ = float(mm["total_loss"][-1])
        row["k"] = k
        row["k_dispatch_ms_per_step"] = round(wall_k / (nd * k) * 1000, 2)
        print(f"\nscan-of-{k} dispatch: {wall_k / (nd * k) * 1000:.2f} "
              f"ms/step ({nd} dispatches)", flush=True)

    print(json.dumps(row))
    return row


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    kk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(b, kk)
