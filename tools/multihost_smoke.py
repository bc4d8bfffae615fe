"""Worker for the REAL 2-process multi-host smoke (VERDICT round-3 item 4).

Each invocation is one JAX process of an N-process CPU "slice" (4 virtual
devices per process). It initializes jax.distributed against a localhost
coordinator, then runs the code paths that previously only executed under
mocks or at process_count=1:

- gather_objects' real process_allgather branch (parallel/multihost.py:36-49)
  with UNEQUAL per-process payload sizes (exercises the padding),
- the Loader's per-process dataset striding + train wrap-pad
  (data/loader.py:250-259),
- Trainer._put_global -> jax.make_array_from_process_local_data
  (trainer.py:324-326),
- the lockstep eval protocol incl. a filler launch on the process whose
  shard runs out first (trainer.py:449-479),
- rank-0 gating of host artifacts + collective orbax save (trainer.py:91-104).

Reference counterpart: torchrun + dist_utils.py:13-49,127-193.

Invoked by tests/test_multihost_real.py; manual run:
  python tools/multihost_smoke.py <pid> <nprocs> <port> <data_dir> <out_dir>
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")


def _file_barrier(out_dir: Path, name: str, pid: int, nprocs: int,
                  timeout: float = 900.0):
    """Rendezvous the N local processes via sentinel files BEFORE each phase
    that launches collectives. Gloo's cross-process rendezvous window is only
    ~30s (GetKeyValue timeout), and on this 1-core host import/compile skew
    between the two python processes routinely exceeds it — the collective
    then dies with 'Gloo context initialization failed: DEADLINE_EXCEEDED'.
    A file barrier costs nothing and guarantees the processes enter each
    collective phase within milliseconds of each other."""
    import time

    (out_dir / f"bar_{name}_p{pid}").touch()
    t0 = time.time()
    while any(not (out_dir / f"bar_{name}_p{q}").exists()
              for q in range(nprocs)):
        time.sleep(0.2)
        if time.time() - t0 > timeout:
            raise TimeoutError(f"barrier {name}: peer never arrived")


def _build_trainer(data_dir, out_dir, n_local_devices=4, n_total=8):
    import jax

    from custom_d_fine_tpu.train.trainer import Trainer
    from custom_d_fine_tpu.utils.config import load_config

    sys.path.insert(0, "/root/repo/tests")
    from helpers import tiny_config

    cfg = load_config(overrides=[
        f"train.data_path={data_dir}",
        f"train.path_to_save={Path(out_dir) / 'run'}",
        "train.epochs=1",
        "train.batch_size=4",
        "train.num_workers=1",
        "train.img_size=[160,160]",
        "train.max_gt=10",
        "train.label_to_name={0: obj}",
        "train.mosaic_augs.mosaic_prob=0.0",
        "train.mosaic_augs.no_mosaic_epochs=0",
        "train.use_ema=true",
        "train.to_visualize_eval=false",
        "model_name=n",
        "exp_name=mh_smoke",
    ])
    return Trainer(cfg, model_cfg_override=tiny_config())


def _precompile(trainer, out_dir: Path, pid: int, nprocs: int):
    """Per-process staggered AOT compile of the train + eval programs, then a
    barrier, so the first EXECUTED collective finds both processes already
    past compilation. Found by the real smoke: Gloo communicator rendezvous
    has a hard ~30s window, and the first execution happens straight after
    .compile() returns — if the peers' compile-finish times differ by >30s
    (routine on this 1-core host: two concurrent multi-minute compiles), the
    early process dies in rendezvous. The persistent-cache key includes the
    global device ASSIGNMENT (0-3,2048-2051 here), so a single-process warm
    (devices 0-7) cannot pre-populate these entries — but process 0's compile
    can: stagger p0 first, then everyone else cache-hits its entries."""
    import jax
    import jax.numpy as jnp

    def compile_all():
        ldc = max(1, trainer.mesh.size // jax.process_count())
        B = -(-trainer.loader.batch_size // ldc) * ldc * jax.process_count()
        h, w = trainer.img_size
        G = trainer.loader.datasets["train"].max_gt

        def sds(shape, dt):
            return jax.ShapeDtypeStruct(shape, dt, sharding=trainer.data_spec)

        batch = {
            # uint8 images = the production wire format (trainer.py flush()
            # ships uint8, the step normalizes on device). This MUST match
            # the executed graph: compiling the f32 variant here left the
            # real first step compiling cold in both workers concurrently,
            # which blew the 30s Gloo first-execution window (2026-08-21).
            "images": sds((B, h, w, 3), jnp.uint8),
            "labels": sds((B, G), jnp.int32),
            "boxes": sds((B, G, 4), jnp.float32),
            "valid": sds((B, G), jnp.bool_),
            "image_valid": sds((B,), jnp.bool_),
        }
        state_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            trainer.state)
        trainer.train_step.lower(
            state_sds, batch, jax.random.PRNGKey(0)).compile()
        trainer.eval_step.lower(
            state_sds, sds((B, h, w, 3), jnp.uint8)).compile()

    if pid == 0:
        compile_all()
    _file_barrier(out_dir, "compile0", pid, nprocs)
    if pid != 0:
        compile_all()  # persistent-cache hit on p0's entries
    _file_barrier(out_dir, "compiled", pid, nprocs)


def _warm_execute(trainer, out_dir: Path, pid: int, nprocs: int):
    """EXECUTE each collective-bearing program once, barrier-aligned.

    Compilation (above) does not create Gloo communicator contexts — the
    first EXECUTION does, and its rendezvous window is the same hard ~30s.
    Observed 2026-08-21: with compiles pre-cached, the workers' first train
    step still happened >30s apart (independent host-side epoch setup on a
    contended 1-core host) and the early worker died in
    `Gloo context initialization failed: DEADLINE_EXCEEDED: GetKeyValue()`.
    Running one throwaway execution of the train + eval programs right after
    a barrier pins the rendezvous to an aligned point; the real first step
    then reuses the established contexts. The train step donates its state
    arg, so it consumes a copy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    ldc = max(1, trainer.mesh.size // jax.process_count())
    B = -(-trainer.loader.batch_size // ldc) * ldc * jax.process_count()
    h, w = trainer.img_size
    G = trainer.loader.datasets["train"].max_gt
    lb = B // jax.process_count()  # rows this process contributes

    def sharded(local_np):
        return jax.make_array_from_process_local_data(
            trainer.data_spec, local_np,
            (B,) + local_np.shape[1:])

    batch = {
        "images": sharded(np.zeros((lb, h, w, 3), np.uint8)),
        "labels": sharded(np.zeros((lb, G), np.int32)),
        "boxes": sharded(np.full((lb, G, 4), 0.5, np.float32)),
        "valid": sharded(np.zeros((lb, G), bool)),
        "image_valid": sharded(np.zeros((lb,), bool)),
    }
    state_copy = jax.tree.map(jnp.copy, trainer.state)  # donated -> copy
    out_state, metrics = trainer.train_step(
        state_copy, batch, jax.random.PRNGKey(0))
    float(metrics["total_loss"])  # sync: forces the execution to finish
    del out_state, state_copy
    ev = trainer.eval_step(trainer.state,
                           sharded(np.zeros((lb, h, w, 3), np.uint8)))
    jax.tree.map(lambda x: np.asarray(x.addressable_shards[0].data), ev)
    _file_barrier(out_dir, "warm_exec", pid, nprocs)


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_dir, out_dir = sys.argv[4], Path(sys.argv[5])

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nprocs

    from custom_d_fine_tpu.parallel.multihost import gather_objects, is_main_process

    # 1) real allgather with unequal payloads: process p contributes p+1 items
    _file_barrier(out_dir, "gather", pid, nprocs)
    local = [f"p{pid}-item{i}" for i in range(pid + 1)]
    gathered = gather_objects(local)
    expect = [f"p{p}-item{i}" for p in range(nprocs) for i in range(p + 1)]
    assert gathered == expect, (gathered, expect)

    # 2-5) the real Trainer end-to-end on the 2-process mesh
    import numpy as np

    from custom_d_fine_tpu.train.trainer import Trainer
    from custom_d_fine_tpu.utils.config import load_config

    sys.path.insert(0, "/root/repo/tests")
    from helpers import tiny_config

    cfg = load_config(overrides=[
        f"train.data_path={data_dir}",
        f"train.path_to_save={out_dir / 'run'}",
        "train.epochs=1",
        "train.batch_size=4",
        "train.num_workers=1",
        "train.img_size=[160,160]",
        "train.max_gt=10",
        "train.label_to_name={0: obj}",
        "train.mosaic_augs.mosaic_prob=0.0",
        "train.mosaic_augs.no_mosaic_epochs=0",
        "train.use_ema=true",
        "train.to_visualize_eval=false",
        "model_name=n",
        "exp_name=mh_smoke",
    ])
    trainer = Trainer(cfg, model_cfg_override=tiny_config())

    # loader striding: train split (9 imgs) wrap-pads to 10 -> 5 per process;
    # val split (9 imgs) strides to 5 / 4 (no pad) -> lockstep eval must issue
    # a filler launch on process 1 (shard_max=5, bs=4 -> n_steps=2, but p1's
    # iterator yields only 1 batch)
    # count with drop_last=False so the wrap-pad is visible (the train
    # default drop_last=True would hide the padded 5th image behind the
    # partial-batch drop at batch_size=4)
    it = trainer.loader.epoch_iterator("train", epoch=1, drop_last=False)
    n_train_local = sum(b["images"].shape[0] for b in it)
    it = trainer.loader.epoch_iterator("val", shuffle=False, drop_last=False)
    n_val_local = sum(b["images"].shape[0] for b in it)

    _precompile(trainer, out_dir, pid, nprocs)
    _warm_execute(trainer, out_dir, pid, nprocs)
    _file_barrier(out_dir, "train", pid, nprocs)
    history = trainer.train()
    _file_barrier(out_dir, "final_eval", pid, nprocs)
    preds, gts = trainer.get_preds_and_gt("val")

    result = {
        "pid": pid,
        "is_main": bool(is_main_process()),
        "n_train_local": int(n_train_local),
        "n_val_local": int(n_val_local),
        "n_gathered_preds": len(preds),
        "n_gathered_gts": len(gts),
        "metrics": {k: float(v) for k, v in history[-1].items()
                    if isinstance(v, (int, float))},
        "train_loss_finite": bool(np.isfinite(history[-1]["train_loss"])),
    }
    (out_dir / f"result_p{pid}.json").write_text(json.dumps(result, indent=1))
    print(f"proc {pid}: OK {json.dumps(result)}", flush=True)


if __name__ == "__main__":
    main()
