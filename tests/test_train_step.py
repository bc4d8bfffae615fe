import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.dfine import build_model
from custom_d_fine_tpu.train.criterion import DFINECriterion
from custom_d_fine_tpu.train.optim import build_optimizer
from custom_d_fine_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

from helpers import make_targets, tiny_config

IMG = 160


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=2)
    criterion = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=4,
                               num_queries=cfg.decoder.num_queries)
    tx = build_optimizer(
        variables["params"], cfg,
        base_lr=2.5e-4, backbone_lr=6e-5, total_steps=100,
    )
    state = create_train_state(variables, tx, use_ema=True)
    return cfg, model, criterion, tx, state


def _batch(cfg, rng):
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    t = make_targets(2, cfg.max_gt, 4, rng)
    return {"images": jnp.asarray(x), **t}


def test_train_step_runs_and_updates(setup):
    cfg, model, criterion, tx, state = setup
    rng = np.random.default_rng(0)
    step_fn = jax.jit(make_train_step(model, criterion, tx))
    batch = _batch(cfg, rng)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))

    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1
    # params must move
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # all expected loss families present
    keys = set(metrics.keys())
    for want in ("loss_vfl", "loss_bbox", "loss_giou", "loss_fgl",
                 "loss_vfl_aux_0", "loss_vfl_pre", "loss_vfl_enc_0",
                 "loss_vfl_dn_0", "loss_fgl_dn_0", "loss_ddf_aux_0"):
        assert want in keys, f"missing {want}: {sorted(keys)[:20]}"
    # second step: loss stays finite
    new_state2, metrics2 = step_fn(new_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2["total_loss"]))


def test_eval_step_uses_ema(setup):
    cfg, model, criterion, tx, state = setup
    eval_fn = jax.jit(make_eval_step(model, use_ema=True))
    out = eval_fn(state, jnp.zeros((1, IMG, IMG, 3), jnp.float32))
    assert out["pred_boxes"].shape == (1, cfg.decoder.num_queries, 4)


def test_empty_batch_no_nans(setup):
    """Zero valid GTs in the whole batch must not produce NaN losses."""
    cfg, model, criterion, tx, state = setup
    rng = np.random.default_rng(1)
    batch = _batch(cfg, rng)
    batch["valid"] = jnp.zeros_like(batch["valid"])
    step_fn = jax.jit(make_train_step(model, criterion, tx))
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"])), metrics


def test_padded_tail_batch_losses_invariant(setup):
    """Criterion totals must be identical with mesh-padding rows appended
    (image_valid=False, GT valid=False) — the tail-batch pad path
    (trainer._pad_to_mesh + criterion image_valid masking)."""
    cfg, model, criterion, tx, state = setup
    rng = np.random.default_rng(3)
    batch = _batch(cfg, rng)
    targets = {k: batch[k] for k in ("labels", "boxes", "valid")}

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outputs = model.apply(variables, batch["images"], targets=targets,
                          train=True, rngs={"dn": jax.random.PRNGKey(7)},
                          mutable=["batch_stats"])[0]
    base = criterion(outputs, targets)

    B = batch["images"].shape[0]
    pad = 2

    def pad_arr(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
            return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x

    outputs_p = jax.tree_util.tree_map(pad_arr, outputs)
    targets_p = {k: pad_arr(v) for k, v in targets.items()}
    targets_p["valid"] = targets_p["valid"].at[B:].set(False)
    targets_p["image_valid"] = jnp.arange(B + pad) < B
    padded = criterion(outputs_p, targets_p)

    assert set(base) == set(padded)
    for k in base:
        np.testing.assert_allclose(
            np.asarray(padded[k]), np.asarray(base[k]), rtol=2e-5, atol=1e-6,
            err_msg=k)


def test_pad_to_mesh_shapes():
    from custom_d_fine_tpu.train.trainer import Trainer

    class Stub:
        mesh = type("M", (), {"size": 8})()
    arrays = {
        "images": np.random.default_rng(0).integers(0, 255, (6, 32, 32, 3)).astype(np.uint8),
        "labels": np.zeros((6, 5), np.int32),
        "boxes": np.zeros((6, 5, 4), np.float32),
        "valid": np.ones((6, 5), bool),
    }
    out = Trainer._pad_to_mesh(Stub(), dict(arrays))
    assert out["images"].shape[0] == 8
    assert out["image_valid"].tolist() == [True] * 6 + [False] * 2
    assert not out["valid"][6:].any()
    # padded images repeat the last real image (BatchNorm stays in-distribution)
    np.testing.assert_array_equal(out["images"][6], arrays["images"][5])
    # already-divisible batches are passed through with all-valid mask
    arrays8 = {k: np.repeat(v, 2, axis=0)[:8] for k, v in arrays.items()}
    out8 = Trainer._pad_to_mesh(Stub(), dict(arrays8))
    assert out8["images"].shape[0] == 8 and out8["image_valid"].all()


def test_uint8_wire_path_matches_f32(setup):
    """The production wire format (uint8 images, normalized to f32/255 INSIDE
    the jitted step — trainer.py flush() and tools/bench_train.py both ship
    this) computes the same update as pre-normalized f32 input. Tolerance is
    the cross-compilation reassociation bound from the multi-step test: the
    two jits differ only in input dtype, so a real normalize bug (double /255,
    missing /255) shows up at 1e-1+, not 1e-4."""
    cfg, model, criterion, tx, state = setup
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, (2, IMG, IMG, 3)).astype(np.uint8)
    t = make_targets(2, cfg.max_gt, 4, rng)

    step_fn = jax.jit(make_train_step(model, criterion, tx))
    key = jax.random.PRNGKey(5)
    s_u8, m_u8 = step_fn(state, {"images": jnp.asarray(u8), **t}, key)
    s_f32, m_f32 = step_fn(
        state, {"images": jnp.asarray(u8.astype(np.float32) / 255.0), **t}, key)

    np.testing.assert_allclose(float(m_u8["total_loss"]),
                               float(m_f32["total_loss"]), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_u8.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_f32.params))):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-4)


def test_multi_step_matches_sequential_single_steps(setup):
    """lax.scan-of-K dispatch (make_train_multi_step) computes the same
    update SEQUENCE as K sequential single-step dispatches with the same
    per-step rngs, and returns [K]-stacked metrics. Equality is up to float
    reassociation between the scanned and standalone compilations of the
    step graph (measured ~2e-5 rel on the loss by step 3 on CPU; a wrong rng
    split / step order / schedule bug shows up at 1e-2+). Also checks the
    uint8-on-the-wire normalization path matches pre-normalized f32
    inputs."""
    from custom_d_fine_tpu.train.train_step import make_train_multi_step

    cfg, model, criterion, tx, state = setup
    rng = np.random.default_rng(7)
    K = 3
    batches = [_batch(cfg, rng) for _ in range(K)]
    # uint8 wire format for the multi-step arm; f32/255 for the single-step arm
    u8 = [np.clip((np.asarray(b["images"]) * 40 + 128), 0, 255).astype(np.uint8)
          for b in batches]
    for b, u in zip(batches, u8):
        b["images"] = jnp.asarray(u.astype(np.float32) / 255.0)

    step_fn = jax.jit(make_train_step(model, criterion, tx))
    multi_fn = jax.jit(make_train_multi_step(model, criterion, tx))

    root = jax.random.PRNGKey(123)
    rngs = jax.random.split(root, K)
    s_seq = state
    seq_losses = []
    for b, r in zip(batches, rngs):
        s_seq, m = step_fn(s_seq, b, r)
        seq_losses.append(float(m["total_loss"]))

    stacked = {
        k: jnp.stack([jnp.asarray(u) if k == "images" else b[k]
                      for b, u in zip(batches, u8)])
        for k in batches[0]
    }
    s_multi, m_multi = multi_fn(state, stacked, root)

    assert m_multi["total_loss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(m_multi["total_loss"]), seq_losses,
                               rtol=2e-4)
    assert int(s_multi.step) == int(s_seq.step) == K
    # params: AdamW normalizes the gradient, so a reassociation-level loss
    # difference can move any single coordinate by O(lr) regardless of
    # magnitude — compare in ABSOLUTE terms at the update scale (measured max
    # 7e-5 after 3 steps; a wrong rng/order bug diverges the LOSS at 1e-3+,
    # which the rtol=2e-4 check above catches)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_seq.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_multi.params))):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_seq.ema)),
                    jax.tree_util.tree_leaves(jax.device_get(s_multi.ema))):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-4)
