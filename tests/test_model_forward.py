import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.dfine import build_model

from helpers import make_targets, tiny_config

IMG = 160  # levels s16,s32 -> 10x10 + 5x5 = 125 tokens >= 60 queries


@pytest.fixture(scope="module")
def small_model():
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=2)
    return cfg, model, variables


def test_eval_forward_shapes(small_model):
    cfg, model, variables = small_model
    x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    Q = cfg.decoder.num_queries
    assert out["pred_logits"].shape == (2, Q, 4)
    assert out["pred_boxes"].shape == (2, Q, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_train_forward_structure(small_model):
    cfg, model, variables = small_model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)), jnp.float32)
    targets = make_targets(2, cfg.max_gt, 4, rng)
    fwd = jax.jit(lambda v, x, t, r: model.apply(
        v, x, targets=t, train=True, rngs={"dn": r}, mutable=["batch_stats"]))
    out, mutated = fwd(variables, x, targets, jax.random.PRNGKey(1))
    L = cfg.decoder.num_layers
    Q = cfg.decoder.num_queries
    assert len(out["aux_outputs"]) == L - 1
    assert len(out["dn_outputs"]) == L
    assert out["pred_corners"].shape == (2, Q, 4 * (cfg.decoder.reg_max + 1))
    assert out["pre_outputs"]["pred_boxes"].shape == (2, Q, 4)
    num_dn = out["dn_meta"]["num_dn"]
    assert out["dn_outputs"][0]["pred_logits"].shape == (2, num_dn, 4)
    # dn positive slots: cycle-fill packs EVERY positive slot for images with
    # >=1 valid GT (reference builds groups per-batch, denoising.py:69-79),
    # so positives = B x num_group x dn_max_gt
    num_group = int(out["dn_meta"]["num_group"])
    dn_max_gt = num_dn // (2 * num_group)
    assert int(out["dn_meta"]["positive"].sum()) == 2 * num_group * dn_max_gt
    for k, v in out.items():
        if isinstance(v, jnp.ndarray):
            assert np.isfinite(np.asarray(v)).all(), k


def test_eval_forward_jits(small_model):
    cfg, model, variables = small_model
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    out = fwd(variables, x)
    assert out["pred_boxes"].shape == (1, cfg.decoder.num_queries, 4)
