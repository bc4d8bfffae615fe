import jax
import jax.numpy as jnp
import pytest

from custom_d_fine_tpu.configs import MODELS
from custom_d_fine_tpu.models.hgnetv2 import ARCH_CONFIGS, HGNetv2


@pytest.mark.parametrize("size", ["n", "s"])
def test_backbone_shapes(size):
    cfg = MODELS[size]
    bb = HGNetv2(
        arch=cfg.backbone.name,
        return_idx=cfg.backbone.return_idx,
        use_lab=cfg.backbone.use_lab,
        freeze_norm=cfg.backbone.freeze_norm,
    )
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(lambda x: bb.init(jax.random.PRNGKey(0), x, train=False))(x)
    outs = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)

    assert len(outs) == len(cfg.backbone.return_idx)
    # strides 4,8,16,32 per stage; expected channels from the arch table.
    for out, idx, in_ch in zip(outs, cfg.backbone.return_idx, cfg.encoder.in_channels):
        stride = 4 * (2 ** idx)
        assert out.shape == (1, 128 // stride, 128 // stride, in_ch), (
            f"stage {idx}: {out.shape}"
        )


def test_backbone_train_mode_updates_batch_stats():
    bb = HGNetv2(arch="B0", return_idx=(2, 3), use_lab=True)
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda x: bb.init(jax.random.PRNGKey(0), x, train=True))(x)
    assert "batch_stats" in variables
    apply = jax.jit(lambda v, x: bb.apply(v, x, train=True, mutable=["batch_stats"]))
    _, mutated = apply(variables, x)
    # running stats must move away from init on a non-zero input
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    moved = any(
        not jnp.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    )
    assert moved


def test_arch_table_channel_consistency():
    for name, cfg in ARCH_CONFIGS.items():
        stages = cfg["stages"]
        assert stages[0][0] == cfg["stem_channels"][2]
        for prev, cur in zip(stages, stages[1:]):
            assert cur[0] == prev[2], f"{name}: stage in_ch chain broken"


def test_flat_batchnorm_matches_nn_batchnorm_in_train_mode():
    """FlatBatchNorm (the stem's lane-packed BN) must be numerically identical
    to the nn.BatchNorm path in BOTH modes: same normalized output and the
    same running-stat update, with a byte-identical variable tree."""
    import numpy as np

    from custom_d_fine_tpu.models.layers import BatchNorm, FlatBatchNorm

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(1.5, 2.0, (2, 5, 7, 12)), jnp.float32)
    B, H, W, C = x.shape

    ref = BatchNorm()
    flat = FlatBatchNorm()
    vref = ref.init(jax.random.PRNGKey(0), x, train=True)
    vflat = flat.init(jax.random.PRNGKey(0), x, train=True)
    # identical variable tree (paths AND values) => checkpoint compatible
    assert jax.tree_util.tree_structure(vref) == jax.tree_util.tree_structure(vflat)
    for a, b in zip(jax.tree_util.tree_leaves(vref), jax.tree_util.tree_leaves(vflat)):
        assert jnp.array_equal(a, b)

    # give scale/bias/running stats non-trivial values
    params = {"bn": {"scale": jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32),
                     "bias": jnp.asarray(rng.normal(0, 1, (C,)), jnp.float32)}}
    stats = {"bn": {"mean": jnp.asarray(rng.normal(0, 1, (C,)), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32)}}
    v = {"params": params, "batch_stats": stats}

    # train mode: output + updated running stats
    yr, mr = jax.jit(lambda v, x: ref.apply(v, x, train=True, mutable=["batch_stats"]))(v, x)
    yf, mf = jax.jit(lambda v, x: flat.apply(v, x, train=True, mutable=["batch_stats"]))(v, x)
    np.testing.assert_allclose(np.asarray(yf).reshape(B, H, W, C), np.asarray(yr),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mr), jax.tree_util.tree_leaves(mf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)

    # eval mode: running-average normalization
    yr = jax.jit(lambda v, x: ref.apply(v, x, train=False))(v, x)
    yf = jax.jit(lambda v, x: flat.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(yf).reshape(B, H, W, C), np.asarray(yr),
                               rtol=0, atol=1e-5)

    # bf16 compute dtype (the default TRAIN graph): flax normalizes in f32
    # and casts only the output — FlatBatchNorm must match that exactly
    ref16 = BatchNorm(dtype=jnp.bfloat16)
    flat16 = FlatBatchNorm(dtype=jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    yr, mr = jax.jit(lambda v, x: ref16.apply(v, x, train=True,
                                              mutable=["batch_stats"]))(v, x16)
    yf, mf = jax.jit(lambda v, x: flat16.apply(v, x, train=True,
                                               mutable=["batch_stats"]))(v, x16)
    assert yf.dtype == yr.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(yf, np.float32).reshape(B, H, W, C),
        np.asarray(yr, np.float32))
    for a, b in zip(jax.tree_util.tree_leaves(mr), jax.tree_util.tree_leaves(mf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
