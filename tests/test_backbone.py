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
