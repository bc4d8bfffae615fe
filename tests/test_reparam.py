"""Deploy-time VGGBlock reparameterization: fused single-conv graph must
reproduce the two-branch graph exactly (up to float rounding), on nontrivial
batch statistics. Reference contract: convert_to_deploy (dfine.py:30-41,
hybrid_encoder.py:123-156)."""

import jax
import jax.numpy as jnp
import numpy as np

from custom_d_fine_tpu.deploy.reparam import convert_to_deploy, fuse_vgg_variables
from custom_d_fine_tpu.models.dfine import build_model

from helpers import tiny_config


def _randomize_stats(variables, seed=0):
    """Give BN nontrivial running stats so the fold is actually exercised."""
    rng = np.random.default_rng(seed)

    def rnd(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.1, x.shape), x.dtype)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, x.shape), x.dtype)
        return x

    v = dict(variables)
    v["batch_stats"] = jax.tree_util.tree_map_with_path(rnd, variables["batch_stats"])
    return v


def test_fused_matches_two_branch():
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=3, img_size=(160, 160),
                                   train_batch=1)
    variables = _randomize_stats(variables)
    x = jnp.asarray(np.random.default_rng(1).normal(0.5, 0.2, (1, 160, 160, 3)),
                    jnp.float32)

    ref = model.apply(variables, x, train=False)
    dep_model, dep_vars = convert_to_deploy(model, variables)
    got = dep_model.apply(dep_vars, x, train=False)

    np.testing.assert_allclose(np.asarray(got["pred_boxes"]),
                               np.asarray(ref["pred_boxes"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["pred_logits"]),
                               np.asarray(ref["pred_logits"]), atol=2e-4)


def test_fuse_counts_and_prunes_stats():
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=3, img_size=(160, 160),
                                   train_batch=1)
    fused, n = fuse_vgg_variables(variables)
    # tiny_config: 2 levels -> 1 FPN + 1 PAN RepNCSPELAN4, each with 2
    # CSPLayers of num_blocks VGGBlocks
    assert n > 0
    flat = jax.tree_util.tree_leaves_with_path(fused["params"])
    names = ["/".join(str(k) for k in p) for p, _ in flat]
    assert any("fused" in s for s in names)
    assert not any("conv1" in s and "bottlenecks" in s for s in names)
    # no batch_stats left under fused blocks
    sflat = jax.tree_util.tree_leaves_with_path(fused["batch_stats"])
    snames = ["/".join(str(k) for k in p) for p, _ in sflat]
    assert not any("bottlenecks" in s for s in snames)
