"""Fused Pallas stem kernel vs the flax StemBlock (interpret mode on CPU).

The kernel is the serving-graph replacement for StemBlock
(ops/pallas/stem.py; reference hgnetv2.py:115-166) — these tests pin its
numerics, edge handling (asym pads, first/last row blocks) and the
stem_external wiring across geometries and LAB variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.hgnetv2 import HGNetv2, StemBlock
from custom_d_fine_tpu.ops.pallas.stem import fold_stem_weights, fused_stem


def _randomized_stats(v, key):
    stats = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(key, a.shape) * 0.3, v["batch_stats"])
    return {"params": v["params"], "batch_stats": stats}


@pytest.mark.parametrize("use_lab,M,O,hw", [
    (False, 24, 32, (64, 96)),   # B2-style, non-square; S=32 single-block
    (True, 16, 16, (96, 64)),    # B0-style with LAB; S=16 multi-block
    (False, 32, 48, (32, 32)),   # single row-block (first == last block)
    (False, 24, 32, (128, 64)),  # S=32 MULTI-block (halo across 64-row steps)
])
def test_fused_stem_matches_stemblock(use_lab, M, O, hw):
    stem = StemBlock(M, O, use_lab=use_lab)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, *hw, 3)), jnp.float32)
    v = stem.init(jax.random.PRNGKey(0), x / 255.0, train=False)
    v = _randomized_stats(v, jax.random.PRNGKey(2))
    want = stem.apply(v, x / 255.0, train=False)
    fw = fold_stem_weights(v["params"], v["batch_stats"])
    got = fused_stem(x, fw, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_stem_external_backbone_consumes_fused_stem():
    bb = HGNetv2(arch="B0", return_idx=(1, 2, 3), use_lab=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 256, (1, 64, 64, 3)), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x / 255.0, train=False)
    want = bb.apply(v, x / 255.0, train=False)

    fw = fold_stem_weights(v["params"]["stem"], v["batch_stats"]["stem"])
    stem_out = fused_stem(x, fw, interpret=True)
    got = bb.clone(stem_external=True).apply(v, stem_out, train=False)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)
