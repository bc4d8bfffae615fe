"""AOT export roundtrip: serialize -> deserialize -> numerically identical."""

import numpy as np

from custom_d_fine_tpu.deploy.export import export_and_verify
from custom_d_fine_tpu.models.dfine import build_model

from helpers import tiny_config

IMG = 160


def test_export_roundtrip(tmp_path):
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=1)
    path = export_and_verify(model, variables, (IMG, IMG),
                             tmp_path / "model.stablehlo", batch_size=1)
    assert path.exists()
    assert path.stat().st_size > 1_000_000  # weights ride along as constants


def test_mesh_sharded_serving_matches_single_device():
    """jit_serving_on_mesh: batch-sharded DP serving over the 8-device CPU
    mesh must produce the single-device detections (eval-mode BN => per-image
    compute is sharding-independent; top-10 compared exactly, full score
    vector to fp tolerance)."""
    import jax
    import jax.numpy as jnp

    from custom_d_fine_tpu.deploy.reparam import convert_to_deploy
    from custom_d_fine_tpu.deploy.serving import (jit_serving_on_mesh,
                                                  make_serving_forward)
    from custom_d_fine_tpu.parallel.mesh import make_mesh, shard_pytree_batch

    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG),
                                   train_batch=1)
    model, variables = convert_to_deploy(model, variables)
    fwd = make_serving_forward(model, variables, (IMG, IMG), num_top=50)

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (8, IMG, IMG, 3)), jnp.uint8)

    ref = jax.jit(fwd)(imgs)

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    sharded_fn, _ = jit_serving_on_mesh(fwd, mesh)
    got = sharded_fn(shard_pytree_batch({"x": imgs}, mesh)["x"])

    rs = np.asarray(ref["scores"])
    gs = np.asarray(got["scores"])
    np.testing.assert_allclose(gs, rs, rtol=1e-4, atol=1e-5)
    # well-separated head of the ranking must agree exactly
    np.testing.assert_array_equal(np.asarray(got["labels"])[:, :10],
                                  np.asarray(ref["labels"])[:, :10])
    np.testing.assert_allclose(np.asarray(got["boxes"])[:, :10],
                               np.asarray(ref["boxes"])[:, :10],
                               rtol=1e-4, atol=1e-3)


def test_build_serving_registry_size_smoke():
    """The canonical one-call serving builder (bench.py / __graft_entry__ /
    JaxModel all use it) must assemble and run for a real registry size on
    CPU: registry config -> build -> deploy reparam -> forward -> top-K."""
    import jax
    import jax.numpy as jnp

    from custom_d_fine_tpu.deploy.serving import build_serving

    # 320 not IMG=160: size-n (strides 16/32) must have >= num_queries=300
    # encoder anchors, exactly like the torch reference's top-k constraint
    fn, model, variables = build_serving("n", num_classes=7,
                                         img_size=(320, 320))
    img = jnp.zeros((1, 320, 320, 3), jnp.uint8)
    det = jax.jit(fn)(img)
    assert det["scores"].shape == (1, 300)
    assert det["boxes"].shape == (1, 300, 4)
    s = np.asarray(det["scores"])
    assert np.isfinite(s).all() and (s >= 0).all() and (s <= 1).all()
