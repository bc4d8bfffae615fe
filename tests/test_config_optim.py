"""Config interpolation/overrides, optimizer group labeling, EMA schedule."""

import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.configs import get_model_config
from custom_d_fine_tpu.train.ema import ema_decay, ema_update
from custom_d_fine_tpu.train.optim import label_params, onecycle
from custom_d_fine_tpu.utils.config import load_config

from helpers import tiny_config


def test_config_interpolation_and_overrides():
    cfg = load_config(overrides=["model_name=m", "exp_name=abc"])
    # ${train.lrs.${model_name}.base_lr} resolves through nested interpolation
    assert cfg["train"]["base_lr"] == 0.00015
    assert cfg["train"]["backbone_lr"] == 0.00002
    assert cfg["exp"].startswith("abc_")
    # path interpolation picks up exp
    assert cfg["exp"] in cfg["train"]["path_to_save"]


def test_config_override_types():
    cfg = load_config(overrides=[
        "train.epochs=3", "train.use_ema=false", "train.img_size=[320,320]",
        "train.label_to_name={0: cat, 1: dog}",
    ])
    assert cfg["train"]["epochs"] == 3
    assert cfg["train"]["use_ema"] is False
    assert cfg["train"]["img_size"] == [320, 320]
    assert cfg["train"]["label_to_name"] == {0: "cat", 1: "dog"}


def test_param_group_labels():
    params = {
        "backbone": {
            "stem": {"stem1": {"conv": {"kernel": 1}, "norm": {"bn": {"scale": 1, "bias": 1}}}},
            "stages_0": {"blocks_0": {"layers_0": {"conv": {"kernel": 1}}}},
        },
        "encoder": {
            "fpn_blocks_0": {"cv1": {"conv": {"kernel": 1}, "norm": {"bn": {"scale": 1}}}},
            "encoder_0_layers_0": {"linear1": {"kernel": 1, "bias": 1}},
        },
        "decoder": {"dec_score_head_0": {"kernel": 1, "bias": 1}},
    }
    cfg = tiny_config()  # freeze_at=-1: nothing frozen
    labels = label_params(params, cfg)
    assert labels["backbone"]["stem"]["stem1"]["conv"]["kernel"] == "backbone"
    assert labels["backbone"]["stem"]["stem1"]["norm"]["bn"]["scale"] == "backbone_norm"
    assert labels["encoder"]["fpn_blocks_0"]["cv1"]["norm"]["bn"]["scale"] == "encdec_norm_bias"
    assert labels["encoder"]["encoder_0_layers_0"]["linear1"]["kernel"] == "rest"
    assert labels["encoder"]["encoder_0_layers_0"]["linear1"]["bias"] == "encdec_norm_bias"
    assert labels["decoder"]["dec_score_head_0"]["kernel"] == "rest"


def test_param_group_labels_frozen_backbone():
    import dataclasses

    cfg = tiny_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, freeze_at=0, freeze_stem_only=False))
    params = {
        "backbone": {
            "stem": {"stem1": {"conv": {"kernel": 1}}},
            "stages_0": {"blocks_0": {"conv": {"kernel": 1}}},
            "stages_1": {"blocks_0": {"conv": {"kernel": 1}}},
        },
    }
    labels = label_params(params, cfg)
    assert labels["backbone"]["stem"]["stem1"]["conv"]["kernel"] == "frozen"
    assert labels["backbone"]["stages_0"]["blocks_0"]["conv"]["kernel"] == "frozen"
    assert labels["backbone"]["stages_1"]["blocks_0"]["conv"]["kernel"] == "backbone"


def test_onecycle_matches_torch_shape():
    """OneCycleLR(cos): starts at max/25, peaks at pct_start, ends at max/25e4."""
    sched = onecycle(1.0, total_steps=1000, pct_start=0.1)
    assert float(sched(0)) == pytest.approx(1.0 / 25.0, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1.0, rel=1e-3)
    assert float(sched(1000)) == pytest.approx(1.0 / 25.0 / 1e4, rel=0.05)
    # monotone up then down
    ramp = [float(sched(i)) for i in range(0, 100, 10)]
    assert all(a <= b + 1e-9 for a, b in zip(ramp, ramp[1:]))


def test_ema_schedule_and_blend():
    # decay = m*(1-exp(-t/2000)) (reference train.py:60)
    assert float(ema_decay(jnp.asarray(0))) == pytest.approx(0.0)
    assert float(ema_decay(jnp.asarray(2000), 0.9998)) == pytest.approx(
        0.9998 * (1 - np.exp(-1)), rel=1e-5)
    ema = {"w": jnp.ones((3,)), "step_count": jnp.asarray(5, jnp.int32)}
    new = {"w": jnp.zeros((3,)), "step_count": jnp.asarray(6, jnp.int32)}
    out = ema_update(ema, new, jnp.asarray(10000), momentum=0.5)
    d = float(ema_decay(jnp.asarray(10000), 0.5))
    np.testing.assert_allclose(np.asarray(out["w"]), d, rtol=1e-6)
    # non-float leaves are replaced, not blended
    assert int(out["step_count"]) == 6


def test_registry_values_match_reference():
    """Spot-check registry values against the reference configs.py numbers."""
    m = get_model_config("m")
    assert m.backbone.name == "B2"
    assert m.decoder.num_layers == 4
    assert m.encoder.depth_mult == 0.67
    x = get_model_config("x")
    assert x.decoder.reg_scale == 8.0
    assert x.encoder.hidden_dim == 384
    assert x.decoder.hidden_dim == 256
    n = get_model_config("n")
    assert n.decoder.num_levels == 2
    assert n.decoder.num_points == (6, 6)
    assert n.backbone.return_idx == (2, 3)


def test_onecycle_tiny_total_steps_no_nan():
    """pct_start * total_steps < 1 must not produce NaN learning rates."""
    for ts in (1, 2, 3, 5):
        sched = onecycle(1.0, total_steps=ts, pct_start=0.1)
        vals = [float(sched(i)) for i in range(ts + 2)]
        assert all(np.isfinite(v) for v in vals), (ts, vals)
