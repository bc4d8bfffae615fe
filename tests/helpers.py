"""Shared test helpers: a tiny model config so full-model tests stay cheap on
the 1-core CPU test environment."""

import dataclasses

import numpy as np

from custom_d_fine_tpu.configs.registry import (
    BackboneConfig,
    DecoderConfig,
    EncoderConfig,
    ModelConfig,
)


def tiny_config(num_queries: int = 60, enable_mask_head: bool = False) -> ModelConfig:
    """2-level micro model (B0 backbone, hidden 64, 2 decoder layers)."""
    return ModelConfig(
        name="tiny",
        backbone=BackboneConfig(name="B0", return_idx=(2, 3), freeze_at=-1,
                                freeze_norm=False, use_lab=True),
        encoder=EncoderConfig(
            in_channels=(512, 1024), feat_strides=(16, 32), hidden_dim=64,
            use_encoder_idx=(1,), dim_feedforward=128, expansion=0.34, depth_mult=0.34,
        ),
        decoder=DecoderConfig(
            feat_channels=(64, 64), feat_strides=(16, 32), hidden_dim=64,
            num_levels=2, num_layers=2, num_queries=num_queries,
            reg_scale=4.0, num_points=(4, 4), dim_feedforward=128,
            num_denoising=20, enable_mask_head=enable_mask_head,
        ),
        max_gt=10,
        dn_max_gt=10,
    )


def make_targets(B, G, n_cls, rng: np.random.Generator, n_valid: int = 3):
    import jax.numpy as jnp

    labels = rng.integers(0, n_cls, (B, G)).astype(np.int32)
    cx = rng.uniform(0.3, 0.7, (B, G, 2))
    wh = rng.uniform(0.1, 0.2, (B, G, 2))
    boxes = np.concatenate([cx, wh], -1).astype(np.float32)
    valid = np.zeros((B, G), bool)
    valid[:, :n_valid] = True
    return {
        "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }
