"""HybridEncoder (Flax/NHWC): per-level projection, AIFI self-attention on the
coarsest level, top-down FPN + bottom-up PAN with CSP-ELAN fusion.

Behavioral parity target: reference src/d_fine/arch/hybrid_encoder.py
(input_proj :345-356, AIFI :358-372,443-463, sincos embedding :425-441,
FPN/PAN :374-408,465-486). TPU redesign notes:
- NHWC layout; nearest-2x upsample via jnp.repeat (no gather), bilinear not needed.
- The positional embedding is computed inside the traced graph from static
  H/W, so XLA constant-folds it — no eval_spatial_size buffer machinery.
- conv+BN deploy fusion is unnecessary (XLA folds BN at inference).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import (
    BatchNorm,
    ConvNorm,
    MultiHeadAttention,
    RepNCSPELAN4,
    SCDown,
    conv2d,
    get_activation,
)


def sincos_pos_embed_2d(w: int, h: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """2D sin-cos positional embedding, parity with reference
    hybrid_encoder.py:425-441. Returns [1, h*w, dim] (numpy; folded as constant).

    Note the reference builds the grid with indexing='ij' over (w, h) then
    flattens, i.e. the flattened order is w-major — we match that exactly.
    """
    assert dim % 4 == 0
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = grid_w.reshape(-1)[:, None] @ omega[None]
    out_h = grid_h.reshape(-1)[:, None] @ omega[None]
    emb = np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1)
    return emb[None]


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer; pos embed added to q,k only
    (reference hybrid_encoder.py:243-290)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "gelu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos_embed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        q = src if pos_embed is None else src + pos_embed
        attn = MultiHeadAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")(
            q, q, src
        )
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src + attn)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ff = get_activation(self.activation)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src + ff)


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample in NHWC without gathers."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class HybridEncoder(nn.Module):
    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    feat_strides: Tuple[int, ...] = (8, 16, 32)
    hidden_dim: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    enc_act: str = "gelu"
    use_encoder_idx: Tuple[int, ...] = (2,)
    num_encoder_layers: int = 1
    pe_temperature: float = 10000.0
    expansion: float = 1.0
    depth_mult: float = 1.0
    act: str = "silu"
    deploy: bool = False  # fused VGGBlocks (see deploy/reparam.py)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == len(self.in_channels)
        hd = self.hidden_dim

        # per-level 1x1 conv + BN projection (reference :345-356)
        proj = []
        for i, f in enumerate(feats):
            y = conv2d(hd, 1, use_bias=False, dtype=self.dtype, prefer_dot=not train, name=f"input_proj_{i}_conv")(f)
            y = BatchNorm(dtype=self.dtype, name=f"input_proj_{i}_norm")(y, train=train)
            proj.append(y)

        # AIFI: full self-attention on selected (coarsest) level(s) (reference :448-463)
        if self.num_encoder_layers > 0:
            for ei, enc_ind in enumerate(self.use_encoder_idx):
                B, H, W, C = proj[enc_ind].shape
                src = proj[enc_ind].reshape(B, H * W, C)
                # match torch flatten(2) on NCHW = row-major over (h, w); the
                # reference embedding is built w-major over meshgrid(w,h,'ij')
                # which equals (h,w)-row-major after its flatten — build with
                # (w=W, h=H) exactly as the reference does.
                pe = sincos_pos_embed_2d(W, H, hd, self.pe_temperature)
                # torch NCHW flatten(2) yields h-major ordering; the reference
                # passes its w-major table directly, so ordering differs only
                # if H != W. Reproduce reference behavior bit-for-bit.
                pe = jnp.asarray(pe, src.dtype)
                for li in range(self.num_encoder_layers):
                    src = TransformerEncoderLayer(
                        hd, self.nhead, self.dim_feedforward, self.enc_act,
                        dtype=self.dtype, name=f"encoder_{ei}_layers_{li}",
                    )(src, pos_embed=pe)
                proj[enc_ind] = src.reshape(B, H, W, C)

        n = len(self.in_channels)
        num_blocks = round(3 * self.depth_mult)
        c4 = round(self.expansion * hd // 2)

        # top-down FPN (reference :465-476)
        inner_outs = [proj[-1]]
        for idx in range(n - 1, 0, -1):
            k = n - 1 - idx
            feat_high = ConvNorm(hd, 1, 1, dtype=self.dtype, name=f"lateral_convs_{k}")(
                inner_outs[0], train=train
            )
            inner_outs[0] = feat_high
            up = _upsample2x_nearest(feat_high)
            fused = RepNCSPELAN4(
                hd, hd * 2, c4, num_blocks, act=self.act, deploy=self.deploy,
                dtype=self.dtype, name=f"fpn_blocks_{k}",
            )(jnp.concatenate([up, proj[idx - 1]], axis=-1), train=train)
            inner_outs.insert(0, fused)

        # bottom-up PAN (reference :478-484)
        outs = [inner_outs[0]]
        for idx in range(n - 1):
            down = SCDown(hd, 3, 2, dtype=self.dtype, name=f"downsample_convs_{idx}")(
                outs[-1], train=train
            )
            out = RepNCSPELAN4(
                hd, hd * 2, c4, num_blocks, act=self.act, deploy=self.deploy,
                dtype=self.dtype, name=f"pan_blocks_{idx}",
            )(jnp.concatenate([down, inner_outs[idx + 1]], axis=-1), train=train)
            outs.append(out)

        return outs
