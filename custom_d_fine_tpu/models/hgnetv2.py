"""HGNetv2 backbone (Flax/NHWC), TPU-native rebuild.

Behavioral parity target: reference src/d_fine/arch/hgnetv2.py (StemBlock
:115-166, HG_Block :189-275, HG_Stage :278-329, arch table :344-422,
freeze policy :481-488, forward :561-568). The torch module tree is replaced
by a functional Flax graph in NHWC; freezing is realized by (a) frozen-norm
BatchNorm (always running stats) and (b) an optimizer param mask produced by
`frozen_param_labels` rather than requires_grad mutation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNAct, EseModule, LightConvBNAct

# stem_channels + per-stage (in, mid, out, num_blocks, downsample, light_block,
# kernel, layer_num): reference hgnetv2.py:344-422. Data table, not code.
ARCH_CONFIGS = {
    "B0": {
        "stem_channels": [3, 16, 16],
        "stages": [
            [16, 16, 64, 1, False, False, 3, 3],
            [64, 32, 256, 1, True, False, 3, 3],
            [256, 64, 512, 2, True, True, 5, 3],
            [512, 128, 1024, 1, True, True, 5, 3],
        ],
    },
    "B1": {
        "stem_channels": [3, 24, 32],
        "stages": [
            [32, 32, 64, 1, False, False, 3, 3],
            [64, 48, 256, 1, True, False, 3, 3],
            [256, 96, 512, 2, True, True, 5, 3],
            [512, 192, 1024, 1, True, True, 5, 3],
        ],
    },
    "B2": {
        "stem_channels": [3, 24, 32],
        "stages": [
            [32, 32, 96, 1, False, False, 3, 4],
            [96, 64, 384, 1, True, False, 3, 4],
            [384, 128, 768, 3, True, True, 5, 4],
            [768, 256, 1536, 1, True, True, 5, 4],
        ],
    },
    "B3": {
        "stem_channels": [3, 24, 32],
        "stages": [
            [32, 32, 128, 1, False, False, 3, 5],
            [128, 64, 512, 1, True, False, 3, 5],
            [512, 128, 1024, 3, True, True, 5, 5],
            [1024, 256, 2048, 1, True, True, 5, 5],
        ],
    },
    "B4": {
        "stem_channels": [3, 32, 48],
        "stages": [
            [48, 48, 128, 1, False, False, 3, 6],
            [128, 96, 512, 1, True, False, 3, 6],
            [512, 192, 1024, 3, True, True, 5, 6],
            [1024, 384, 2048, 1, True, True, 5, 6],
        ],
    },
    "B5": {
        "stem_channels": [3, 32, 64],
        "stages": [
            [64, 64, 128, 1, False, False, 3, 6],
            [128, 128, 512, 2, True, False, 3, 6],
            [512, 256, 1024, 5, True, True, 5, 6],
            [1024, 512, 2048, 2, True, True, 5, 6],
        ],
    },
    "B6": {
        "stem_channels": [3, 48, 96],
        "stages": [
            [96, 96, 192, 2, False, False, 3, 6],
            [192, 192, 512, 3, True, False, 3, 6],
            [512, 384, 1024, 6, True, True, 5, 6],
            [1024, 768, 2048, 3, True, True, 5, 6],
        ],
    },
}


class StemBlock(nn.Module):
    """Stride-4 stem with asymmetric-pad 2x2 conv branch + maxpool branch
    (reference hgnetv2.py:115-166)."""

    mid_chs: int
    out_chs: int
    use_lab: bool = False
    frozen_norm: bool = False
    conv_impl: str = "conv"  # "dots": tap-dot convs in train graphs (layers.dot_conv)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """All inter-conv elementwise work (BN apply, relu, LAB, the
        asymmetric pads, the 2x2/s1 maxpool) runs on FLAT [B, H, W*C] views:
        with C=12..24 the NHWC minor dim wastes 81-91% of the 128 VPU lanes,
        and this cluster profiled at ~28 ms of a 170 ms bs=16 train step.
        On the flat view the minor dim is W*C (thousands) and a W-shift is a
        lane-shift by C. Values are bit-identical; only tiling changes.
        (reference semantics: torch F.pad(x,(0,1,0,1)) + 2x2 valid convs +
        ceil-mode maxpool, hgnetv2.py:115-166)."""
        kw = dict(use_lab=self.use_lab, frozen_norm=self.frozen_norm,
                  dtype=self.dtype, flat_act=True, conv_impl=self.conv_impl)
        B, Hin, Win = x.shape[:3]
        C = self.mid_chs
        # stem1: k3 s2 pad(1,1) output size
        H, W = (Hin - 1) // 2 + 1, (Win - 1) // 2 + 1
        f = ConvBNAct(C, 3, stride=2, name="stem1", **kw)(x, train=train)
        # pad (0,1) on W (= C trailing lanes) and H, flat view [B, H+1, (W+1)*C]
        f = jnp.pad(f, ((0, 0), (0, 1), (0, C)))
        x2 = ConvBNAct(C // 2, 2, name="stem2a", **kw)(
            f.reshape(B, H + 1, W + 1, C), train=train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, C // 2)))
        x2 = ConvBNAct(C, 2, name="stem2b", **kw)(
            x2.reshape(B, H + 1, W + 1, C // 2), train=train)
        # maxpool k2 s1 on the padded stem1 output: horizontal max = lane
        # shift by C, vertical max = row shift
        fw = jnp.maximum(f[:, :, :-C], f[:, :, C:])   # [B, H+1, W*C]
        x1 = jnp.maximum(fw[:, :-1], fw[:, 1:])       # [B, H, W*C]
        x = jnp.concatenate([x1.reshape(B, H, W, C),
                             x2.reshape(B, H, W, C)], axis=-1)
        x = ConvBNAct(C, 3, stride=2, name="stem3", **kw)(x, train=train)
        Ho, Wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
        x = ConvBNAct(self.out_chs, 1, name="stem4", **kw)(
            x.reshape(B, Ho, Wo, C), train=train)
        return x.reshape(B, Ho, Wo, self.out_chs)


class HGBlock(nn.Module):
    """Dense block: k convs concatenated with the input, then squeeze/excite
    1x1 aggregation, optional residual (reference hgnetv2.py:189-275).

    The reference instantiates agg="se" for all stages (HG_Stage default), so
    aggregation = squeeze 1x1 ConvBNAct (out/2) -> excitation 1x1 ConvBNAct (out).
    """

    mid_chs: int
    out_chs: int
    layer_num: int
    kernel_size: int = 3
    residual: bool = False
    light_block: bool = False
    use_lab: bool = False
    frozen_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_lab=self.use_lab, frozen_norm=self.frozen_norm, dtype=self.dtype)
        identity = x
        outs = [x]
        y = x
        for i in range(self.layer_num):
            if self.light_block:
                y = LightConvBNAct(self.mid_chs, self.kernel_size, name=f"layers_{i}", **kw)(y, train=train)
            else:
                y = ConvBNAct(self.mid_chs, self.kernel_size, name=f"layers_{i}", **kw)(y, train=train)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBNAct(self.out_chs // 2, 1, name="agg_squeeze", **kw)(y, train=train)
        y = ConvBNAct(self.out_chs, 1, name="agg_excite", **kw)(y, train=train)
        if self.residual:
            y = y + identity
        return y


class HGStage(nn.Module):
    """Optional depthwise stride-2 downsample + num_blocks HGBlocks
    (reference hgnetv2.py:278-329)."""

    in_chs: int
    mid_chs: int
    out_chs: int
    block_num: int
    layer_num: int
    downsample: bool = True
    light_block: bool = False
    kernel_size: int = 3
    use_lab: bool = False
    frozen_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.downsample:
            x = ConvBNAct(
                self.in_chs, 3, stride=2, groups=self.in_chs, use_act=False,
                use_lab=self.use_lab, frozen_norm=self.frozen_norm, dtype=self.dtype,
                name="downsample",
            )(x, train=train)
        for i in range(self.block_num):
            x = HGBlock(
                self.mid_chs, self.out_chs, self.layer_num,
                kernel_size=self.kernel_size,
                residual=(i != 0),
                light_block=self.light_block,
                use_lab=self.use_lab,
                frozen_norm=self.frozen_norm,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train=train)
        return x


class HGNetv2(nn.Module):
    """Full backbone; returns features at `return_idx` stages
    (reference hgnetv2.py:332-568)."""

    arch: str = "B0"
    return_idx: Tuple[int, ...] = (1, 2, 3)
    use_lab: bool = False
    freeze_norm: bool = False
    # serving option: the input is already the stem output (computed by the
    # fused Pallas stem kernel, ops/pallas/stem.py) — skip StemBlock
    stem_external: bool = False
    stem_impl: str = "conv"  # "dots": tap-dot stem convs in train graphs;
    # "s2d"/"s2d_all": space-to-depth rewrite of the k3/s2 stem convs
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = ARCH_CONFIGS[self.arch]
        stem_chs = cfg["stem_channels"]
        if not self.stem_external:
            x = StemBlock(
                stem_chs[1], stem_chs[2], use_lab=self.use_lab,
                frozen_norm=self.freeze_norm, conv_impl=self.stem_impl,
                dtype=self.dtype, name="stem",
            )(x, train=train)
        outs = []
        for i, (in_c, mid_c, out_c, nb, ds, light, k, ln) in enumerate(cfg["stages"]):
            x = HGStage(
                in_c, mid_c, out_c, nb, ln,
                downsample=ds, light_block=light, kernel_size=k,
                use_lab=self.use_lab, frozen_norm=self.freeze_norm,
                dtype=self.dtype, name=f"stages_{i}",
            )(x, train=train)
            if i in self.return_idx:
                outs.append(x)
        return outs

    @staticmethod
    def out_channels(arch: str, return_idx: Sequence[int]) -> Tuple[int, ...]:
        return tuple(ARCH_CONFIGS[arch]["stages"][i][2] for i in return_idx)


def frozen_param_labels(params, freeze_at: int, freeze_stem_only: bool, prefix: str = "backbone"):
    """Label pytree leaves 'frozen' / 'trainable' replicating the reference
    freeze policy (hgnetv2.py:481-485): freeze_at >= 0 freezes the stem, and
    stages 0..freeze_at as well unless freeze_stem_only."""

    def label(path: Tuple[str, ...]) -> str:
        if freeze_at < 0:
            return "trainable"
        parts = [getattr(p, "key", str(p)) for p in path]
        if prefix not in parts:
            return "trainable"
        i = parts.index(prefix)
        sub = parts[i + 1] if i + 1 < len(parts) else ""
        if sub == "stem":
            return "frozen"
        if not freeze_stem_only and sub.startswith("stages_"):
            stage = int(sub.split("_")[1])
            if stage <= freeze_at:
                return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)
