"""Shared conv/norm/attention building blocks (Flax linen, NHWC layout).

TPU-first re-designs of the reference building blocks:
- ConvBNAct / LightConvBNAct           (reference src/d_fine/arch/hgnetv2.py:35-112)
- LearnableAffineBlock                  (hgnetv2.py:25-32)
- EseModule                             (hgnetv2.py:169-186)
- ConvNorm (= ConvNormLayer[_fuse])     (hybrid_encoder.py:21-93) — BN fusion is
  left to XLA constant folding at inference; no explicit reparam step needed.
- VGGBlock / CSPLayer / RepNCSPELAN4 / SCDown (hybrid_encoder.py:96-239)
- MLP                                   (dfine_decoder.py:33-46)
- MultiHeadAttention                    (plain SDPA; torch nn.MultiheadAttention parity)

All spatial tensors are NHWC (TPU-native layout); torch reference is NCHW.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name is None or name == "identity":
        return lambda x: x
    name = name.lower()
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return jax.nn.leaky_relu
    if name == "gelu":
        # torch nn.GELU() is the exact erf form, not the tanh approximation
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "hardsigmoid":
        return jax.nn.hard_sigmoid
    raise ValueError(f"unknown activation {name!r}")


class PointwiseConv(nn.Module):
    """1x1/s1 dense conv implemented as a channel-dim dot (drop-in for nn.Conv).

    XLA's TPU conv emitter handles batch-1 NHWC 1x1 convs with the spatial
    conv path ("EmitAllBatchInSublanes", T(1,128) spatial-major layouts) at
    ~15% MXU efficiency; expressing the same op as dot_general over the
    channel dim gets a real MXU matmul. Param shape/name match nn.Conv
    exactly ([1,1,Ci,Co] "kernel", [Co] "bias"), so checkpoints, converters,
    and init RNG draws are unchanged.
    """

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, ci, self.features)
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
        y = jax.lax.dot_general(
            x, kernel.reshape(ci, self.features),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        if bias is not None:
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


def conv2d(out_chs, kernel_size, strides=(1, 1), padding="VALID", groups=1,
           use_bias=False, dtype=None, name="conv", prefer_dot=True):
    """nn.Conv factory that routes dense 1x1/s1 convs to PointwiseConv.

    prefer_dot is False in TRAINING graphs: the dot's backward measured
    marginally slower than XLA's tuned conv backward at batch 8 (28.5 vs
    28.8 img/s, bench_train), while in batch-1 inference the dot is ~7x
    faster than the conv emitter ("EmitAllBatchInSublanes"). Param
    shape/name are identical either way, so checkpoints are unaffected.
    """
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    pad_free = padding == "VALID" or (
        isinstance(padding, (list, tuple))
        and all(tuple(p) == (0, 0) for p in padding))
    if (prefer_dot and k == (1, 1) and tuple(strides) == (1, 1)
            and groups == 1 and pad_free):
        return PointwiseConv(out_chs, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Conv(out_chs, k, strides=strides, padding=padding,
                   feature_group_count=groups, use_bias=use_bias, dtype=dtype,
                   name=name)


class BatchNorm(nn.Module):
    """BatchNorm2d with optional freezing.

    Under pjit/GSPMD the batch statistics are computed over the *global* batch
    (XLA inserts the cross-device reductions), which subsumes the reference's
    SyncBatchNorm conversion (train.py:169-170) with zero extra code.
    """

    frozen: bool = False
    momentum: float = 0.9  # torch BatchNorm2d default momentum=0.1 => ema decay 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_running = (not train) or self.frozen
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


class _FlatBNStats(nn.Module):
    """Param/stat container for FlatBatchNorm, named "bn" so the variable tree
    ({...}/norm/bn/{scale,bias} + batch_stats mean/var) is byte-identical to
    the nn.BatchNorm path — checkpoints, converters and init RNG unchanged."""

    use_running: bool
    momentum: float
    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        if self.use_running:
            mu, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
            # E[x^2] - E[x]^2, matching flax _compute_stats (biased, like the
            # normalization var; flax also feeds it to the running var)
            mu2 = jnp.mean(jax.lax.square(xf), axis=tuple(range(x.ndim - 1)))
            var = jnp.maximum(mu2 - jax.lax.square(mu), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mu
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        return mu, mul, bias


class FlatBatchNorm(nn.Module):
    """BatchNorm whose normalization is applied on a FLAT [B, H, W*C] view.

    Why: stem tensors have C=24/12 — as the minor (lane) dim that wastes 81%
    of every 128-lane VPU op, and the stem's elementwise fwd+bwd fusions
    profiled at ~28 ms/step of a 170 ms D-FINE-m bs=16 train step. On the
    flat view the minor dim is W*C (thousands), so XLA tiles elementwise work
    (and the ReLU masks / LAB reduces of the backward) at full lane width.
    Per-channel vectors are tiled to [W*C] rows. Parameter tree identical to
    BatchNorm (see _FlatBNStats). Same-session A/B 2026-08-17: see CLAUDE.md.
    """

    frozen: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x [B, H, W, C] -> FLAT normalized [B, H, W*C]; the caller keeps
        downstream elementwise work (relu/LAB/pad/maxpool) on the flat view
        and reshapes back to NHWC only at the next conv boundary."""
        B, H, W, C = x.shape
        use_running = (not train) or self.frozen
        mu, mul, bias = _FlatBNStats(use_running, self.momentum, self.epsilon,
                                     name="bn")(x)
        # flax nn.BatchNorm normalizes in f32 (mean/var/scale stay f32, the
        # subtraction promotes) and casts to `dtype` only at the END — same
        # here, so the bf16 train graph matches the nn.BatchNorm path too
        # (torch AMP also keeps BN in f32). Same association as flax:
        # (x - mean) * mul + bias.
        dt = self.dtype or x.dtype
        xf = x.reshape(B, H, W * C).astype(jnp.float32)
        y = (xf - jnp.tile(mu, W)) * jnp.tile(mul, W) + jnp.tile(bias, W)
        return y.astype(dt)


class _Kernel(nn.Module):
    """Declares a conv kernel param identical to nn.Conv's (same path
    "<name>/kernel", shape [kh,kw,ci,co], lecun_normal init, f32) without
    instantiating the conv — used by the tap-dot conv path so the variable
    tree (checkpoints, converters, init RNG draws) is unchanged."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def dot_conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
             pad, dtype: Optional[Dtype]) -> jnp.ndarray:
    """Dense conv as a sum of per-tap channel dots (training stem path).

    Why: at stem shapes (C=3..48, 320-640px) XLA's conv emitters are far off
    the bandwidth roofline — the bs16 D-FINE-m profile (2026-08-19) shows
    ~6.4 ms/step of conv-backward-filter fusions and ~5 ms of fused
    conv+BN-stat forward for <1% of the step's FLOPs. Decomposing the conv
    into one dot_general per kernel tap makes autodiff produce reduction
    DOTS for d/dW ([C, B*H*W] @ [B*H*W, Cout] — MXU, bandwidth-bound)
    instead of the conv-bwd-filter emitter, and plain dots + pads for d/dx.

    Numerics: each tap dot accumulates in f32 (preferred_element_type) and
    taps are summed in f32, rounding once at the end — same single-rounding
    contract as lax.conv with bf16 operands (up to reassociation).
    """
    kh, kw, ci, co = kernel.shape
    if dtype is not None:
        x, kernel = x.astype(dtype), kernel.astype(dtype)
    if any(p != (0, 0) for p in pad):
        x = jnp.pad(x, ((0, 0), tuple(pad[0]), tuple(pad[1]), (0, 0)))
    B, Hp, Wp, _ = x.shape
    ho = (Hp - kh) // stride + 1
    wo = (Wp - kw) // stride + 1
    acc = None
    for r in range(kh):
        for t in range(kw):
            v = jax.lax.slice(
                x, (0, r, t, 0),
                (B, r + (ho - 1) * stride + 1, t + (wo - 1) * stride + 1, ci),
                (1, stride, stride, 1))
            y = jax.lax.dot_general(v, kernel[r, t], (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype)


def s2d_conv(x: jnp.ndarray, kernel: jnp.ndarray, pad,
             dtype: Optional[Dtype]) -> jnp.ndarray:
    """Stride-2 k3 conv as space-to-depth + 2x2/s1 conv (training stem path).

    The classic TPU stem trick (MLPerf ResNet): a k3/s2 conv over C=3 puts 3
    channels in the 128-lane minor dim and starves both the conv emitter and
    its backward-filter pass. Re-expressing it on the 2x2-cell space-to-depth
    view [B, H/2, W/2, 4C] turns the contraction into 2*2*4C taps (48 for
    C=3) and halves the spatial extent, while the kernel is zero-embedded
    into the 4x4 window the 2x2 cell conv covers — autodiff routes d/dW
    through the embedding for free, so d/dW becomes a dense [4*4*C, Cout]
    reduction instead of a starved conv-backward-filter.

    Numerics: identical taps, one dot accumulation — same contract as
    lax.conv up to reassociation. Parameter tree unchanged (caller passes
    the nn.Conv-shaped [3,3,ci,co] kernel).
    """
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3, "s2d path is specialized to k3/s2"
    if dtype is not None:
        x, kernel = x.astype(dtype), kernel.astype(dtype)
    x = jnp.pad(x, ((0, 0), tuple(pad[0]), tuple(pad[1]), (0, 0)))
    B, Hp, Wp, _ = x.shape
    ho, wo = (Hp - kh) // 2 + 1, (Wp - kw) // 2 + 1
    # cell grid must cover rows/cols [0, 2*(ho-1)+3) -> ho+1 cells of 2
    Hc, Wc = ho + 1, wo + 1
    x = jnp.pad(x, ((0, 0), (0, 2 * Hc - Hp), (0, 2 * Wc - Wp), (0, 0)))
    x = x.reshape(B, Hc, 2, Wc, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hc, Wc, 4 * ci)
    # zero-embed [3,3,ci,co] into the (R,r2,T,t2) cell layout: tap (r,t) ->
    # cell (r//2, t//2), sub-position (r%2, t%2)
    k4 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [4,4,ci,co]
    k4 = k4.reshape(2, 2, 2, 2, ci, co).transpose(0, 2, 1, 3, 4, 5)
    k4 = k4.reshape(2, 2, 4 * ci, co)
    return jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class LearnableAffineBlock(nn.Module):
    """Scalar scale*x + bias (reference hgnetv2.py:25-32)."""

    scale_init: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", lambda k: jnp.full((1,), self.scale_init, jnp.float32))
        bias = self.param("bias", lambda k: jnp.full((1,), self.bias_init, jnp.float32))
        return scale.astype(x.dtype) * x + bias.astype(x.dtype)


class ConvBNAct(nn.Module):
    """conv(no bias) -> BN -> ReLU -> optional LAB (reference hgnetv2.py:35-80).

    padding="same2" replicates the torch ZeroPad2d([0,1,0,1]) + valid-conv trick
    used for the k=2 stem convs.
    """

    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: str = ""  # "" => (k-1)//2 symmetric; "same2" => asymmetric (0,1)
    use_act: bool = True
    use_lab: bool = False
    frozen_norm: bool = False
    flat_act: bool = False  # True => BN/relu/LAB on a flat [B,H,W*C] view and
    # RETURN the flat tensor (full-lane tiling for small C; see FlatBatchNorm)
    conv_impl: str = "conv"  # "dots" => tap-dot conv in TRAIN graphs (see dot_conv)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.padding == "same2":
            pad = [(0, 1), (0, 1)]
        else:
            p = (self.kernel_size - 1) // 2
            pad = [(p, p), (p, p)]
        if self.conv_impl == "dots" and train and self.groups == 1:
            kern = _Kernel((self.kernel_size, self.kernel_size,
                            x.shape[-1], self.out_chs), name="conv")()
            x = dot_conv(x, kern, self.stride, pad, self.dtype)
        elif (self.conv_impl in ("s2d", "s2d_all") and train
              and self.groups == 1 and self.kernel_size == 3
              and self.stride == 2
              and (self.conv_impl == "s2d_all" or x.shape[-1] <= 4)):
            # "s2d": space-to-depth rewrite of the C=3 stem1 conv only;
            # "s2d_all": also the C=24 stem3 conv (see s2d_conv docstring)
            kern = _Kernel((3, 3, x.shape[-1], self.out_chs), name="conv")()
            x = s2d_conv(x, kern, pad, self.dtype)
        else:
            x = conv2d(
                self.out_chs, self.kernel_size, strides=(self.stride, self.stride),
                padding=pad, groups=self.groups, use_bias=False, dtype=self.dtype,
                name="conv", prefer_dot=not train,
            )(x)
        if self.flat_act:
            x = FlatBatchNorm(frozen=self.frozen_norm, dtype=self.dtype,
                              name="norm")(x, train=train)  # [B, H, W*C]
        else:
            x = BatchNorm(frozen=self.frozen_norm, dtype=self.dtype, name="norm")(x, train=train)
        if self.use_act:
            x = jax.nn.relu(x)
            if self.use_lab:
                x = LearnableAffineBlock(name="lab")(x)
        return x


class LightConvBNAct(nn.Module):
    """1x1 conv (no act) + depthwise kxk conv (act) (reference hgnetv2.py:83-112)."""

    out_chs: int
    kernel_size: int
    use_lab: bool = False
    frozen_norm: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNAct(
            self.out_chs, 1, use_act=False, use_lab=self.use_lab,
            frozen_norm=self.frozen_norm, dtype=self.dtype, name="conv1",
        )(x, train=train)
        x = ConvBNAct(
            self.out_chs, self.kernel_size, groups=self.out_chs, use_act=True,
            use_lab=self.use_lab, frozen_norm=self.frozen_norm, dtype=self.dtype, name="conv2",
        )(x, train=train)
        return x


class EseModule(nn.Module):
    """Effective-SE channel attention (reference hgnetv2.py:169-186)."""

    chs: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = conv2d(self.chs, 1, use_bias=True, dtype=self.dtype, name="conv")(s)
        return x * jax.nn.sigmoid(s)


class ConvNorm(nn.Module):
    """conv -> BN -> act (reference ConvNormLayer/_fuse, hybrid_encoder.py:21-93).

    The reference keeps a separate deploy-time conv+BN fusion; on TPU, inference
    runs with running stats so BN is an affine op XLA folds into the conv —
    a separate fused parameter set is unnecessary.
    """

    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: Optional[int] = None
    use_bias: bool = False
    act: Optional[str] = None
    frozen_norm: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = (self.kernel_size - 1) // 2 if self.padding is None else self.padding
        x = conv2d(
            self.out_chs, self.kernel_size, strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)], groups=self.groups,
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
            prefer_dot=not train,
        )(x)
        x = BatchNorm(frozen=self.frozen_norm, dtype=self.dtype, name="norm")(x, train=train)
        return get_activation(self.act)(x)


class SCDown(nn.Module):
    """1x1 conv then depthwise stride-2 conv (reference hybrid_encoder.py:96-103)."""

    out_chs: int
    kernel_size: int = 3
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvNorm(self.out_chs, 1, 1, dtype=self.dtype, name="cv1")(x, train=train)
        x = ConvNorm(
            self.out_chs, self.kernel_size, self.stride, groups=self.out_chs,
            dtype=self.dtype, name="cv2",
        )(x, train=train)
        return x


class VGGBlock(nn.Module):
    """RepVGG-style 3x3+1x1 parallel conv (reference hybrid_encoder.py:106-156).

    Trains as two branches. XLA folds each branch's BN into the conv epilogue
    but will NOT merge two convolutions into one, so the reference's
    `convert_to_deploy` kernel merge (hybrid_encoder.py:123-156) has a real TPU
    equivalent: deploy=True runs a single fused 3x3 conv whose weights are
    produced by deploy/reparam.fuse_vgg_variables (BN-fold both branches, pad
    the 1x1 to 3x3, sum kernels and biases).
    """

    out_chs: int
    act: Optional[str] = "silu"
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.deploy:
            y = nn.Conv(self.out_chs, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, dtype=self.dtype, name="fused")(x)
            return get_activation(self.act)(y)
        y = ConvNorm(self.out_chs, 3, 1, padding=1, dtype=self.dtype, name="conv1")(x, train=train)
        y = y + ConvNorm(self.out_chs, 1, 1, padding=0, dtype=self.dtype, name="conv2")(x, train=train)
        return get_activation(self.act)(y)


class CSPLayer(nn.Module):
    """Cross-stage-partial layer of VGGBlocks (reference hybrid_encoder.py:209-239)."""

    out_chs: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_chs * self.expansion)
        x1 = ConvNorm(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train=train)
        for i in range(self.num_blocks):
            x1 = VGGBlock(hidden, act=self.act, deploy=self.deploy,
                          dtype=self.dtype, name=f"bottlenecks_{i}")(x1, train=train)
        x2 = ConvNorm(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2")(x, train=train)
        y = x1 + x2
        if hidden != self.out_chs:
            y = ConvNorm(self.out_chs, 1, 1, act=self.act, dtype=self.dtype, name="conv3")(y, train=train)
        return y


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN fusion block (reference hybrid_encoder.py:182-206)."""

    out_chs: int  # c2
    c3: int
    c4: int
    num_blocks: int = 3
    act: str = "silu"
    deploy: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvNorm(self.c3, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train=train)
        half = self.c3 // 2
        y1, y2 = y[..., :half], y[..., half:]

        b2 = CSPLayer(self.c4, self.num_blocks, act=self.act, deploy=self.deploy,
                      dtype=self.dtype, name="cv2_csp")(y2, train=train)
        b2 = ConvNorm(self.c4, 3, 1, act=self.act, dtype=self.dtype, name="cv2_conv")(b2, train=train)

        b3 = CSPLayer(self.c4, self.num_blocks, act=self.act, deploy=self.deploy,
                      dtype=self.dtype, name="cv3_csp")(b2, train=train)
        b3 = ConvNorm(self.c4, 3, 1, act=self.act, dtype=self.dtype, name="cv3_conv")(b3, train=train)

        out = jnp.concatenate([y1, y2, b2, b3], axis=-1)
        return ConvNorm(self.out_chs, 1, 1, act=self.act, dtype=self.dtype, name="cv4")(out, train=train)


class MLP(nn.Module):
    """num_layers-deep MLP with activation on all but the last layer
    (reference dfine_decoder.py:33-46)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    act: str = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.act)
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = act(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard softmax MHA with separate q/k/v inputs and optional boolean mask.

    Parity with torch nn.MultiheadAttention(batch_first=True): mask True = blocked.
    """

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,  # [Lq, Lk] bool, True = cannot attend
    ) -> jnp.ndarray:
        h, d = self.num_heads, self.embed_dim // self.num_heads
        B, Lq, _ = q.shape
        Lk = k.shape[1]

        def proj(x, name):
            return nn.Dense(self.embed_dim, dtype=self.dtype, name=name)(x)

        qh = proj(q, "q_proj").reshape(B, Lq, h, d)
        kh = proj(k, "k_proj").reshape(B, Lk, h, d)
        vh = proj(v, "v_proj").reshape(B, Lk, h, d)

        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
        if attn_mask is not None:
            neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
            logits = jnp.where(attn_mask[None, None, :, :], neg, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, Lq, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


def bias_init_with_prob(prior_prob: float = 0.01) -> float:
    """Focal-style classification bias init (reference arch/utils.py:76-79)."""
    return float(-math.log((1 - prior_prob) / prior_prob))
