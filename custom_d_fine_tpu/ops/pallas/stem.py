"""Fused Pallas TPU kernel for the HGNetv2 StemBlock (serving graph).

Parity target: reference src/d_fine/arch/hgnetv2.py:115-166 (StemBlock) —
stem1 3x3/s2 -> asym-pad -> {stem2a 2x2 -> pad -> stem2b 2x2 | maxpool 2x2/s1}
-> concat -> stem3 3x3/s2 -> stem4 1x1, each conv followed by BN+ReLU(+LAB).

Why a kernel: the stem works on few-channel large-spatial tensors (3->M->M/2
->M->2M channels at 640^2/320^2), which XLA lays out badly on TPU — profiling
shows ~0.5 ms of the D-FINE-m serving graph spent on stem convs plus pure
layout copies. The Pallas kernel fuses normalize+stem1+stem2a/2b+pool+concat
with every intermediate in VMEM; stem3/stem4 (ordinary 2M-channel convs XLA
handles well) run as folded-weight XLA convs on the kernel's output.

Mosaic constraints that shaped the design:
- value-level strided slices, strided ref loads and wide gathers are all
  unavailable at these shapes, so the stride-2 stem1 de-interleaves its input
  ON THE MXU: one matmul with a constant one-hot matrix D maps the raw
  interleaved lanes (2x+dx)*3+ci to (dx,ci)-grouped columns, and three
  one-hot row-select matmuls R_dy pick the stride-2 row phases. Inputs are
  raw 0..255 pixel values — exact in bf16, and each one-hot product has a
  single nonzero term, so the de-interleave is bit-exact; /255 is folded
  into the stem1 weights.
- vectors only reshape (merge/split trailing dims) when the minor dim is a
  128-multiple, so conv results are computed at merge width
  MW = roundup(W/2, 128) and stored at lane width LW = MW + 128; lanes
  beyond the real width are re-zeroed after each activation.
- concat refuses operands with mismatched vector offsets, so the maxpool
  shifts use pltpu.roll instead of offset slices.
- each conv is a tap-wise MXU contraction dot(w_tap [K, Cout], A_tap [K, N]);
  BN is folded into the weights on the host (eval-mode BN is affine).
- the asymmetric (0,1) pads are explicit zero columns / last-block row masks,
  matching torch F.pad semantics exactly.

Grid: (B, H/32); each step emits 16 rows of the stride-2 concat map. The
input row window (40 rows incl. halo) is DMA'd per step.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5  # models/layers.py BatchNorm.epsilon


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_stem_weights(stem_params: Dict, stem_stats: Dict) -> Dict[str, jnp.ndarray]:
    """Fold eval-mode BN into each stem conv; collect LAB scalars.

    Returns arrays shaped for the kernel / XLA tail:
      w1 [27, M]   b1 [M]      (stem1 3x3, HWIO reshape, tap order (dy,dx,ci))
      w2a [4, M, M2]  b2a [M2] (stem2a 2x2, per-tap [Cin, Cout])
      w2b [4, M2, M]  b2b [M]
      w3 [3, 3, 2M, M] b3 [M]  (stem3 3x3 kept HWIO for the XLA conv)
      w4 [1, 1, M, O]  b4 [O]
      lab [5, 2]               ((scale, bias) per conv; (1, 0) when no LAB)
    """
    out = {}
    lab = np.ones((5, 2), np.float32)
    lab[:, 1] = 0.0
    for i, name in enumerate(("stem1", "stem2a", "stem2b", "stem3", "stem4")):
        p, s = stem_params[name], stem_stats[name]
        k = np.asarray(p["conv"]["kernel"], np.float32)  # HWIO
        bn_p, bn_s = p["norm"]["bn"], s["norm"]["bn"]
        t = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
            np.asarray(bn_s["var"], np.float32) + BN_EPS)
        w = k * t  # broadcast over out-channel (last) dim
        b = np.asarray(bn_p["bias"], np.float32) - np.asarray(bn_s["mean"], np.float32) * t
        kh, kw, ci, co = w.shape
        tag = name[4:]
        if name in ("stem3", "stem4"):
            out[f"w{tag}"] = jnp.asarray(w)  # HWIO for lax.conv
        elif kh == 3:
            out[f"w{tag}"] = jnp.asarray(w.reshape(9 * ci, co))
        else:
            out[f"w{tag}"] = jnp.asarray(w.reshape(kh * kw, ci, co))
        out[f"b{tag}"] = jnp.asarray(b)
        if "lab" in p:
            lab[i, 0] = float(np.asarray(p["lab"]["scale"]).reshape(()))
            lab[i, 1] = float(np.asarray(p["lab"]["bias"]).reshape(()))
    out["lab"] = jnp.asarray(lab)
    return out


def _stem_kernel(img_ref, d_ref, r_ref, w1_ref, b1_ref, w2a_ref, b2a_ref,
                 w2b_ref, b2b_ref, lab_ref, out_ref, scratch, sem, *, W: int,
                 M: int, M2: int, n_blocks: int, LIN: int,
                 fast: bool = False):
    i = pl.program_id(1)
    b = pl.program_id(0)
    # fast (serving) mode: single bf16 MXU passes for the conv contractions —
    # same error class as XLA's own bf16 conv passes (~4e-3 rel)
    HI = None if fast else jax.lax.Precision.HIGHEST
    W2 = W // 2
    MW = _round_up(W2, 128)       # conv merge width (384 @ W=640)
    LW = MW + 128                 # stored lane width, fits kx+MW windows

    # ---- DMA the 40-row input window (rows 32i..32i+40 of the padded image)
    cp = pltpu.make_async_copy(img_ref.at[b, pl.ds(i * 32, 40), :], scratch,
                               sem)
    cp.start()
    cp.wait()

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LW), 2)

    def act(y, bias, lab_i, real_w):
        """bias+ReLU+LAB on [C, rows, MW], zero lanes >= real_w, widen to LW.
        bias arrives [C, 1, 1] (broadcast-ready); LAB scalars come from SMEM."""
        y = jax.nn.relu(y + bias)
        y = lab_ref[lab_i, 0] * y + lab_ref[lab_i, 1]
        y = jnp.pad(y, ((0, 0), (0, 0), (0, LW - y.shape[-1])))
        return jnp.where(lanes >= real_w, 0.0, y)

    # ---- de-interleave on the MXU: G[r, (dx,ci)-group*MW + x] = raw pixel at
    # padded col 2x+dx, channel ci — one bf16 matmul with the constant one-hot
    # matrix D. Inputs are raw 0..255 values (exact in bf16; each output has
    # exactly one nonzero term), so the product is exact; 1/255 is folded into
    # the stem1 weights. Row phases (input row 2j+dy) are then picked with
    # three one-hot row-select matmuls R_dy — also exact.
    G = jax.lax.dot_general(scratch[...].astype(jnp.bfloat16), d_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [40, 9*MW]
    Gb = G.astype(jnp.bfloat16)

    # ---- stem1 3x3/s2: out rows s = 16i+j, j in [0,18).
    taps = []
    for dy in range(3):
        g_dy = jax.lax.dot_general(r_ref[dy], Gb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        for dx in range(3):
            for ci in range(3):
                g = dx * 3 + ci
                taps.append(jax.lax.slice(g_dy, (0, g * MW),
                                          (18, (g + 1) * MW)))
    A = jnp.stack(taps).reshape(27, 18 * MW)
    out1 = jax.lax.dot_general(w1_ref[...], A, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32, precision=HI)
    out1 = act(out1.reshape(M, 18, MW), b1_ref[...], 0, W2)  # b1 [M,1,1]
    # last block: stem1 rows s >= H/2 are the asym bottom pad -> zero
    rows18 = jax.lax.broadcasted_iota(jnp.int32, (1, 18, 1), 1)
    out1 = jnp.where((i == n_blocks - 1) & (rows18 >= 16), 0.0, out1)
    # out1 cols: real 0..W2-1, col W2 == 0 (asym right pad), rest zero

    # ---- stem2a 2x2 valid on padded out1: rows j in [0,17)
    out2a = jnp.zeros((M2, 17 * MW), jnp.float32)
    for t in range(4):
        ky, kx = t // 2, t % 2
        A2 = jax.lax.slice(out1, (0, ky, kx), (M, ky + 17, kx + MW))
        out2a += jax.lax.dot_general(w2a_ref[t], A2.reshape(M, 17 * MW),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
    out2a = act(out2a.reshape(M2, 17, MW), b2a_ref[...], 1, W2)
    rows17 = jax.lax.broadcasted_iota(jnp.int32, (1, 17, 1), 1)
    out2a = jnp.where((i == n_blocks - 1) & (rows17 >= 16), 0.0, out2a)

    # ---- stem2b 2x2 valid: rows j in [0,16)
    out2b = jnp.zeros((M, 16 * MW), jnp.float32)
    for t in range(4):
        ky, kx = t // 2, t % 2
        A2 = jax.lax.slice(out2a, (0, ky, kx), (M2, ky + 16, kx + MW))
        out2b += jax.lax.dot_general(w2b_ref[t], A2.reshape(M2, 16 * MW),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
    out2b = act(out2b.reshape(M, 16, MW), b2b_ref[...], 2, W2)

    # ---- maxpool 2x2/s1 on padded out1 (post-ReLU; zero pad = ceil_mode).
    # Shifts are realized with pltpu.roll (layout-preserving) rather than
    # offset slices: Mosaic cannot concat operands with mismatched vector
    # offsets, and offset-1 slices would poison the concat below.
    r_c = pltpu.roll(out1, LW - 1, 2)      # col+1 neighbor (shift must be >=0)
    m0 = jnp.maximum(out1, r_c)
    m1 = pltpu.roll(m0, 18 - 1, 1)         # row+1 neighbor
    pool = jax.lax.slice(jnp.maximum(m0, m1), (0, 0, 0), (M, 16, LW))
    # roll wraps lanes: lane W2-1 sees lane W2 (the zero pad col) -> correct;
    # row 15 sees row 16 (real or zero-masked pad row) -> correct.

    # ---- concat [pool, stem2b] -> NHWC block [16, W2, 2M]
    cat = jnp.concatenate(
        [pool, jax.lax.slice(out2b, (0, 0, 0), (M, 16, LW))], axis=0)
    out_ref[0] = jnp.transpose(jax.lax.slice(cat, (0, 0, 0), (2 * M, 16, W2)),
                               (1, 2, 0))


def _affine_act(y, bias, lab_row):
    y = jax.nn.relu(y + bias)
    return lab_row[0] * y + lab_row[1]


def fused_stem(x: jnp.ndarray, fw: Dict[str, jnp.ndarray],
               fast: bool = False, interpret: bool = False) -> jnp.ndarray:
    """x [B, H, W, 3] float32 RAW 0..255 pixel values -> [B, H/4, W/4, O].

    The /255 normalize is folded into the stem1 weights (exactness of the
    one-hot de-interleave matmuls needs integer-valued inputs, which bf16
    represents exactly up to 256). Requires H % 32 == 0 and W % 4 == 0.
    """
    B, H, W, C = x.shape
    assert C == 3 and H % 32 == 0 and W % 4 == 0, (B, H, W, C)
    M = fw["b1"].shape[0]
    M2 = fw["b2a"].shape[0]
    n_blocks = H // 32
    W2 = W // 2
    MW = _round_up(W2, 128)
    LIN = _round_up((W + 3) * 3, 128)

    # padded raw image, lanes = (col, channel) interleaved
    xp = jnp.pad(x, ((0, 0), (1, 7), (1, 2), (0, 0))).reshape(B, H + 8, (W + 3) * 3)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, LIN - (W + 3) * 3)))

    # one-hot de-interleave matrix: lane (2x+dx)*3+ci -> group (dx,ci), col x
    D = np.zeros((LIN, 9 * MW), np.float32)
    for dx in range(3):
        for ci in range(3):
            for xcol in range(W2 + 2):
                f = (2 * xcol + dx) * 3 + ci
                if f < LIN and xcol < MW:
                    D[f, (dx * 3 + ci) * MW + xcol] = 1.0
    D = jnp.asarray(D, jnp.bfloat16)
    # one-hot row selectors: scratch row 2j+dy -> out row j
    R = np.zeros((3, 18, 40), np.float32)
    for dy in range(3):
        for j in range(18):
            R[dy, j, 2 * j + dy] = 1.0
    R = jnp.asarray(R, jnp.bfloat16)
    fw = dict(fw)
    fw["w1"] = fw["w1"] / 255.0  # folded normalize

    kern = functools.partial(_stem_kernel, W=W, M=M, M2=M2, n_blocks=n_blocks,
                             LIN=LIN, fast=fast)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    cat = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] + wspecs
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=pl.BlockSpec((1, 16, W2, 2 * M), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W2, 2 * M), jnp.float32),
        scratch_shapes=[pltpu.VMEM((40, LIN), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, D, R, fw["w1"], fw["b1"].reshape(-1, 1, 1), fw["w2a"],
      fw["b2a"].reshape(-1, 1, 1), fw["w2b"], fw["b2b"].reshape(-1, 1, 1),
      fw["lab"])

    # stem3 (3x3/s2/p1) + stem4 (1x1) as XLA convs on the folded weights
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(cat, fw["w3"], (2, 2), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    y = _affine_act(y, fw["b3"], fw["lab"][3])
    y = jax.lax.conv_general_dilated(y, fw["w4"], (1, 1), "VALID",
                                     dimension_numbers=dn)
    return _affine_act(y, fw["b4"], fw["lab"][4])
