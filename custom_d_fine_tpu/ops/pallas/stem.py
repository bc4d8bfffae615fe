"""Fused Pallas TPU kernel for the FULL HGNetv2 StemBlock (serving graph).

Parity target: reference src/d_fine/arch/hgnetv2.py:115-166 (StemBlock) —
stem1 3x3/s2 -> asym-pad -> {stem2a 2x2 -> pad -> stem2b 2x2 | maxpool 2x2/s1}
-> concat -> stem3 3x3/s2 -> stem4 1x1, each conv followed by BN+ReLU(+LAB).

Why a kernel: the stem works on few-channel large-spatial tensors (3->M->M/2
->M->2M->M->O channels at 640^2/320^2/160^2), which XLA lays out badly on TPU
— profiling showed ~0.5 ms of the D-FINE-m serving graph spent on stem convs
plus pure layout copies, and with only stem1/2 fused, another ~0.25 ms on the
XLA stem3/4 convs + the spatial re-tiling copy of the 20 MB concat map. This
kernel fuses normalize + the ENTIRE stem; the only HBM traffic is the raw
image in and the 4.9 MB stride-4 output out.

Mosaic constraints that shaped the design:
- value-level strided slices, strided ref loads and wide gathers are all
  unavailable at these shapes, so every stride-2 selection runs ON THE MXU
  with constant one-hot matmuls: D de-interleaves the raw interleaved input
  lanes, R picks stride-2 stem1 row phases, and E compacts even output
  lanes; stem3's stride-2 rows fall out of a stride-1 formulation (row rolls)
  followed by a sublane split-and-slice.
  One-hot products have a single nonzero term each: with integer-valued
  inputs (raw pixels, bf16-exact) they are bit-exact; on f32 activations the
  exact path uses Precision.HIGHEST (bf16x6) which is exact for 0/1 factors.
- vectors only reshape (merge/split trailing dims) when the minor dim is a
  128-multiple, so conv results are computed at merge width
  MW = roundup(W/2, 128) and stored at lane width LW = MW + 128; lanes
  beyond the real width are re-zeroed after each activation.
- concat refuses operands with mismatched vector offsets, so the maxpool and
  the stem3 +-1-column taps use pltpu.roll (wrap-around lands in zeroed or
  never-selected lanes).
- each conv is a tap-wise MXU contraction dot(w_tap [K, Cout], A_tap [K, N]);
  BN is folded into the weights on the host (eval-mode BN is affine).
- the asymmetric (0,1) pads are explicit zero columns / last-block row masks,
  matching torch F.pad semantics exactly.

Grid: (B, H/(2S)) with S = 32 when H % 64 == 0 else 16; each step emits S/2
rows of the stride-4 stem output from a 2S+8-row input window DMA'd per step;
the one-row top halo needed by stem3 is recomputed from the same window
(R covers S+3 stem1 rows).
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

    Returns arrays shaped for the kernel:
      w1 [27, M]      b1 [M]   (stem1 3x3, HWIO reshape, tap order (dy,dx,ci))
      w2a [4, M, M2]  b2a [M2] (stem2a 2x2, per-tap [Cin, Cout])
      w2b [4, M2, M]  b2b [M]
      w3 [3, 2M, 3M]  b3 [M]   (stem3 3x3: per-dy [Cin, dx-major Cout])
      w4 [M, O]       b4 [O]   (stem4 1x1)
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
        if name == "stem4":
            out["w4"] = jnp.asarray(w.reshape(ci, co))
        elif name == "stem1":
            out["w1"] = jnp.asarray(w.reshape(9 * ci, co))
        elif name == "stem3":
            # [dy, Cin, dx-major Cout]: one kernel dot per dy emits all
            # three dx partials as sublane row groups
            out["w3"] = jnp.asarray(
                w.transpose(0, 2, 1, 3).reshape(3, ci, 3 * co))
        else:  # 2x2 taps: [kh*kw, Cin, Cout]
            out[f"w{tag}"] = jnp.asarray(w.reshape(kh * kw, ci, co))
        out[f"b{tag}"] = jnp.asarray(b)
        if "lab" in p:
            lab[i, 0] = float(np.asarray(p["lab"]["scale"]).reshape(()))
            lab[i, 1] = float(np.asarray(p["lab"]["bias"]).reshape(()))
    out["lab"] = jnp.asarray(lab)
    return out


def _stem_kernel(img_ref, d_ref, r_ref, e_ref, w1_ref, b1_ref,
                 w2a_ref, b2a_ref, w2b_ref, b2b_ref, w3_ref, b3_ref,
                 w4_ref, b4_ref, lab_ref, out_ref, scratch, sem, *, W: int,
                 M: int, M2: int, O: int, n_blocks: int, LIN: int, S: int,
                 fast: bool = False):
    i = pl.program_id(1)
    b = pl.program_id(0)
    # fast (serving) mode: single bf16 MXU passes for the conv contractions —
    # same error class as XLA's own bf16 conv passes (~4e-3 rel)
    HI = None if fast else jax.lax.Precision.HIGHEST
    W2 = W // 2
    W4 = W // 4
    MW = _round_up(W2, 128)       # conv merge width (384 @ W=640)
    LW = MW + 128                 # stored lane width, fits kx+MW windows
    MW4 = _round_up(W4, 128)
    CH = 2 * M                    # concat channels

    # ---- DMA the input row window (2S+8 rows starting at padded row 2S*i)
    cp = pltpu.make_async_copy(img_ref.at[b, pl.ds(i * 2 * S, 2 * S + 8), :],
                               scratch, sem)
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
    # the stem1 weights. Row phases (input row 2j'+dy) are then picked with
    # three one-hot row-select matmuls R_dy — also exact.
    G = jax.lax.dot_general(scratch[...].astype(jnp.bfloat16), d_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [2S+8, 9*MW]
    Gb = G.astype(jnp.bfloat16)

    # ---- stem1 3x3/s2: S+3 out rows j' = 0..S+2 <-> global rows Si+j'-1
    # (one top-halo row j'=0 so stem3 gets its previous-row input; for i==0 it
    # convolves pure pad and is masked to zero at the concat below).
    taps = []
    for dy in range(3):
        g_dy = jax.lax.dot_general(r_ref[dy], Gb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        for dx in range(3):
            for ci in range(3):
                g = dx * 3 + ci
                taps.append(jax.lax.slice(g_dy, (0, g * MW),
                                          (S + 3, (g + 1) * MW)))
    A = jnp.stack(taps).reshape(27, (S + 3) * MW)
    out1 = jax.lax.dot_general(w1_ref[...], A, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32, precision=HI)
    out1 = act(out1.reshape(M, S + 3, MW), b1_ref[...], 0, W2)  # b1 [M,1,1]
    # last block: stem1 rows s >= H/2 are the asym bottom pad -> zero
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (1, S + 3, 1), 1)
    out1 = jnp.where((i == n_blocks - 1) & (rows1 >= S + 1), 0.0, out1)
    # out1 cols: real 0..W2-1, col W2 == 0 (asym right pad), rest zero

    # ---- stem2a 2x2 valid on padded out1: S+2 rows
    out2a = jnp.zeros((M2, (S + 2) * MW), jnp.float32)
    for t in range(4):
        ky, kx = t // 2, t % 2
        A2 = jax.lax.slice(out1, (0, ky, kx), (M, ky + S + 2, kx + MW))
        out2a += jax.lax.dot_general(w2a_ref[t], A2.reshape(M, (S + 2) * MW),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
    out2a = act(out2a.reshape(M2, S + 2, MW), b2a_ref[...], 1, W2)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (1, S + 2, 1), 1)
    out2a = jnp.where((i == n_blocks - 1) & (rows2 >= S + 1), 0.0, out2a)

    # ---- stem2b 2x2 valid: S+1 rows
    out2b = jnp.zeros((M, (S + 1) * MW), jnp.float32)
    for t in range(4):
        ky, kx = t // 2, t % 2
        A2 = jax.lax.slice(out2a, (0, ky, kx), (M2, ky + S + 1, kx + MW))
        out2b += jax.lax.dot_general(w2b_ref[t], A2.reshape(M2, (S + 1) * MW),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
    out2b = act(out2b.reshape(M, S + 1, MW), b2b_ref[...], 2, W2)

    # ---- maxpool 2x2/s1 on padded out1 (post-ReLU; zero pad = ceil_mode).
    # Shifts are realized with pltpu.roll (layout-preserving) rather than
    # offset slices: Mosaic cannot concat operands with mismatched vector
    # offsets, and offset-1 slices would poison the concat below.
    r_c = pltpu.roll(out1, LW - 1, 2)      # col+1 neighbor (shift must be >=0)
    m0 = jnp.maximum(out1, r_c)
    m1 = pltpu.roll(m0, S + 3 - 1, 1)      # row+1 neighbor
    pool = jax.lax.slice(jnp.maximum(m0, m1), (0, 0, 0), (M, S + 1, LW))
    # roll wraps lanes: lane W2-1 sees lane W2 (the zero pad col) -> correct;
    # row S sees row S+1 (real or zero-masked pad row) -> correct.

    # ---- concat [pool, stem2b]: S+1 rows j'' = 0..S <-> global Si + j'' - 1
    cat = jnp.concatenate(
        [pool, jax.lax.slice(out2b, (0, 0, 0), (M, S + 1, LW))], axis=0)
    # top halo row is stem3's zero padding when this is the first block
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (1, S + 1, 1), 1)
    cat = jnp.where((i == 0) & (rows3 == 0), 0.0, cat)
    # re-zero pad lanes: the maxpool roll wrapped out1 col 0 into lane LW-1,
    # which the stem3 dx=0 roll below would wrap back into output col 0
    cat = jnp.where(lanes >= W2, 0.0, cat)

    # ---- stem3 as a STRIDE-1 conv (17 rows) built from row/col rolls — no
    # transposes, no row-phase matmuls. Out row q of the strided conv is the
    # stride-1 result centered at cat row 2q+1; odd rows are kept below with
    # a split-and-slice (sublane strided selection is not available, but
    # splitting the sublane dim [16]->[8,2] and slicing index 0 is). Column
    # taps live on EVEN lanes (lane 2xc = output col xc); odd/pad lanes carry
    # never-selected garbage that the final E compaction drops.
    cat_up = pltpu.roll(cat, 1, 1)        # row j holds cat row j-1
    cat_dn = pltpu.roll(cat, S + 1 - 1, 1)  # row j holds cat row j+1
    # wrap rows (0 of cat_up, 16 of cat_dn) are garbage but only centers
    # c in 1..15 are ever kept, and those never read a wrapped row.
    # Column taps are DEFERRED: accumulate per-dx partial sums at stride-1
    # lanes, then apply the dx shift inside the one-hot compaction matmul
    # E_dx[2xc-1+dx, xc] — no column rolls at all, and everything downstream
    # runs at the compacted width MW4.
    # one dot per dy with dx-major output rows [3M] (3x better MXU row use
    # than 9 separate M-row dots); per-dx partials are sublane slices
    s_all = jnp.zeros((3 * M, (S + 1) * LW), jnp.float32)
    for dy, base in enumerate((cat_up, cat, cat_dn)):
        s_all += jax.lax.dot_general(
            w3_ref[dy], base.reshape(CH, (S + 1) * LW),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)
    s_dx = [jax.lax.slice(s_all, (dx * M, 0), ((dx + 1) * M, (S + 1) * LW))
            for dx in range(3)]

    def compact(x2d, e):
        """x [rows, LW] @ one-hot E [LW, MW4]; bit-exact in the exact path
        (bf16x6 with 0/1 factors), bf16-rounded in fast mode."""
        if fast:
            return jax.lax.dot_general(
                x2d.astype(jnp.bfloat16), e.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            x2d, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out3 = jnp.zeros((M * (S + 1), MW4), jnp.float32)
    for dx in range(3):
        out3 += compact(s_dx[dx].reshape(M * (S + 1), LW), e_ref[dx])
    y3 = jax.nn.relu(out3.reshape(M, S + 1, MW4) + b3_ref[...])
    y3 = lab_ref[3, 0] * y3 + lab_ref[3, 1]

    # ---- stem4 1x1 (on all S+1 stride-1 rows; the extra rows are cheap)
    y4 = jax.lax.dot_general(w4_ref[...], y3.reshape(M, (S + 1) * MW4),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32, precision=HI)
    y4 = jax.nn.relu(y4.reshape(O, S + 1, MW4) + b4_ref[...])
    y4 = lab_ref[4, 0] * y4 + lab_ref[4, 1]

    # ---- keep odd rows (stride-2 centers 2q+1): rows 1..S -> [S/2, 2] pairs,
    # slice index 0 (sublane strided selection is unavailable; split+slice is)
    y4o = jax.lax.slice(y4, (0, 1, 0), (O, S + 1, MW4)).reshape(
        O, S // 2, 2, MW4)
    y4o = jax.lax.slice(y4o, (0, 0, 0, 0), (O, S // 2, 1, MW4)).reshape(
        O, S // 2, MW4)
    out_ref[0] = jnp.transpose(jax.lax.slice(y4o, (0, 0, 0), (O, S // 2, W4)),
                               (1, 2, 0))


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
    O = fw["b4"].shape[0]
    # S = stem1-level rows per grid step (block height / 2). Bigger blocks
    # amortize per-step overheads; 64-row blocks measured fastest at 640^2.
    S = 32 if H % 64 == 0 else 16
    # device A/B knob: STEM_BLOCK_S overrides the block size when divisible
    # (e.g. 64 -> 128-row blocks; VMEM intermediates scale with S)
    _s_env = __import__("os").environ.get("STEM_BLOCK_S")
    if _s_env:
        try:
            s_ov = int(_s_env)
        except ValueError as e:
            raise ValueError(
                f"STEM_BLOCK_S={_s_env!r} is not an integer") from e
        if H % (2 * s_ov) == 0:
            S = s_ov
    n_blocks = H // (2 * S)
    W2 = W // 2
    W4 = W // 4
    MW = _round_up(W2, 128)
    LW = MW + 128
    MW4 = _round_up(W4, 128)
    LIN = _round_up((W + 3) * 3, 128)

    # padded raw image, lanes = (col, channel) interleaved; 3 top pad rows
    # (1 for stem1's own pad + 2 so the window reaches the stem3 halo row)
    xp = jnp.pad(x, ((0, 0), (3, 7), (1, 2), (0, 0))).reshape(B, H + 10, (W + 3) * 3)
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
    # one-hot row selectors: scratch row 2j'+dy -> out1 row j'
    R = np.zeros((3, S + 3, 2 * S + 8), np.float32)
    for dy in range(3):
        for j in range(S + 3):
            if 2 * j + dy < 2 * S + 8:
                R[dy, j, 2 * j + dy] = 1.0
    R = jnp.asarray(R, jnp.bfloat16)
    # per-dx shifted compaction: lane 2xc-1+dx -> col xc (stem3 column taps)
    E = np.zeros((3, LW, MW4), np.float32)
    for dx in range(3):
        for xc in range(W4):
            lane = 2 * xc - 1 + dx
            if 0 <= lane < LW:
                E[dx, lane, xc] = 1.0
    E = jnp.asarray(E)

    fw = dict(fw)
    fw["w1"] = fw["w1"] / 255.0  # folded normalize

    kern = functools.partial(_stem_kernel, W=W, M=M, M2=M2, O=O,
                             n_blocks=n_blocks, LIN=LIN, S=S, fast=fast)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=([pl.BlockSpec(memory_space=pl.ANY)] + wspecs
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=pl.BlockSpec((1, S // 2, W4, O), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 4, W4, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * S + 8, LIN), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        # the stride-1 stem3 intermediates exceed the default 16 MB scoped
        # vmem at batch > 4 (the limit scales oddly with the batch grid dim);
        # v5e has 128 MB VMEM — raise the cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, D, R, E, fw["w1"], fw["b1"].reshape(-1, 1, 1), fw["w2a"],
      fw["b2a"].reshape(-1, 1, 1), fw["w2b"], fw["b2b"].reshape(-1, 1, 1),
      fw["w3"], fw["b3"].reshape(-1, 1, 1), fw["w4"],
      fw["b4"].reshape(-1, 1, 1), fw["lab"])
    return out
