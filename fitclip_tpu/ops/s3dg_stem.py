"""Pallas kernel for the S3DG space-to-depth stem (inference).

The stem (space_to_depth -> Conv3D(2,4,4)/64 -> BN -> ReLU -> 3x3/2 max
pool, reference aligner/encoder/s3dg.py:183-189) is the single most
expensive piece of the S3DG eval forward. The XLA decomposition
(scripts/bench_s3dg_stem3.py, batch 16x16f x 224^2, v5e) measures
~10.2 ms: the s2d tensor's NDHWC layout puts 24 channels on the lane
(minor) dim so the conv runs ~41 TFLOP/s on 24/128-occupied tiles, and the
strided-lane max pool costs another ~4.4 ms of reduce_window relayouts in
ANY layout.

This kernel computes conv + BN bias + ReLU + the ENTIRE first max pool in
one pallas_call, with a lane layout the MXU and VPU like:

  * input arrives s2d-TRANSPOSED as (B, Ts+1, Hs, C=32, W->128 lanes) —
    channels on sublanes, width on lanes (zero-padded: lanes >= Ws, channel
    rows 24..31, and one trailing all-zero time row so the t+1 tap needs no
    bounds check);
  * the four width-tap shifts {+1, 0, -1, -2} are circular lane rotates.
    Mosaic's rotate is 32-bit-only, so bf16 tiles are bitcast to int32
    (packing sublane pairs), rotated natively, and bitcast back — pure bit
    movement, no precision change. The zero lanes past Ws make the
    wraparound act as the conv's width zero padding. Rolled taps land in a
    VMEM slab (2, Hs+3, 4*32, 128) whose first and last-two h rows are zero
    (the conv's height padding — asymmetric 1 low / 2 high because of the
    reference's [1:] output slice);
  * each conv row h is two exact matmuls
    (64, 512) @ slab[ti, h:h+4].reshape(512, 128) — contraction over
    (dh, dw, c), fp32 accumulation — plus bias + ReLU + a zero-mask on the
    pad lanes;
  * the 3x3/2 TF-'SAME' max pool fuses in-kernel: width-max via two f32
    lane rotates (wmax[w] = max(x[w..w+2])) cached per row in a VMEM
    ring, height-max over three cached rows, and the stride-2 lane
    selection as a tiny 0/1 selection matmul (exact: one product per
    output). max commutes with monotonic bf16 rounding, so pooling fp32
    activations and casting once is bit-identical to the XLA path's
    bf16 pool.

Output is pooled (B, Ts, Hs/2, 64, Ws/2), channels-on-sublanes — 8x less
HBM than the unpooled conv output; the caller transposes the quarter-res
tensor back to NDHWC (models/s3dg_fast.py).

Weight/bias layouts are precomputed by `pack_stem_weights` from the same
folded (kernel, bias) pair the XLA path uses, so numerics differ only by
fp32-accumulation order (parity: tests/test_s3dg_stem.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C_PAD = 32  # s2d channels (24) padded to a full sublane group


def s2d_transpose(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2 + 1, H/2, 8C->32, 128) kernel input.

    Same (t2, h2, w2, c) channel order as models/s3dg.py:space_to_depth, but
    with channels on the second-minor dim and width on lanes, zero-padded:
    lanes [W/2, 128), channel rows [8C, 32), and one all-zero trailing time
    row (the stem's t+1 tap at the clip end).

    The (w2, c) de-interleave runs as a 0/1 SELECTION MATMUL on the MXU —
    P[row, 128*j + wo] = x_row[2*c*wo + j] — followed by a transpose whose
    minor dim is a contiguous 128-lane chunk. Bit-exact vs the direct 8-D
    transpose, and 3.6x faster (0.84 vs 3.06 ms at batch 16x16f: the direct
    form de-interleaves the (W, C)-trailing source at stride 6 bytes and
    manages ~60 GB/s; scripts/bench_s3dg_relayout.py).
    """
    b, t, h, w, c = x.shape
    ws = w // 2
    jn = 2 * c  # (w2, c) channel pairs per output lane group
    jj = np.arange(jn).repeat(ws)
    wo = np.tile(np.arange(ws), jn)
    sel = np.zeros((w * c, jn * 128), np.float32)
    sel[jn * wo + jj, 128 * jj + wo] = 1.0
    rows = x.reshape(b, t, h, w * c)
    p = jax.lax.dot_general(rows, jnp.asarray(sel, x.dtype),
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = p.astype(x.dtype).reshape(b, t // 2, 2, h // 2, 2, jn, 128)
    p = p.transpose(0, 1, 3, 2, 4, 5, 6)  # (B, Ts, Hs, t2, h2, j, 128)
    p = p.reshape(b, t // 2, h // 2, 8 * c, 128)
    return jnp.pad(p, ((0, 0), (0, 1), (0, 0), (0, _C_PAD - 8 * c), (0, 0)))


def s2d_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C=3) -> (B, T, H/2, 2048) v4 kernel input.

    One selection matmul de-interleaves BOTH the h parity and (w2, c) of a
    raw frame: the lhs view (B, T, H/2, 2, W*C) is a pure reshape (h2 rows
    are memory-adjacent), and the contraction runs over its two minor dims
    against sel[h2, wc, out]. Output channels are (h2*8 + j)*128 + w with
    j = w2*C + c (j in [2C, 8) zero), so each frame contributes an aligned
    16-sublane slab piece — no pad, no transpose, no extra HBM pass (the
    v2/v3 producer `s2d_transpose` spent ~1.5 ms/call on those,
    scripts/profile_s3dg.py). Time padding (the t+1 tap at the clip end)
    moves into the kernel, which zeroes the new slab slot on the last step.
    """
    b, t, h, w, c = x.shape
    assert c == 3, "v4 packs (w2, c) pairs into 8-lane-group pieces (C == 3)"
    ws = w // 2
    jn = 2 * c
    jj = np.arange(jn).repeat(ws)
    wo = np.tile(np.arange(ws), jn)
    sel = np.zeros((2, w * c, 16 * 128), np.float32)
    for h2 in range(2):
        sel[h2, jn * wo + jj, 128 * (h2 * 8 + jj) + wo] = 1.0
    rows = x.reshape(b, t, h // 2, 2, w * c)
    p = jax.lax.dot_general(rows, jnp.asarray(sel, x.dtype),
                            (((3, 4), (0, 1)), ((), ())),
                            preferred_element_type=jnp.float32)
    return p.astype(x.dtype)  # (B, T, H/2, 2048)


def pack_stem_weights(kernel: jnp.ndarray, bias: jnp.ndarray,
                      dtype) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Folded conv kernel (2, 4, 4, 24, 64) THWIO + bias (64,) ->
    ((2, 64, 512) matmul weights, (64, 128) fp32 broadcast bias,
    (128, 128) stride-2 lane-selection matrix)."""
    kt, kh, kw, c_in, c_out = kernel.shape
    k = jnp.pad(kernel.astype(jnp.float32),
                ((0, 0), (0, 0), (0, 0), (0, _C_PAD - c_in), (0, 0)))
    w2 = k.reshape(kt, kh * kw * _C_PAD, c_out).transpose(0, 2, 1).astype(dtype)
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (c_out, 128))
    sel = jnp.zeros((128, 128), dtype).at[2 * jnp.arange(64), jnp.arange(64)].set(1)
    return w2, bias_b, sel


def _lane_roll(v: jnp.ndarray, shift: int, interpret: bool) -> jnp.ndarray:
    """Circular roll of the minor (lane) dim by a static shift.

    Mosaic's tpu.dynamic_rotate rejects non-32-bit data, so bf16 tiles are
    bitcast to int32 (sublane pairs pack; the lane dim is untouched),
    rotated, and bitcast back.
    """
    shift = shift % 128
    if shift == 0:
        return v
    if interpret:
        return jnp.roll(v, shift, axis=v.ndim - 1)
    if v.dtype == jnp.bfloat16:
        packed = pltpu.bitcast(v, jnp.int32)
        return pltpu.bitcast(pltpu.roll(packed, shift, v.ndim - 1), v.dtype)
    return pltpu.roll(v, shift, v.ndim - 1)


def _stem_kernel(x0_ref, x1_ref, w_ref, b_ref, s_ref, o_ref, slab_ref,
                 wmax_ref, *, hs: int, ws: int, interpret: bool):
    # --- tap slab: lane-rolled copies of the two time rows ---------------
    # Slab h layout: row 0 zero (the h-1 tap at h=0), rows 1..hs the input,
    # rows hs+1/hs+2 zero (the h+1/h+2 taps at h=hs-1 — the [1:] output
    # slice makes the height padding asymmetric: 1 low, 2 high).
    zero_rows = jnp.zeros((2, 4 * _C_PAD, 128), slab_ref.dtype)
    for ti, x_ref in enumerate((x0_ref, x1_ref)):
        slab_ref[ti, 0:1] = zero_rows[:1]
        slab_ref[ti, hs + 1:hs + 3] = zero_rows
        x = x_ref[0, 0]  # (hs, 32, 128)
        for dw in range(4):
            # Output w reads input lane w + dw - 1.
            shifted = _lane_roll(x, 1 - dw, interpret)
            slab_ref[ti, 1:hs + 1, dw * _C_PAD:(dw + 1) * _C_PAD, :] = shifted

    w0 = w_ref[0]  # (64, 512)
    w1 = w_ref[1]
    bias = b_ref[...]        # (64, 128) fp32
    sel = s_ref[...]         # (128, 128) stride-2 selection
    c_out = bias.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, 128), 1)
    dn = (((1,), (0,)), ((), ()))

    # --- conv rows + width max into the ring --------------------------
    def conv_row(h, carry):
        p0 = slab_ref[0, pl.ds(h, 4)].reshape(4 * 4 * _C_PAD, 128)
        p1 = slab_ref[1, pl.ds(h, 4)].reshape(4 * 4 * _C_PAD, 128)
        acc = jax.lax.dot_general(w0, p0, dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(w1, p1, dn,
                                        preferred_element_type=jnp.float32)
        act = jnp.maximum(acc + bias, 0.0)
        # Zero the pad lanes (>= ws): they hold wrapped-tap garbage, and 0
        # is the pool's TF-'SAME' pad value for post-ReLU activations.
        act = jnp.where(lane < ws, act, 0.0)
        m = jnp.maximum(act, _lane_roll(act, -1, interpret))
        m = jnp.maximum(m, _lane_roll(act, -2, interpret))
        wmax_ref[h] = m.astype(wmax_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hs, conv_row, 0)
    wmax_ref[hs] = jnp.zeros((c_out, 128), wmax_ref.dtype)  # height pad row

    # --- height max + stride-2 lane selection ------------------------
    def pool_row(i, carry):
        hm = jnp.max(wmax_ref[pl.ds(2 * i, 3)], axis=0)  # (64, 128)
        out = jax.lax.dot_general(hm, sel, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0, i] = out[:, :ws // 2].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hs // 2, pool_row, 0)


def pack_stem_weights_v2(kernel: jnp.ndarray, bias: jnp.ndarray, dtype,
                         rows_per_iter: int = 2
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-batched weights for the v2 kernel (time-stacked slab).

    The v2 slab stacks BOTH time taps on the channel/sublane dim —
    slab[h, ti*128 + dw*32 + c] — so a conv row is ONE matmul with a
    1024-deep (dh, ti, dw, c) contraction, and R=rows_per_iter consecutive
    output rows batch into one (R*64, (R+3)*256) @ ((R+3)*256, 128) matmul:
    row block r reads the base weights at column offset r*256 (one slab-row
    stride), zeros elsewhere. Sublane occupancy goes 64 -> R*64 for a
    (R*256)/(R*64*4) = (R+3)/(4R) FLOP inflation (1.25x at R=2).
    """
    kt, kh, kw, c_in, c_out = kernel.shape
    k = jnp.pad(kernel.astype(jnp.float32),
                ((0, 0), (0, 0), (0, 0), (0, _C_PAD - c_in), (0, 0)))
    # contraction ordering (dh, ti, dw, c) to match slab[h:h+R+3].reshape
    base = k.transpose(1, 0, 2, 3, 4).reshape(kh * kt * kw * _C_PAD, c_out).T
    r = rows_per_iter
    cols = kh * kt * kw * _C_PAD  # 1024
    wide = jnp.zeros((r * c_out, (r + 3) * 256), jnp.float32)
    for i in range(r):
        wide = wide.at[i * c_out:(i + 1) * c_out,
                       i * 256:i * 256 + cols].set(base)
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                              (c_out, 128))
    bias_b = jnp.tile(bias_b, (r, 1))
    sel = jnp.zeros((128, 128), dtype).at[2 * jnp.arange(64),
                                          jnp.arange(64)].set(1)
    return wide.astype(dtype), bias_b, sel


def _stem_kernel_v2(x0_ref, x1_ref, w_ref, b_ref, s_ref, o_ref, slab_ref,
                    wmax_ref, *, hs: int, ws: int, rpi: int, pc: int,
                    interpret: bool):
    # --- tap slab: lane-rolled copies, BOTH time rows channel-stacked -----
    c_out = b_ref.shape[0] // rpi
    zero_rows = jnp.zeros((2, 2 * 4 * _C_PAD, 128), slab_ref.dtype)
    slab_ref[0:1] = zero_rows[:1]
    slab_ref[hs + 1:hs + 3] = zero_rows
    for ti, x_ref in enumerate((x0_ref, x1_ref)):
        x = x_ref[0, 0]  # (hs, 32, 128)
        for dw in range(4):
            shifted = _lane_roll(x, 1 - dw, interpret)
            base = ti * 4 * _C_PAD + dw * _C_PAD
            slab_ref[1:hs + 1, base:base + _C_PAD, :] = shifted

    w = w_ref[...]           # (rpi*64, (rpi+3)*256)
    bias = b_ref[...]        # (rpi*64, 128) fp32
    sel = s_ref[...]         # (128, 128) stride-2 selection
    lane = jax.lax.broadcasted_iota(jnp.int32, (rpi * c_out, 128), 1)
    dn = (((1,), (0,)), ((), ()))

    # --- conv rows (rpi at a time) + width max into the ring --------------
    def conv_rows(i, carry):
        h = i * rpi
        patch = slab_ref[pl.ds(h, rpi + 3)].reshape((rpi + 3) * 256, 128)
        acc = jax.lax.dot_general(w, patch, dn,
                                  preferred_element_type=jnp.float32)
        act = jnp.maximum(acc + bias, 0.0)
        act = jnp.where(lane < ws, act, 0.0)
        m = jnp.maximum(act, _lane_roll(act, -1, interpret))
        m = jnp.maximum(m, _lane_roll(act, -2, interpret))
        wmax_ref[pl.ds(h, rpi)] = m.reshape(rpi, c_out, 128).astype(
            wmax_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hs // rpi, conv_rows, 0)
    wmax_ref[hs] = jnp.zeros((c_out, 128), wmax_ref.dtype)  # height pad row

    # --- height max + stride-2 lane selection, pc pool rows per iter ------
    def pool_rows(i, carry):
        base = i * pc
        rows = wmax_ref[pl.ds(2 * base, 2 * pc + 1)]  # (2pc+1, 64, 128)
        m1 = jnp.maximum(rows[0:2 * pc], rows[1:2 * pc + 1])
        hm = m1.reshape(pc, 2, c_out, 128).max(axis=1)  # (pc, 64, 128)
        out = jax.lax.dot_general(hm.reshape(pc * c_out, 128), sel, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds(base, pc)] = out.reshape(
            pc, c_out, 128)[:, :, :ws // 2].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, (hs // 2) // pc, pool_rows, 0)


def pack_stem_weights_v3(kernel: jnp.ndarray, bias: jnp.ndarray, dtype,
                         rows_per_iter: int = 4
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-batched per-time-tap weights for the v3 kernel (persistent slab).

    v3 keeps the two time taps in SEPARATE slab slots (leading scratch dim,
    as v1) so a slot survives into the next grid step — step t reuses the
    row it wrote at step t-1 and copies only row t+1. A conv row block is
    then TWO matmuls (one per tap; the ti-block weights stay static while
    the slot index rotates) instead of v2's single 1024-deep one. Returns
    (wide (2, R*64, (R+3)*128), bias (R*64, 128) fp32, sel (128, 128))."""
    kt, kh, kw, c_in, c_out = kernel.shape
    k = jnp.pad(kernel.astype(jnp.float32),
                ((0, 0), (0, 0), (0, 0), (0, _C_PAD - c_in), (0, 0)))
    # per-tap base (c_out, kh*kw*_C_PAD): contraction order (dh, dw, c)
    base = k.reshape(kt, kh * kw * _C_PAD, c_out).transpose(0, 2, 1)
    r = rows_per_iter
    cols = kh * kw * _C_PAD  # 512
    wide = jnp.zeros((kt, r * c_out, (r + 3) * kw * _C_PAD), jnp.float32)
    for i in range(r):
        wide = wide.at[:, i * c_out:(i + 1) * c_out,
                       i * kw * _C_PAD:i * kw * _C_PAD + cols].set(base)
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                              (c_out, 128))
    bias_b = jnp.tile(bias_b, (r, 1))
    sel = jnp.zeros((128, 128), dtype).at[2 * jnp.arange(64),
                                          jnp.arange(64)].set(1)
    return wide.astype(dtype), bias_b, sel


def _stem_kernel_v3(x0_ref, x1_ref, w_ref, b_ref, s_ref, o_ref, slab_ref,
                    wmax_ref, *, hs: int, ws: int, rpi: int, pc: int,
                    interpret: bool):
    t = pl.program_id(1)
    c_out = b_ref.shape[0] // rpi
    row_c = 4 * _C_PAD  # 128 slab channels per (slot, h) row

    # --- persistent tap slab ----------------------------------------------
    # Slot p holds time row r with r % 2 == p. Step t needs rows t (written
    # by step t-1, or here when t == 0) and t+1 (written now). Zero h-pad
    # rows are written once per clip and never overwritten.
    @pl.when(t == 0)
    def _():
        zero_rows = jnp.zeros((2, row_c, 128), slab_ref.dtype)
        for ti in range(2):
            slab_ref[ti, 0:1] = zero_rows[:1]
            slab_ref[ti, hs + 1:hs + 3] = zero_rows
        x = x0_ref[0, 0]
        for dw in range(4):
            slab_ref[0, 1:hs + 1, dw * _C_PAD:(dw + 1) * _C_PAD, :] = (
                _lane_roll(x, 1 - dw, interpret))

    slot_new = (t + 1) % 2
    x = x1_ref[0, 0]
    for dw in range(4):
        shifted = _lane_roll(x, 1 - dw, interpret)
        slab_ref[slot_new, 1:hs + 1,
                 pl.ds(dw * _C_PAD, _C_PAD), :] = shifted

    wa = w_ref[0]            # (rpi*64, (rpi+3)*128) — the row-t tap
    wb = w_ref[1]            # the row-(t+1) tap
    bias = b_ref[...]        # (rpi*64, 128) fp32
    sel = s_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rpi * c_out, 128), 1)
    dn = (((1,), (0,)), ((), ()))
    slot_a = t % 2

    # --- conv rows (rpi at a time) + width max into the ring --------------
    def conv_rows(i, carry):
        h = i * rpi
        pa = slab_ref[slot_a, pl.ds(h, rpi + 3)].reshape((rpi + 3) * row_c, 128)
        pb = slab_ref[slot_new, pl.ds(h, rpi + 3)].reshape((rpi + 3) * row_c, 128)
        acc = jax.lax.dot_general(wa, pa, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(wb, pb, dn,
                                        preferred_element_type=jnp.float32)
        act = jnp.maximum(acc + bias, 0.0)
        act = jnp.where(lane < ws, act, 0.0)
        m = jnp.maximum(act, _lane_roll(act, -1, interpret))
        m = jnp.maximum(m, _lane_roll(act, -2, interpret))
        wmax_ref[pl.ds(h, rpi)] = m.reshape(rpi, c_out, 128).astype(
            wmax_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hs // rpi, conv_rows, 0)
    wmax_ref[hs] = jnp.zeros((c_out, 128), wmax_ref.dtype)  # height pad row

    # --- height max + stride-2 lane selection, pc pool rows per iter ------
    def pool_rows(i, carry):
        base = i * pc
        rows = wmax_ref[pl.ds(2 * base, 2 * pc + 1)]  # (2pc+1, 64, 128)
        m1 = jnp.maximum(rows[0:2 * pc], rows[1:2 * pc + 1])
        hm = m1.reshape(pc, 2, c_out, 128).max(axis=1)  # (pc, 64, 128)
        out = jax.lax.dot_general(hm.reshape(pc * c_out, 128), sel, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds(base, pc)] = out.reshape(
            pc, c_out, 128)[:, :, :ws // 2].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, (hs // 2) // pc, pool_rows, 0)


def pack_stem_weights_v4(kernel: jnp.ndarray, bias: jnp.ndarray, dtype,
                         rows_per_iter: int = 4
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v3's per-tap row-batched weights, with the 32 slab channels per dw
    ordered ((t2*2 + h2) * 8 + w2*C + c) to match the v4 kernel's aligned
    8-sublane (t2, h2) piece stores (j rows 2C..8 are zero, mirroring the
    zero lane groups `s2d_rows` emits)."""
    kt, kh, kw, c_in, c_out = kernel.shape
    c = c_in // 8  # s2d channel order (t2, h2, w2, c) with C = c_in/8
    k = kernel.astype(jnp.float32).reshape(kt, kh, kw, 2, 2, 2 * c, c_out)
    k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 0),
                    (0, 8 - 2 * c), (0, 0)))
    k = k.reshape(kt, kh, kw, _C_PAD, c_out)
    base = k.reshape(kt, kh * kw * _C_PAD, c_out).transpose(0, 2, 1)
    r = rows_per_iter
    cols = kh * kw * _C_PAD  # 512
    wide = jnp.zeros((kt, r * c_out, (r + 3) * kw * _C_PAD), jnp.float32)
    for i in range(r):
        wide = wide.at[:, i * c_out:(i + 1) * c_out,
                       i * kw * _C_PAD:i * kw * _C_PAD + cols].set(base)
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32)[:, None],
                              (c_out, 128))
    bias_b = jnp.tile(bias_b, (r, 1))
    sel = jnp.zeros((128, 128), dtype).at[2 * jnp.arange(64),
                                          jnp.arange(64)].set(1)
    return wide.astype(dtype), bias_b, sel


def _stem_kernel_v4(x0_ref, x1_ref, w_ref, b_ref, s_ref, o_ref, slab_ref,
                    wmax_ref, *, hs: int, ws: int, ts: int, rpi: int,
                    pc: int, interpret: bool):
    t = pl.program_id(1)
    c_out = b_ref.shape[0] // rpi
    row_c = 4 * _C_PAD

    def fill_slot(slot, x_ref):
        # x block (1, 2, hs, 2048): each frame (t2) contributes a 16-sublane
        # (h2*8 + j) piece — a full bf16 tile, so the 8 rolled stores are
        # all tile-aligned. (8-sublane pieces needed masked half-tile writes
        # or an in-register concat — both measured ~1.4 ms/call slower.)
        for t2 in range(2):
            src = x_ref[0, t2].reshape(hs, 16, 128)
            for dw in range(4):
                off = dw * _C_PAD + t2 * 16
                slab_ref[slot, 1:hs + 1, off:off + 16, :] = (
                    _lane_roll(src, 1 - dw, interpret))

    @pl.when(t == 0)
    def _():
        zero_rows = jnp.zeros((2, row_c, 128), slab_ref.dtype)
        for ti in range(2):
            slab_ref[ti, 0:1] = zero_rows[:1]
            slab_ref[ti, hs + 1:hs + 3] = zero_rows
        fill_slot(0, x0_ref)

    slot_new = (t + 1) % 2

    @pl.when(t < ts - 1)
    def _():
        fill_slot(slot_new, x1_ref)

    @pl.when(t == ts - 1)
    def _():
        # The t+1 tap past the clip end is the conv's zero time padding
        # (s2d_transpose carried an explicit zero row for v2/v3).
        slab_ref[slot_new, 1:hs + 1] = jnp.zeros((hs, row_c, 128),
                                                 slab_ref.dtype)

    wa = w_ref[0]
    wb = w_ref[1]
    bias = b_ref[...]
    sel = s_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rpi * c_out, 128), 1)
    dn = (((1,), (0,)), ((), ()))
    slot_a = t % 2

    def conv_rows(i, carry):
        h = i * rpi
        pa = slab_ref[slot_a, pl.ds(h, rpi + 3)].reshape((rpi + 3) * row_c, 128)
        pb = slab_ref[slot_new, pl.ds(h, rpi + 3)].reshape((rpi + 3) * row_c, 128)
        acc = jax.lax.dot_general(wa, pa, dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(wb, pb, dn,
                                        preferred_element_type=jnp.float32)
        act = jnp.maximum(acc + bias, 0.0)
        act = jnp.where(lane < ws, act, 0.0)
        m = jnp.maximum(act, _lane_roll(act, -1, interpret))
        m = jnp.maximum(m, _lane_roll(act, -2, interpret))
        wmax_ref[pl.ds(h, rpi)] = m.reshape(rpi, c_out, 128).astype(
            wmax_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hs // rpi, conv_rows, 0)
    wmax_ref[hs] = jnp.zeros((c_out, 128), wmax_ref.dtype)

    def pool_rows(i, carry):
        base = i * pc
        rows = wmax_ref[pl.ds(2 * base, 2 * pc + 1)]
        m1 = jnp.maximum(rows[0:2 * pc], rows[1:2 * pc + 1])
        hm = m1.reshape(pc, 2, c_out, 128).max(axis=1)
        out = jax.lax.dot_general(hm.reshape(pc * c_out, 128), sel, dn,
                                  preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds(base, pc)] = out.reshape(
            pc, c_out, 128)[:, :, :ws // 2].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, (hs // 2) // pc, pool_rows, 0)


def s3dg_stem_conv_v4(x: jnp.ndarray, wide: jnp.ndarray, bias_b: jnp.ndarray,
                      sel: jnp.ndarray, ws: int,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """v4: v3's persistent slab fed straight from `s2d_rows` output —
    measured NEGATIVE on v5e, kept as a numerics-pinned ablation arm.

    The idea was to drop the XLA-side pad/transpose relayouts by having the
    kernel gather the de-interleaved frame pieces itself. Three layouts all
    lost to v3's producer+kernel split (4.57 ms full path, batch 16x16f):
    8-sublane piece stores = masked half-tile writes (kernel 2.91 -> 4.98
    ms); in-register concat then full-tile stores (4.31); 16-sublane pieces
    via an (h2, wc)-contracting selection matmul = aligned stores (3.50)
    but the doubled-depth matmul producer runs at ~50 TFLOP/s instead of
    ~180 (3.21 vs 0.44 ms) — full path 6.75 ms. The conclusion: Mosaic
    wants full-tile stores AND the producer matmul wants a single minor-dim
    contraction; v3's explicit relayout is cheaper than avoiding it."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_raw, hs, lanes = x.shape
    ts = t_raw // 2
    assert lanes == 16 * 128 and ws <= 126
    assert hs % 2 == 0 and ws % 2 == 0
    rpi = wide.shape[2] // (4 * _C_PAD) - 3
    c_out = wide.shape[1] // rpi
    assert hs % rpi == 0, (hs, rpi)
    pc = next(p for p in (8, 4, 2, 1) if (hs // 2) % p == 0)
    kernel = functools.partial(_stem_kernel_v4, hs=hs, ws=ws, ts=ts, rpi=rpi,
                               pc=pc, interpret=interpret)
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b, ts),
        in_specs=[
            pl.BlockSpec((1, 2, hs, 16 * 128),
                         lambda i, t: (i, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((1, 2, hs, 16 * 128),
                         lambda i, t: (i, jnp.minimum(t + 1, ts - 1), 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(wide.shape, lambda i, t: (0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(bias_b.shape, lambda i, t: (0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((128, 128), lambda i, t: (0, 0),
                         memory_space=memory_space),
        ],
        out_specs=pl.BlockSpec((1, 1, hs // 2, c_out, ws // 2),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((b, ts, hs // 2, c_out, ws // 2),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((2, hs + 3, 4 * _C_PAD, 128), x.dtype),
                        pltpu.VMEM((hs + 1, c_out, 128), x.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x, x, wide, bias_b, sel)


def s3dg_stem_conv_v3(x: jnp.ndarray, wide: jnp.ndarray, bias_b: jnp.ndarray,
                      sel: jnp.ndarray, ws: int,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """v3 of s3dg_stem_conv: persistent two-slot slab — each grid step
    lane-rolls only the NEW time row (4 copies instead of 8) and fetches
    only that row from HBM (the t tap was written by step t-1). Same
    contract as v1/v2; `wide` comes from pack_stem_weights_v3."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ts1, hs, c_pad, lanes = x.shape
    ts = ts1 - 1
    assert c_pad == _C_PAD and lanes == 128 and ws <= 126
    assert hs % 2 == 0 and ws % 2 == 0
    rpi = wide.shape[2] // (4 * _C_PAD) - 3
    c_out = wide.shape[1] // rpi
    assert hs % rpi == 0, (hs, rpi)
    pc = next(p for p in (8, 4, 2, 1) if (hs // 2) % p == 0)
    kernel = functools.partial(_stem_kernel_v3, hs=hs, ws=ws, rpi=rpi, pc=pc,
                               interpret=interpret)
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b, ts),
        in_specs=[
            # Row 0 only (read at t == 0): constant-in-t index map, so the
            # block is fetched once per clip instead of per step.
            pl.BlockSpec((1, 1, hs, c_pad, 128), lambda i, t: (i, 0, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((1, 1, hs, c_pad, 128),
                         lambda i, t: (i, t + 1, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(wide.shape, lambda i, t: (0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(bias_b.shape, lambda i, t: (0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((128, 128), lambda i, t: (0, 0),
                         memory_space=memory_space),
        ],
        out_specs=pl.BlockSpec((1, 1, hs // 2, c_out, ws // 2),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((b, ts, hs // 2, c_out, ws // 2),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((2, hs + 3, 4 * _C_PAD, 128), x.dtype),
                        pltpu.VMEM((hs + 1, c_out, 128), x.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x, x, wide, bias_b, sel)


def s3dg_stem_conv_v2(x: jnp.ndarray, wide: jnp.ndarray, bias_b: jnp.ndarray,
                      sel: jnp.ndarray, ws: int,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """v2 of s3dg_stem_conv: same contract, time-stacked slab + row-batched
    matmuls + chunked pooling. `wide`/`bias_b` come from
    pack_stem_weights_v2; rows_per_iter is recovered from their shapes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ts1, hs, c_pad, lanes = x.shape
    ts = ts1 - 1
    assert c_pad == _C_PAD and lanes == 128 and ws <= 126
    assert hs % 2 == 0 and ws % 2 == 0
    rpi = wide.shape[1] // 256 - 3
    c_out = wide.shape[0] // rpi
    assert hs % rpi == 0, (hs, rpi)
    pc = next(p for p in (8, 4, 2, 1) if (hs // 2) % p == 0)
    kernel = functools.partial(_stem_kernel_v2, hs=hs, ws=ws, rpi=rpi, pc=pc,
                               interpret=interpret)
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b, ts),
        in_specs=[
            pl.BlockSpec((1, 1, hs, c_pad, 128), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((1, 1, hs, c_pad, 128),
                         lambda i, t: (i, t + 1, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(wide.shape, lambda i, t: (0, 0),
                         memory_space=memory_space),
            pl.BlockSpec(bias_b.shape, lambda i, t: (0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((128, 128), lambda i, t: (0, 0),
                         memory_space=memory_space),
        ],
        out_specs=pl.BlockSpec((1, 1, hs // 2, c_out, ws // 2),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((b, ts, hs // 2, c_out, ws // 2),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((hs + 3, 2 * 4 * _C_PAD, 128), x.dtype),
                        pltpu.VMEM((hs + 1, c_out, 128), x.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x, x, wide, bias_b, sel)


def s3dg_stem_conv(x: jnp.ndarray, w2: jnp.ndarray, bias_b: jnp.ndarray,
                   sel: jnp.ndarray, ws: int,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """x: s2d_transpose output (B, Ts+1, Hs, 32, 128); ws = W/2 (the valid
    lane count). Returns the stem's pooled ReLU(conv+bias) as
    (B, Ts, Hs/2, 64, Ws/2) with channels on sublanes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ts1, hs, c_pad, lanes = x.shape
    ts = ts1 - 1
    assert c_pad == _C_PAD and lanes == 128 and ws <= 126
    assert hs % 2 == 0 and ws % 2 == 0
    c_out = w2.shape[1]
    kernel = functools.partial(_stem_kernel, hs=hs, ws=ws, interpret=interpret)
    memory_space = pltpu.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(b, ts),
        in_specs=[
            pl.BlockSpec((1, 1, hs, c_pad, 128), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((1, 1, hs, c_pad, 128),
                         lambda i, t: (i, t + 1, 0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((2, c_out, 4 * 4 * _C_PAD), lambda i, t: (0, 0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((c_out, 128), lambda i, t: (0, 0),
                         memory_space=memory_space),
            pl.BlockSpec((128, 128), lambda i, t: (0, 0),
                         memory_space=memory_space),
        ],
        out_specs=pl.BlockSpec((1, 1, hs // 2, c_out, ws // 2),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=memory_space),
        out_shape=jax.ShapeDtypeStruct((b, ts, hs // 2, c_out, ws // 2),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((2, hs + 3, 4 * _C_PAD, 128), x.dtype),
                        pltpu.VMEM((hs + 1, c_out, 128), x.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(x, x, w2, bias_b, sel)
