"""Pallas TPU deblocking kernel (spec 8.7) — the hot-path implementation.

Split insight: boundary strengths, alpha/beta thresholds, and tc0 depend
only on CODING data (intra flags, nz, MVs, QPs) — never on pixels — so they
are precomputed for every edge of the frame in one vectorized XLA pass
(ops.deblock.deblock_tables).  The Pallas kernel performs only pixel
filtering, with the frame planes resident in VMEM, walking MBs in RASTER
order (the exact spec-serial order — a sequential kernel needs no wavefront
schedule), one grid step per MB row.

Mosaic on this platform only allows ALIGNED dynamic slices (sublanes %8,
lanes %128), so each MB loads an aligned 256-lane working tile, normalizes
it with a dynamic lane roll, filters all 8 edges at STATIC in-tile offsets
through a VMEM scratch, rolls back, and stores.  All per-MB scalar metadata
(bS / tc0 / alpha / beta) is packed into ONE [mb_h, mb_w, 128] SMEM array
so each fetch is a direct [0, mbx, field] read (no div/mod address math —
the scalar core's divide is the single biggest per-MB cost otherwise).

Bit-exact vs oracle.deblock: same integer formulas, same MB-serial order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LPAD = 8  # left/top origin shift (keeps MB origins 8-aligned in sublanes)


def _seg_col(vals4, reps: int):
    """4 traced scalars -> [4*reps, 1] column (per-segment broadcast)."""
    si = jax.lax.broadcasted_iota(jnp.int32, (4 * reps, 1), 0) // reps
    return jnp.where(si == 0, vals4[0],
                     jnp.where(si == 1, vals4[1],
                               jnp.where(si == 2, vals4[2], vals4[3])))


def _seg_row(vals4, reps: int):
    si = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * reps), 1) // reps
    return jnp.where(si == 0, vals4[0],
                     jnp.where(si == 1, vals4[1],
                               jnp.where(si == 2, vals4[2], vals4[3])))


def _place_cols(win, repl):
    """win [r, c]; repl: {col_index: [r, 1] values} -> new [r, c]."""
    ci = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    out = win
    for k, v in repl.items():
        out = jnp.where(ci == k, v, out)
    return out


def _place_rows(win, repl):
    ri = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    out = win
    for k, v in repl.items():
        out = jnp.where(ri == k, v, out)
    return out


def _filter_luma_cols(win, bs, tc0, alpha, beta):
    """win [16, 8] int32 (cols p3..p0 q0..q3); bs/tc0 [16,1]; a/b scalars."""
    c = lambda k: win[:, k:k + 1]
    p3, p2, p1, p0 = c(0), c(1), c(2), c(3)
    q0, q1, q2, q3 = c(4), c(5), c(6), c(7)
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np1_w = jnp.where(ap, p1 + jnp.clip(
        (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0), p1)
    nq1_w = jnp.where(aq, q1 + jnp.clip(
        (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0), q1)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp_ = strong & ap
    np0_s = jnp.where(sp_, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                      (2 * p1 + p0 + q1 + 2) >> 2)
    np1_s = jnp.where(sp_, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    np2_s = jnp.where(sp_, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq_ = strong & aq
    nq0_s = jnp.where(sq_, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                      (2 * q1 + q0 + p1 + 2) >> 2)
    nq1_s = jnp.where(sq_, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    nq2_s = jnp.where(sq_, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    np0 = jnp.where(filt, jnp.where(is4, np0_s, np0_w), p0)
    np1 = jnp.where(filt, jnp.where(is4, np1_s, np1_w), p1)
    np2 = jnp.where(filt & is4, np2_s, p2)
    nq0 = jnp.where(filt, jnp.where(is4, nq0_s, nq0_w), q0)
    nq1 = jnp.where(filt, jnp.where(is4, nq1_s, nq1_w), q1)
    nq2 = jnp.where(filt & is4, nq2_s, q2)
    return _place_cols(win, {1: np2, 2: np1, 3: np0, 4: nq0, 5: nq1, 6: nq2})


def _filter_luma_rows16(win, bs, tc0, alpha, beta):
    """win [8, 16] int32 (rows p3..p0 q0..q3); bs/tc0 [1,16]; a/b scalars."""
    r = lambda k: win[k:k + 1, :]
    p3, p2, p1, p0 = r(0), r(1), r(2), r(3)
    q0, q1, q2, q3 = r(4), r(5), r(6), r(7)
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np1_w = jnp.where(ap, p1 + jnp.clip(
        (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0), p1)
    nq1_w = jnp.where(aq, q1 + jnp.clip(
        (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0), q1)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp_ = strong & ap
    np0_s = jnp.where(sp_, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                      (2 * p1 + p0 + q1 + 2) >> 2)
    np1_s = jnp.where(sp_, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    np2_s = jnp.where(sp_, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq_ = strong & aq
    nq0_s = jnp.where(sq_, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                      (2 * q1 + q0 + p1 + 2) >> 2)
    nq1_s = jnp.where(sq_, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    nq2_s = jnp.where(sq_, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    np0 = jnp.where(filt, jnp.where(is4, np0_s, np0_w), p0)
    np1 = jnp.where(filt, jnp.where(is4, np1_s, np1_w), p1)
    np2 = jnp.where(filt & is4, np2_s, p2)
    nq0 = jnp.where(filt, jnp.where(is4, nq0_s, nq0_w), q0)
    nq1 = jnp.where(filt, jnp.where(is4, nq1_s, nq1_w), q1)
    nq2 = jnp.where(filt & is4, nq2_s, q2)
    return _place_rows(win, {1: np2, 2: np1, 3: np0, 4: nq0, 5: nq1, 6: nq2})


def _filter_chroma_cols(win, bs, tc0, alpha, beta):
    """win [8, 4] (cols p1 p0 q0 q1); bs/tc0 [8,1]."""
    c = lambda k: win[:, k:k + 1]
    p1, p0, q0, q1 = c(0), c(1), c(2), c(3)
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np0_s = (2 * p1 + p0 + q1 + 2) >> 2
    nq0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    np0 = jnp.where(filt, jnp.where(is4, np0_s, np0_w), p0)
    nq0 = jnp.where(filt, jnp.where(is4, nq0_s, nq0_w), q0)
    return _place_cols(win, {1: np0, 2: nq0})


def _filter_chroma_rows(win, bs, tc0, alpha, beta):
    """win [4, 8] (rows p1 p0 q0 q1); bs/tc0 [1,8]."""
    r = lambda k: win[k:k + 1, :]
    p1, p0, q0, q1 = r(0), r(1), r(2), r(3)
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np0_s = (2 * p1 + p0 + q1 + 2) >> 2
    nq0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    np0 = jnp.where(filt, jnp.where(is4, np0_s, np0_w), p0)
    nq0 = jnp.where(filt, jnp.where(is4, nq0_s, nq0_w), q0)
    return _place_rows(win, {1: np0, 2: nq0})


# luma SMEM field layout (one [mb_h, mb_w, 128] int32 array):
#   bs_v  e*4+s -> 0..15     tc_v 16..31    a_v 32..35    b_v 36..39
#   bs_h        -> 40..55    tc_h 56..71    a_h 72..75    b_h 76..79
# chroma (per plane):
#   bs_c d*8+e*4+s -> 0..15  tc_c 16..31 (d*8+e*4+s)  a_c 32..35  b_c 36..39
#   (d = 0 vertical, 1 horizontal; e = edge; s = 4-row/col segment)


def _luma_kernel(md_ref, y_in, out_ref, scratch, *, mb_w: int):
    mby = pl.program_id(0)
    ty = pl.multiple_of(mby * 16, 16)          # tile top (= y0 - 8)

    @pl.when(mby == 0)
    def _():
        # seed the output plane (kernels update MBs in place; explicit copy
        # instead of input_output_aliases, which miscompiles when fused
        # with large upstream graphs on this platform)
        out_ref[:, :] = y_in[:, :]

    def body(mbx, _):
        x0 = mbx * 16 + LPAD                   # MB left in padded plane
        ax = pl.multiple_of(((x0 - 4) // 128) * 128, 128)
        off = x0 - 4 - ax                      # 0..127, multiple of 4
        tile = out_ref[pl.ds(ty, 32), pl.ds(ax, 256)].astype(jnp.int32)
        scratch[:, :] = pltpu.roll(tile, -off, 1)
        # window geometry (static): MB rows = scratch rows 8..24,
        # window col c == absolute x0 - 4 + c
        for e in range(4):  # vertical edges, left to right
            win = scratch[8:24, 4 * e:4 * e + 8]
            bs = _seg_col([md_ref[0, mbx, e * 4 + s] for s in range(4)], 4)
            tc = _seg_col([md_ref[0, mbx, 16 + e * 4 + s]
                           for s in range(4)], 4)
            f = _filter_luma_cols(win, bs, tc, md_ref[0, mbx, 32 + e],
                                  md_ref[0, mbx, 36 + e])
            scratch[8:24, 4 * e:4 * e + 8] = f
        for e in range(4):  # horizontal edges, top to bottom
            win = scratch[4 + 4 * e:12 + 4 * e, 4:20]
            bs = _seg_row([md_ref[0, mbx, 40 + e * 4 + s]
                           for s in range(4)], 4)
            tc = _seg_row([md_ref[0, mbx, 56 + e * 4 + s]
                           for s in range(4)], 4)
            f = _filter_luma_rows16(win, bs, tc, md_ref[0, mbx, 72 + e],
                                    md_ref[0, mbx, 76 + e])
            scratch[4 + 4 * e:12 + 4 * e, 4:20] = f
        out_ref[pl.ds(ty, 32), pl.ds(ax, 256)] = \
            pltpu.roll(scratch[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, mb_w, body, 0)


def _chroma_kernel(md_ref, c_in, out_ref, scratch, *, mb_w: int):
    mby = pl.program_id(0)
    ty = pl.multiple_of(mby * 8, 8)            # tile top (= y0 - 8)

    @pl.when(mby == 0)
    def _():
        out_ref[:, :] = c_in[:, :]

    def body(mbx, _):
        x0 = mbx * 8 + LPAD
        ax = pl.multiple_of(((x0 - 2) // 128) * 128, 128)
        off = x0 - 2 - ax
        tile = out_ref[pl.ds(ty, 24), pl.ds(ax, 256)].astype(jnp.int32)
        scratch[:, :] = pltpu.roll(tile, -off, 1)
        # MB rows = scratch rows 8..16; window col c == x0 - 2 + c
        for e in range(2):  # vertical chroma edges (luma edges 0, 8)
            win = scratch[8:16, 4 * e:4 * e + 4]
            bs = _seg_col([md_ref[0, mbx, e * 4 + s] for s in range(4)], 2)
            tc = _seg_col([md_ref[0, mbx, 16 + e * 4 + s]
                           for s in range(4)], 2)
            f = _filter_chroma_cols(win, bs, tc, md_ref[0, mbx, 32 + e],
                                    md_ref[0, mbx, 36 + e])
            scratch[8:16, 4 * e:4 * e + 4] = f
        for e in range(2):
            win = scratch[6 + 4 * e:10 + 4 * e, 2:10]
            bs = _seg_row([md_ref[0, mbx, 8 + e * 4 + s] for s in range(4)], 2)
            tc = _seg_row([md_ref[0, mbx, 24 + e * 4 + s]
                           for s in range(4)], 2)
            f = _filter_chroma_rows(win, bs, tc, md_ref[0, mbx, 34 + e],
                                    md_ref[0, mbx, 38 + e])
            scratch[6 + 4 * e:10 + 4 * e, 2:10] = f
        out_ref[pl.ds(ty, 24), pl.ds(ax, 256)] = \
            pltpu.roll(scratch[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, mb_w, body, 0)


def _pad_plane(p, h_pad: int, w_align: int):
    """Pad to [LPAD + H + h_pad, ceil((W + 2*LPAD)/128)*128 + w_align]."""
    H, W = p.shape
    Wp = ((W + 2 * LPAD + 127) // 128) * 128 + w_align
    return jnp.pad(p.astype(jnp.int16),
                   ((LPAD, h_pad), (LPAD, Wp - W - LPAD)))


def _pack_md(fields, mb_w: int, mb_h: int):
    """Concat per-MB fields into ONE [mb_h, mb_w8, 128] int32 SMEM array."""
    n = mb_w * mb_h
    cols = jnp.concatenate(
        [f.reshape(n, -1).astype(jnp.int32) for f in fields], axis=1)
    w8 = -(-mb_w // 8) * 8
    md = jnp.pad(cols, ((0, 0), (0, 128 - cols.shape[1])))
    md = md.reshape(mb_h, mb_w, 128)
    return jnp.pad(md, ((0, 0), (0, w8 - mb_w), (0, 0)))


def deblock_pallas(y, cb, cr, tables, mb_w: int, mb_h: int):
    """Run the raster-order deblock kernels.  y [H, W] int32 planes (in),
    tables from ops.deblock.deblock_tables.  Returns filtered planes."""
    H, W = mb_h * 16, mb_w * 16
    interp = jax.default_backend() == "cpu"  # interpret mode off-TPU

    def smem_spec(a):
        return pl.BlockSpec((1, a.shape[1], 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    md_y = _pack_md((tables["bs_v"], tables["tc_v"], tables["a_v"],
                     tables["b_v"], tables["bs_h"], tables["tc_h"],
                     tables["a_h"], tables["b_h"]), mb_w, mb_h)
    yp = _pad_plane(y, 16, 256)
    yf = pl.pallas_call(
        functools.partial(_luma_kernel, mb_w=mb_w),
        out_shape=jax.ShapeDtypeStruct(yp.shape, jnp.int16),
        grid=(mb_h,),
        in_specs=[smem_spec(md_y), vmem],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((32, 256), jnp.int32)],
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(md_y, yp)
    y_out = yf[LPAD:LPAD + H, LPAD:LPAD + W].astype(jnp.int32)

    outs_c = []
    for plane_idx, plane in ((0, cb), (1, cr)):
        md_c = _pack_md((tables["bs_c"], tables["tc_c"][..., plane_idx],
                         tables["a_c"][..., plane_idx],
                         tables["b_c"][..., plane_idx]), mb_w, mb_h)
        cp = _pad_plane(plane, 16, 256)
        cf = pl.pallas_call(
            functools.partial(_chroma_kernel, mb_w=mb_w),
            out_shape=jax.ShapeDtypeStruct(cp.shape, jnp.int16),
            grid=(mb_h,),
            in_specs=[smem_spec(md_c), vmem],
            out_specs=vmem,
            scratch_shapes=[pltpu.VMEM((24, 256), jnp.int32)],
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(md_c, cp)
        outs_c.append(cf[LPAD:LPAD + H // 2,
                         LPAD:LPAD + W // 2].astype(jnp.int32))
    return y_out, outs_c[0], outs_c[1]
