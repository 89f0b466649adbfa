"""Pallas TPU deblocking kernel (spec 8.7) — the hot-path implementation.

Split insight: boundary strengths, alpha/beta thresholds, and tc0 depend
only on CODING data (intra flags, nz, MVs, QPs) — never on pixels — so they
are precomputed for every edge of the frame in one vectorized XLA pass
(ops.deblock.deblock_tables).  The Pallas kernel performs only pixel
filtering, with the frame planes resident in VMEM and the knight-move
wavefront as a sequential grid dimension (zero per-phase launch overhead).

Mosaic on this platform only allows ALIGNED dynamic slices (sublanes %8,
lanes %128), so each MB loads an aligned 256-lane working tile, normalizes
it with a dynamic lane roll, filters all 8 edges at STATIC in-tile offsets
through a VMEM scratch, rolls back, and stores.  Per-MB scalar metadata
(bS / tc0 / alpha / beta) is delivered through per-phase SMEM blocks.

Bit-exact vs oracle.deblock: same integer formulas, same MB-serial order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intra import build_schedule

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


def _sm(ref, f):
    """Scalar fetch from a [1, k, 128]-blocked SMEM ref at flat index f."""
    return ref[0, f // 128, f % 128]


def _luma_kernel(idx_ref, bsv_ref, tcv_ref, av_ref, bv_ref,
                 bsh_ref, tch_ref, ah_ref, bh_ref, y_in, out_ref, scratch,
                 *, mb_w: int, pmax: int):
    def body(p, _):
        idx = _sm(idx_ref, p)

        @pl.when(idx >= 0)
        def _():
            mbx = idx % mb_w
            mby = idx // mb_w
            x0 = mbx * 16 + LPAD              # MB left in padded plane
            ty = pl.multiple_of(mby * 16, 16)  # tile top (= y0 - 8)
            ax = pl.multiple_of(((x0 - 4) // 128) * 128, 128)
            off = x0 - 4 - ax                  # 0..127, multiple of 4
            tile = out_ref[pl.ds(ty, 32), pl.ds(ax, 256)].astype(jnp.int32)
            scratch[:, :] = pltpu.roll(tile, -off, 1)
            # window geometry (static): MB rows = scratch rows 8..24,
            # window col c == absolute x0 - 4 + c
            for e in range(4):  # vertical edges, left to right
                win = scratch[8:24, 4 * e:4 * e + 8]
                base = p * 16 + e * 4
                bs = _seg_col([_sm(bsv_ref, base + s) for s in range(4)], 4)
                tc = _seg_col([_sm(tcv_ref, base + s) for s in range(4)], 4)
                f = _filter_luma_cols(win, bs, tc, _sm(av_ref, p * 4 + e),
                                      _sm(bv_ref, p * 4 + e))
                scratch[8:24, 4 * e:4 * e + 8] = f
            for e in range(4):  # horizontal edges, top to bottom
                win = scratch[4 + 4 * e:12 + 4 * e, 4:20]
                base = p * 16 + e * 4
                bs = _seg_row([_sm(bsh_ref, base + s) for s in range(4)], 4)
                tc = _seg_row([_sm(tch_ref, base + s) for s in range(4)], 4)
                f = _filter_luma_rows16(win, bs, tc, _sm(ah_ref, p * 4 + e),
                                        _sm(bh_ref, p * 4 + e))
                scratch[4 + 4 * e:12 + 4 * e, 4:20] = f
            out_ref[pl.ds(ty, 32), pl.ds(ax, 256)] = \
                pltpu.roll(scratch[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, pmax, body, 0)


def _chroma_kernel(idx_ref, bsc_ref, tcc_ref, ac_ref, bc_ref,
                   c_in, out_ref, scratch, *, mb_w: int, pmax: int,
                   plane: int):
    def body(p, _):
        idx = _sm(idx_ref, p)

        @pl.when(idx >= 0)
        def _():
            mbx = idx % mb_w
            mby = idx // mb_w
            x0 = mbx * 8 + LPAD
            ty = pl.multiple_of(mby * 8, 8)    # tile top (= y0 - 8)
            ax = pl.multiple_of(((x0 - 2) // 128) * 128, 128)
            off = x0 - 2 - ax
            tile = out_ref[pl.ds(ty, 24), pl.ds(ax, 256)].astype(jnp.int32)
            scratch[:, :] = pltpu.roll(tile, -off, 1)
            # MB rows = scratch rows 8..16; window col c == x0 - 2 + c
            # flat strides: bs_c (p,d,e,s): p*16 + d*8 + e*4 + s
            # tc_c (p,d,e,s,pl): p*32 + d*16 + e*8 + s*2 + pl
            # a/b_c (p,d,e,pl): p*8 + d*4 + e*2 + pl
            for e in range(2):  # vertical chroma edges (luma edges 0, 8)
                win = scratch[8:16, 4 * e:4 * e + 4]
                bs = _seg_col([_sm(bsc_ref, p * 16 + e * 4 + s)
                               for s in range(4)], 2)
                tc = _seg_col([_sm(tcc_ref, p * 32 + e * 8 + s * 2 + plane)
                               for s in range(4)], 2)
                f = _filter_chroma_cols(win, bs, tc,
                                        _sm(ac_ref, p * 8 + e * 2 + plane),
                                        _sm(bc_ref, p * 8 + e * 2 + plane))
                scratch[8:16, 4 * e:4 * e + 4] = f
            for e in range(2):
                win = scratch[6 + 4 * e:10 + 4 * e, 2:10]
                bs = _seg_row([_sm(bsc_ref, p * 16 + 8 + e * 4 + s)
                               for s in range(4)], 2)
                tc = _seg_row([_sm(tcc_ref, p * 32 + 16 + e * 8 + s * 2 + plane)
                               for s in range(4)], 2)
                f = _filter_chroma_rows(win, bs, tc,
                                        _sm(ac_ref, p * 8 + 4 + e * 2 + plane),
                                        _sm(bc_ref, p * 8 + 4 + e * 2 + plane))
                scratch[6 + 4 * e:10 + 4 * e, 2:10] = f
            out_ref[pl.ds(ty, 24), pl.ds(ax, 256)] = \
                pltpu.roll(scratch[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, pmax, body, 0)


def _pad_plane(p, h_pad: int, w_align: int):
    """Pad to [LPAD + H + h_pad, ceil((W + 2*LPAD)/128)*128 + w_align]."""
    H, W = p.shape
    Wp = ((W + 2 * LPAD + 127) // 128) * 128 + w_align
    return jnp.pad(p.astype(jnp.int16),
                   ((LPAD, h_pad), (LPAD, Wp - W - LPAD)))


def deblock_pallas(y, cb, cr, tables, mb_w: int, mb_h: int):
    """Run the wavefront deblock kernels.  y [H, W] int32 planes (in),
    tables from ops.deblock.deblock_tables.  Returns filtered planes."""
    H, W = mb_h * 16, mb_w * 16
    mb_idx, active = build_schedule(mb_w, mb_h)
    F, P = mb_idx.shape
    idx = jnp.where(active, mb_idx, -1).astype(jnp.int32)
    flat = jnp.clip(idx, 0, mb_w * mb_h - 1).reshape(-1)

    def per_phase(t):  # gather [n,...] table -> [F,P,...] and mask inactive
        g = jnp.take(t, flat, axis=0).reshape((F, P) + t.shape[1:])
        return g

    bsv = jnp.where((idx >= 0)[..., None, None], per_phase(tables["bs_v"]), 0)
    bsh = jnp.where((idx >= 0)[..., None, None], per_phase(tables["bs_h"]), 0)
    tcv = per_phase(tables["tc_v"])
    tch = per_phase(tables["tc_h"])
    av = per_phase(tables["a_v"])
    bv = per_phase(tables["b_v"])
    ah = per_phase(tables["a_h"])
    bh = per_phase(tables["b_h"])
    bsc = jnp.where((idx >= 0)[..., None, None, None],
                    per_phase(tables["bs_c"]), 0)
    tcc = per_phase(tables["tc_c"])
    ac = per_phase(tables["a_c"])
    bc = per_phase(tables["b_c"])

    interp = jax.default_backend() == "cpu"  # interpret mode off-TPU

    def smem_pack(a):
        """[F, ...] -> [F, k, 128] int32 (SMEM block rule: (8,128) tiles)."""
        flat = a.reshape(F, -1).astype(jnp.int32)
        k = max(1, -(-flat.shape[1] // 128))
        pad = k * 128 - flat.shape[1]
        return jnp.pad(flat, ((0, 0), (0, pad))).reshape(F, k, 128)

    def smem_spec(a):
        k = a.shape[1]
        return pl.BlockSpec((1, k, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    yp = _pad_plane(y, 16, 256)
    kern = functools.partial(_luma_kernel, mb_w=mb_w, pmax=P)
    luma_args = [smem_pack(a) for a in (idx, bsv, tcv, av, bv, bsh, tch,
                                        ah, bh)]
    yf = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(yp.shape, jnp.int16),
        grid=(F,),
        in_specs=[smem_spec(a) for a in luma_args] + [vmem],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((32, 256), jnp.int32)],
        input_output_aliases={9: 0},
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*luma_args, yp)
    y_out = yf[LPAD:LPAD + H, LPAD:LPAD + W].astype(jnp.int32)

    outs_c = []
    for plane_idx, plane in ((0, cb), (1, cr)):
        cp = _pad_plane(plane, 16, 256)
        kern_c = functools.partial(_chroma_kernel, mb_w=mb_w, pmax=P,
                                   plane=plane_idx)
        c_args = [smem_pack(a) for a in (idx, bsc, tcc, ac, bc)]
        cf = pl.pallas_call(
            kern_c,
            out_shape=jax.ShapeDtypeStruct(cp.shape, jnp.int16),
            grid=(F,),
            in_specs=[smem_spec(a) for a in c_args] + [vmem],
            out_specs=vmem,
            scratch_shapes=[pltpu.VMEM((24, 256), jnp.int32)],
            input_output_aliases={5: 0},
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*c_args, cp)
        outs_c.append(cf[LPAD:LPAD + H // 2,
                         LPAD:LPAD + W // 2].astype(jnp.int32))
    return y_out, outs_c[0], outs_c[1]
