"""Pallas TPU intra-reconstruction kernel (spec 8.3) — the hot path.

Same architecture as the deblock kernel: MBs walk in RASTER order (the
exact spec-serial order; a sequential kernel needs no wavefront schedule)
with one grid step per MB row; each intra MB loads an aligned working tile
(its pixels + the 1-pixel top/left halo and top-right extension), normalizes
it with a dynamic lane roll, reconstructs all its blocks at STATIC in-tile
offsets in spec decode order, rolls back, and stores.  Per-MB scalars come
from one packed [mb_h, mb_w8, 128] SMEM array (direct [0, mbx, field] reads;
no div/mod address math on the scalar core).

Directional prediction uses the oracle-probed weight tables
(ops.intra_tables.K4_PACKED / K8_PACKED): every mode is a non-negative
integer weighted average, so pred = ((sum_i W_i * v_i) + R) >> S with the
per-mode [8, 128/256] coefficient block fetched by one aligned dynamic read.
DC / plane / PCM paths are computed directly with vector ops.

Inter-MB pixels arrive pre-filled in the init plane (MC stage); intra MBs
overwrite their own regions and may read inter neighbors — identical
semantics to ops.intra.intra_reconstruct, bit-exact by the equivalence and
conformance tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..abi import KIND_I4x4, KIND_I8x8, KIND_I16, KIND_IPCM
from ..intra_tables import K4_PACKED, K8_PACKED

LPAD = 8


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _bc(x11, shape):
    """[1,1] -> shape via a rank-0 extract (Mosaic lacks 2-axis vector
    broadcast, but scalar->vector splat is supported)."""
    return jnp.broadcast_to(x11[0, 0], shape)


def _dc_sel(st, sl, al, at, n: int):
    """DC value [1,1] from sums; n = block size (4/8/16)."""
    import math
    lg = int(math.log2(n))
    both = (st + sl + n) >> (lg + 1)
    lonly = (sl + (n >> 1)) >> lg
    tonly = (st + (n >> 1)) >> lg
    return jnp.where(at & al, both,
                     jnp.where(al, lonly, jnp.where(at, tonly, 128)))


def _luma4_block(scr, res, k4_ref, px: int, py: int, mode, av):
    """Reconstruct one intra 4x4 block at static tile coords (px, py)."""
    al = (av & 1) != 0
    at = (av & 2) != 0
    atl = (av & 4) != 0
    atr = (av & 8) != 0
    trow = scr[py - 1:py, px - 1:px + 15].astype(jnp.int32)   # [1,16]
    li = _lane_iota((1, 16))
    t3 = trow[0:1, 4:5]
    trow = jnp.where((li >= 5) & (li <= 8) & ~atr, t3, trow)
    trow = jnp.where(li == 0, jnp.where(atl, trow, 0),
                     jnp.where(at, trow, 0))
    lcol = scr[py:py + 4, px - 1:px].astype(jnp.int32)        # [4,1]
    lcol = jnp.where(al, lcol, 0)
    wm = k4_ref[pl.ds(pl.multiple_of(mode * 8, 8), 8), :]     # [8,128]
    acc = jnp.zeros((4, 4), jnp.int32)
    for i in range(13):
        w = wm[0:4, 4 * i:4 * i + 4]
        v = trow[0:1, i:i + 1] if i < 9 else lcol[i - 9:i - 8, 0:1]
        acc = acc + w * _bc(v, (4, 4))
    rnd = wm[0:4, 52:56]
    sh = wm[0:4, 56:60]
    pred = (acc + rnd) >> sh
    st = jnp.sum(trow[0:1, 1:5], axis=1, keepdims=True)
    sl = jnp.sum(lcol, axis=0, keepdims=True)
    dc = _dc_sel(st, sl, al, at, 4)
    pred = jnp.where(mode == 2, _bc(dc, (4, 4)), pred)
    out = jnp.clip(pred + res[py:py + 4, px:px + 4], 0, 255)
    scr[py:py + 4, px:px + 4] = out


def _filter8_refs_vec(trow, lcol, tl_ok, at, al):
    """Intra8x8 reference filtering (8.3.2.2.1) on [1,24] trow / [8,1] lcol.

    trow lanes: 0 = tl, 1..16 = t0..t15 (substituted/zeroed already).
    Returns (ftrow [1,24], flcol [8,1]) filtered (tl' in lane 0).
    """
    li = _lane_iota((1, 24))
    t = trow
    tm1 = jnp.where(li >= 1, pltpu.roll(t, 1, 1), 0)   # t[x-1] at lane x
    tp1 = pltpu.roll(t, 23, 1)                          # t[x+1] (roll -1)
    mid = (tm1 + 2 * t + tp1 + 2) >> 2
    # x = 0 (lane 1): (tl + 2 t0 + t1) if tl_ok else (3 t0 + t1)
    f0_tl = (t[0:1, 0:1] + 2 * t[0:1, 1:2] + t[0:1, 2:3] + 2) >> 2
    f0_no = (3 * t[0:1, 1:2] + t[0:1, 2:3] + 2) >> 2
    f0 = jnp.where(tl_ok, f0_tl, f0_no)
    # x = 15 (lane 16): (t14 + 3 t15)
    f15 = (t[0:1, 15:16] + 3 * t[0:1, 16:17] + 2) >> 2
    ft = jnp.where(li == 1, f0, jnp.where(li == 16, f15, mid))
    # tl' (lane 0): both: (t0 + 2 tl + l0); only top: (3 tl + t0);
    # only left: (3 tl + l0)
    tl = t[0:1, 0:1]
    l0 = lcol[0:1, 0:1]
    ftl = jnp.where(at & al, (t[0:1, 1:2] + 2 * tl + l0 + 2) >> 2,
                    jnp.where(at, (3 * tl + t[0:1, 1:2] + 2) >> 2,
                              jnp.where(al, (3 * tl + l0 + 2) >> 2, tl)))
    ft = jnp.where(li == 0, ftl, ft)
    ft = jnp.where(at | (li == 0), ft, t)      # unfiltered when !at
    ft = jnp.where((li == 0) & ~tl_ok, tl, ft)  # tl unchanged when !atl
    # left filtering on [8,1]
    ri = _row_iota((8, 1))
    lm1 = jnp.where(ri >= 1, pltpu.roll(lcol, 1, 0), 0)
    lp1 = pltpu.roll(lcol, 7, 0)
    lmid = (lm1 + 2 * lcol + lp1 + 2) >> 2
    fl0 = jnp.where(tl_ok, (tl + 2 * l0 + lcol[1:2, 0:1] + 2) >> 2,
                    (3 * l0 + lcol[1:2, 0:1] + 2) >> 2)
    fl7 = (lcol[6:7, 0:1] + 3 * lcol[7:8, 0:1] + 2) >> 2
    fl = jnp.where(ri == 0, fl0, jnp.where(ri == 7, fl7, lmid))
    fl = jnp.where(al, fl, lcol)
    return ft, fl


def _luma8_block(scr, res, k8_ref, px: int, py: int, mode, av):
    al = (av & 1) != 0
    at = (av & 2) != 0
    atl = (av & 4) != 0
    atr = (av & 8) != 0
    trow = scr[py - 1:py, px - 1:px + 23].astype(jnp.int32)   # [1,24]
    li = _lane_iota((1, 24))
    t7 = trow[0:1, 8:9]
    trow = jnp.where((li >= 9) & (li <= 16) & ~atr, t7, trow)
    trow = jnp.where(li == 0, jnp.where(atl, trow, 0),
                     jnp.where(at, trow, 0))
    lcol = scr[py:py + 8, px - 1:px].astype(jnp.int32)        # [8,1]
    lcol = jnp.where(al, lcol, 0)
    ft, fl = _filter8_refs_vec(trow, lcol, atl, at, al)
    wm = k8_ref[pl.ds(pl.multiple_of(mode * 8, 8), 8), :]     # [8,256]
    acc = jnp.zeros((8, 8), jnp.int32)
    for i in range(25):
        w = wm[0:8, 8 * i:8 * i + 8]
        v = ft[0:1, i:i + 1] if i < 17 else fl[i - 17:i - 16, 0:1]
        acc = acc + w * _bc(v, (8, 8))
    rnd = wm[0:8, 200:208]
    sh = wm[0:8, 208:216]
    pred = (acc + rnd) >> sh
    st = jnp.sum(ft[0:1, 1:9], axis=1, keepdims=True)
    sl = jnp.sum(fl, axis=0, keepdims=True)
    dc = _dc_sel(st, sl, al, at, 8)
    pred = jnp.where(mode == 2, _bc(dc, (8, 8)), pred)
    out = jnp.clip(pred + res[py:py + 8, px:px + 8], 0, 255)
    scr[py:py + 8, px:px + 8] = out


# plane-mode H/V coefficient over [tl, p0..p_{2N-1}] at index i is (i - N)
# (spec 8.3.3.4: H = sum (x+1)(p[N/2+x] - p[N/2-2-x]), tl enters at x=N/2-1)


def _luma16_job(scr, res, px: int, py: int, mode, av, is_pcm):
    al = ((av & 1) != 0) & ~is_pcm
    at = ((av & 2) != 0) & ~is_pcm
    atl = ((av & 4) != 0) & ~is_pcm
    te = scr[py - 1:py, px - 1:px + 16].astype(jnp.int32)     # [1,17] tl,t0..15
    li = _lane_iota((1, 17))
    te = jnp.where(li == 0, jnp.where(atl, te, 0), jnp.where(at, te, 0))
    le = scr[py - 1:py + 16, px - 1:px].astype(jnp.int32)     # [17,1] tl,l0..15
    ri = _row_iota((17, 1))
    le = jnp.where(ri == 0, jnp.where(atl, le, 0), jnp.where(al, le, 0))
    t = te[0:1, 1:17]
    l = le[1:17, 0:1]
    vert = jnp.broadcast_to(t, (16, 16))
    hor = jnp.broadcast_to(l, (16, 16))
    st = jnp.sum(t, axis=1, keepdims=True)
    sl = jnp.sum(l, axis=0, keepdims=True)
    dcv = _dc_sel(st, sl, al, at, 16)
    dc = _bc(dcv, (16, 16))
    h = jnp.sum((li - 8) * te, axis=1, keepdims=True)
    v = jnp.sum((ri - 8) * le, axis=0, keepdims=True)
    a = _bc(16 * (l[15:16, 0:1] + t[0:1, 15:16]), (16, 16))
    b = _bc((5 * h + 32) >> 6, (16, 16))
    c = _bc((5 * v + 32) >> 6, (16, 16))
    gx = _lane_iota((16, 16))
    gy = _row_iota((16, 16))
    plane = jnp.clip((a + b * (gx - 7) + c * (gy - 7) + 16) >> 5, 0, 255)
    pred = jnp.where(mode == 0, vert,
                     jnp.where(mode == 1, hor,
                               jnp.where(mode == 2, dc, plane)))
    pred = jnp.where(is_pcm, 0, pred)
    out = jnp.clip(pred + res[py:py + 16, px:px + 16], 0, 255)
    scr[py:py + 16, px:px + 16] = out


def _chroma_job(scr, res, px: int, py: int, mode, av, is_pcm):
    al = ((av & 1) != 0)
    at = ((av & 2) != 0)
    atl = ((av & 4) != 0)
    te = scr[py - 1:py, px - 1:px + 8].astype(jnp.int32)      # [1,9]
    li = _lane_iota((1, 9))
    te = jnp.where(li == 0, jnp.where(atl, te, 0), jnp.where(at, te, 0))
    le = scr[py - 1:py + 8, px - 1:px].astype(jnp.int32)      # [9,1]
    ri = _row_iota((9, 1))
    le = jnp.where(ri == 0, jnp.where(atl, le, 0), jnp.where(al, le, 0))
    t = te[0:1, 1:9]
    l = le[1:9, 0:1]
    vert = jnp.broadcast_to(t, (8, 8))
    hor = jnp.broadcast_to(l, (8, 8))
    # DC per 4x4 sub-block (spec 8.3.4.1)
    st0 = jnp.sum(t[0:1, 0:4], axis=1, keepdims=True)
    st1 = jnp.sum(t[0:1, 4:8], axis=1, keepdims=True)
    sl0 = jnp.sum(l[0:4, 0:1], axis=0, keepdims=True)
    sl1 = jnp.sum(l[4:8, 0:1], axis=0, keepdims=True)
    both00 = (st0 + sl0 + 4) >> 3
    both11 = (st1 + sl1 + 4) >> 3
    t_only = lambda s: (s + 2) >> 2
    l_only = lambda s: (s + 2) >> 2
    dc00 = jnp.where(at & al, both00,
                     jnp.where(al, l_only(sl0), jnp.where(at, t_only(st0), 128)))
    dc01 = jnp.where(at, t_only(st1), jnp.where(al, l_only(sl0), 128))
    dc10 = jnp.where(al, l_only(sl1), jnp.where(at, t_only(st0), 128))
    dc11 = jnp.where(at & al, both11,
                     jnp.where(al, l_only(sl1), jnp.where(at, t_only(st1), 128)))
    gx = _lane_iota((8, 8))
    gy = _row_iota((8, 8))
    dc = jnp.where((gx < 4) & (gy < 4), _bc(dc00, (8, 8)),
                   jnp.where((gx >= 4) & (gy < 4), _bc(dc01, (8, 8)),
                             jnp.where((gx < 4) & (gy >= 4),
                                       _bc(dc10, (8, 8)), _bc(dc11, (8, 8)))))
    h = jnp.sum((li - 4) * te, axis=1, keepdims=True)
    v = jnp.sum((ri - 4) * le, axis=0, keepdims=True)
    a = _bc(16 * (l[7:8, 0:1] + t[0:1, 7:8]), (8, 8))
    b = _bc((34 * h + 32) >> 6, (8, 8))
    c = _bc((34 * v + 32) >> 6, (8, 8))
    plane = jnp.clip((a + b * (gx - 3) + c * (gy - 3) + 16) >> 5, 0, 255)
    pred = jnp.where(mode == 0, dc,
                     jnp.where(mode == 1, hor,
                               jnp.where(mode == 2, vert, plane)))
    pred = jnp.where(is_pcm, 0, pred)
    out = jnp.clip(pred + res[py:py + 8, px:px + 8], 0, 255)
    scr[py:py + 8, px:px + 8] = out


# luma 4x4 blocks in spec decode order (luma4x4BlkIdx)
_I4_ORDER = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
             (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]


# SMEM field layout (one [mb_h, mb_w8, 128] int32 array per kernel):
#   luma: kind 0, i4_modes 1..16, i4_avail 17..32 (packed al|at<<1|atl<<2|
#   atr<<3), i8_modes 33..36, i8_avail 37..40, i16_mode 41, mb_avail 42
#   chroma: kind 0, chroma_mode 1, mb_avail 2


def _luma_kernel(md_ref, k4_ref, k8_ref, y_in, res_in,
                 out_ref, scr, rscr, *, mb_w: int):
    mby = pl.program_id(0)
    ty = pl.multiple_of(mby * 16, 16)

    @pl.when(mby == 0)
    def _():
        # seed the output plane (explicit copy instead of
        # input_output_aliases, which miscompiles when fused with large
        # upstream graphs on this platform)
        out_ref[:, :] = y_in[:, :]

    def body(mbx, _):
        kind = md_ref[0, mbx, 0]

        @pl.when(kind <= KIND_IPCM)
        def _():
            x0 = mbx * 16 + LPAD
            ax = pl.multiple_of(((x0 - 8) // 128) * 128, 128)
            off = x0 - 8 - ax
            tile = out_ref[pl.ds(ty, 32), pl.ds(ax, 256)].astype(jnp.int32)
            scr[:, :] = pltpu.roll(tile, -off, 1)
            rtile = res_in[pl.ds(ty, 32), pl.ds(ax, 256)].astype(jnp.int32)
            rscr[:, :] = pltpu.roll(rtile, -off, 1)
            # MB pixel (r, c) at scratch [8 + r, 8 + c]

            @pl.when(kind == KIND_I4x4)
            def _():
                for blk, (x4, y4) in enumerate(_I4_ORDER):
                    r = y4 * 4 + x4
                    _luma4_block(scr, rscr, k4_ref, 8 + 4 * x4, 8 + 4 * y4,
                                 md_ref[0, mbx, 1 + r],
                                 md_ref[0, mbx, 17 + r])

            @pl.when(kind == KIND_I8x8)
            def _():
                for b8 in range(4):
                    _luma8_block(scr, rscr, k8_ref, 8 + 8 * (b8 % 2),
                                 8 + 8 * (b8 // 2),
                                 md_ref[0, mbx, 33 + b8],
                                 md_ref[0, mbx, 37 + b8])

            @pl.when((kind == KIND_I16) | (kind == KIND_IPCM))
            def _():
                _luma16_job(scr, rscr, 8, 8, md_ref[0, mbx, 41],
                            md_ref[0, mbx, 42], kind == KIND_IPCM)

            out_ref[pl.ds(ty, 32), pl.ds(ax, 256)] = \
                pltpu.roll(scr[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, mb_w, body, 0)


def _chroma_kernel(md_ref, c_in, res_in, out_ref, scr, rscr, *, mb_w: int):
    mby = pl.program_id(0)
    ty = pl.multiple_of(mby * 8, 8)

    @pl.when(mby == 0)
    def _():
        out_ref[:, :] = c_in[:, :]

    def body(mbx, _):
        kind = md_ref[0, mbx, 0]

        @pl.when(kind <= KIND_IPCM)
        def _():
            x0 = mbx * 8 + LPAD
            ax = pl.multiple_of(((x0 - 8) // 128) * 128, 128)
            off = x0 - 8 - ax
            tile = out_ref[pl.ds(ty, 24), pl.ds(ax, 256)].astype(jnp.int32)
            scr[:, :] = pltpu.roll(tile, -off, 1)
            rtile = res_in[pl.ds(ty, 24), pl.ds(ax, 256)].astype(jnp.int32)
            rscr[:, :] = pltpu.roll(rtile, -off, 1)
            _chroma_job(scr, rscr, 8, 8, md_ref[0, mbx, 1],
                        md_ref[0, mbx, 2], kind == KIND_IPCM)
            out_ref[pl.ds(ty, 24), pl.ds(ax, 256)] = \
                pltpu.roll(scr[:, :], off, 1).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, mb_w, body, 0)


def _pad_plane(p, dtype=jnp.int16):
    H, W = p.shape
    Wp = ((W + 2 * LPAD + 127) // 128) * 128 + 256
    return jnp.pad(p.astype(dtype), ((LPAD, 16), (LPAD, Wp - W - LPAD)))


def intra_reconstruct_pallas(abi, res_y, res_cb, res_cr,
                             init_y, init_cb, init_cr,
                             mb_w: int, mb_h: int):
    """Pallas intra/PCM reconstruction in raster (spec) order.  Same contract
    as ops.intra.intra_reconstruct (init planes carry inter pixels)."""
    H, W = mb_h * 16, mb_w * 16
    n = mb_w * mb_h

    def pack_md(fields):
        cols = jnp.concatenate(
            [f.reshape(n, -1).astype(jnp.int32) for f in fields], axis=1)
        w8 = -(-mb_w // 8) * 8
        md = jnp.pad(cols, ((0, 0), (0, 128 - cols.shape[1])))
        md = md.reshape(mb_h, mb_w, 128)
        return jnp.pad(md, ((0, 0), (0, w8 - mb_w), (0, 0)))

    av = abi["i4_avail"]
    i4a = (av[..., 0] | (av[..., 1] << 1) | (av[..., 2] << 2)
           | (av[..., 3] << 3))
    av8 = abi["i8_avail"]
    i8a = (av8[..., 0] | (av8[..., 1] << 1) | (av8[..., 2] << 2)
           | (av8[..., 3] << 3))
    mav = abi["mb_avail"]
    mba = mav[..., 0] | (mav[..., 1] << 1) | (mav[..., 2] << 2)
    md_y = pack_md((abi["kind"], abi["i4_modes"], i4a, abi["i8_modes"],
                    i8a, abi["i16_mode"], mba))
    md_c = pack_md((abi["kind"], abi["chroma_mode"], mba))

    interp = jax.default_backend() == "cpu"

    def smem_spec(a):
        return pl.BlockSpec((1, a.shape[1], 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    yp = _pad_plane(init_y)
    rp = _pad_plane(res_y)
    yf = pl.pallas_call(
        functools.partial(_luma_kernel, mb_w=mb_w),
        out_shape=jax.ShapeDtypeStruct(yp.shape, jnp.int16),
        grid=(mb_h,),
        in_specs=[smem_spec(md_y), vmem, vmem, vmem, vmem],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((32, 256), jnp.int32),
                        pltpu.VMEM((32, 256), jnp.int32)],
        interpret=interp,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(md_y, jnp.asarray(K4_PACKED), jnp.asarray(K8_PACKED), yp, rp)
    y_out = yf[LPAD:LPAD + H, LPAD:LPAD + W].astype(jnp.int32)

    outs = []
    for init_c, res_c in ((init_cb, res_cb), (init_cr, res_cr)):
        cp = _pad_plane(init_c)
        rcp = _pad_plane(res_c)
        cf = pl.pallas_call(
            functools.partial(_chroma_kernel, mb_w=mb_w),
            out_shape=jax.ShapeDtypeStruct(cp.shape, jnp.int16),
            grid=(mb_h,),
            in_specs=[smem_spec(md_c), vmem, vmem],
            out_specs=vmem,
            scratch_shapes=[pltpu.VMEM((24, 256), jnp.int32),
                            pltpu.VMEM((24, 256), jnp.int32)],
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(md_c, cp, rcp)
        outs.append(cf[LPAD:LPAD + H // 2, LPAD:LPAD + W // 2]
                    .astype(jnp.int32))
    return y_out, outs[0], outs[1]
