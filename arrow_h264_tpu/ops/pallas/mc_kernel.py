"""Pallas TPU inter-prediction (MC) kernel — the 1080p hot path.

Reference parity: JM-lineage `get_block.c` quarter-pel interpolation +
`mc_prediction.c` (SURVEY.md §2 "Inter prediction / MC"), re-designed for
TPU around three ideas:

1. **Half-pel planes in the DPB** (kept from ops.inter): the 6-tap work is
   done once per stored reference; per-block quarter-pel MC reduces to two
   single-pixel reads + one rounding average (spec 8.4.2.2.1 table).

2. **Packed u32 lanes**: frame pixels are packed 4-per-int32 lane, so a
   4x4 block (the MV granularity) is exactly ONE lane wide and candidate
   masks are lane-granular; sub-lane pixel offsets are SWAR byte shifts,
   and the final average is a SWAR avg_ceil.  Mosaic only rotates 32-bit
   data, so this also unlocks traced-shift `pltpu.roll` for row/column
   alignment.

3. **Dynamic candidate lists**: for each 16-row destination band the host
   (XLA prep, `mc_prepare`) emits the sorted list of distinct
   (dpb-slot, mv_y_int, mv_x_int) triples used by that band's blocks.  The
   kernel loops over the list (`lax.fori_loop`, traced bound): per
   candidate it aligns the reference slab once with two rolls + byte
   shifts and select-merges it into 8 aligned position tiles
   (G/b/h/j x row/col +1 variants).  Work is proportional to the band's
   real MV diversity — typically 2-15 candidates — instead of a static
   candidate product.

Frames whose MVs exceed the slab window, use >4 distinct DPB slots, or
exceed the per-band candidate cap fall back to the gather path
(ops.inter.inter_predict), selected per frame by the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..inter import PAD, weight_bi_dev, weight_uni_dev

PADC = PAD // 2
CAP = 61           # max distinct (k, dy, dx) per band (list words = CAP + 3)
MAX_SLOTS = 4      # distinct DPB slots per frame on this path
# host-checked MV bounds for this path (integer-pel, luma)
DY_MIN, DY_MAX = -20, 20
DX_MIN, DX_MAX = -30, 30

# position-tile ids: 0:G00 1:G01 2:G10 3:b00 4:b10 5:h00 6:h01 7:j00
# (plane, +1 row, +1 col); derived from spec 8.4.2.2.1 (see ops.inter
# _LUMA_TAB) — P1/P2 tile per quarter-pel position yf*4+xf.
TILE1 = np.array([0, 0, 3, 3, 0, 3, 3, 3, 5, 5, 7, 7, 2, 4, 7, 4], np.int32)
TILE2 = np.array([0, 3, 3, 1, 5, 5, 7, 6, 5, 7, 7, 6, 5, 5, 4, 6], np.int32)
# which (plane, ey) slabs feed each tile: tile -> (plane, ey, ex)
_TILE_SRC = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 0, 0),
             (1, 1, 0), (2, 0, 0), (2, 0, 1), (3, 0, 0)]


def _round128(x: int) -> int:
    """Round lanes up to a POWER-OF-TWO multiple of 128: Mosaic's dynamic
    (traced-shift) roll drops the tile-granular shift component when the
    tile count is not a power of two (same bug class as the 40-row
    chroma slab; bit it again at 720p's 384 = 3x128 lanes)."""
    n = 128
    while n < x:
        n *= 2
    return n


def luma_lanes(W: int) -> int:
    return _round128((W + 2 * PAD) // 4)


def chroma_lanes(W: int) -> int:
    return _round128((W // 2 + 2 * PADC) // 4)


def chroma_rows(H: int) -> int:
    """Padded chroma plane rows; >= 64 so the kernel's 64-row slab DMA
    (see _chroma_kernel) stays in bounds at every band."""
    return max(H // 2 + 2 * PADC, 64)


# ---------------------------------------------------------------------------
# packing helpers (XLA)
# ---------------------------------------------------------------------------

def pack_u8_plane(p, n_lanes: int):
    """u8 [H, Wpx] -> packed u32 [H, n_lanes] (little-endian 4px/lane)."""
    H, Wpx = p.shape
    pad = n_lanes * 4 - Wpx
    x = jnp.pad(p, ((0, 0), (0, pad))).reshape(H, n_lanes, 4)
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def unpack_u32_plane(p, Wpx: int):
    """packed u32 [..., H, L] -> u8 [..., H, Wpx]."""
    x = jax.lax.bitcast_convert_type(p, jnp.uint8)
    return x.reshape(*p.shape[:-1], p.shape[-1] * 4)[..., :Wpx]


# ---------------------------------------------------------------------------
# XLA prep: block maps + per-band candidate lists
# ---------------------------------------------------------------------------

def _pack_cand(k, dy, dx):
    return (k << 13) | ((dy + 32) << 7) | (dx + 48)


def _tab16(table, idx):
    """16-entry table lookup as a select chain (avoids TPU gathers)."""
    out = jnp.full(idx.shape, int(table[0]), jnp.int32)
    for i in range(1, 16):
        out = jnp.where(idx == i, int(table[i]), out)
    return out


def _band_lists(cand_blk, n_bands: int, cap: int):
    """cand_blk [n_bands*4, BL] int32 (-1 invalid) ->
    (lists [n_bands, cap], counts [n_bands], kmask [n_bands])."""
    c = cand_blk.reshape(n_bands, -1)
    s = jnp.sort(c, axis=1)
    prev = jnp.concatenate([jnp.full((n_bands, 1), -2, s.dtype), s[:, :-1]], 1)
    uniq = (s != prev) & (s >= 0)
    count = uniq.sum(1)
    key = jnp.where(uniq, s, jnp.int32(2**31 - 1))
    lst = jnp.sort(key, axis=1)[:, :cap]
    lst = jnp.where(lst == 2**31 - 1, 0, lst)
    ks = jnp.where(uniq, s >> 13, 4)
    kmask = ((ks == 0).any(1) * 1 + (ks == 1).any(1) * 2 +
             (ks == 2).any(1) * 4 + (ks == 3).any(1) * 8)
    return lst, count, kmask


def _expand_rows(m, r: int):
    """block-row map [BR, L] -> pixel-row map [BR*r, L]."""
    return jnp.repeat(m, r, axis=0)


def mc_prepare_luma(abi, mb_w: int, mb_h: int, slot_list, lst: int):
    """ABI + frame slot list -> kernel inputs for list `lst`.

    Returns (cand_map [H, WL] i32, m12_map [H, WL] i32,
             bandinfo [mb_h, 3 + CAP] i32).
    bandinfo row: [count, kmask, tilemask, cand...].
    """
    n = mb_w * mb_h
    W = mb_w * 16
    WL = luma_lanes(W)
    mv = abi["mv"].reshape(n, 16, 2, 2)[:, :, lst]          # [n,16,(x,y)]
    refslot = abi["refslot"].reshape(n, 16, 2)[:, :, lst]
    valid = refslot >= 0
    sl = jnp.asarray(slot_list, jnp.int32)                  # [4]
    k = jnp.zeros_like(refslot)
    for i in range(MAX_SLOTS):
        k = jnp.where(refslot == sl[i], i, k)
    mvx, mvy = mv[..., 0], mv[..., 1]
    dy = mvy >> 2
    dx = mvx >> 2
    pos = (mvy & 3) * 4 + (mvx & 3)
    t1 = _tab16(TILE1, pos)
    t2 = _tab16(TILE2, pos)
    cand = jnp.where(valid, _pack_cand(k, dy, dx), -1)
    # block-res maps [mb_h*4, mb_w*4]
    def blkmap(v):
        return v.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(mb_h * 4, mb_w * 4)
    cand_b = blkmap(cand)
    m12_b = blkmap(t1 * 8 + t2)
    tmask_b = blkmap(jnp.where(valid, (1 << t1) | (1 << t2), 0))
    lists, counts, kmask = _band_lists(cand_b, mb_h, CAP)
    tmask = jnp.bitwise_or.reduce(tmask_b.reshape(mb_h, -1), axis=1)
    pad_l = WL - mb_w * 4
    cand_map = jnp.pad(_expand_rows(cand_b, 4), ((0, 0), (0, pad_l)),
                       constant_values=-1)
    m12_map = jnp.pad(_expand_rows(m12_b, 4), ((0, 0), (0, pad_l)))
    bandinfo = jnp.concatenate(
        [counts[:, None], kmask[:, None], tmask[:, None], lists], axis=1)
    return cand_map.astype(jnp.int32), m12_map.astype(jnp.int32), \
        bandinfo.astype(jnp.int32)


def mc_prepare_chroma(abi, mb_w: int, mb_h: int, slot_list, lst: int):
    """Returns (cand_e [H2, WLc], cand_o, xfyf [4][H2, WLc], bandinfo)."""
    n = mb_w * mb_h
    W2 = mb_w * 8
    WLc = chroma_lanes(mb_w * 16)
    mv = abi["mv"].reshape(n, 16, 2, 2)[:, :, lst]
    refslot = abi["refslot"].reshape(n, 16, 2)[:, :, lst]
    valid = refslot >= 0
    sl = jnp.asarray(slot_list, jnp.int32)
    k = jnp.zeros_like(refslot)
    for i in range(MAX_SLOTS):
        k = jnp.where(refslot == sl[i], i, k)
    mvx, mvy = mv[..., 0], mv[..., 1]
    dyc = mvy >> 3
    dxc = mvx >> 3
    xf = mvx & 7
    yf = mvy & 7
    cand = jnp.where(valid, _pack_cand(k, dyc, dxc), -1)

    def blkmap(v):  # [mb_h*4, mb_w*4] (chroma 2x2 blocks == luma 4x4 grid)
        return v.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(mb_h * 4, mb_w * 4)

    cand_b = blkmap(cand)          # block == 2 chroma px
    xf_b = blkmap(xf)
    yf_b = blkmap(yf)
    lists, counts, kmask = _band_lists(cand_b, mb_h, CAP)
    # lane maps: lane L covers chroma px 4L..4L+3 = blocks 2L, 2L+1
    nb = mb_w * 4                  # blocks per row
    nl = WLc                       # lanes
    def lanemap(bmap, which, fill):
        v = bmap[:, which::2]      # strided slice, no gather
        return jnp.pad(v, ((0, 0), (0, nl - v.shape[1])),
                       constant_values=fill)
    cand_e = _expand_rows(lanemap(cand_b, 0, -1), 2)
    cand_o = _expand_rows(lanemap(cand_b, 1, -1), 2)
    # per-byte xf/yf maps: byte b of lane L = px 4L+b = block 2L + b//2
    xfyf = []
    for b in range(4):
        m = lanemap(xf_b * 8 + yf_b, b // 2, 0)
        xfyf.append(_expand_rows(m, 2).astype(jnp.int32))
    bandinfo = jnp.concatenate(
        [counts[:, None], kmask[:, None],
         jnp.zeros((mb_h, 1), counts.dtype), lists], axis=1)
    return cand_e.astype(jnp.int32), cand_o.astype(jnp.int32), xfyf, \
        bandinfo.astype(jnp.int32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _u32(v):
    return v.astype(jnp.uint32)


def _byte_shift(la, lb, r):
    """Packed val at +r pixels (r traced 0..3): (la >> 8r) | (lb << 32-8r)."""
    hi = jnp.where(r > 0, lb << _u32((32 - 8 * r) & 31), jnp.uint32(0))
    return (la >> _u32(8 * r)) | hi


def _byte_shift1(la, lb, r):
    """Packed val at +r+1 pixels (r traced 0..3)."""
    v = (la >> _u32((8 * (r + 1)) & 31)) | (lb << _u32((32 - 8 * (r + 1)) & 31))
    return jnp.where(r == 3, lb, v)


def _swar_avg(a, b):
    """Per-byte (a + b + 1) >> 1 on packed u32."""
    return (a | b) - (((a ^ b) >> jnp.uint32(1)) & jnp.uint32(0x7F7F7F7F))


def _luma_kernel(slots_ref, band_ref, cmap_ref, m12_ref, dpb_ref,
                 out_ref, sb, rr, tt, st, sem, *, n_lanes: int,
                 n_bands: int):
    bb = pl.program_id(0)          # stream lane (batched grid)
    band = pl.program_id(1)
    tmask = band_ref[0, 0, 2]

    # Band slabs are double-buffered: band b computes from sb[b%2] (DMA
    # started at band b-1) while band b+1's slab prefetches into the
    # other buffer.  All MAX_SLOTS slots are copied (clamped index for
    # unused -1 entries) — guard branches cost more than the copies.
    def dma_band(buf: int, b, method: str):
        r0 = pl.multiple_of(b * 16 + 8, 8)
        for k in range(MAX_SLOTS):
            slot = jnp.maximum(slots_ref[0, 0, k], 0)
            getattr(pltpu.make_async_copy(
                dpb_ref.at[bb, slot, :, pl.ds(r0, 64), :],
                sb.at[buf, k], sem.at[buf, k]), method)()

    @pl.when(band == 0)
    def _():
        dma_band(0, 0, "start")

    @pl.when((band + 1 < n_bands) & (band % 2 == 0))
    def _():
        dma_band(1, band + 1, "start")

    @pl.when((band + 1 < n_bands) & (band % 2 == 1))
    def _():
        dma_band(0, band + 1, "start")

    @pl.when(band % 2 == 0)
    def _():
        dma_band(0, band, "wait")

    @pl.when(band % 2 == 1)
    def _():
        dma_band(1, band, "wait")
    buf = band % 2
    tt[:, :, :] = jnp.zeros((8, 16, n_lanes), jnp.uint32)

    st[0] = -1
    count = band_ref[0, 0, 0]
    cmap = cmap_ref[:, :]

    def body(i, _):
        c = band_ref[0, 0, 3 + i]
        k = c >> 13
        dy = ((c >> 7) & 63) - 32
        dx = (c & 127) - 48
        qx = dx >> 2
        rx = dx & 3

        @pl.when(st[0] != (c >> 7))
        def _():
            # row-align all 4 planes for this (k, dy); reused across dx
            for p in range(4):
                rr[p, :, :] = pltpu.roll(sb[buf, k, p], -(24 + dy), 0)
            st[0] = c >> 7

        mask = cmap == c
        for p in range(4):
            need0 = [t for t, (pp, ey, ex) in enumerate(_TILE_SRC)
                     if pp == p and ex == 0]
            need1 = [t for t, (pp, ey, ex) in enumerate(_TILE_SRC)
                     if pp == p and ex == 1]
            la = pltpu.roll(rr[p, 0:24, :], -(8 + qx), 1)
            lb = pltpu.roll(la, n_lanes - 1, 1)
            v0 = _byte_shift(la, lb, rx)
            for t in need0:
                ey = _TILE_SRC[t][1]
                tt[t, :, :] = jnp.where(mask, v0[ey:ey + 16, :],
                                        tt[t, :, :])
            if need1:
                v1 = _byte_shift1(la, lb, rx)
                for t in need1:
                    tt[t, :, :] = jnp.where(mask, v1[0:16, :],
                                            tt[t, :, :])
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    m12 = m12_ref[:, :]
    t1 = m12 >> 3
    t2 = m12 & 7
    p1 = jnp.zeros((16, n_lanes), jnp.uint32)
    p2 = jnp.zeros((16, n_lanes), jnp.uint32)
    for t in range(8):
        v = tt[t, :, :]
        if t in (0, 2, 3, 4, 5, 7):       # tiles reachable by P1
            p1 = jnp.where(t1 == t, v, p1)
        p2 = jnp.where(t2 == t, v, p2)
    out_ref[:, :] = _swar_avg(p1, p2)


def _chroma_kernel(slots_ref, band_ref, ce_ref, co_ref,
                   xy0_ref, xy1_ref, xy2_ref, xy3_ref, dpb_ref,
                   out_ref, sb, rr, tt, st, sem, *, n_lanes: int,
                   n_bands: int):
    # The slab is 64 rows (not the minimal 40): Mosaic's dynamic-shift
    # sublane roll drops the tile-granular part of the shift when the
    # sublane-tile count is not a power of two (40 rows = 5 tiles broke
    # it; 64 rows = 8 tiles is exact).  The DMA start is clamped so the
    # last bands stay in bounds; `off` rebases the roll accordingly.
    Hcp = dpb_ref.shape[3]
    bb = pl.program_id(0)          # stream lane (batched grid)
    band = pl.program_id(1)
    off = band * 8 - jnp.minimum(band * 8, Hcp - 64)

    def dma_band(buf: int, b, method: str):
        r0 = pl.multiple_of(jnp.minimum(b * 8, Hcp - 64), 8)
        for k in range(MAX_SLOTS):
            slot = jnp.maximum(slots_ref[0, 0, k], 0)
            getattr(pltpu.make_async_copy(
                dpb_ref.at[bb, slot, :, pl.ds(r0, 64), :],
                sb.at[buf, k], sem.at[buf, k]), method)()

    @pl.when(band == 0)
    def _():
        dma_band(0, 0, "start")

    @pl.when((band + 1 < n_bands) & (band % 2 == 0))
    def _():
        dma_band(1, band + 1, "start")

    @pl.when((band + 1 < n_bands) & (band % 2 == 1))
    def _():
        dma_band(0, band + 1, "start")

    @pl.when(band % 2 == 0)
    def _():
        dma_band(0, band, "wait")

    @pl.when(band % 2 == 1)
    def _():
        dma_band(1, band, "wait")
    buf = band % 2
    tt[:, :, :, :] = jnp.zeros((2, 4, 8, n_lanes), jnp.uint32)

    st[0] = -1
    count = band_ref[0, 0, 0]
    ce = ce_ref[:, :]
    co = co_ref[:, :]

    def body(i, _):
        c = band_ref[0, 0, 3 + i]
        k = c >> 13
        dy = ((c >> 7) & 63) - 32
        dx = (c & 127) - 48
        qx = dx >> 2
        rx = dx & 3

        @pl.when(st[0] != (c >> 7))
        def _():
            # dest row r reads slab row 16 + off + dy + r (slab starts
            # at padded row row0 = band*8 - off; dest row 0 = padded row
            # band*8 + 16)
            for p in range(2):
                rr[p, :, :] = pltpu.roll(sb[buf, k, p], -(16 + off + dy), 0)
            st[0] = c >> 7

        me = ce == c
        mo = co == c
        mw = (jnp.where(me, jnp.uint32(0x0000FFFF), jnp.uint32(0)) |
              jnp.where(mo, jnp.uint32(0xFFFF0000), jnp.uint32(0)))
        nmw = ~mw
        for p in range(2):
            la = pltpu.roll(rr[p, 0:10, :], -(4 + qx), 1)
            lb = pltpu.roll(la, n_lanes - 1, 1)
            v0 = _byte_shift(la, lb, rx)      # A/C source (+0 px)
            v1 = _byte_shift1(la, lb, rx)     # B/D source (+1 px)
            for t, (v, ey) in enumerate(((v0, 0), (v1, 0), (v0, 1), (v1, 1))):
                tt[p, t, :, :] = (v[ey:ey + 8, :] & mw) | \
                    (tt[p, t, :, :] & nmw)
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    # bilinear per byte-plane: ((8-xf)(8-yf)A + xf(8-yf)B + (8-xf)yf C
    #                           + xf yf D + 32) >> 6   (spec 8.4.2.2.2)
    xys = (xy0_ref[:, :], xy1_ref[:, :], xy2_ref[:, :], xy3_ref[:, :])
    for p in range(2):
        out = jnp.zeros((8, n_lanes), jnp.uint32)
        for b in range(4):
            sh = jnp.uint32(8 * b)
            A = ((tt[p, 0, :, :] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
            B = ((tt[p, 1, :, :] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
            C = ((tt[p, 2, :, :] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
            D = ((tt[p, 3, :, :] >> sh) & jnp.uint32(0xFF)).astype(jnp.int32)
            xf = xys[b] >> 3
            yf = xys[b] & 7
            v = ((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B +
                 (8 - xf) * yf * C + xf * yf * D + 32) >> 6
            out = out | (_u32(v) << sh)
        out_ref[0, p, :, :] = out


# ---------------------------------------------------------------------------
# host-callable wrappers
# ---------------------------------------------------------------------------

def mc_luma_pallas_batch(dpb_y4p_b, cand_map_b, m12_map_b, bandinfo_b,
                         slots_b, mb_w: int, mb_h: int,
                         interpret: bool | None = None):
    """Batched MC luma: ONE kernel over a (stream, band) grid.

    dpb_y4p_b [B, S, 4, Hp, WL] u32; cand/m12 [B, H, WL] i32;
    bandinfo_b [B, mb_h, 3+CAP] i32; slots_b [B, MAX_SLOTS] i32.
    Returns packed pred [B, H, WL] u32.  One launch for the whole stream
    batch — the per-stream python loop this replaces compiled B copies
    of the call graph and paid B launch overheads."""
    B = dpb_y4p_b.shape[0]
    H = mb_h * 16
    WL = dpb_y4p_b.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    smem = lambda a: pl.BlockSpec(
        (1, 1, a.shape[2]), lambda b, i: (b * mb_h + i, 0, 0),
        memory_space=pltpu.SMEM)
    smem0 = lambda a: pl.BlockSpec(
        (1, 1, a.shape[2]), lambda b, i: (b, 0, 0),
        memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((16, WL), lambda b, i: (b * mb_h + i, 0),
                         memory_space=pltpu.VMEM)
    slots = jnp.asarray(slots_b, jnp.int32).reshape(B, 1, MAX_SLOTS)
    bandinfo = bandinfo_b.reshape(B * mb_h, 1, -1)
    out = pl.pallas_call(
        functools.partial(_luma_kernel, n_lanes=WL, n_bands=mb_h),
        out_shape=jax.ShapeDtypeStruct((B * H, WL), jnp.uint32),
        grid=(B, mb_h),
        in_specs=[smem0(slots), smem(bandinfo), vspec, vspec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=vspec,
        scratch_shapes=[pltpu.VMEM((2, MAX_SLOTS, 4, 64, WL), jnp.uint32),
                        pltpu.VMEM((4, 64, WL), jnp.uint32),
                        pltpu.VMEM((8, 16, WL), jnp.uint32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, MAX_SLOTS))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(slots, bandinfo, cand_map_b.reshape(B * H, WL),
      m12_map_b.reshape(B * H, WL), dpb_y4p_b)
    return out.reshape(B, H, WL)


def mc_chroma_pallas_batch(dpb_cp_b, cand_e_b, cand_o_b, xfyf_b, bandinfo_b,
                           slots_b, mb_w: int, mb_h: int,
                           interpret: bool | None = None):
    """Batched MC chroma: dpb_cp_b [B, S, 2, Hcp, WLc] u32 ->
    packed pred [B, 2, H2, WLc] u32 (see mc_luma_pallas_batch)."""
    B = dpb_cp_b.shape[0]
    H2 = mb_h * 8
    WLc = dpb_cp_b.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    smem = lambda a: pl.BlockSpec(
        (1, 1, a.shape[2]), lambda b, i: (b * mb_h + i, 0, 0),
        memory_space=pltpu.SMEM)
    smem0 = lambda a: pl.BlockSpec(
        (1, 1, a.shape[2]), lambda b, i: (b, 0, 0),
        memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((8, WLc), lambda b, i: (b * mb_h + i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 2, 8, WLc), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM)
    slots = jnp.asarray(slots_b, jnp.int32).reshape(B, 1, MAX_SLOTS)
    bandinfo = bandinfo_b.reshape(B * mb_h, 1, -1)
    flat = lambda a: a.reshape(B * H2, WLc)
    return pl.pallas_call(
        functools.partial(_chroma_kernel, n_lanes=WLc, n_bands=mb_h),
        out_shape=jax.ShapeDtypeStruct((B, 2, H2, WLc), jnp.uint32),
        grid=(B, mb_h),
        in_specs=[smem0(slots), smem(bandinfo), vspec, vspec,
                  vspec, vspec, vspec, vspec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ospec,
        scratch_shapes=[pltpu.VMEM((2, MAX_SLOTS, 2, 64, WLc), jnp.uint32),
                        pltpu.VMEM((2, 64, WLc), jnp.uint32),
                        pltpu.VMEM((2, 4, 8, WLc), jnp.uint32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, MAX_SLOTS))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(slots, bandinfo, flat(cand_e_b), flat(cand_o_b),
      *[flat(x) for x in xfyf_b], dpb_cp_b)


def mc_luma_pallas(dpb_y4p, cand_map, m12_map, bandinfo, slot_list,
                   mb_w: int, mb_h: int, interpret: bool | None = None):
    """dpb_y4p [S, 4, Hp, WL] u32 -> packed pred [H, WL] u32."""
    return mc_luma_pallas_batch(
        dpb_y4p[None], cand_map[None], m12_map[None], bandinfo[None],
        jnp.asarray(slot_list, jnp.int32)[None], mb_w, mb_h, interpret)[0]


def mc_chroma_pallas(dpb_cp, cand_e, cand_o, xfyf, bandinfo, slot_list,
                     mb_w: int, mb_h: int, interpret: bool | None = None):
    """dpb_cp [S, 2, Hcp, WLc] u32 -> packed pred [2, H2, WLc] u32."""
    return mc_chroma_pallas_batch(
        dpb_cp[None], cand_e[None], cand_o[None], [x[None] for x in xfyf],
        bandinfo[None], jnp.asarray(slot_list, jnp.int32)[None],
        mb_w, mb_h, interpret)[0]


def _mc_combine(abi, preds_y, preds_c, mb_w: int, mb_h: int, lists):
    """Weighted / bi prediction combine of the two per-list MC planes
    (identical maps to ops.inter.inter_predict)."""
    n = mb_w * mb_h
    refslot = abi["refslot"].reshape(n, 16, 2)
    used = refslot >= 0

    def blkmap(v):
        return v.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(mb_h * 4, mb_w * 4)

    def px(v, scale):
        return jnp.repeat(jnp.repeat(blkmap(v), scale, 0), scale, 1)

    u0 = px(used[:, :, 0], 4)
    u1 = px(used[:, :, 1], 4) if len(lists) == 2 else jnp.zeros_like(u0)
    u0c = px(used[:, :, 0], 2)
    u1c = px(used[:, :, 1], 2) if len(lists) == 2 else jnp.zeros_like(u0c)
    wp = abi["wp"].reshape(n, 16, 2, 3, 2)
    lw_y = jnp.repeat(jnp.repeat(
        abi["logwd"][:, 0].reshape(mb_h, mb_w), 16, 0), 16, 1)
    lw_c = jnp.repeat(jnp.repeat(
        abi["logwd"][:, 1].reshape(mb_h, mb_w), 8, 0), 8, 1)

    def comb(p0, p1, plane_idx, lw, m0, m1, scale):
        w0 = px(wp[:, :, 0, plane_idx, 0], scale)
        o0 = px(wp[:, :, 0, plane_idx, 1], scale)
        w1 = px(wp[:, :, 1, plane_idx, 0], scale)
        o1 = px(wp[:, :, 1, plane_idx, 1], scale)
        bi = weight_bi_dev(p0, p1, w0, w1, o0, o1, lw)
        uni0 = weight_uni_dev(p0, w0, o0, lw)
        uni1 = weight_uni_dev(p1, w1, o1, lw)
        return jnp.where(m0 & m1, bi, jnp.where(m0, uni0, uni1))

    pred_y = comb(preds_y[0], preds_y[1], 0, lw_y, u0, u1, 4)
    pred_cb = comb(preds_c[0][0], preds_c[1][0], 1, lw_c, u0c, u1c, 2)
    pred_cr = comb(preds_c[0][1], preds_c[1][1], 2, lw_c, u0c, u1c, 2)
    return pred_y, pred_cb, pred_cr


def inter_predict_pallas_batch(abi_b, dpb_y_b, dpb_c_b, slots_b,
                               mb_w: int, mb_h: int, lists=(0, 1),
                               interpret: bool | None = None):
    """Batched Pallas MC over the stream axis.

    abi_b: dict with [B, ...]-leading "mv", "refslot", "wp", "logwd"
    (weights already resolved); dpb_y_b [B, S, 4, Hp, WL] u32 packed;
    dpb_c_b [B, S, 2, Hcp, WLc]; slots_b [B, MAX_SLOTS] i32.
    Returns ([B, H, W], [B, H2, W2] x2) int32 (intra lanes garbage).
    The XLA prep + combine vmap over streams; the kernels run ONCE on a
    (stream, band) grid."""
    W = mb_w * 16
    mv_rs = {"mv": abi_b["mv"], "refslot": abi_b["refslot"]}
    preds_y, preds_c = [], []
    for lst in lists:
        cand, m12, binfo = jax.vmap(
            lambda a, s: mc_prepare_luma(a, mb_w, mb_h, s, lst))(
            mv_rs, slots_b)
        py = mc_luma_pallas_batch(dpb_y_b, cand, m12, binfo, slots_b,
                                  mb_w, mb_h, interpret)
        preds_y.append(unpack_u32_plane(py, W).astype(jnp.int32))
        ce, co, xfyf, binfo_c = jax.vmap(
            lambda a, s: mc_prepare_chroma(a, mb_w, mb_h, s, lst))(
            mv_rs, slots_b)
        pc = mc_chroma_pallas_batch(dpb_c_b, ce, co, xfyf, binfo_c,
                                    slots_b, mb_w, mb_h, interpret)
        preds_c.append(unpack_u32_plane(pc, W // 2).astype(jnp.int32))
    if len(lists) == 1:
        preds_y.append(preds_y[0])
        preds_c.append(preds_c[0])

    def comb_one(refslot, wp, logwd, y0, y1, c0, c1):
        return _mc_combine({"refslot": refslot, "wp": wp, "logwd": logwd},
                           [y0, y1], [c0, c1], mb_w, mb_h, lists)

    return jax.vmap(comb_one)(
        abi_b["refslot"], abi_b["wp"], abi_b["logwd"],
        preds_y[0], preds_y[1], preds_c[0], preds_c[1])


def inter_predict_pallas(abi, dpb_y4p, dpb_cp, slot_list,
                         mb_w: int, mb_h: int, lists=(0, 1),
                         interpret: bool | None = None):
    """Same contract as ops.inter.inter_predict, Pallas MC path.

    dpb_y4p [S, 4, Hp, WL] u32 packed; dpb_cp [S, 2, Hcp, WLc] u32 packed.
    Returns (pred_y [H, W], pred_cb, pred_cr) int32 (intra lanes garbage).
    """
    abi_b = {k: jnp.asarray(abi[k])[None]
             for k in ("mv", "refslot", "wp", "logwd")}
    out = inter_predict_pallas_batch(
        abi_b, dpb_y4p[None], dpb_cp[None],
        jnp.asarray(slot_list, jnp.int32)[None], mb_w, mb_h, lists,
        interpret)
    return tuple(o[0] for o in out)
