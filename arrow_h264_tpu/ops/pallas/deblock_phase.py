"""Phase-batched Pallas deblocking — the north-star "wavefront-free
batched-MB" schedule (SURVEY.md §2 parallelism row 1).

Reference parity: JM-lineage `DeblockPicture` / `loopFilter.c` (SURVEY.md
§2, §3.5).  The spec's MB-raster order has dependency set
{(r,c-1), (r-1,c), (r-1,c+1)} per MB — (r,c-1) through the left columns
the vertical MB-boundary filter reads/writes, (r-1,c) through the top
rows, (r-1,c+1) through the top-right 3x4 corner its E0v writes.  The
knight-move phase `2r + c` respects all three, so every MB of a phase is
filtered in ONE batched step (≤ mb_h MBs x B streams), bit-exactly.

Layout: frame planes are SKEWED per MB-row (row-block r shifted right by
2r MBs) so a phase's MBs form one contiguous pixel column, stored as
16-px-wide column blocks with B streams packed into lanes (lane = c*B+s).
Per phase the kernel DMAs two blocks (left: this phase's partially
filtered output; right: fresh input), filters the 4 vertical then 4
horizontal edge positions of all MBs in the phase as dense vector steps,
and DMAs both halves back.  Inactive rows carry bs=0 metadata (filter
no-op), so no masking logic is needed.

Per-edge parameters (bS / tc0 / alpha / beta from ops.deblock.deblock_tables)
are pre-expanded in XLA into per-phase maps aligned with the slab layout.
No transposes (Mosaic 2D transpose measured 18.8 ms at this size) and no
pltpu.repeat on lanes (miscompiles) are used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RPAD = 8   # top/bottom padding rows in the skewed planes


def n_phases(mb_w: int, mb_h: int) -> int:
    return mb_w + 2 * (mb_h - 1)


# ---------------------------------------------------------------------------
# XLA prep: skew <-> blocks
# ---------------------------------------------------------------------------

def _skew(planes, mb_h: int, row_px: int, shift_px: int, lead_px: int,
          total_px: int):
    """[B, H, W] -> [B, H + 2*RPAD, total_px]; row-block r shifted by
    lead_px + shift_px * r."""
    B, H, W = planes.shape
    rows = planes.reshape(B, mb_h, row_px, W)
    parts = []
    for r in range(mb_h):
        lo = lead_px + shift_px * r
        parts.append(jnp.pad(rows[:, r], ((0, 0), (0, 0),
                                          (lo, total_px - W - lo))))
    sk = jnp.stack(parts, axis=1).reshape(B, H, total_px)
    return jnp.pad(sk, ((0, 0), (RPAD, RPAD), (0, 0)))


def _unskew(sk, mb_h: int, row_px: int, shift_px: int, lead_px: int,
            W: int):
    """Inverse of _skew (drops padding)."""
    B = sk.shape[0]
    body = sk[:, RPAD:-RPAD, :]
    H = body.shape[1]
    rows = body.reshape(B, mb_h, row_px, -1)
    parts = []
    for r in range(mb_h):
        lo = lead_px + shift_px * r
        parts.append(rows[:, r, :, lo:lo + W])
    return jnp.stack(parts, axis=1).reshape(B, H, W)


def _to_blocks(sk, blk_px: int):
    """[B, RH, Wk] -> [NB, RH, blk_px*B] u8 (lane = c*B + s)."""
    B, RH, Wk = sk.shape
    NB = Wk // blk_px
    x = sk.reshape(B, RH, NB, blk_px)
    return x.transpose(2, 1, 3, 0).reshape(NB, RH, blk_px * B) \
        .astype(jnp.uint8)


def _from_blocks(blocks, B: int):
    """[NB, RH, blk_px*B] -> [B, RH, Wk]."""
    NB, RH, L = blocks.shape
    blk_px = L // B
    x = blocks.reshape(NB, RH, blk_px, B)
    return x.transpose(3, 1, 0, 2).reshape(B, RH, NB * blk_px)


def _skew_phase_axis(arr, mb_h: int, NP: int):
    """[B, mb_h, mb_w, ...] -> [B, mb_h, NP, ...]: row r's mb_w entries
    placed at phase offsets 2r .. 2r+mb_w-1 (zeros elsewhere)."""
    mb_w = arr.shape[2]
    parts = []
    for r in range(mb_h):
        pad = [(0, 0)] * arr.ndim
        pad[2] = (2 * r, NP - mb_w - 2 * r)
        parts.append(jnp.pad(arr[:, r:r + 1], pad))
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# XLA prep: per-phase metadata maps
# ---------------------------------------------------------------------------

def _vmeta(bs, tc, a, b, mb_w: int, mb_h: int, seg_rows: int):
    """bs/tc [B, n, E, 4] a/b [B, n, E] -> [NP, RH, 2E*... ] u8 map.

    Output lane = f*B + s with fields f = [bs_e..., tc_e..., a_e..., b_e...]
    (E each); sublane = skewed row."""
    B = bs.shape[0]
    E = bs.shape[2]
    NP = n_phases(mb_w, mb_h)
    rows = seg_rows * 4
    # [B, mb_h, mb_w, rows, E]
    def seg_expand(x):
        x = x.reshape(B, mb_h, mb_w, E, 4).transpose(0, 1, 2, 4, 3)
        return jnp.repeat(x, seg_rows, axis=3)
    bs_r = seg_expand(bs)
    tc_r = seg_expand(tc)
    ab = jnp.broadcast_to(
        a.reshape(B, mb_h, mb_w, 1, E), bs_r.shape)
    bb = jnp.broadcast_to(
        b.reshape(B, mb_h, mb_w, 1, E), bs_r.shape)
    m = jnp.concatenate([bs_r, tc_r, ab, bb], axis=4)  # [B,mb_h,mb_w,rows,4E]
    m = _skew_phase_axis(m, mb_h, NP)                  # [B,mb_h,NP,rows,4E]
    m = m.transpose(2, 1, 3, 4, 0)                     # [NP,mb_h,rows,4E,B]
    m = m.reshape(NP, mb_h * rows, 4 * E * B)
    return jnp.pad(m, ((0, 0), (RPAD, RPAD), (0, 0))).astype(jnp.uint8)


def _hmeta(bs, tc, a, b, mb_w: int, mb_h: int, seg_cols: int, win: int,
           lead: int):
    """bs/tc [B, n, E, 4] a/b [B, n, E] -> [NP, 4E, mb_h, win*B] u8.

    Lane = c*B + s over the phase window's `win` columns; the MB occupies
    window cols lead .. lead+4*seg_cols*... (zeros elsewhere -> bs=0 no-op)."""
    B = bs.shape[0]
    E = bs.shape[2]
    NP = n_phases(mb_w, mb_h)
    mbw_px = 4 * seg_cols

    def col_expand(x):   # [B, n, E, 4seg] -> [B, mb_h, mb_w, E, win]
        x = x.reshape(B, mb_h, mb_w, E, 4)
        x = jnp.repeat(x, seg_cols, axis=4)            # MB cols
        return jnp.pad(x, ((0, 0),) * 4 + ((lead, win - mbw_px - lead),))
    bs_c = col_expand(bs)
    tc_c = col_expand(tc)
    ae = jnp.pad(jnp.broadcast_to(
        a.reshape(B, mb_h, mb_w, E, 1),
        (B, mb_h, mb_w, E, mbw_px)),
        ((0, 0),) * 4 + ((lead, win - mbw_px - lead),))
    be = jnp.pad(jnp.broadcast_to(
        b.reshape(B, mb_h, mb_w, E, 1),
        (B, mb_h, mb_w, E, mbw_px)),
        ((0, 0),) * 4 + ((lead, win - mbw_px - lead),))
    m = jnp.concatenate([bs_c, tc_c, ae, be], axis=3)  # [B,mb_h,mb_w,4E,win]
    m = _skew_phase_axis(m, mb_h, NP)                  # [B,mb_h,NP,4E,win]
    m = m.transpose(2, 3, 1, 4, 0)                     # [NP,4E,mb_h,win,B]
    return m.reshape(NP, 4 * E, mb_h, win * B).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# filter math (identical formulas to deblock_kernel; operand-shape agnostic)
# ---------------------------------------------------------------------------

def _luma_filter(p3, p2, p1, p0, q0, q1, q2, q3, bs, tc0, alpha, beta):
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
    return np2, np1, np0, nq0, nq1, nq2


def _chroma_filter(p1, p0, q0, q1, bs, tc0, alpha, beta):
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
    return np0, nq0


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
#
# Phase window = FOUR blocks (array indices p .. p+3).  With skew lead
# 2.5 blocks, window col W maps to: current row-block r's MB at
# W in [2.5*blk, 2.5*blk+blk); row-block r-1 (the H pass's above-strip)
# at W in [0.5*blk, 1.5*blk).  Blocks p..p+2 are re-read from OUT (they
# were written by earlier phases; from IN on their first touch when
# p+i < 3), block p+3 is fresh from IN.  All four are written back; block
# p is final after phase p.


def _phase_kernel(vm_ref, hm_ref, in_ref, out_ref, land, pf, ostage, slab,
                  sem_in, sem_pf, sem_out, *, NS: int, mb_h: int,
                  luma: bool, NP: int, ablate: str = ""):
    del in_ref  # aliased to out_ref; kept for arity
    blk = 16 if luma else 8
    rpb = 16 if luma else 8
    NE = 4 if luma else 2
    taps = 8 if luma else 4
    p = pl.program_id(0)
    A = slab.shape[0]
    half = blk * NS
    mb0 = (2 * blk + blk // 2) * NS      # lane of MB col 0, current row
    ab0 = (blk // 2) * NS                # lane of MB col 0, above row

    # The slab is CARRIED across phases: after phase p it holds blocks
    # p..p+3 post-filter, so phase p+1 shifts it left one block and only
    # DMAs the one new block (p+4, prefetched during phase p — its first
    # write is at phase p+1, so its pre-read is the original input via
    # the in/out aliasing).  Writebacks: block p is final after phase p;
    # its out-DMA overlaps the next phase (parity-alternating staging),
    # and the last phase flushes the remaining three blocks.

    # wait the previous phase's writeback before reusing its staging
    @pl.when((p > 0) & (p % 2 == 1))
    def _():
        pltpu.make_async_copy(ostage.at[0], out_ref.at[p - 1],
                              sem_out.at[0]).wait()

    @pl.when((p > 0) & (p % 2 == 0))
    def _():
        pltpu.make_async_copy(ostage.at[1], out_ref.at[p - 1],
                              sem_out.at[1]).wait()

    @pl.when(p == 0)
    def _():
        for i in range(4):
            pltpu.make_async_copy(out_ref.at[i], land.at[i],
                                  sem_in.at[i]).start()
        for i in range(4):
            pltpu.make_async_copy(out_ref.at[i], land.at[i],
                                  sem_in.at[i]).wait()
        for i in range(4):
            slab[:, :, i * half:(i + 1) * half] = \
                land[i].astype(jnp.int32).reshape(A, rpb, half)

    @pl.when(p > 0)
    def _():
        slab[:, :, 0:3 * half] = slab[:, :, half:4 * half]
        pltpu.make_async_copy(out_ref.at[p + 3], pf, sem_pf).wait()
        slab[:, :, 3 * half:] = pf[:, :].astype(jnp.int32) \
            .reshape(A, rpb, half)

    @pl.when(p + 4 < NP + 3)             # prefetch next phase's new block
    def _():
        pltpu.make_async_copy(out_ref.at[p + 4], pf, sem_pf).start()

    vm = vm_ref[0].astype(jnp.int32).reshape(A, rpb, 4 * NE * NS)

    # ---- vertical edges: edge e at window lane (mb0 + 4e*NS).
    # Operands are 2D [RH, NS] (leading dims merged via value reshape):
    # 3D [A, rpb, NS] slices cost ~3x in Mosaic (per-outer iteration).
    vm2 = vm.reshape(A * rpb, 4 * NE * NS)
    for e in range(0 if "v" in ablate else NE):
        c0 = mb0 + (4 * e - taps // 2) * NS
        s2 = slab[:, :, c0:c0 + (taps + 1) * NS].reshape(
            A * rpb, (taps + 1) * NS)
        t = [s2[:, k * NS:(k + 1) * NS] for k in range(taps)]
        par = [vm2[:, (f * NE + e) * NS:(f * NE + e + 1) * NS]
               for f in range(4)]
        res = _luma_filter(*t, *par) if luma else _chroma_filter(*t, *par)
        w0 = c0 + NS
        for k, v in enumerate(res):
            slab[:, :, w0 + k * NS: w0 + (k + 1) * NS] = \
                v.reshape(A, rpb, NS)

    # ---- horizontal edges: taps along rows; above rows (m < RPAD) read
    # the above-strip lanes, current rows the MB lanes.
    def row_get(m):
        base = ab0 if m < RPAD else mb0
        if m < rpb:
            return slab[0:mb_h, m, base:base + blk * NS]
        return slab[1:mb_h + 1, m - rpb, base:base + blk * NS]

    def row_set(m, v):
        base = ab0 if m < RPAD else mb0
        if m < rpb:
            slab[0:mb_h, m, base:base + blk * NS] = v
        else:
            slab[1:mb_h + 1, m - rpb, base:base + blk * NS] = v

    for e in range(0 if "h" in ablate else NE):
        base = RPAD + 4 * e - taps // 2
        t = [row_get(base + k) for k in range(taps)]
        par = [hm_ref[0, f * NE + e].astype(jnp.int32) for f in range(4)]
        res = _luma_filter(*t, *par) if luma else _chroma_filter(*t, *par)
        for k, v in enumerate(res):
            row_set(base + 1 + k, v)

    @pl.when((p < NP - 1) & (p % 2 == 0))
    def _():
        ostage[0] = slab[:, :, 0:half].reshape(A * rpb, half) \
            .astype(jnp.uint8)
        pltpu.make_async_copy(ostage.at[0], out_ref.at[p],
                              sem_out.at[0]).start()

    @pl.when((p < NP - 1) & (p % 2 == 1))
    def _():
        ostage[1] = slab[:, :, 0:half].reshape(A * rpb, half) \
            .astype(jnp.uint8)
        pltpu.make_async_copy(ostage.at[1], out_ref.at[p],
                              sem_out.at[1]).start()

    @pl.when(p == NP - 1)                # final phase: flush all 4 blocks
    def _():
        for i in range(4):
            land[i] = slab[:, :, i * half:(i + 1) * half] \
                .reshape(A * rpb, half).astype(jnp.uint8)
        for i in range(4):
            pltpu.make_async_copy(land.at[i], out_ref.at[p + i],
                                  sem_in.at[i]).start()
        for i in range(4):
            pltpu.make_async_copy(land.at[i], out_ref.at[p + i],
                                  sem_in.at[i]).wait()


def _run_plane(blocks, vmap_, hmap_, mb_w: int, mb_h: int, NS: int,
               luma: bool, interpret: bool, ablate: str = ""):
    NB, RH, half = blocks.shape
    blk = 16 if luma else 8
    rpb = 16 if luma else 8
    NE = 4 if luma else 2
    NP = n_phases(mb_w, mb_h)
    A = RH // rpb
    vspec = pl.BlockSpec((1, RH, 4 * NE * NS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 4 * NE, mb_h, blk * NS),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_phase_kernel, NS=NS, mb_h=mb_h, luma=luma,
                          NP=NP, ablate=ablate),
        out_shape=jax.ShapeDtypeStruct(blocks.shape, jnp.uint8),
        grid=(NP,),
        in_specs=[vspec, hspec,
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((4, RH, half), jnp.uint8),   # land (init/flush)
            pltpu.VMEM((RH, half), jnp.uint8),      # pf (prefetch)
            pltpu.VMEM((2, RH, half), jnp.uint8),   # ostage (parity)
            pltpu.VMEM((A, rpb, 4 * half), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(vmap_, hmap_, blocks)


def deblock_phase_batch(y, cb, cr, tables, mb_w: int, mb_h: int,
                        interpret: bool | None = None,
                        in_blocks=None):
    """Knight-phase batched deblock.  y [B, H, W] int32 (cb/cr half res),
    tables: dict of STACKED [B, ...] deblock_tables outputs.
    Returns filtered (y, cb, cr) int32.

    in_blocks=(y_blocks, c_blocks, B0): take the inputs directly in the
    skewed block layout from intra_phase_batch(raw_out=True) — same
    horizontal skew/lane packing; intra's luma vertical pad (row_px=16)
    is trimmed to this kernel's RPAD=8, chroma pads already match.
    Elides the unskew->reskew HBM round-trip between the stages; y/cb/cr
    are ignored (pass None)."""
    NP = n_phases(mb_w, mb_h)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16

    if in_blocks is not None:
        yblk, cblk, B0 = in_blocks
        B = yblk.shape[2] // 16      # lane = c*B + s
        if B != B0:
            tables = {k: jnp.pad(v, ((0, B - B0),) + ((0, 0),) * (v.ndim - 1))
                      for k, v in tables.items()}
        blocks = yblk[:, 16 - RPAD:-(16 - RPAD), :]
        cblocks_in = cblk           # chroma pad row_px=8 == RPAD
    else:
        B0 = y.shape[0]
        # Pad the stream batch to a multiple of 8 so every lane dimension
        # is a multiple of 128 (Mosaic DMA tiling).  Dummy lanes cost no
        # extra vector instructions (ops were lane-padded anyway).
        B = max(8, -(-B0 // 8) * 8)
        if B != B0:
            pad = ((0, B - B0), (0, 0), (0, 0))
            y = jnp.pad(y, pad)
            cb = jnp.pad(cb, pad)
            cr = jnp.pad(cr, pad)
            tables = {k: jnp.pad(v, ((0, B - B0),) + ((0, 0),) * (v.ndim - 1))
                      for k, v in tables.items()}

        # --- luma: blocks over skewed cols [0, (NP+3)*16), lead 2.5 blocks
        sk = _skew(y.astype(jnp.uint8), mb_h, 16, 32, 40, (NP + 3) * 16)
        blocks = _to_blocks(sk, 16)
    vm = _vmeta(tables["bs_v"].reshape(B, n, 4, 4),
                tables["tc_v"].reshape(B, n, 4, 4),
                tables["a_v"].reshape(B, n, 4),
                tables["b_v"].reshape(B, n, 4), mb_w, mb_h, 4)
    hm = _hmeta(tables["bs_h"].reshape(B, n, 4, 4),
                tables["tc_h"].reshape(B, n, 4, 4),
                tables["a_h"].reshape(B, n, 4),
                tables["b_h"].reshape(B, n, 4), mb_w, mb_h, 4, 16, 0)
    outb = _run_plane(blocks, vm, hm, mb_w, mb_h, B, True, interpret)
    y_out = _unskew(_from_blocks(outb, B), mb_h, 16, 32, 40, W) \
        .astype(jnp.int32)

    # --- chroma: cb and cr as 2B lane-streams (plane-specific tc/a/b)
    if in_blocks is not None:
        cblocks = cblocks_in
    else:
        c2 = jnp.concatenate([cb, cr], axis=0).astype(jnp.uint8)
        skc = _skew(c2, mb_h, 8, 16, 20, (NP + 3) * 8)
        cblocks = _to_blocks(skc, 8)
    bs_c = tables["bs_c"].reshape(B, n, 2, 2, 4)
    tc_c = tables["tc_c"].reshape(B, n, 2, 2, 4, 2)
    a_c = tables["a_c"].reshape(B, n, 2, 2, 2)
    b_c = tables["b_c"].reshape(B, n, 2, 2, 2)

    def stk(x0, x1):
        return jnp.concatenate([x0, x1], axis=0)

    vmc = _vmeta(stk(bs_c[:, :, 0], bs_c[:, :, 0]),
                 stk(tc_c[:, :, 0, :, :, 0], tc_c[:, :, 0, :, :, 1]),
                 stk(a_c[:, :, 0, :, 0], a_c[:, :, 0, :, 1]),
                 stk(b_c[:, :, 0, :, 0], b_c[:, :, 0, :, 1]),
                 mb_w, mb_h, 2)
    hmc = _hmeta(stk(bs_c[:, :, 1], bs_c[:, :, 1]),
                 stk(tc_c[:, :, 1, :, :, 0], tc_c[:, :, 1, :, :, 1]),
                 stk(a_c[:, :, 1, :, 0], a_c[:, :, 1, :, 1]),
                 stk(b_c[:, :, 1, :, 0], b_c[:, :, 1, :, 1]),
                 mb_w, mb_h, 2, 8, 0)
    outc = _run_plane(cblocks, vmc, hmc, mb_w, mb_h, 2 * B, False,
                      interpret)
    cfl = _unskew(_from_blocks(outc, 2 * B), mb_h, 8, 16, 20, W // 2) \
        .astype(jnp.int32)
    return y_out[:B0], cfl[:B0], cfl[B:B + B0]
