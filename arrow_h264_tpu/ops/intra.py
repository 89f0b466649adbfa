"""Device intra reconstruction: wavefront-phased batched-MB kernels (JAX).

Reference parity: JM-lineage serial `decode_one_macroblock` intra path
(SURVEY.md §3.2) re-scheduled as a knight-move wavefront (phase = 2*mb_y +
mb_x, SURVEY.md §7 "hard parts"): all MBs in a phase are mutually
independent; within an MB, 4x4/8x8 blocks advance through fixed sub-steps
(2*y4 + x4) that respect the spec's left/top/top-left/top-right dependencies.

The frame lives in a padded int32 buffer carried through a lax.scan over
phases; every job is vectorized over the MBs of the phase (and, one level
up, over the stream batch via vmap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .abi import KIND_I4x4, KIND_I8x8, KIND_I16, KIND_IPCM
from .intra_tables import R4, R8, S4, S8, W4, W8

# substep -> list of (x4, y4) luma 4x4 block positions (2*y4 + x4 == s)
_SUBSTEP_BLOCKS = [[(x, y) for y in range(4) for x in range(4) if 2 * y + x == s]
                   for s in range(10)]
_SUBSTEP_BLK8 = {0: 0, 2: 1, 4: 2, 6: 3}  # substep -> 8x8 block (2*(2y8)+2x8)


def build_schedule(mb_w: int, mb_h: int):
    """Knight-move wavefront schedule. Returns (mb_idx [F,P], active [F,P])."""
    n_phases = 2 * (mb_h - 1) + mb_w
    per_phase = [[my * mb_w + (p - 2 * my) for my in range(mb_h)
                  if 0 <= p - 2 * my < mb_w] for p in range(n_phases)]
    pmax = max(len(m) for m in per_phase)
    mb_idx = np.zeros((n_phases, pmax), np.int32)
    active = np.zeros((n_phases, pmax), bool)
    for p, mbs in enumerate(per_phase):
        mb_idx[p, :len(mbs)] = mbs
        active[p, :len(mbs)] = True
    return jnp.asarray(mb_idx), jnp.asarray(active)


def _win_gather(buf, py, px, h: int, w: int):
    """vmapped dynamic_slice: windows [P, h, w] at buffer coords (py, px)."""
    return jax.vmap(lambda y, x: jax.lax.dynamic_slice(buf, (y, x), (h, w)))(py, px)


def _scatter(buf, mask, py, px, out, h: int, w: int):
    """Masked disjoint scatter of [P, h, w] tiles at buffer coords +1 offset.

    Inactive jobs are redirected to the dummy region BELOW the frame (rows
    >= H+1, never touched by active jobs) and write back gathered current
    values — identical across duplicates, so the scatter stays deterministic.
    """
    dummy_row = buf.shape[0] - 17  # top of the dummy strip
    by = jnp.where(mask, py + 1, dummy_row)
    bx = jnp.where(mask, px + 1, 0)
    ys = by[:, None, None] + jnp.arange(h)[None, :, None]
    xs = bx[:, None, None] + jnp.arange(w)[None, None, :]
    cur = buf[ys, xs]
    vals = jnp.where(mask[:, None, None], out, cur)
    return buf.at[ys, xs].set(vals)


def _res_gather(res, py, px, h: int, w: int):
    return jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(res, (y, x), (h, w)))(py, px)


def _dc4(top, left, al, at):
    st = top[:, :4].sum(1)
    sl = left.sum(1)
    both = (st + sl + 4) >> 3
    lonly = (sl + 2) >> 2
    tonly = (st + 2) >> 2
    return jnp.where(at & al, both,
                     jnp.where(al, lonly, jnp.where(at, tonly, 128)))


def _linear_preds(v, W, S, R):
    """v [P, dim] -> [P, 9, n*n] all-mode predictions."""
    lin = jnp.einsum("pi,mji->pmj", v, jnp.asarray(W))
    return (lin + jnp.asarray(R)[None]) >> jnp.asarray(S)[None]


def _job_luma4(yb, res_y, mask, py, px, mode, avail):
    """One 4x4 intra-luma job across P MBs."""
    win = _win_gather(yb, py, px, 5, 9)  # buffer coords == (py-1,px-1)+1
    al, at = avail[:, 0] > 0, avail[:, 1] > 0
    atl, atr = avail[:, 2] > 0, avail[:, 3] > 0
    tl = jnp.where(atl, win[:, 0, 0], 0)
    top = jnp.where(at[:, None], win[:, 0, 1:9], 0)
    top = top.at[:, 4:].set(
        jnp.where((at & ~atr)[:, None], top[:, 3:4], top[:, 4:]))
    left = jnp.where(al[:, None], win[:, 1:5, 0], 0)
    v = jnp.concatenate([tl[:, None], top, left], axis=1)
    preds = _linear_preds(v, W4, S4, R4)          # [P, 9, 16]
    pred = jnp.take_along_axis(preds, mode[:, None, None].astype(jnp.int32),
                               axis=1)[:, 0]
    dc = _dc4(top, left, al, at)
    pred = jnp.where((mode == 2)[:, None], dc[:, None], pred).reshape(-1, 4, 4)
    res = _res_gather(res_y, py, px, 4, 4)
    out = jnp.clip(pred + res, 0, 255)
    return _scatter(yb, mask, py, px, out, 4, 4)


def _filter8_refs(tl, top, left, al, at, atl):
    """Intra_8x8 reference filtering (spec 8.3.2.2.1), vectorized [P, ...]."""
    t, l = top, left
    ft0 = jnp.where(atl, (tl + 2 * t[:, 0] + t[:, 1] + 2) >> 2,
                    (3 * t[:, 0] + t[:, 1] + 2) >> 2)
    mid = (t[:, :-2] + 2 * t[:, 1:-1] + t[:, 2:] + 2) >> 2   # x = 1..14
    ft15 = (t[:, 14] + 3 * t[:, 15] + 2) >> 2
    ft = jnp.concatenate([ft0[:, None], mid, ft15[:, None]], axis=1)
    ft = jnp.where(at[:, None], ft, t)
    ftl = jnp.where(at & al, (t[:, 0] + 2 * tl + l[:, 0] + 2) >> 2,
                    jnp.where(at, (3 * tl + t[:, 0] + 2) >> 2,
                              jnp.where(al, (3 * tl + l[:, 0] + 2) >> 2, tl)))
    ftl = jnp.where(atl, ftl, tl)
    fl0 = jnp.where(atl, (tl + 2 * l[:, 0] + l[:, 1] + 2) >> 2,
                    (3 * l[:, 0] + l[:, 1] + 2) >> 2)
    lmid = (l[:, :-2] + 2 * l[:, 1:-1] + l[:, 2:] + 2) >> 2  # y = 1..6
    fl7 = (l[:, 6] + 3 * l[:, 7] + 2) >> 2
    fl = jnp.concatenate([fl0[:, None], lmid, fl7[:, None]], axis=1)
    fl = jnp.where(al[:, None], fl, l)
    return ftl, ft, fl


def _job_luma8(yb, res_y, mask, py, px, mode, avail):
    win = _win_gather(yb, py, px, 9, 17)
    al, at = avail[:, 0] > 0, avail[:, 1] > 0
    atl, atr = avail[:, 2] > 0, avail[:, 3] > 0
    tl = jnp.where(atl, win[:, 0, 0], 0)
    top = jnp.where(at[:, None], win[:, 0, 1:17], 0)
    top = top.at[:, 8:].set(
        jnp.where((at & ~atr)[:, None], top[:, 7:8], top[:, 8:]))
    left = jnp.where(al[:, None], win[:, 1:9, 0], 0)
    ftl, ft, fl = _filter8_refs(tl, top, left, al, at, atl)
    v = jnp.concatenate([ftl[:, None], ft, fl], axis=1)
    preds = _linear_preds(v, W8, S8, R8)          # [P, 9, 64]
    pred = jnp.take_along_axis(preds, mode[:, None, None].astype(jnp.int32),
                               axis=1)[:, 0]
    st = ft[:, :8].sum(1)
    sl = fl.sum(1)
    dc = jnp.where(at & al, (st + sl + 8) >> 4,
                   jnp.where(al, (sl + 4) >> 3,
                             jnp.where(at, (st + 4) >> 3, 128)))
    pred = jnp.where((mode == 2)[:, None], dc[:, None], pred).reshape(-1, 8, 8)
    res = _res_gather(res_y, py, px, 8, 8)
    out = jnp.clip(pred + res, 0, 255)
    return _scatter(yb, mask, py, px, out, 8, 8)


def _job_luma16(yb, res_y, mask, py, px, mode, mb_avail):
    win = _win_gather(yb, py, px, 17, 17)
    al, at, atl = mb_avail[:, 0] > 0, mb_avail[:, 1] > 0, mb_avail[:, 2] > 0
    tl = jnp.where(atl, win[:, 0, 0], 0)
    top = jnp.where(at[:, None], win[:, 0, 1:17], 0)
    left = jnp.where(al[:, None], win[:, 1:17, 0], 0)
    vert = jnp.broadcast_to(top[:, None, :], top.shape[:1] + (16, 16))
    hor = jnp.broadcast_to(left[:, :, None], left.shape[:1] + (16, 16))
    st, sl = top.sum(1), left.sum(1)
    dcv = jnp.where(at & al, (st + sl + 16) >> 5,
                    jnp.where(al, (sl + 8) >> 4,
                              jnp.where(at, (st + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dcv[:, None, None], vert.shape)
    # plane (spec 8.3.3.4)
    te = jnp.concatenate([tl[:, None], top], axis=1)
    le = jnp.concatenate([tl[:, None], left], axis=1)
    xs = jnp.arange(8)
    h = ((xs + 1)[None] * (te[:, 9:17] - te[:, 7 - xs])).sum(1)
    vv = ((xs + 1)[None] * (le[:, 9:17] - le[:, 7 - xs])).sum(1)
    a = 16 * (left[:, 15] + top[:, 15])
    b = (5 * h + 32) >> 6
    c = (5 * vv + 32) >> 6
    g = jnp.arange(16)
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (g[None, None, :] - 7)
                      + c[:, None, None] * (g[None, :, None] - 7) + 16) >> 5,
                     0, 255)
    preds = jnp.stack([vert, hor, dc, plane], axis=1)
    pred = jnp.take_along_axis(
        preds, mode[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
    res = _res_gather(res_y, py, px, 16, 16)
    out = jnp.clip(pred + res, 0, 255)
    return _scatter(yb, mask, py, px, out, 16, 16)


def _job_pcm_luma(yb, res_y, mask, py, px):
    res = _res_gather(res_y, py, px, 16, 16)
    return _scatter(yb, mask, py, px, res, 16, 16)


def _job_chroma(cb_buf, res_c, mask, py, px, mode, mb_avail, is_pcm):
    """One chroma plane for all intra kinds (incl. PCM with zero pred)."""
    win = _win_gather(cb_buf, py, px, 9, 9)
    al, at, atl = mb_avail[:, 0] > 0, mb_avail[:, 1] > 0, mb_avail[:, 2] > 0
    tl = jnp.where(atl, win[:, 0, 0], 0)
    top = jnp.where(at[:, None], win[:, 0, 1:9], 0)
    left = jnp.where(al[:, None], win[:, 1:9, 0], 0)
    # DC per 4x4 sub-block (spec 8.3.4.1)
    st = jnp.stack([top[:, :4].sum(1), top[:, 4:].sum(1)], 1)   # [P, 2]
    sl = jnp.stack([left[:, :4].sum(1), left[:, 4:].sum(1)], 1)
    dcs = []
    for by in range(2):
        row = []
        for bx in range(2):
            t_, l_ = st[:, bx], sl[:, by]
            both = (t_ + l_ + 4) >> 3
            tonly = (t_ + 2) >> 2
            lonly = (l_ + 2) >> 2
            if (bx, by) == (0, 0) or (bx > 0 and by > 0):
                v = jnp.where(at & al, both,
                              jnp.where(al, lonly, jnp.where(at, tonly, 128)))
            elif bx > 0:
                v = jnp.where(at, tonly, jnp.where(al, lonly, 128))
            else:
                v = jnp.where(al, lonly, jnp.where(at, tonly, 128))
            row.append(v)
        dcs.append(row)
    dc = jnp.block([[dcs[0][0][:, None, None] * jnp.ones((1, 4, 4), jnp.int32),
                     dcs[0][1][:, None, None] * jnp.ones((1, 4, 4), jnp.int32)],
                    [dcs[1][0][:, None, None] * jnp.ones((1, 4, 4), jnp.int32),
                     dcs[1][1][:, None, None] * jnp.ones((1, 4, 4), jnp.int32)]])
    hor = jnp.broadcast_to(left[:, :, None], left.shape[:1] + (8, 8))
    vert = jnp.broadcast_to(top[:, None, :], top.shape[:1] + (8, 8))
    te = jnp.concatenate([tl[:, None], top], axis=1)
    le = jnp.concatenate([tl[:, None], left], axis=1)
    xs = jnp.arange(4)
    h = ((xs + 1)[None] * (te[:, 5:9] - te[:, 3 - xs])).sum(1)
    vv = ((xs + 1)[None] * (le[:, 5:9] - le[:, 3 - xs])).sum(1)
    a = 16 * (left[:, 7] + top[:, 7])
    b = (34 * h + 32) >> 6
    c = (34 * vv + 32) >> 6
    g = jnp.arange(8)
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (g[None, None, :] - 3)
                      + c[:, None, None] * (g[None, :, None] - 3) + 16) >> 5,
                     0, 255)
    preds = jnp.stack([dc, hor, vert, plane], axis=1)
    pred = jnp.take_along_axis(
        preds, mode[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
    pred = jnp.where(is_pcm[:, None, None], 0, pred)
    res = _res_gather(res_c, py, px, 8, 8)
    out = jnp.clip(pred + res, 0, 255)
    return _scatter(cb_buf, mask, py, px, out, 8, 8)


def intra_reconstruct(abi, res_y, res_cb, res_cr, mb_w: int, mb_h: int,
                      init_y=None, init_cb=None, init_cr=None):
    """Run the full intra/PCM reconstruction wavefront.

    `init_*` planes carry already-reconstructed inter-MB pixels (MC stage);
    intra/PCM jobs overwrite their own MBs and may read inter neighbors.
    Returns (y, cb, cr) int32 planes.
    """
    H, W = mb_h * 16, mb_w * 16
    # +1 top/left border for edge gathers; +17 dummy rows for masked scatters
    yb = jnp.zeros((H + 1 + 17, W + 9), jnp.int32)
    cbb = jnp.zeros((H // 2 + 1 + 17, W // 2 + 1), jnp.int32)
    crb = jnp.zeros((H // 2 + 1 + 17, W // 2 + 1), jnp.int32)
    if init_y is not None:
        yb = yb.at[1:H + 1, 1:W + 1].set(init_y)
        cbb = cbb.at[1:H // 2 + 1, 1:W // 2 + 1].set(init_cb)
        crb = crb.at[1:H // 2 + 1, 1:W // 2 + 1].set(init_cr)
    mb_idx, active = build_schedule(mb_w, mb_h)

    kind_all = abi["kind"]

    def phase_body(carry, xs):
        yb, cbb, crb = carry
        idx, act = xs
        mbx = idx % mb_w
        mby = idx // mb_w
        kind = jnp.take(kind_all, idx)
        i4m = jnp.take(abi["i4_modes"], idx, axis=0)
        i4a = jnp.take(abi["i4_avail"], idx, axis=0)
        i8m = jnp.take(abi["i8_modes"], idx, axis=0)
        i8a = jnp.take(abi["i8_avail"], idx, axis=0)
        i16m = jnp.take(abi["i16_mode"], idx)
        cmode = jnp.take(abi["chroma_mode"], idx)
        mba = jnp.take(abi["mb_avail"], idx, axis=0)

        # substep 0 MB-level jobs
        yb = _job_luma16(yb, res_y, act & (kind == KIND_I16),
                         mby * 16, mbx * 16, i16m, mba)
        yb = _job_pcm_luma(yb, res_y, act & (kind == KIND_IPCM),
                           mby * 16, mbx * 16)
        is_intra = act & (kind <= KIND_IPCM)
        is_pcm = kind == KIND_IPCM
        cbb = _job_chroma(cbb, res_cb, is_intra, mby * 8, mbx * 8,
                          cmode, mba, is_pcm)
        crb = _job_chroma(crb, res_cr, is_intra, mby * 8, mbx * 8,
                          cmode, mba, is_pcm)

        for s in range(10):
            for (x4, y4) in _SUBSTEP_BLOCKS[s]:
                r = y4 * 4 + x4
                yb = _job_luma4(yb, res_y, act & (kind == KIND_I4x4),
                                mby * 16 + y4 * 4, mbx * 16 + x4 * 4,
                                i4m[:, r], i4a[:, r])
            if s in _SUBSTEP_BLK8:
                b8 = _SUBSTEP_BLK8[s]
                yb = _job_luma8(yb, res_y, act & (kind == KIND_I8x8),
                                mby * 16 + (b8 // 2) * 8, mbx * 16 + (b8 % 2) * 8,
                                i8m[:, b8], i8a[:, b8])
        return (yb, cbb, crb), None

    (yb, cbb, crb), _ = jax.lax.scan(phase_body, (yb, cbb, crb),
                                     (mb_idx, active))
    return (yb[1:H + 1, 1:W + 1], cbb[1:, 1:], crb[1:, 1:])
