"""Device in-loop deblocking: wavefront-phased batched-MB kernels (JAX).

Reference parity: JM-lineage `loopFilter.c` (SURVEY.md §3.5) with the spec's
MB-serial semantics preserved by the knight-move wavefront (phase = 2*mb_y +
mb_x): an MB's filtering depends on left/top/top-right MBs, all in earlier
phases.  Within an MB the 4 vertical then 4 horizontal edges are sequential
static steps; across MBs of a phase everything is vectorized.

Bit-exact vs oracle.deblock (same integer formulas, same order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..common.tables import ALPHA_TABLE, BETA_TABLE, CHROMA_QP_TABLE, TC0_TABLE
from .intra import build_schedule

_ALPHA = np.asarray(ALPHA_TABLE, np.int32)
_BETA = np.asarray(BETA_TABLE, np.int32)
_TC0 = np.asarray(TC0_TABLE, np.int32)          # [3, 52]
_CQP = np.asarray(CHROMA_QP_TABLE, np.int32)


def _mv_far(a, b):
    """a, b [..., 2] qpel MVs -> bool."""
    return (jnp.abs(a[..., 0] - b[..., 0]) >= 4) | \
           (jnp.abs(a[..., 1] - b[..., 1]) >= 4)


def _bs_pair(ip, iq, mb_edge, nzp, nzq, refp, refq, mvp, mvq, bs4=4):
    """Boundary strength (spec 8.7.2.1), vectorized over [...].

    refp/refq [..., 2] picture ids (-1 unused); mvp/mvq [..., 2, 2].
    bs4: strength of intra MACROBLOCK edges — 4, except HORIZONTAL MB
    edges of FIELD pictures take 3 (8.7.2.1: bS 4 needs verticalEdgeFlag
    or a frame picture).
    """
    n_p = (refp >= 0).sum(-1)
    n_q = (refq >= 0).sum(-1)
    sets_eq = (jnp.minimum(refp[..., 0], refp[..., 1]) ==
               jnp.minimum(refq[..., 0], refq[..., 1])) & \
              (jnp.maximum(refp[..., 0], refp[..., 1]) ==
               jnp.maximum(refq[..., 0], refq[..., 1]))
    # single-MV: pick the used list
    p_use0 = (refp[..., 0] >= 0)[..., None]
    q_use0 = (refq[..., 0] >= 0)[..., None]
    mv1p = jnp.where(p_use0, mvp[..., 0, :], mvp[..., 1, :])
    mv1q = jnp.where(q_use0, mvq[..., 0, :], mvq[..., 1, :])
    far1 = _mv_far(mv1p, mv1q)
    # two-MV: two pairings
    straight = _mv_far(mvp[..., 0, :], mvq[..., 0, :]) | \
        _mv_far(mvp[..., 1, :], mvq[..., 1, :])
    crossed = _mv_far(mvp[..., 0, :], mvq[..., 1, :]) | \
        _mv_far(mvp[..., 1, :], mvq[..., 0, :])
    same_ref_pair = refp[..., 0] == refp[..., 1]
    # distinct refs: match q order to p by picture id
    q_matches = refq[..., 0] == refp[..., 0]
    far2_distinct = jnp.where(q_matches, straight, crossed)
    far2_same = straight & crossed
    far2 = jnp.where(same_ref_pair, far2_same, far2_distinct)
    far = jnp.where(n_p == 1, far1, jnp.where(n_p == 2, far2, False))
    mv_bs = jnp.where((n_p != n_q) | ~sets_eq | far, 1, 0)
    bs = jnp.where(nzp | nzq, 2, mv_bs)
    bs = jnp.where(ip | iq, jnp.where(mb_edge, bs4, 3), bs)
    return bs


def _filter_luma(p, q, bs, index_a, alpha, beta):
    """p [..., 4] = (p3,p2,p1,p0), q [..., 4] = (q0..q3); bs/idx broadcast.

    Returns filtered (p, q).  spec 8.7.2.3 / 8.7.2.4.
    """
    p3, p2, p1, p0 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    # --- bS < 4 path
    tc0 = jnp.asarray(_TC0)[jnp.clip(bs - 1, 0, 2), index_a]
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np1_w = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1, -tc0, tc0)
    nq1_w = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1, -tc0, tc0)
    np1_w = jnp.where(ap, np1_w, p1)
    nq1_w = jnp.where(aq, nq1_w, q1)
    # --- bS == 4 path
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
    np0 = jnp.where(is4, np0_s, np0_w)
    np1 = jnp.where(is4, np1_s, np1_w)
    np2 = jnp.where(is4, np2_s, p2)
    nq0 = jnp.where(is4, nq0_s, nq0_w)
    nq1 = jnp.where(is4, nq1_s, nq1_w)
    nq2 = jnp.where(is4, nq2_s, q2)
    np0 = jnp.where(filt, np0, p0)
    np1 = jnp.where(filt, np1, p1)
    np2 = jnp.where(filt, np2, p2)
    nq0 = jnp.where(filt, nq0, q0)
    nq1 = jnp.where(filt, nq1, q1)
    nq2 = jnp.where(filt, nq2, q2)
    return (jnp.stack([p3, np2, np1, np0], -1),
            jnp.stack([nq0, nq1, nq2, q3], -1))


def _filter_chroma(p, q, bs, index_a, alpha, beta):
    """p [..., 2] = (p1, p0), q [..., 2] = (q0, q1)."""
    p1, p0 = p[..., 0], p[..., 1]
    q0, q1 = q[..., 0], q[..., 1]
    filt = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = jnp.asarray(_TC0)[jnp.clip(bs - 1, 0, 2), index_a] + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_w = jnp.clip(p0 + delta, 0, 255)
    nq0_w = jnp.clip(q0 - delta, 0, 255)
    np0_s = (2 * p1 + p0 + q1 + 2) >> 2
    nq0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    np0 = jnp.where(filt, jnp.where(is4, np0_s, np0_w), p0)
    nq0 = jnp.where(filt, jnp.where(is4, nq0_s, nq0_w), q0)
    return (jnp.stack([p1, np0], -1), jnp.stack([nq0, q1], -1))


def _idx_ab(qp_p, qp_q, a_off, b_off):
    qpav = (qp_p + qp_q + 1) >> 1
    ia = jnp.clip(qpav + a_off, 0, 51)
    ib = jnp.clip(qpav + b_off, 0, 51)
    return ia, ib


def deblock_planes(abi, y, cb, cr, mb_w: int, mb_h: int, cqp_off=(0, 0),
                   field: bool = False):
    """Apply the full deblocking process.  y [H, W] int32 etc.  Returns planes.

    Planes are padded bottom/right; masked-off jobs gather AND scatter in the
    pad corner so duplicate scatter targets always carry identical values
    (deterministic no-ops) and never collide with active MBs.
    """
    H, W = mb_h * 16, mb_w * 16
    y = jnp.pad(y, ((0, 16), (0, 16)))
    cb = jnp.pad(cb, ((0, 8), (0, 8)))
    cr = jnp.pad(cr, ((0, 8), (0, 8)))
    n = mb_w * mb_h
    kind = abi["kind"]
    is_intra_all = kind <= 3
    nz_all = abi["nz"] > 0                       # [n,4,4]
    mv_all = abi["mv"]                           # [n,4,4,2,2]
    ref_all = abi["refid"]                       # [n,4,4,2]
    qp_all = abi["qp"]
    sid_all = abi["slice_id"]
    dis_all = abi["disable_idc"]
    aoff_all = abi["alpha_off"]
    boff_all = abi["beta_off"]
    tr8_all = abi["tr8"] > 0
    mb_idx, active = build_schedule(mb_w, mb_h)

    def neigh(arr, idx, d):
        """arr indexed at idx+d with clamp (validity handled by masks)."""
        return jnp.take(arr, jnp.clip(idx + d, 0, n - 1), axis=0)

    def phase_body(carry, xs):
        y, cb, cr = carry
        idx, act = xs
        mbx = idx % mb_w
        mby = idx // mb_w
        cur_i = jnp.take(is_intra_all, idx)
        cur_nz = jnp.take(nz_all, idx, axis=0)
        cur_mv = jnp.take(mv_all, idx, axis=0)
        cur_ref = jnp.take(ref_all, idx, axis=0)
        cur_qp = jnp.take(qp_all, idx)
        cur_sid = jnp.take(sid_all, idx)
        cur_dis = jnp.take(dis_all, idx)
        a_off = jnp.take(aoff_all, idx)
        b_off = jnp.take(boff_all, idx)
        cur_tr8 = jnp.take(tr8_all, idx)
        do_any = act & (cur_dis != 1)

        left_ok = (mbx > 0) & do_any & ~(
            (cur_dis == 2) & (neigh(sid_all, idx, -1) != cur_sid))
        top_ok = (mby > 0) & do_any & ~(
            (cur_dis == 2) & (neigh(sid_all, idx, -mb_w) != cur_sid))

        def edge_v(y, cb, cr, xe: int):
            mb_edge = xe == 0
            mask = left_ok if mb_edge else (
                do_any & (~cur_tr8 if xe in (4, 12) else True))
            pid = idx - 1 if mb_edge else idx
            p_i = jnp.take(is_intra_all, jnp.clip(pid, 0, n - 1))
            p_nz = jnp.take(nz_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_mv = jnp.take(mv_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_ref = jnp.take(ref_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_qp = jnp.take(qp_all, jnp.clip(pid, 0, n - 1))
            bxp = 3 if mb_edge else xe // 4 - 1
            bxq = xe // 4
            segs = jnp.arange(4)
            bs = _bs_pair(p_i[:, None], cur_i[:, None], mb_edge,
                          p_nz[:, :, bxp], cur_nz[:, :, bxq],
                          p_ref[:, :, bxp], cur_ref[:, :, bxq],
                          p_mv[:, :, bxp], cur_mv[:, :, bxq])  # [P, 4]
            ia, ib = _idx_ab(p_qp, cur_qp, a_off, b_off)   # [P] (per MB pair)
            alpha = jnp.asarray(_ALPHA)[ia]
            beta = jnp.asarray(_BETA)[ib]
            # luma: window [P, 16, 8] at (my*16, mx*16+xe-4); masked -> pad
            py0 = jnp.where(mask, mby * 16, H)
            px0 = jnp.where(mask, mbx * 16 + xe - 4, W)
            win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                y, (yy, xx), (16, 8)))(py0, px0)
            rep = lambda a: jnp.repeat(a, 4, axis=1)   # [P,4] -> [P,16]
            fp, fq = _filter_luma(win[:, :, 0:4], win[:, :, 4:8], rep(bs),
                                  ia[:, None], alpha[:, None], beta[:, None])
            out = jnp.concatenate([fp, fq], axis=-1)
            out = jnp.where(mask[:, None, None], out, win)
            ys = py0[:, None, None] + jnp.arange(16)[None, :, None]
            xs_ = px0[:, None, None] + jnp.arange(8)[None, None, :]
            y = y.at[ys, xs_].set(out)
            # chroma for luma edges 0 and 8
            if xe % 8 == 0:
                for pl, plane, off in ((0, cb, cqp_off[0]), (1, cr, cqp_off[1])):
                    qpc_p = jnp.asarray(_CQP)[jnp.clip(p_qp + off, 0, 51)]
                    qpc_q = jnp.asarray(_CQP)[jnp.clip(cur_qp + off, 0, 51)]
                    iac, ibc = _idx_ab(qpc_p, qpc_q, a_off, b_off)
                    al_c = jnp.asarray(_ALPHA)[iac]
                    be_c = jnp.asarray(_BETA)[ibc]
                    pyc0 = jnp.where(mask, mby * 8, H // 2)
                    pxc0 = jnp.where(mask, mbx * 8 + xe // 2 - 2, W // 2)
                    winc = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                        plane, (yy, xx), (8, 4)))(pyc0, pxc0)
                    repc = lambda a: jnp.repeat(a, 2, axis=1)  # per 2 rows
                    fpc, fqc = _filter_chroma(
                        winc[:, :, 0:2], winc[:, :, 2:4], repc(bs),
                        iac[:, None], al_c[:, None], be_c[:, None])
                    outc = jnp.concatenate([fpc, fqc], axis=-1)
                    outc = jnp.where(mask[:, None, None], outc, winc)
                    ysc = pyc0[:, None, None] + jnp.arange(8)[None, :, None]
                    xsc = pxc0[:, None, None] + jnp.arange(4)[None, None, :]
                    if pl == 0:
                        cb = cb.at[ysc, xsc].set(outc)
                    else:
                        cr = cr.at[ysc, xsc].set(outc)
            return y, cb, cr

        def edge_h(y, cb, cr, ye: int):
            mb_edge = ye == 0
            mask = top_ok if mb_edge else (
                do_any & (~cur_tr8 if ye in (4, 12) else True))
            pid = idx - mb_w if mb_edge else idx
            p_i = jnp.take(is_intra_all, jnp.clip(pid, 0, n - 1))
            p_nz = jnp.take(nz_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_mv = jnp.take(mv_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_ref = jnp.take(ref_all, jnp.clip(pid, 0, n - 1), axis=0)
            p_qp = jnp.take(qp_all, jnp.clip(pid, 0, n - 1))
            byp = 3 if mb_edge else ye // 4 - 1
            byq = ye // 4
            bs = _bs_pair(p_i[:, None], cur_i[:, None], mb_edge,
                          p_nz[:, byp, :], cur_nz[:, byq, :],
                          p_ref[:, byp, :], cur_ref[:, byq, :],
                          p_mv[:, byp, :], cur_mv[:, byq, :],
                          bs4=3 if field else 4)  # [P, 4]
            ia, ib = _idx_ab(p_qp, cur_qp, a_off, b_off)
            alpha = jnp.asarray(_ALPHA)[ia]
            beta = jnp.asarray(_BETA)[ib]
            py0 = jnp.where(mask, mby * 16 + ye - 4, H)
            px0 = jnp.where(mask, mbx * 16, W)
            win = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                y, (yy, xx), (8, 16)))(py0, px0)
            winT = jnp.swapaxes(win, 1, 2)               # [P, 16, 8]
            rep = lambda a: jnp.repeat(a, 4, axis=1)
            fp, fq = _filter_luma(winT[:, :, 0:4], winT[:, :, 4:8], rep(bs),
                                  ia[:, None], alpha[:, None], beta[:, None])
            outT = jnp.concatenate([fp, fq], axis=-1)
            out = jnp.swapaxes(outT, 1, 2)
            out = jnp.where(mask[:, None, None], out, win)
            ys = py0[:, None, None] + jnp.arange(8)[None, :, None]
            xs_ = px0[:, None, None] + jnp.arange(16)[None, None, :]
            y = y.at[ys, xs_].set(out)
            if ye % 8 == 0:
                for pl, plane, off in ((0, cb, cqp_off[0]), (1, cr, cqp_off[1])):
                    qpc_p = jnp.asarray(_CQP)[jnp.clip(p_qp + off, 0, 51)]
                    qpc_q = jnp.asarray(_CQP)[jnp.clip(cur_qp + off, 0, 51)]
                    iac, ibc = _idx_ab(qpc_p, qpc_q, a_off, b_off)
                    al_c = jnp.asarray(_ALPHA)[iac]
                    be_c = jnp.asarray(_BETA)[ibc]
                    pyc0 = jnp.where(mask, mby * 8 + ye // 2 - 2, H // 2)
                    pxc0 = jnp.where(mask, mbx * 8, W // 2)
                    winc = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                        plane, (yy, xx), (4, 8)))(pyc0, pxc0)
                    wincT = jnp.swapaxes(winc, 1, 2)
                    repc = lambda a: jnp.repeat(a, 2, axis=1)
                    fpc, fqc = _filter_chroma(
                        wincT[:, :, 0:2], wincT[:, :, 2:4], repc(bs),
                        iac[:, None], al_c[:, None], be_c[:, None])
                    outc = jnp.swapaxes(jnp.concatenate([fpc, fqc], -1), 1, 2)
                    outc = jnp.where(mask[:, None, None], outc, winc)
                    ysc = pyc0[:, None, None] + jnp.arange(4)[None, :, None]
                    xsc = pxc0[:, None, None] + jnp.arange(8)[None, None, :]
                    if pl == 0:
                        cb = cb.at[ysc, xsc].set(outc)
                    else:
                        cr = cr.at[ysc, xsc].set(outc)
            return y, cb, cr

        for xe in (0, 4, 8, 12):
            y, cb, cr = edge_v(y, cb, cr, xe)
        for ye in (0, 4, 8, 12):
            y, cb, cr = edge_h(y, cb, cr, ye)
        return (y, cb, cr), None

    (y, cb, cr), _ = jax.lax.scan(phase_body, (y, cb, cr), (mb_idx, active))
    return y[:H, :W], cb[:H // 2, :W // 2], cr[:H // 2, :W // 2]


# ---------------------------------------------------------------------------
# Vectorized edge-table precompute for the Pallas kernel (ops/pallas).
# bS and thresholds depend only on coding data, so every edge of the frame
# is computed in one parallel pass; the sequential wavefront then only
# filters pixels.
# ---------------------------------------------------------------------------

def _lut52(table, idx):
    """52-entry table lookup as a fused select chain (beats a TPU gather
    by orders of magnitude on these small per-MB index arrays)."""
    out = jnp.full(idx.shape, int(table[0]), jnp.int32)
    for k in range(1, 52):
        if int(table[k]) != int(table[k - 1]):
            out = jnp.where(idx >= k, int(table[k]), out)
    return out


def _lut_tc0(tc0_table, bsi, ia):
    """tc0[bsi, ia] (bsi in 0..2, ia in 0..51) via select chains."""
    out = jnp.zeros(jnp.broadcast_shapes(bsi.shape, ia.shape), jnp.int32)
    for k in range(52):
        t0, t1, t2 = (int(tc0_table[r][k]) for r in range(3))
        v = jnp.where(bsi == 0, t0, jnp.where(bsi == 1, t1, t2))
        out = jnp.where(ia == k, v, out)
    return out


def deblock_tables(abi, mb_w: int, mb_h: int, cqp_off=(0, 0),
                   field: bool = False):
    """Per-edge bS / tc0 / alpha / beta tables for the whole frame.

    Returns dict:
      bs_v/bs_h [n,4,4] int32, tc_v/tc_h [n,4,4] int32,
      a_v/a_h/b_v/b_h [n,4] int32,
      bs_c [n,2,2,4], tc_c [n,2,2,4,2], a_c/b_c [n,2,2,2] int32.
    """
    n = mb_w * mb_h
    kind = abi["kind"]
    is_intra = (kind <= 3).reshape(mb_h, mb_w)
    nz = (abi["nz"] > 0).reshape(mb_h, mb_w, 4, 4)
    mv = abi["mv"].reshape(mb_h, mb_w, 4, 4, 2, 2)
    ref = abi["refid"].reshape(mb_h, mb_w, 4, 4, 2)
    qp = abi["qp"].reshape(mb_h, mb_w)
    sid = abi["slice_id"].reshape(mb_h, mb_w)
    dis = abi["disable_idc"].reshape(mb_h, mb_w)
    a_off = abi["alpha_off"].reshape(mb_h, mb_w)
    b_off = abi["beta_off"].reshape(mb_h, mb_w)
    tr8 = (abi["tr8"] > 0).reshape(mb_h, mb_w)

    def shift_left(a):  # value of MB (my, mx-1); col 0 garbage (masked)
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    def shift_up(a):
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    do_any = dis != 1
    left_ok = do_any & \
        (jnp.arange(mb_w)[None, :] > 0) & \
        ~((dis == 2) & (shift_left(sid) != sid))
    top_ok = do_any & \
        (jnp.arange(mb_h)[:, None] > 0) & \
        ~((dis == 2) & (shift_up(sid) != sid))

    alpha_t, beta_t, tc0_t, cqp_t = _ALPHA, _BETA, _TC0, _CQP

    def one_dir(horiz: bool):
        if horiz:
            sh, ok_edge0 = shift_up, top_ok
            # q blocks for edge e, seg s: (e, s); p: (e-1, s) / top (3, s)
            q_nz = lambda e: nz[:, :, e, :]
            p_nz = lambda e: nz[:, :, e - 1, :] if e else sh(nz[:, :, 3, :])
            q_ref = lambda e: ref[:, :, e, :, :]
            p_ref = lambda e: ref[:, :, e - 1, :, :] if e else sh(ref[:, :, 3, :, :])
            q_mv = lambda e: mv[:, :, e, :, :, :]
            p_mv = lambda e: mv[:, :, e - 1, :, :, :] if e else sh(mv[:, :, 3, :, :, :])
        else:
            sh, ok_edge0 = shift_left, left_ok
            q_nz = lambda e: nz[:, :, :, e]
            p_nz = lambda e: nz[:, :, :, e - 1] if e else sh(nz[:, :, :, 3])
            q_ref = lambda e: ref[:, :, :, e, :]
            p_ref = lambda e: ref[:, :, :, e - 1, :] if e else sh(ref[:, :, :, 3, :])
            q_mv = lambda e: mv[:, :, :, e, :, :]
            p_mv = lambda e: mv[:, :, :, e - 1, :, :] if e else sh(mv[:, :, :, 3, :, :])
        p_intra0 = sh(is_intra)
        qp_p0 = sh(qp)
        bs_list, tc_list, a_list, b_list = [], [], [], []
        for e in range(4):
            mb_edge = e == 0
            p_i = p_intra0 if mb_edge else is_intra
            bs = _bs_pair(p_i[..., None], is_intra[..., None], mb_edge,
                          p_nz(e), q_nz(e), p_ref(e), q_ref(e),
                          p_mv(e), q_mv(e),
                          bs4=3 if (horiz and field) else 4)
            if mb_edge:
                mask = ok_edge0
            else:
                mask = do_any & (True if e == 2 else ~tr8)
            bs = jnp.where(mask[..., None], bs, 0)
            qp_p = qp_p0 if mb_edge else qp
            qpav = (qp_p + qp + 1) >> 1
            ia = jnp.clip(qpav + a_off, 0, 51)
            ib = jnp.clip(qpav + b_off, 0, 51)
            a = _lut52(alpha_t, ia)
            b = _lut52(beta_t, ib)
            tc0 = _lut_tc0(tc0_t, jnp.clip(bs - 1, 0, 2), ia[..., None])
            bs_list.append(bs)
            tc_list.append(tc0)
            a_list.append(a)
            b_list.append(b)
        return (jnp.stack(bs_list, 2).reshape(n, 4, 4),
                jnp.stack(tc_list, 2).reshape(n, 4, 4),
                jnp.stack(a_list, 2).reshape(n, 4),
                jnp.stack(b_list, 2).reshape(n, 4))

    bs_v, tc_v, a_v, b_v = one_dir(False)
    bs_h, tc_h, a_h, b_h = one_dir(True)

    # chroma: edges map to luma edges 0 and 8 (indices 0 and 2)
    bs_c = jnp.stack([jnp.stack([bs_v[:, 0], bs_v[:, 2]], 1),
                      jnp.stack([bs_h[:, 0], bs_h[:, 2]], 1)], 1)  # [n,2,2,4]
    qp_l = shift_left(qp)
    qp_u = shift_up(qp)
    tc_c_all, a_c_all, b_c_all = [], [], []
    for d, qp_nb in ((0, qp_l), (1, qp_u)):
        tcs, as_, bs_ = [], [], []
        for e in range(2):
            qpp = qp_nb if e == 0 else qp
            tce, ae, be = [], [], []
            for pl_ in range(2):
                qpc_p = _lut52(cqp_t, jnp.clip(qpp + cqp_off[pl_], 0, 51))
                qpc_q = _lut52(cqp_t, jnp.clip(qp + cqp_off[pl_], 0, 51))
                qpav = (qpc_p + qpc_q + 1) >> 1
                ia = jnp.clip(qpav + a_off, 0, 51)
                ib = jnp.clip(qpav + b_off, 0, 51)
                ae.append(_lut52(alpha_t, ia))
                be.append(_lut52(beta_t, ib))
                bs_here = bs_c[:, d, e].reshape(mb_h, mb_w, 4)
                tce.append(_lut_tc0(tc0_t, jnp.clip(bs_here - 1, 0, 2),
                                    ia[..., None]))
            tcs.append(jnp.stack(tce, -1))       # [mbh,mbw,4,2]
            as_.append(jnp.stack(ae, -1))        # [mbh,mbw,2]
            bs_.append(jnp.stack(be, -1))
        tc_c_all.append(jnp.stack(tcs, 2))       # [mbh,mbw,2,4,2]
        a_c_all.append(jnp.stack(as_, 2))        # [mbh,mbw,2,2]
        b_c_all.append(jnp.stack(bs_, 2))
    tc_c = jnp.stack(tc_c_all, 2).reshape(n, 2, 2, 4, 2)
    a_c = jnp.stack(a_c_all, 2).reshape(n, 2, 2, 2)
    b_c = jnp.stack(b_c_all, 2).reshape(n, 2, 2, 2)

    return {"bs_v": bs_v.astype(jnp.int32), "tc_v": tc_v.astype(jnp.int32),
            "a_v": a_v.astype(jnp.int32), "b_v": b_v.astype(jnp.int32),
            "bs_h": bs_h.astype(jnp.int32), "tc_h": tc_h.astype(jnp.int32),
            "a_h": a_h.astype(jnp.int32), "b_h": b_h.astype(jnp.int32),
            "bs_c": bs_c.astype(jnp.int32), "tc_c": tc_c.astype(jnp.int32),
            "a_c": a_c.astype(jnp.int32), "b_c": b_c.astype(jnp.int32)}
