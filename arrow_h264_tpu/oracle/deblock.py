"""Spec-literal in-loop deblocking filter oracle (numpy, spec 8.7).

Reference parity: JM-lineage `loopFilter.c` / `loop_filter_normal.c`
(SURVEY.md §2; reference mount empty — implemented from spec 8.7, frame
coding, 4:2:0, 8-bit).

Follows the exact MB-serial spec order (raster MBs; vertical edges
left-to-right then horizontal top-to-bottom) so it is the bit-exactness
oracle for the phased device kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..common.tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE, CHROMA_QP_TABLE


@dataclass
class DeblockMeta:
    """Per-frame deblocking inputs; all arrays indexed [mb_y, mb_x, ...]."""

    is_intra: np.ndarray        # [H, W] bool
    tr8: np.ndarray             # [H, W] bool (transform_size_8x8_flag)
    qp: np.ndarray              # [H, W] int  (QPY; 0 for I_PCM)
    nz: np.ndarray              # [H, W, 4, 4] bool  per 4x4 luma block (y4, x4);
                                # for tr8 MBs already OR-ed over each 8x8
    mv: np.ndarray              # [H, W, 4, 4, 2, 2] int (list, (x,y)) qpel
    refid: np.ndarray           # [H, W, 4, 4, 2] int unique pic id, -1 unused
    slice_id: np.ndarray        # [H, W] int
    disable_idc: np.ndarray     # [H, W] int (of the MB's slice)
    alpha_off: np.ndarray       # [H, W] int (filterOffsetA = 2*alpha_c0_div2)
    beta_off: np.ndarray        # [H, W] int
    chroma_qp_off: tuple = (0, 0)   # PPS offsets (cb, cr)


def _bs_pair(meta: DeblockMeta, mbp, bp, mbq, bq, mb_edge: bool) -> int:
    """Boundary strength for one 4x4 block pair (spec 8.7.2.1, frame)."""
    p_intra = meta.is_intra[mbp]
    q_intra = meta.is_intra[mbq]
    if (p_intra or q_intra) and mb_edge:
        return 4
    if p_intra or q_intra:
        return 3
    if meta.nz[mbp][bp] or meta.nz[mbq][bq]:
        return 2
    # motion-based bS
    refp = meta.refid[mbp][bp]
    refq = meta.refid[mbq][bq]
    mvp = meta.mv[mbp][bp]
    mvq = meta.mv[mbq][bq]
    np_ = int((refp >= 0).sum())
    nq = int((refq >= 0).sum())
    if np_ != nq:
        return 1
    setp = sorted(int(r) for r in refp if r >= 0)
    setq = sorted(int(r) for r in refq if r >= 0)
    if setp != setq:
        return 1

    def mv_far(a, b) -> bool:
        return abs(int(a[0]) - int(b[0])) >= 4 or abs(int(a[1]) - int(b[1])) >= 4

    if np_ == 1:
        lp = 0 if refp[0] >= 0 else 1
        lq = 0 if refq[0] >= 0 else 1
        return 1 if mv_far(mvp[lp], mvq[lq]) else 0
    if np_ == 2:
        if refp[0] != refp[1]:
            # two different ref pics: match q's lists to p's by picture
            if refq[0] == refp[0]:
                bad = mv_far(mvp[0], mvq[0]) or mv_far(mvp[1], mvq[1])
            else:
                bad = mv_far(mvp[0], mvq[1]) or mv_far(mvp[1], mvq[0])
            return 1 if bad else 0
        # same ref pic used twice: bS=0 if either pairing is close
        a = not mv_far(mvp[0], mvq[0]) and not mv_far(mvp[1], mvq[1])
        b = not mv_far(mvp[0], mvq[1]) and not mv_far(mvp[1], mvq[0])
        return 0 if (a or b) else 1
    return 0


def _filter_luma_seg(p, q, bs, index_a, alpha, beta):
    """Filter one luma sample row: p = [p3..p0], q = [q0..q3] (ints).

    Returns new (p, q) lists. spec 8.7.2.3 / 8.7.2.4.
    """
    p3, p2, p1, p0 = p
    q0, q1, q2, q3 = q
    if abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta or abs(q1 - q0) >= beta:
        return p, q
    ap = abs(p2 - p0) < beta
    aq = abs(q2 - q0) < beta
    if bs < 4:
        tc0 = int(TC0_TABLE[bs - 1, index_a])
        tc = tc0 + (1 if ap else 0) + (1 if aq else 0)
        delta = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
        np0 = max(0, min(255, p0 + delta))
        nq0 = max(0, min(255, q0 - delta))
        np1, nq1 = p1, q1
        if ap:
            np1 = p1 + max(-tc0, min(tc0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1))
        if aq:
            nq1 = q1 + max(-tc0, min(tc0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1))
        return [p3, p2, np1, np0], [nq0, nq1, q2, q3]
    # bS == 4
    strong = abs(p0 - q0) < ((alpha >> 2) + 2)
    if strong and ap:
        np0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        np1 = (p2 + p1 + p0 + q0 + 2) >> 2
        np2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    else:
        np0 = (2 * p1 + p0 + q1 + 2) >> 2
        np1, np2 = p1, p2
    if strong and aq:
        nq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        nq1 = (q2 + q1 + q0 + p0 + 2) >> 2
        nq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    else:
        nq0 = (2 * q1 + q0 + p1 + 2) >> 2
        nq1, nq2 = q1, q2
    return [p3, np2, np1, np0], [nq0, nq1, nq2, q3]


def _filter_chroma_pair(p1, p0, q0, q1, bs, index_a, alpha, beta):
    if abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta or abs(q1 - q0) >= beta:
        return p0, q0
    if bs < 4:
        tc = int(TC0_TABLE[bs - 1, index_a]) + 1
        delta = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
        return (max(0, min(255, p0 + delta)), max(0, min(255, q0 - delta)))
    return ((2 * p1 + p0 + q1 + 2) >> 2, (2 * q1 + q0 + p1 + 2) >> 2)


def _chroma_qp(qp_y: int, off: int) -> int:
    return int(CHROMA_QP_TABLE[max(0, min(51, qp_y + off))])


def deblock_frame(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  meta: DeblockMeta) -> None:
    """Apply the full-picture deblocking process in place (spec 8.7)."""
    mb_h, mb_w = meta.is_intra.shape
    yi = y.astype(np.int32)
    cbi = cb.astype(np.int32)
    cri = cr.astype(np.int32)

    for my in range(mb_h):
        for mx in range(mb_w):
            cur = (my, mx)
            if meta.disable_idc[cur] == 1:
                continue
            a_off = int(meta.alpha_off[cur])
            b_off = int(meta.beta_off[cur])
            qp_q = int(meta.qp[cur])

            def same_slice(nb):
                return meta.slice_id[nb] == meta.slice_id[cur]

            def do_vertical_edge(xe: int, mb_edge: bool, nbmb) -> None:
                x_abs = mx * 16 + xe
                for seg in range(4):  # 4-row segments
                    y0 = my * 16 + seg * 4
                    if mb_edge:
                        bp = (seg, 3)
                        pmb = nbmb
                    else:
                        bp = (seg, xe // 4 - 1)
                        pmb = cur
                    bq = (seg, xe // 4)
                    bs = _bs_pair(meta, pmb, bp, cur, bq, mb_edge)
                    if bs == 0:
                        continue
                    qp_p = int(meta.qp[pmb])
                    qpav = (qp_p + qp_q + 1) >> 1
                    index_a = max(0, min(51, qpav + a_off))
                    index_b = max(0, min(51, qpav + b_off))
                    alpha = int(ALPHA_TABLE[index_a])
                    beta = int(BETA_TABLE[index_b])
                    for r in range(4):
                        row = yi[y0 + r]
                        p = [int(v) for v in row[x_abs - 4:x_abs]]
                        q = [int(v) for v in row[x_abs:x_abs + 4]]
                        fp, fq = _filter_luma_seg(p, q, bs, index_a, alpha, beta)
                        row[x_abs - 4:x_abs] = fp
                        row[x_abs:x_abs + 4] = fq
                    # chroma for luma edges 0 and 8
                    if xe % 8 == 0:
                        xc = (mx * 16 + xe) // 2
                        for ci, plane, off in ((0, cbi, meta.chroma_qp_off[0]),
                                               (1, cri, meta.chroma_qp_off[1])):
                            qpc_p = _chroma_qp(qp_p, off)
                            qpc_q = _chroma_qp(qp_q, off)
                            qpavc = (qpc_p + qpc_q + 1) >> 1
                            ia = max(0, min(51, qpavc + a_off))
                            ib = max(0, min(51, qpavc + b_off))
                            al = int(ALPHA_TABLE[ia])
                            be = int(BETA_TABLE[ib])
                            for r in range(2):  # 2 chroma rows per luma seg
                                yc = (my * 16 + seg * 4) // 2 + r
                                row = plane[yc]
                                p1v, p0v = int(row[xc - 2]), int(row[xc - 1])
                                q0v, q1v = int(row[xc]), int(row[xc + 1])
                                np0, nq0 = _filter_chroma_pair(
                                    p1v, p0v, q0v, q1v, bs, ia, al, be)
                                row[xc - 1] = np0
                                row[xc] = nq0

            def do_horizontal_edge(ye: int, mb_edge: bool, nbmb) -> None:
                y_abs = my * 16 + ye
                for seg in range(4):
                    x0 = mx * 16 + seg * 4
                    if mb_edge:
                        bp = (3, seg)
                        pmb = nbmb
                    else:
                        bp = (ye // 4 - 1, seg)
                        pmb = cur
                    bq = (ye // 4, seg)
                    bs = _bs_pair(meta, pmb, bp, cur, bq, mb_edge)
                    if bs == 0:
                        continue
                    qp_p = int(meta.qp[pmb])
                    qpav = (qp_p + qp_q + 1) >> 1
                    index_a = max(0, min(51, qpav + a_off))
                    index_b = max(0, min(51, qpav + b_off))
                    alpha = int(ALPHA_TABLE[index_a])
                    beta = int(BETA_TABLE[index_b])
                    for c in range(4):
                        col = yi[:, x0 + c]
                        p = [int(v) for v in col[y_abs - 4:y_abs]]
                        q = [int(v) for v in col[y_abs:y_abs + 4]]
                        fp, fq = _filter_luma_seg(p, q, bs, index_a, alpha, beta)
                        col[y_abs - 4:y_abs] = fp
                        col[y_abs:y_abs + 4] = fq
                    if ye % 8 == 0:
                        yc = (my * 16 + ye) // 2
                        for ci, plane, off in ((0, cbi, meta.chroma_qp_off[0]),
                                               (1, cri, meta.chroma_qp_off[1])):
                            qpc_p = _chroma_qp(qp_p, off)
                            qpc_q = _chroma_qp(qp_q, off)
                            qpavc = (qpc_p + qpc_q + 1) >> 1
                            ia = max(0, min(51, qpavc + a_off))
                            ib = max(0, min(51, qpavc + b_off))
                            al = int(ALPHA_TABLE[ia])
                            be = int(BETA_TABLE[ib])
                            for c in range(2):
                                xc = (mx * 16 + seg * 4) // 2 + c
                                col = plane[:, xc]
                                p1v, p0v = int(col[yc - 2]), int(col[yc - 1])
                                q0v, q1v = int(col[yc]), int(col[yc + 1])
                                np0, nq0 = _filter_chroma_pair(
                                    p1v, p0v, q0v, q1v, bs, ia, al, be)
                                col[yc - 1] = np0
                                col[yc] = nq0

            # vertical edges, left to right
            if mx > 0 and not (meta.disable_idc[cur] == 2 and not same_slice((my, mx - 1))):
                do_vertical_edge(0, True, (my, mx - 1))
            internal_v = (8,) if meta.tr8[cur] else (4, 8, 12)
            for xe in internal_v:
                do_vertical_edge(xe, False, None)
            # horizontal edges, top to bottom
            if my > 0 and not (meta.disable_idc[cur] == 2 and not same_slice((my - 1, mx))):
                do_horizontal_edge(0, True, (my - 1, mx))
            internal_h = (8,) if meta.tr8[cur] else (4, 8, 12)
            for ye in internal_h:
                do_horizontal_edge(ye, False, None)

    y[:] = yi.astype(y.dtype)
    cb[:] = cbi.astype(cb.dtype)
    cr[:] = cri.astype(cr.dtype)
