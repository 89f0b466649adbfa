"""Device inter prediction: quarter-pel MC over precomputed half-pel planes.

Reference parity: JM-lineage `get_block.c` quarter-pel interpolation +
`mc_prediction.c` weighted prediction (SURVEY.md §2), restructured for TPU:
instead of per-block 6-tap windows (gather-heavy), each reference picture's
half-pel planes (b = horizontal, h = vertical, j = diagonal) are computed
ONCE when the picture is stored into the device DPB — dense separable
filtering that vectorizes perfectly — and per-block MC reduces to at most
two single-pixel gathers plus an average (the spec's quarter-pel position
table, 8.4.2.2.1).

The planes are edge-padded by PAD with clamp semantics, which is exactly
the spec's unrestricted-MV edge extension (see oracle.inter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PAD = 32            # luma padding; chroma uses PAD // 2
# banded (gather-free) MC covers integer MVs in [-MV_BAND-1, MV_BAND]; the
# host falls back to the gather path for frames with larger motion.  16
# covers x264's default motion-search range; raising it grows the fused
# select chain (and compile time) linearly.
MV_BAND = 16


def _tap6_1d(v, axis):
    """6-tap (1,-5,20,20,-5,1) along axis; output length = len - 5."""
    taps = (1, -5, 20, 20, -5, 1)
    n = v.shape[axis]
    sl = lambda k: jax.lax.slice_in_dim(v, k, n - 5 + k, axis=axis)
    return sum(c * sl(k) for k, c in enumerate(taps))


def halfpel_planes(y_plane):
    """[H, W] uint8 (unpadded) -> (G, b, h, j) [Hp, Wp] uint8 padded planes.

    G is the padded integer plane; b/h/j are the spec 8.4.2.2.1 half-pels
    aligned so that plane[y + PAD, x + PAD] is the half-pel sample at
    integer position (x, y) (i.e. b at (x+0.5, y), h at (x, y+0.5),
    j at (x+0.5, y+0.5)).
    """
    yi = jnp.pad(y_plane, PAD + 3, mode="edge").astype(jnp.int32)
    # b: horizontal 6-tap at (x+0.5): taps over x-2..x+3
    b1 = _tap6_1d(yi, 1)                    # [Hp+6, Wp+1]
    b = jnp.clip((b1 + 16) >> 5, 0, 255)[3:-3, 1:]
    # h: vertical 6-tap
    h1 = _tap6_1d(yi, 0)                    # [Hp+1, Wp+6]
    h = jnp.clip((h1 + 16) >> 5, 0, 255)[1:, 3:-3]
    # j: vertical 6-tap of b1 intermediates
    j1 = _tap6_1d(b1, 0)                    # [Hp+1, Wp+1]
    j = jnp.clip((j1 + 512) >> 10, 0, 255)[1:, 1:]
    G = yi[3:-3, 3:-3]
    return (G.astype(jnp.uint8), b.astype(jnp.uint8),
            h.astype(jnp.uint8), j.astype(jnp.uint8))


def pad_chroma(p):
    return jnp.pad(p, PAD // 2, mode="edge")


def luma_mc_gather(dpb_y4, slot, bx, by, mvx, mvy):
    """Quarter-pel MC via plane gathers.

    dpb_y4: [S, 4, Hp, Wp] uint8 — (G, b, h, j) planes per slot.
    slot/bx/by [N]; mv in qpel.  Returns [N, 4, 4] int32.

    Position table (spec 8.4.2.2.1): out = (P1 + P2 + 1) >> 1 with plane and
    offset selection by (xFrac, yFrac); full/half positions use P1 == P2.
    """
    Hp, Wp = dpb_y4.shape[2], dpb_y4.shape[3]
    xi = bx + (mvx >> 2) + PAD
    yi = by + (mvy >> 2) + PAD
    xf = mvx & 3
    yf = mvy & 3

    # plane/offset table per (yf, xf): (plane1, dy1, dx1, plane2, dy2, dx2)
    # planes: 0 G, 1 b, 2 h, 3 j
    table = jnp.asarray([
        # yf = 0
        [0, 0, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0], [1, 0, 0, 1, 0, 0],
        [1, 0, 0, 0, 0, 1],
        # yf = 1
        [0, 0, 0, 2, 0, 0], [1, 0, 0, 2, 0, 0], [1, 0, 0, 3, 0, 0],
        [1, 0, 0, 2, 0, 1],
        # yf = 2
        [2, 0, 0, 2, 0, 0], [2, 0, 0, 3, 0, 0], [3, 0, 0, 3, 0, 0],
        [3, 0, 0, 2, 0, 1],
        # yf = 3
        [0, 1, 0, 2, 0, 0], [1, 1, 0, 2, 0, 0], [3, 0, 0, 1, 1, 0],
        [1, 1, 0, 2, 0, 1],
    ], jnp.int32)                               # [16, 6]
    sel = table[yf * 4 + xf]                    # [N, 6]

    ys = jnp.arange(4)
    xs = jnp.arange(4)
    # clamp bases so the 4x4 read stays in the padded plane (clamp == spec
    # edge extension given |overshoot| <= PAD handled by padding)
    def gather(plane_idx, dy, dx):
        yy = jnp.clip(yi[:, None] + dy[:, None] + ys[None, :], 0, Hp - 1)
        xx = jnp.clip(xi[:, None] + dx[:, None] + xs[None, :], 0, Wp - 1)
        return dpb_y4[slot[:, None, None], plane_idx[:, None, None],
                      yy[:, :, None], xx[:, None, :]].astype(jnp.int32)

    p1 = gather(sel[:, 0], sel[:, 1], sel[:, 2])
    p2 = gather(sel[:, 3], sel[:, 4], sel[:, 5])
    same = (sel[:, 0] == sel[:, 3]) & (sel[:, 1] == sel[:, 4]) & \
        (sel[:, 2] == sel[:, 5])
    avg = (p1 + p2 + 1) >> 1
    return jnp.where(same[:, None, None], p1, avg)


def chroma_mc_blocks(dpb_c, slot, bx, by, mvx, mvy):
    """1/8-pel bilinear chroma MC for N 2x2 blocks via 4 pixel gathers.

    dpb_c [S, Hcp, Wcp] uint8 (padded PAD//2).  Returns [N, 2, 2] int32.
    """
    Hp, Wp = dpb_c.shape[1], dpb_c.shape[2]
    xi = bx + (mvx >> 3) + PAD // 2
    yi = by + (mvy >> 3) + PAD // 2
    xf = (mvx & 7)[:, None, None]
    yf = (mvy & 7)[:, None, None]
    ys = jnp.arange(2)
    xs = jnp.arange(2)

    def g(dy, dx):
        yy = jnp.clip(yi[:, None] + ys[None, :] + dy, 0, Hp - 1)
        xx = jnp.clip(xi[:, None] + xs[None, :] + dx, 0, Wp - 1)
        return dpb_c[slot[:, None, None], yy[:, :, None],
                     xx[:, None, :]].astype(jnp.int32)

    A = g(0, 0)
    B = g(0, 1)
    C = g(1, 0)
    D = g(1, 1)
    return ((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B +
            (8 - xf) * yf * C + xf * yf * D + 32) >> 6


def weight_uni_dev(pred, w, o, log_wd):
    """Explicit unidirectional weighting (8.4.2.3.2); unit params = identity."""
    hi = ((pred * w + (1 << jnp.maximum(log_wd - 1, 0))) >> log_wd) + o
    lo = pred * w + o
    return jnp.clip(jnp.where(log_wd >= 1, hi, lo), 0, 255)


def weight_bi_dev(p0, p1, w0, w1, o0, o1, log_wd):
    """Weighted bi-prediction; (1,1,0,0,0) degenerates to default averaging."""
    v = ((p0 * w0 + p1 * w1 + (1 << log_wd)) >> (log_wd + 1)) + \
        ((o0 + o1 + 1) >> 1)
    return jnp.clip(v, 0, 255)


# ---------------------------------------------------------------------------
# Banded (gather-free) MC.
#
# TPU gathers cost ~12ns/element (measured), making per-pixel MC gathers the
# pipeline's dominant cost.  But MVs are constant per 4x4 block and almost
# always small, so MC is re-expressed as a chain of static shifted reads
# select-merged by block-resolution masks — pure fused elementwise work that
# runs ~3 orders of magnitude faster.  Frames with |mv_int| > MV_BAND fall
# back to the gather path (host checks the ABI and picks the variant).
#
# Correctness structure: a separable shift (vertical pass then horizontal
# pass) is WRONG at block boundaries because the horizontal pass would read
# vertically-shifted pixels produced under a neighbor block's MV.  Instead,
# one fused pass builds, for every destination 4x4 block, an expanded source
# window indexed BY DESTINATION BLOCK (rows dyi..dyi+1 via two outputs; an
# 8-wide column window at 4*floor(dxi/4)), so every mask is evaluated at the
# block that consumes the pixels.  The final quarter-pel read is then an
# 8-term in-window select.
# ---------------------------------------------------------------------------

# quarter-pel position table (spec 8.4.2.2.1): (plane1, dy1, dx1,
# plane2, dy2, dx2) per (yFrac * 4 + xFrac); planes: 0 G, 1 b, 2 h, 3 j.
_LUMA_TAB = np.asarray([
    [0, 0, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0], [1, 0, 0, 1, 0, 0],
    [1, 0, 0, 0, 0, 1],
    [0, 0, 0, 2, 0, 0], [1, 0, 0, 2, 0, 0], [1, 0, 0, 3, 0, 0],
    [1, 0, 0, 2, 0, 1],
    [2, 0, 0, 2, 0, 0], [2, 0, 0, 3, 0, 0], [3, 0, 0, 3, 0, 0],
    [3, 0, 0, 2, 0, 1],
    [0, 1, 0, 2, 0, 0], [1, 1, 0, 2, 0, 0], [3, 0, 0, 1, 1, 0],
    [1, 1, 0, 2, 0, 1],
], np.int32)


def _blk4_map(vals, mb_w: int, mb_h: int):
    """Per-4x4-block values [n, 16] -> block-resolution map [H/4, W/4]."""
    return vals.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 4, mb_w * 4)


def _tab_sel(col: np.ndarray, pos):
    """Lookup tiny table column by [.,.] index map via a select chain
    (16 fused selects beat a 65k-element gather on TPU)."""
    out = jnp.full(pos.shape, int(col[0]), jnp.int32)
    for k in range(1, len(col)):
        out = jnp.where(pos == k, int(col[k]), out)
    return out


def _mb_map(vals, mb_w: int, mb_h: int, scale: int):
    """Per-MB values [n] -> pixel map [mb_h*scale, mb_w*scale]."""
    m = vals.reshape(mb_h, mb_w)
    return jnp.repeat(jnp.repeat(m, scale, 0), scale, 1)


def _luma_windows_banded(dpb_y4, slotm, dyim, qxm, H: int, W: int,
                         band: int):
    """Build per-destination-block luma source windows.

    dpb_y4 [S, 4, Hp, Wp]; maps at block resolution [H/4, W/4]:
    slotm (>=0), dyim = mv_y integer part in [-band-1, band],
    qxm = floor(mv_x_int / 4) in [-band//4-2, band//4+1].
    Returns (Ua, Wb) each [4, H, W/4, 8] uint8: rows r+dyi (Ua) and
    r+dyi+1 (Ub); window column w = source col 4*jblk + 4*qx + w.
    """
    S = dpb_y4.shape[0]
    Wp = dpb_y4.shape[3]
    X = dpb_y4.reshape(S, 4, dpb_y4.shape[2], Wp // 4, 4)
    # expanded 8-wide windows, built ONCE, kept FLAT in the lane dim
    # (a trailing dim of 8 would be padded to 128 lanes by the TPU layout —
    # 16x physical bloat the moment fusion materializes it)
    Xe = jnp.concatenate([X[:, :, :, :-1], X[:, :, :, 1:]], axis=4) \
        .reshape(S, 4, dpb_y4.shape[2], (Wp // 4 - 1) * 8)
    nj = W // 4
    c4 = PAD // 4
    ua = jnp.zeros((4, H, nj * 8), jnp.uint8)
    ub = jnp.zeros((4, H, nj * 8), jnp.uint8)
    m_r = jnp.repeat(jnp.repeat(slotm, 4, 0), 8, 1)      # [H, 8*W/4]
    dy_r = jnp.repeat(jnp.repeat(dyim, 4, 0), 8, 1)
    qx_r = jnp.repeat(jnp.repeat(qxm, 4, 0), 8, 1)
    for t in range(S):
        st = m_r == t
        for sy in range(-band - 1, band + 1):
            msk_sy = st & (dy_r == sy)
            rowsl = Xe[t, :, PAD + sy:PAD + sy + H + 1]  # [4, H+1, 8*(Wp/4-1)]
            for q in range(-(band + 4) // 4 - 1, band // 4 + 1):
                m = (msk_sy & (qx_r == q))[None]
                win = rowsl[:, :, 8 * (c4 + q):8 * (c4 + q) + 8 * nj]
                ua = jnp.where(m, win[:, :H], ua)
                ub = jnp.where(m, win[:, 1:], ub)
    return ua.reshape(4, H, nj, 8), ub.reshape(4, H, nj, 8)


def _luma_pos_read(U, planem, dysel, widx, H: int, W: int):
    """Read one quarter-pel position from the windows.

    U = (Ua, Ub) each [4, H, W/4, 8]; planem [H, W] in 0..3; dysel [H, W]
    in {0, 1} picks Ua/Ub; widx [H, W] in 0..7 in-window column."""
    out = jnp.zeros((H, W), jnp.int32)
    for k in range(4):
        for v in range(2):
            src = U[v][k]                                # [H, W/4, 8]
            sel = (planem == k) & (dysel == v)
            for w in range(8):
                cand = jnp.repeat(src[:, :, w], 4, 1)    # [H, W]
                out = jnp.where(sel & (widx == w),
                                cand.astype(jnp.int32), out)
    return out


def _chroma_banded(dpb_c, slotm2, dycm, qxcm, H2: int, W2: int, band: int):
    """Per-destination-block chroma source windows (4 wide, 2 row variants).

    Maps at 2x2-block resolution [H2/2, W2/2]: dycm = mv_y>>3 in
    [-band//2-1, band//2], qxcm = floor((mv_x>>3)/2).
    Returns (ua, ub) [H2, W2/2, 4] uint8 (rows r+dyc and r+dyc+1)."""
    S = dpb_c.shape[0]
    pc = PAD // 2
    Wp2 = dpb_c.shape[2]
    X = dpb_c.reshape(S, dpb_c.shape[1], Wp2 // 2, 2)
    Xe = jnp.concatenate([X[:, :, :-1], X[:, :, 1:]], axis=3) \
        .reshape(S, dpb_c.shape[1], (Wp2 // 2 - 1) * 4)
    nj = W2 // 2
    c2 = pc // 2
    ua = jnp.zeros((H2, nj * 4), jnp.uint8)
    ub = jnp.zeros((H2, nj * 4), jnp.uint8)
    m_r = jnp.repeat(jnp.repeat(slotm2, 2, 0), 4, 1)
    dy_r = jnp.repeat(jnp.repeat(dycm, 2, 0), 4, 1)
    qx_r = jnp.repeat(jnp.repeat(qxcm, 2, 0), 4, 1)
    for t in range(S):
        st = m_r == t
        for sy in range(-band // 2 - 2, band // 2 + 2):
            msk_sy = st & (dy_r == sy)
            rowsl = Xe[t, pc + sy:pc + sy + H2 + 1]      # [H2+1, 4*(Wp2/2-1)]
            for q in range(-(band // 2 + 2) // 2 - 1, band // 4 + 2):
                m = msk_sy & (qx_r == q)
                win = rowsl[:, 4 * (c2 + q):4 * (c2 + q) + 4 * nj]
                ua = jnp.where(m, win[:H2], ua)
                ub = jnp.where(m, win[1:], ub)
    return ua.reshape(H2, nj, 4), ub.reshape(H2, nj, 4)


def inter_predict_banded(abi, dpb_y4, dpb_cb, dpb_cr, mb_w: int, mb_h: int,
                         band: int = MV_BAND):
    """Gather-free MC for frames with |mv_int| <= band (host-verified).

    Same contract as inter_predict."""
    n = mb_w * mb_h
    H, W = mb_h * 16, mb_w * 16
    H2, W2 = H // 2, W // 2
    mv = abi["mv"].reshape(n, 16, 2, 2)
    refslot = abi["refslot"].reshape(n, 16, 2)

    preds_y = []
    preds_cb = []
    preds_cr = []
    for lst in range(2):
        slot = jnp.maximum(refslot[:, :, lst], 0)
        mvx = mv[:, :, lst, 0]
        mvy = mv[:, :, lst, 1]
        slotm = _blk4_map(slot, mb_w, mb_h)
        dyim = _blk4_map(mvy >> 2, mb_w, mb_h)
        dxim = _blk4_map(mvx >> 2, mb_w, mb_h)
        qxm = dxim >> 2
        rxm = dxim & 3
        pos = _blk4_map((mvy & 3) * 4 + (mvx & 3), mb_w, mb_h)
        U = _luma_windows_banded(dpb_y4, slotm, dyim, qxm, H, W, band)
        # position maps at pixel resolution
        vcol = jnp.arange(W) % 4
        p1 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 0], pos), 4, 0), 4, 1)
        d1 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 1], pos), 4, 0), 4, 1)
        x1 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 2], pos), 4, 0), 4, 1)
        p2 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 3], pos), 4, 0), 4, 1)
        d2 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 4], pos), 4, 0), 4, 1)
        x2 = jnp.repeat(jnp.repeat(_tab_sel(_LUMA_TAB[:, 5], pos), 4, 0), 4, 1)
        rx_px = jnp.repeat(jnp.repeat(rxm, 4, 0), 4, 1)
        w1 = vcol[None, :] + rx_px + x1
        w2 = vcol[None, :] + rx_px + x2
        v1 = _luma_pos_read(U, p1, d1, w1, H, W)
        v2 = _luma_pos_read(U, p2, d2, w2, H, W)
        same = (p1 == p2) & (d1 == d2) & (w1 == w2)
        py = jnp.where(same, v1, (v1 + v2 + 1) >> 1)

        # chroma
        slotm2 = _blk4_map(slot, mb_w, mb_h)        # 2x2 blocks == 4x4 grid
        dycm = _blk4_map(mvy >> 3, mb_w, mb_h)
        dxcm = _blk4_map(mvx >> 3, mb_w, mb_h)
        qxcm = dxcm >> 1
        rxcm = dxcm & 1
        xfm = _blk4_map(mvx & 7, mb_w, mb_h)
        yfm = _blk4_map(mvy & 7, mb_w, mb_h)
        pcs = []
        for dpb_c in (dpb_cb, dpb_cr):
            ua, ub = _chroma_banded(dpb_c, slotm2, dycm, qxcm, H2, W2, band)
            vcol2 = jnp.arange(W2) % 2
            rx_c = jnp.repeat(jnp.repeat(rxcm, 2, 0), 2, 1)
            wbase = vcol2[None, :] + rx_c               # [H2, W2] in 0..2
            xf = jnp.repeat(jnp.repeat(xfm, 2, 0), 2, 1)
            yf = jnp.repeat(jnp.repeat(yfm, 2, 0), 2, 1)
            A = jnp.zeros((H2, W2), jnp.int32)
            B = jnp.zeros((H2, W2), jnp.int32)
            C = jnp.zeros((H2, W2), jnp.int32)
            D = jnp.zeros((H2, W2), jnp.int32)
            for w in range(4):
                ca = jnp.repeat(ua[:, :, w], 2, 1).astype(jnp.int32)
                cb = jnp.repeat(ub[:, :, w], 2, 1).astype(jnp.int32)
                A = jnp.where(wbase == w, ca, A)
                B = jnp.where(wbase + 1 == w, ca, B)
                C = jnp.where(wbase == w, cb, C)
                D = jnp.where(wbase + 1 == w, cb, D)
            pcs.append(((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B +
                        (8 - xf) * yf * C + xf * yf * D + 32) >> 6)
        preds_y.append(py)
        preds_cb.append(pcs[0])
        preds_cr.append(pcs[1])

    # weighted / bi-prediction combine with per-MB parameter maps
    used = refslot >= 0                                  # [n, 16, 2]
    u0 = jnp.repeat(jnp.repeat(_blk4_map(used[:, :, 0], mb_w, mb_h), 4, 0), 4, 1)
    u1 = jnp.repeat(jnp.repeat(_blk4_map(used[:, :, 1], mb_w, mb_h), 4, 0), 4, 1)
    u0c = jnp.repeat(jnp.repeat(_blk4_map(used[:, :, 0], mb_w, mb_h), 2, 0), 2, 1)
    u1c = jnp.repeat(jnp.repeat(_blk4_map(used[:, :, 1], mb_w, mb_h), 2, 0), 2, 1)
    wp = abi["wp"].reshape(n, 16, 2, 3, 2)
    lw_y = _mb_map(abi["logwd"][:, 0], mb_w, mb_h, 16)
    lw_c = _mb_map(abi["logwd"][:, 1], mb_w, mb_h, 8)

    def comb(p0, p1, plane_idx, lw, m0, m1, scale):
        w0 = jnp.repeat(jnp.repeat(
            _blk4_map(wp[:, :, 0, plane_idx, 0], mb_w, mb_h), scale, 0), scale, 1)
        o0 = jnp.repeat(jnp.repeat(
            _blk4_map(wp[:, :, 0, plane_idx, 1], mb_w, mb_h), scale, 0), scale, 1)
        w1 = jnp.repeat(jnp.repeat(
            _blk4_map(wp[:, :, 1, plane_idx, 0], mb_w, mb_h), scale, 0), scale, 1)
        o1 = jnp.repeat(jnp.repeat(
            _blk4_map(wp[:, :, 1, plane_idx, 1], mb_w, mb_h), scale, 0), scale, 1)
        bi = weight_bi_dev(p0, p1, w0, w1, o0, o1, lw)
        uni0 = weight_uni_dev(p0, w0, o0, lw)
        uni1 = weight_uni_dev(p1, w1, o1, lw)
        return jnp.where(m0 & m1, bi, jnp.where(m0, uni0, uni1))

    pred_y = comb(preds_y[0], preds_y[1], 0, lw_y, u0, u1, 4)
    pred_cb = comb(preds_cb[0], preds_cb[1], 1, lw_c, u0c, u1c, 2)
    pred_cr = comb(preds_cr[0], preds_cr[1], 2, lw_c, u0c, u1c, 2)
    return pred_y, pred_cb, pred_cr


def inter_predict(abi, dpb_y4, dpb_cb, dpb_cr, mb_w: int, mb_h: int):
    """Prediction planes for all inter blocks (one batched kernel).

    dpb_y4 [S, 4, Hp, Wp]: precomputed (G, b, h, j) planes per slot.
    Returns (pred_y [H, W], pred_cb, pred_cr) int32; intra-MB regions are
    garbage (masked by the caller).
    """
    n = mb_w * mb_h
    mv = abi["mv"].reshape(n * 16, 2, 2)            # [N, list, (x, y)]
    refslot = abi["refslot"].reshape(n * 16, 2)
    used = refslot >= 0
    slot = jnp.maximum(refslot, 0)
    blk = jnp.arange(n * 16)
    mbi = blk // 16
    cell = blk % 16
    mbx = mbi % mb_w
    mby = mbi // mb_w
    bx = mbx * 16 + (cell % 4) * 4
    by = mby * 16 + (cell // 4) * 4
    cx = mbx * 8 + (cell % 4) * 2
    cy = mby * 8 + (cell // 4) * 2

    preds_y = []
    preds_cb = []
    preds_cr = []
    for lst in range(2):
        py = luma_mc_gather(dpb_y4, slot[:, lst], bx, by,
                            mv[:, lst, 0], mv[:, lst, 1])
        pcb = chroma_mc_blocks(dpb_cb, slot[:, lst], cx, cy,
                               mv[:, lst, 0], mv[:, lst, 1])
        pcr = chroma_mc_blocks(dpb_cr, slot[:, lst], cx, cy,
                               mv[:, lst, 0], mv[:, lst, 1])
        preds_y.append(py)
        preds_cb.append(pcb)
        preds_cr.append(pcr)

    wp = abi["wp"]                                   # [n,4,4,2,3,2]
    wpf = wp.reshape(n * 16, 2, 3, 2)
    logwd_y = jnp.repeat(abi["logwd"][:, 0], 16)     # [N]
    logwd_c = jnp.repeat(abi["logwd"][:, 1], 16)

    def combine(p0, p1, plane_idx, logwd):
        w0 = wpf[:, 0, plane_idx, 0][:, None, None]
        o0 = wpf[:, 0, plane_idx, 1][:, None, None]
        w1 = wpf[:, 1, plane_idx, 0][:, None, None]
        o1 = wpf[:, 1, plane_idx, 1][:, None, None]
        lw = logwd[:, None, None]
        both = (used[:, 0] & used[:, 1])[:, None, None]
        only1 = (~used[:, 0])[:, None, None]
        uni0 = weight_uni_dev(p0, w0, o0, lw)
        uni1 = weight_uni_dev(p1, w1, o1, lw)
        bi = weight_bi_dev(p0, p1, w0, w1, o0, o1, lw)
        return jnp.where(both, bi, jnp.where(only1, uni1, uni0))

    out_y = combine(preds_y[0], preds_y[1], 0, logwd_y)
    out_cb = combine(preds_cb[0], preds_cb[1], 1, logwd_c)
    out_cr = combine(preds_cr[0], preds_cr[1], 2, logwd_c)

    from .transforms import blocks4_to_plane
    pred_y = blocks4_to_plane(out_y.reshape(n, 16, 4, 4), mb_w, mb_h)
    pcb_mb = out_cb.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
    pcr_mb = out_cr.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
    pred_cb = pcb_mb.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 8, mb_w * 8)
    pred_cr = pcr_mb.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 8, mb_w * 8)
    return pred_y, pred_cb, pred_cr
