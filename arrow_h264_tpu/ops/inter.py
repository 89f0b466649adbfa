"""Device inter prediction: batched quarter-pel MC over the HBM DPB (JAX).

Reference parity: JM-lineage `get_block.c` quarter-pel interpolation +
`mc_prediction.c` weighted prediction (SURVEY.md §2), re-expressed as ONE
batched gather+filter over every 4x4 block of the frame — inter blocks have
no intra-frame dependencies, so this is a single dependency-free kernel
(SURVEY.md §2 "wavefront-free batched-MB scheduling" for the inter path).

The DPB lives on device as [S, Hp, Wp] uint8 planes, padded by PAD with
edge replication; MC windows are gathered with base-clamp, which is exactly
equivalent to the spec's per-sample edge extension because PAD exceeds the
window size (see oracle.inter for the scalar reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD = 16            # luma padding; chroma uses PAD // 2
_WIN = 10           # 4x4 block -> (4+6) x (4+6) tap window


def pad_plane(p):
    """[H, W] -> [H + 2*PAD(/2), W + ...] edge-replicated, same dtype."""
    pad = PAD if p.ndim == 2 else PAD
    return jnp.pad(p, pad, mode="edge")


def pad_chroma(p):
    return jnp.pad(p, PAD // 2, mode="edge")


def _tap6(v, axis):
    taps = (1, -5, 20, 20, -5, 1)
    n = v.shape[axis]
    sl = lambda k: jax.lax.slice_in_dim(v, k, n - 5 + k, axis=axis)
    return sum(c * sl(k) for k, c in enumerate(taps))


def luma_mc_blocks(dpb_y, slot, bx, by, mvx, mvy):
    """Quarter-pel MC for N 4x4 luma blocks.

    dpb_y [S, Hp, Wp] uint8 (padded PAD); slot/bx/by/mvx/mvy [N] int32,
    (bx, by) = unpadded block origin.  Returns [N, 4, 4] int32.
    """
    Hp, Wp = dpb_y.shape[1], dpb_y.shape[2]
    xi = bx + (mvx >> 2) + PAD - 2
    yi = by + (mvy >> 2) + PAD - 2
    xf = mvx & 3
    yf = mvy & 3
    xi = jnp.clip(xi, 0, Wp - _WIN)
    yi = jnp.clip(yi, 0, Hp - _WIN)

    def g(s, y, x):
        return jax.lax.dynamic_slice(dpb_y, (s, y, x), (1, _WIN, _WIN))[0]

    win = jax.vmap(g)(slot, yi, xi).astype(jnp.int32)      # [N, 10, 10]

    G = win[:, 2:8, 2:8]                                    # [N, 6, 6] (5 used)
    b1 = _tap6(win, 2)                                      # [N, 10, 5]
    h1 = _tap6(win, 1)                                      # [N, 5, 10]
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    hh = jnp.clip((h1 + 16) >> 5, 0, 255)
    j1 = _tap6(b1, 1)                                       # [N, 5, 5]
    j = jnp.clip((j1 + 512) >> 10, 0, 255)[:, :4, :4]
    b_g = b[:, 2:8, :]                                      # [N, 5(rows), 5]
    h_g = hh[:, :, 2:8]                                     # [N, 5, 5(cols)]

    G00 = G[:, :4, :4]
    G01 = G[:, :4, 1:5]
    G10 = G[:, 1:5, :4]
    b_same = b_g[:, :4, :4]
    b_next = b_g[:, 1:5, :4]     # s: horizontal half at next row
    h_same = h_g[:, :4, :4]
    h_next = h_g[:, :4, 1:5]     # m: vertical half at next column

    avg = lambda a, b_: (a + b_ + 1) >> 1
    # candidates[yf][xf] per spec 8.4.2.2.1 position table
    cand = [
        [G00, avg(G00, b_same), b_same, avg(b_same, G01)],
        [avg(G00, h_same), avg(b_same, h_same), avg(b_same, j),
         avg(b_same, h_next)],
        [h_same, avg(h_same, j), j, avg(j, h_next)],
        [avg(G10, h_same), avg(b_next, h_same), avg(j, b_next),
         avg(b_next, h_next)],
    ]
    stack = jnp.stack([jnp.stack(row, axis=1) for row in cand], axis=1)
    # stack [N, 4(yf), 4(xf), 4, 4]
    sel = stack[jnp.arange(stack.shape[0]), yf, xf]
    return sel


def chroma_mc_blocks(dpb_c, slot, bx, by, mvx, mvy):
    """1/8-pel bilinear chroma MC for N 2x2 blocks.

    dpb_c [S, Hcp, Wcp] uint8 (padded PAD//2); (bx, by) unpadded chroma
    block origin.  Returns [N, 2, 2] int32.
    """
    Hp, Wp = dpb_c.shape[1], dpb_c.shape[2]
    xi = bx + (mvx >> 3) + PAD // 2
    yi = by + (mvy >> 3) + PAD // 2
    xf = mvx & 7
    yf = mvy & 7
    xi = jnp.clip(xi, 0, Wp - 3)
    yi = jnp.clip(yi, 0, Hp - 3)

    def g(s, y, x):
        return jax.lax.dynamic_slice(dpb_c, (s, y, x), (1, 3, 3))[0]

    win = jax.vmap(g)(slot, yi, xi).astype(jnp.int32)      # [N, 3, 3]
    A = win[:, :2, :2]
    B = win[:, :2, 1:3]
    C = win[:, 1:3, :2]
    D = win[:, 1:3, 1:3]
    xf = xf[:, None, None]
    yf = yf[:, None, None]
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


def inter_predict(abi, dpb_y, dpb_cb, dpb_cr, mb_w: int, mb_h: int):
    """Prediction planes for all inter blocks (one batched kernel).

    Uses per-block refslot/mv from the ABI; blocks whose list is unused get
    unit-weight zero contributions masked out.  Returns (pred_y [H, W],
    pred_cb, pred_cr) int32; values for intra MBs are garbage (masked later).
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
        py = luma_mc_blocks(dpb_y, slot[:, lst], bx, by,
                            mv[:, lst, 0], mv[:, lst, 1])
        pcb = chroma_mc_blocks(dpb_cb, slot[:, lst], cx, cy,
                               mv[:, lst, 0], mv[:, lst, 1])
        pcr = chroma_mc_blocks(dpb_cr, slot[:, lst], cx, cy,
                               mv[:, lst, 0], mv[:, lst, 1])
        preds_y.append(py)
        preds_cb.append(pcb)
        preds_cr.append(pcr)

    wp = abi["wp"]                                   # [n,4,4,2,3,2] (list, plane(y/cb/cr), (w,o))
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

    # assemble planes: [N,4,4] -> [n,16,4,4] -> plane
    from .transforms import blocks4_to_plane
    pred_y = blocks4_to_plane(out_y.reshape(n, 16, 4, 4), mb_w, mb_h)
    # chroma blocks are 2x2 at (cell%4, cell//4): reassemble [n,8,8]
    pcb_mb = out_cb.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
    pcr_mb = out_cr.reshape(n, 4, 4, 2, 2).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
    pred_cb = pcb_mb.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 8, mb_w * 8)
    pred_cr = pcr_mb.reshape(mb_h, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(mb_h * 8, mb_w * 8)
    return pred_y, pred_cb, pred_cr
