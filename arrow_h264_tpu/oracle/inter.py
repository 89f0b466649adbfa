"""Spec-literal inter prediction oracle (numpy, spec 8.4.2.2-8.4.2.3).

Reference parity: JM-lineage `mc_prediction.c` / `get_block.c` (SURVEY.md §2;
reference mount empty — implemented from the spec clauses).

Luma: quarter-pel, 6-tap (1,-5,20,20,-5,1) half-pel + bilinear quarter-pel.
Chroma (4:2:0): 1/8-pel bilinear.  Weighted prediction per 8.4.2.3.
Reference planes are edge-extended by coordinate clamping.
"""

from __future__ import annotations

import numpy as np


def _clip3(lo, hi, v):
    return np.minimum(hi, np.maximum(lo, v))


def luma_block_mc(ref: np.ndarray, x0: int, y0: int, mv_x: int, mv_y: int,
                  w: int, h: int) -> np.ndarray:
    """Quarter-pel luma MC for a w x h block at (x0, y0), MV in qpel units.

    `ref` is the full unpadded reference plane; edge extension via clamp.
    Returns int32 [h, w] in [0, 255].
    """
    H, W = ref.shape
    xi = x0 + (mv_x >> 2)
    yi = y0 + (mv_y >> 2)
    xf = mv_x & 3
    yf = mv_y & 3
    # gather (h+5) x (w+5) window at (yi-2, xi-2) with clamp edge extension
    ys = _clip3(0, H - 1, np.arange(yi - 2, yi + h + 3))
    xs = _clip3(0, W - 1, np.arange(xi - 2, xi + w + 3))
    win = ref[np.ix_(ys, xs)].astype(np.int64)   # [h+5, w+5]

    def tap6(a, axis):
        sl = [slice(None)] * a.ndim
        out = None
        for k, c in enumerate((1, -5, 20, 20, -5, 1)):
            s = [slice(None)] * a.ndim
            s[axis] = slice(k, a.shape[axis] - 5 + k)
            t = c * a[tuple(s)]
            out = t if out is None else out + t
        return out

    G = win[2:2 + h + 1, 2:2 + w + 1]                    # +1 for neighbors
    b1 = tap6(win, 1)                                    # [h+5, w]
    h1 = tap6(win, 0)                                    # [h, w+5]
    b = _clip3(0, 255, (b1 + 16) >> 5)                   # horizontal half
    hh = _clip3(0, 255, (h1 + 16) >> 5)                  # vertical half
    j1 = tap6(b1, 0)                                     # [h, w]
    j = _clip3(0, 255, (j1 + 512) >> 10)
    # align to (h+1) x (w+1) grids for neighbor averaging
    b_g = b[2:2 + h + 1, :]                              # [h+1, w]
    h_g = hh[:, 2:2 + w + 1]                             # [h, w+1]

    def out(yf, xf):
        if (yf, xf) == (0, 0):
            return G[:h, :w]
        if (yf, xf) == (0, 2):
            return b_g[:h, :]
        if (yf, xf) == (2, 0):
            return h_g[:, :w]
        if (yf, xf) == (2, 2):
            return j
        if yf == 0:  # (0,1)/(0,3): avg of G/H and b
            g = G[:h, :w] if xf == 1 else G[:h, 1:w + 1]
            return (g + b_g[:h, :] + 1) >> 1
        if xf == 0:
            g = G[:h, :w] if yf == 1 else G[1:h + 1, :w]
            return (g + h_g[:, :w] + 1) >> 1
        if (yf, xf) in ((1, 1), (1, 3), (3, 1), (3, 3)):
            bb = b_g[:h, :] if yf == 1 else b_g[1:h + 1, :]
            hv = h_g[:, :w] if xf == 1 else h_g[:, 1:w + 1]
            return (bb + hv + 1) >> 1
        if yf == 2:  # (2,1)/(2,3): avg j with h
            hv = h_g[:, :w] if xf == 1 else h_g[:, 1:w + 1]
            return (j + hv + 1) >> 1
        # xf == 2: (1,2)/(3,2): avg j with b
        bb = b_g[:h, :] if yf == 1 else b_g[1:h + 1, :]
        return (j + bb + 1) >> 1

    return out(yf, xf).astype(np.int32)


def chroma_block_mc(ref: np.ndarray, x0: int, y0: int, mv_x: int, mv_y: int,
                    w: int, h: int) -> np.ndarray:
    """1/8-pel bilinear chroma MC (spec 8.4.2.2.2); MV in luma qpel units."""
    H, W = ref.shape
    xi = x0 + (mv_x >> 3)
    yi = y0 + (mv_y >> 3)
    xf = mv_x & 7
    yf = mv_y & 7
    ys = _clip3(0, H - 1, np.arange(yi, yi + h + 1))
    xs = _clip3(0, W - 1, np.arange(xi, xi + w + 1))
    win = ref[np.ix_(ys, xs)].astype(np.int64)
    A = win[:h, :w]
    B = win[:h, 1:w + 1]
    C = win[1:h + 1, :w]
    D = win[1:h + 1, 1:w + 1]
    return (((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B +
             (8 - xf) * yf * C + xf * yf * D + 32) >> 6).astype(np.int32)


def weight_uni(pred: np.ndarray, w: int, o: int, log_wd: int) -> np.ndarray:
    """Explicit unidirectional weighted prediction (spec 8.4.2.3.2)."""
    if log_wd >= 1:
        v = ((pred * w + (1 << (log_wd - 1))) >> log_wd) + o
    else:
        v = pred * w + o
    return _clip3(0, 255, v).astype(np.int32)


def weight_bi(p0: np.ndarray, p1: np.ndarray, w0: int, w1: int,
              o0: int, o1: int, log_wd: int) -> np.ndarray:
    """Weighted bi-prediction (spec 8.4.2.3.2)."""
    v = ((p0 * w0 + p1 * w1 + (1 << log_wd)) >> (log_wd + 1)) + ((o0 + o1 + 1) >> 1)
    return _clip3(0, 255, v).astype(np.int32)


def default_bi(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    return ((p0 + p1 + 1) >> 1).astype(np.int32)
