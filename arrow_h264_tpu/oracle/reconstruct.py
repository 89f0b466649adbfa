"""Spec-literal picture reconstruction oracle (numpy).

Reference parity: JM-lineage `decode_one_macroblock` path: `block.c`,
`intra*_pred.c`, `mc_prediction.c` (SURVEY.md §2; reference mount empty —
implemented from spec 8.3-8.5).

Consumes parsed MBRecords (the host entropy output) and produces frame
planes; the in-loop deblock runs afterwards via oracle.deblock.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.params import PPS, SPS
from ..common.tables import (
    BLK4_X, BLK4_Y, BLK8_X, BLK8_Y, RASTER_TO_BLK4, chroma_qp,
)
from ..mb.parse import PictureParse
from ..mb.types import MB_I16x16, MB_IPCM, MB_PSKIP, MBRecord
from . import intra as ip
from .inter import (
    chroma_block_mc, default_bi, luma_block_mc, weight_bi, weight_uni,
)


def implicit_weights(cur_poc: int, p0, p1) -> tuple[int, int]:
    """Implicit weighted bi-prediction weights (spec 8.4.2.3.1)."""
    if p0.long_term or p1.long_term:
        return 32, 32
    td = max(-128, min(127, p1.poc - p0.poc))
    if td == 0:
        return 32, 32
    tb = max(-128, min(127, cur_poc - p0.poc))
    tx = (16384 + (abs(td) >> 1)) // td
    dsf = max(-1024, min(1023, (tb * tx + 32) >> 6))
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return 32, 32
    return 64 - w1, w1
from .transforms import (
    chroma_dc_dequant, dequant4x4, dequant8x8, idct4x4, idct8x8,
    inverse_scan_4x4, inverse_scan_8x8, luma_dc_dequant,
    weight_scale_raster_4x4, weight_scale_raster_8x8,
)


def _clip_u8(a: np.ndarray) -> np.ndarray:
    return np.clip(a, 0, 255)


class Reconstructor:
    def __init__(self, pic: PictureParse, poc: int = 0):
        self.pic = pic
        self.poc = poc
        self.sps: SPS = pic.sps
        self.pps: PPS = pic.pps
        self.mb_w = pic.mb_w
        self.mb_h = pic.mb_h
        self.w = self.mb_w * 16
        self.h = self.mb_h * 16
        self.y = np.zeros((self.h, self.w), np.int32)
        self.cb = np.zeros((self.h // 2, self.w // 2), np.int32)
        self.cr = np.zeros((self.h // 2, self.w // 2), np.int32)
        # active scaling lists (PPS overrides SPS), raster 4x4 / 8x8
        pps, sps = self.pps, self.sps
        sl4 = pps.scaling_lists_4x4 if pps.scaling_lists_4x4 is not None else sps.scaling_lists_4x4
        sl8 = pps.scaling_lists_8x8 if pps.scaling_lists_8x8 is not None else sps.scaling_lists_8x8
        self.ws4 = [weight_scale_raster_4x4(l) for l in sl4]       # 6 lists
        self.ws8 = [weight_scale_raster_8x8(l) for l in sl8[:2]]   # intra/inter Y

    # -- availability -------------------------------------------------------

    def _mb_avail_intra(self, nb_x: int, nb_y: int, cur: MBRecord) -> bool:
        """MB-level availability for intra prediction (spec 6.4.9 + 8.3)."""
        if nb_x < 0 or nb_y < 0 or nb_x >= self.mb_w or nb_y >= self.mb_h:
            return False
        nb_addr = nb_y * self.mb_w + nb_x
        cur_addr = cur.mb_y * self.mb_w + cur.mb_x
        if nb_addr >= cur_addr:
            return False
        if self.pic.slice_map[nb_y, nb_x] != cur.slice_id:
            return False
        nb = self.pic.mbs[nb_addr]
        if self.pps.constrained_intra_pred_flag and not nb.is_intra:
            return False
        return True

    def _blk_avail_intra(self, bx: int, by: int, cur: MBRecord, cur_blk: int) -> bool:
        """4x4-block availability for intra pred sample fetch."""
        if bx < 0 or by < 0 or bx >= self.mb_w * 4 or by >= self.mb_h * 4:
            return False
        nb_mbx, nb_mby = bx // 4, by // 4
        if (nb_mbx, nb_mby) == (cur.mb_x, cur.mb_y):
            blk = RASTER_TO_BLK4[(bx % 4) + 4 * (by % 4)]
            return blk < cur_blk
        return self._mb_avail_intra(nb_mbx, nb_mby, cur)

    # -- luma intra ---------------------------------------------------------

    def _recon_i4x4(self, mb: MBRecord) -> None:
        ws = self.ws4[0]
        x0, y0 = mb.mb_x * 16, mb.mb_y * 16
        for blk in range(16):
            x4, y4 = BLK4_X[blk], BLK4_Y[blk]
            bx, by = mb.mb_x * 4 + x4, mb.mb_y * 4 + y4
            px, py = x0 + 4 * x4, y0 + 4 * y4
            avail_l = self._blk_avail_intra(bx - 1, by, mb, blk)
            avail_t = self._blk_avail_intra(bx, by - 1, mb, blk)
            avail_tl = self._blk_avail_intra(bx - 1, by - 1, mb, blk)
            avail_tr = self._blk_avail_intra(bx + 1, by - 1, mb, blk)
            top = np.zeros(8, np.int32)
            left = np.zeros(4, np.int32)
            tl = 0
            if avail_t:
                top[:4] = self.y[py - 1, px:px + 4]
                if avail_tr:
                    top[4:] = self.y[py - 1, px + 4:px + 8]
                else:
                    top[4:] = top[3]
            if avail_l:
                left[:] = self.y[py:py + 4, px - 1]
            if avail_tl:
                tl = int(self.y[py - 1, px - 1])
            pred = ip.intra_nxn_pred(mb.i4_modes[blk], 4, top, left, tl,
                                     avail_t, avail_l, avail_tl)
            d = dequant4x4(inverse_scan_4x4(mb.luma_levels[blk]), mb.qp, ws)
            r = idct4x4(d)
            self.y[py:py + 4, px:px + 4] = _clip_u8(pred + r)

    def _recon_i8x8(self, mb: MBRecord) -> None:
        ws = self.ws8[0]
        x0, y0 = mb.mb_x * 16, mb.mb_y * 16
        for blk in range(4):
            x8, y8 = BLK8_X[blk], BLK8_Y[blk]
            bx, by = mb.mb_x * 4 + 2 * x8, mb.mb_y * 4 + 2 * y8  # 4x4 coords
            cur_blk4 = RASTER_TO_BLK4[(2 * x8) + 4 * (2 * y8)]
            px, py = x0 + 8 * x8, y0 + 8 * y8
            avail_l = self._blk_avail_intra(bx - 1, by, mb, cur_blk4)
            avail_t = self._blk_avail_intra(bx, by - 1, mb, cur_blk4)
            avail_tl = self._blk_avail_intra(bx - 1, by - 1, mb, cur_blk4)
            avail_tr = self._blk_avail_intra(bx + 2, by - 1, mb, cur_blk4)
            top = np.zeros(16, np.int32)
            left = np.zeros(8, np.int32)
            tl = 0
            if avail_t:
                top[:8] = self.y[py - 1, px:px + 8]
                if avail_tr:
                    top[8:] = self.y[py - 1, px + 8:px + 16]
                else:
                    top[8:] = top[7]
            if avail_l:
                left[:] = self.y[py:py + 8, px - 1]
            if avail_tl:
                tl = int(self.y[py - 1, px - 1])
            ft, fl, ftl = ip.filter_intra8x8_refs(top, left, tl, avail_t,
                                                  avail_l, avail_tl)
            pred = ip.intra_nxn_pred(mb.i8_modes[blk], 8, ft, fl, ftl,
                                     avail_t, avail_l, avail_tl)
            d = dequant8x8(inverse_scan_8x8(mb.luma_levels[blk]), mb.qp, ws)
            r = idct8x8(d)
            self.y[py:py + 8, px:px + 8] = _clip_u8(pred + r)

    def _recon_i16x16(self, mb: MBRecord) -> None:
        ws = self.ws4[0]
        x0, y0 = mb.mb_x * 16, mb.mb_y * 16
        avail_l = self._mb_avail_intra(mb.mb_x - 1, mb.mb_y, mb)
        avail_t = self._mb_avail_intra(mb.mb_x, mb.mb_y - 1, mb)
        avail_tl = self._mb_avail_intra(mb.mb_x - 1, mb.mb_y - 1, mb)
        top = self.y[y0 - 1, x0:x0 + 16] if avail_t else np.zeros(16, np.int32)
        left = self.y[y0:y0 + 16, x0 - 1] if avail_l else np.zeros(16, np.int32)
        tl = int(self.y[y0 - 1, x0 - 1]) if avail_tl else 0
        pred = ip.intra16x16_pred(mb.i16_mode, top, left, tl, avail_t, avail_l)
        # DC transform (DC levels arrive zig-zag scanned, spec 8.5.6)
        dc = luma_dc_dequant(_dc_raster(mb.luma_dc), mb.qp, int(ws[0, 0]))
        res = np.zeros((16, 16), np.int64)
        for blk in range(16):
            x4, y4 = BLK4_X[blk], BLK4_Y[blk]
            c = inverse_scan_4x4(mb.luma_levels[blk])
            d = dequant4x4(c, mb.qp, ws, dc_passthrough=True)
            d[0, 0] = dc[y4, x4]
            res[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] = idct4x4(d)
        self.y[y0:y0 + 16, x0:x0 + 16] = _clip_u8(pred + res)

    # -- inter (P) ----------------------------------------------------------

    def _recon_inter(self, mb: MBRecord) -> None:
        """MC + residual for P/B macroblocks, per 4x4 luma / 2x2 chroma block."""
        hdr = self.pic.headers[mb.slice_id]
        lists = self.pic.slice_reflists[mb.slice_id]
        x0, y0 = mb.mb_x * 16, mb.mb_y * 16
        explicit = (bool(self.pps.weighted_pred_flag) and hdr.is_p) or \
            (self.pps.weighted_bipred_idc == 1 and hdr.is_b)
        implicit = self.pps.weighted_bipred_idc == 2 and hdr.is_b
        pred_y = np.zeros((16, 16), np.int32)
        pred_c = [np.zeros((8, 8), np.int32), np.zeros((8, 8), np.int32)]
        pw_tabs = (hdr.pred_weights_l0, hdr.pred_weights_l1)
        for y4 in range(4):
            for x4 in range(4):
                parts = []   # (list, refpic, pred_y, pred_cb, pred_cr, refidx)
                for lst in range(2):
                    ref_idx = int(mb.refidx[lst, y4, x4])
                    if ref_idx < 0:
                        continue
                    mvx = int(mb.mvs[lst, y4, x4, 0])
                    mvy = int(mb.mvs[lst, y4, x4, 1])
                    ref = lists[lst][ref_idx]
                    ry, rcb, rcr = ref.planes[0], ref.planes[1], ref.planes[2]
                    py = luma_block_mc(ry, x0 + 4 * x4, y0 + 4 * y4,
                                       mvx, mvy, 4, 4)
                    pcb = chroma_block_mc(rcb, x0 // 2 + 2 * x4,
                                          y0 // 2 + 2 * y4, mvx, mvy, 2, 2)
                    pcr = chroma_block_mc(rcr, x0 // 2 + 2 * x4,
                                          y0 // 2 + 2 * y4, mvx, mvy, 2, 2)
                    parts.append((lst, ref, py, pcb, pcr, ref_idx))
                if len(parts) == 2:
                    _, r0, y0p, cb0, cr0, i0 = parts[0]
                    _, r1, y1p, cb1, cr1, i1 = parts[1]
                    if explicit:
                        w0, w1 = pw_tabs[0][i0], pw_tabs[1][i1]
                        ld, cd = hdr.luma_log2_weight_denom, \
                            hdr.chroma_log2_weight_denom
                        py = weight_bi(y0p, y1p, w0.luma_weight, w1.luma_weight,
                                       w0.luma_offset, w1.luma_offset, ld)
                        pcb = weight_bi(cb0, cb1, w0.chroma_weight[0],
                                        w1.chroma_weight[0], w0.chroma_offset[0],
                                        w1.chroma_offset[0], cd)
                        pcr = weight_bi(cr0, cr1, w0.chroma_weight[1],
                                        w1.chroma_weight[1], w0.chroma_offset[1],
                                        w1.chroma_offset[1], cd)
                    elif implicit:
                        iw0, iw1 = implicit_weights(self.poc, r0, r1)
                        py = weight_bi(y0p, y1p, iw0, iw1, 0, 0, 5)
                        pcb = weight_bi(cb0, cb1, iw0, iw1, 0, 0, 5)
                        pcr = weight_bi(cr0, cr1, iw0, iw1, 0, 0, 5)
                    else:
                        py = default_bi(y0p, y1p)
                        pcb = default_bi(cb0, cb1)
                        pcr = default_bi(cr0, cr1)
                else:
                    lst, _, py, pcb, pcr, ref_idx = parts[0]
                    if explicit:
                        pw = pw_tabs[lst][ref_idx]
                        py = weight_uni(py, pw.luma_weight, pw.luma_offset,
                                        hdr.luma_log2_weight_denom)
                        pcb = weight_uni(pcb, pw.chroma_weight[0],
                                         pw.chroma_offset[0],
                                         hdr.chroma_log2_weight_denom)
                        pcr = weight_uni(pcr, pw.chroma_weight[1],
                                         pw.chroma_offset[1],
                                         hdr.chroma_log2_weight_denom)
                pred_y[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] = py
                pred_c[0][2 * y4:2 * y4 + 2, 2 * x4:2 * x4 + 2] = pcb
                pred_c[1][2 * y4:2 * y4 + 2, 2 * x4:2 * x4 + 2] = pcr
        # luma residual (inter scaling lists)
        res = np.zeros((16, 16), np.int64)
        if mb.category != MB_PSKIP and mb.cbp_luma:
            if mb.transform_8x8:
                ws = self.ws8[1]
                for blk in range(4):
                    d = dequant8x8(inverse_scan_8x8(mb.luma_levels[blk]),
                                   mb.qp, ws)
                    x8, y8 = BLK8_X[blk], BLK8_Y[blk]
                    res[8 * y8:8 * y8 + 8, 8 * x8:8 * x8 + 8] = idct8x8(d)
            else:
                ws = self.ws4[3]
                for blk in range(16):
                    d = dequant4x4(inverse_scan_4x4(mb.luma_levels[blk]),
                                   mb.qp, ws)
                    x4, y4 = BLK4_X[blk], BLK4_Y[blk]
                    res[4 * y4:4 * y4 + 4, 4 * x4:4 * x4 + 4] = idct4x4(d)
        self.y[y0:y0 + 16, x0:x0 + 16] = _clip_u8(pred_y + res)
        # chroma residual
        cx, cy = mb.mb_x * 8, mb.mb_y * 8
        for pl, plane in ((0, self.cb), (1, self.cr)):
            resc = np.zeros((8, 8), np.int64)
            if mb.category != MB_PSKIP and mb.cbp_chroma:
                qpc = chroma_qp(mb.qp, self.pps.chroma_qp_offset(pl))
                ws = self.ws4[4 + pl]
                dc = chroma_dc_dequant(mb.chroma_dc[pl].reshape(2, 2), qpc,
                                       int(ws[0, 0]))
                for blk in range(4):
                    x2, y2 = blk % 2, blk // 2
                    c = inverse_scan_4x4(mb.chroma_ac[pl, blk])
                    d = dequant4x4(c, qpc, ws, dc_passthrough=True)
                    d[0, 0] = dc[y2, x2]
                    resc[4 * y2:4 * y2 + 4, 4 * x2:4 * x2 + 4] = idct4x4(d)
            plane[cy:cy + 8, cx:cx + 8] = _clip_u8(pred_c[pl] + resc)

    # -- chroma -------------------------------------------------------------

    def _recon_chroma(self, mb: MBRecord) -> None:
        x0, y0 = mb.mb_x * 8, mb.mb_y * 8
        avail_l = self._mb_avail_intra(mb.mb_x - 1, mb.mb_y, mb)
        avail_t = self._mb_avail_intra(mb.mb_x, mb.mb_y - 1, mb)
        avail_tl = self._mb_avail_intra(mb.mb_x - 1, mb.mb_y - 1, mb)
        for pl, plane in ((0, self.cb), (1, self.cr)):
            qpc = chroma_qp(mb.qp, self.pps.chroma_qp_offset(pl))
            ws = self.ws4[1 + pl]  # intra Cb / Cr lists
            top = plane[y0 - 1, x0:x0 + 8] if avail_t else np.zeros(8, np.int32)
            left = plane[y0:y0 + 8, x0 - 1] if avail_l else np.zeros(8, np.int32)
            tl = int(plane[y0 - 1, x0 - 1]) if avail_tl else 0
            pred = ip.chroma_pred(mb.chroma_mode, top, left, tl, avail_t, avail_l)
            res = np.zeros((8, 8), np.int64)
            if mb.cbp_chroma:
                dc = chroma_dc_dequant(mb.chroma_dc[pl].reshape(2, 2), qpc,
                                       int(ws[0, 0]))
                for blk in range(4):
                    x2, y2 = blk % 2, blk // 2
                    c = inverse_scan_4x4(mb.chroma_ac[pl, blk])
                    d = dequant4x4(c, qpc, ws, dc_passthrough=True)
                    d[0, 0] = dc[y2, x2]
                    res[4 * y2:4 * y2 + 4, 4 * x2:4 * x2 + 4] = idct4x4(d)
            plane[y0:y0 + 8, x0:x0 + 8] = _clip_u8(pred + res)

    # -- driver ---------------------------------------------------------------

    def recon_mb(self, mb: MBRecord) -> None:
        if not mb.is_intra:
            self._recon_inter(mb)
            return
        if mb.category == MB_IPCM:
            x0, y0 = mb.mb_x * 16, mb.mb_y * 16
            s = mb.pcm_samples
            self.y[y0:y0 + 16, x0:x0 + 16] = s[:256].reshape(16, 16)
            cx, cy = mb.mb_x * 8, mb.mb_y * 8
            self.cb[cy:cy + 8, cx:cx + 8] = s[256:320].reshape(8, 8)
            self.cr[cy:cy + 8, cx:cx + 8] = s[320:384].reshape(8, 8)
            return
        if mb.category == MB_I16x16:
            self._recon_i16x16(mb)
        elif mb.transform_8x8:
            self._recon_i8x8(mb)
        else:
            self._recon_i4x4(mb)
        self._recon_chroma(mb)

    def run(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        for addr, mb in enumerate(self.pic.mbs):
            if mb is None:
                raise ValueError(f"missing MB {addr}")
            self.recon_mb(mb)
        return self.y, self.cb, self.cr


def _dc_raster(dc16: np.ndarray) -> np.ndarray:
    """Luma DC levels arrive in 4x4 zig-zag scan order -> raster (8.5.6)."""
    return inverse_scan_4x4(dc16)
