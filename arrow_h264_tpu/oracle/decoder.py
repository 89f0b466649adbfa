"""Oracle decoder driver: Annex-B stream -> YUV frames (numpy path).

Reference parity: JM-lineage `ldecod.c` / `image.c` decode loop
(SURVEY.md §3.2 call stack; reference mount empty — spec 8.2 order).

This is the bring-up + unit-test oracle (SURVEY.md §7 step 1).  The TPU
pipeline shares the same host entropy layer (mb.parse) and must match this
decoder bit-exactly.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import nal
from ..bitstream.bits import BitReader
from ..bitstream.params import PPS, SPS, parse_pps, parse_sps
from ..bitstream.slicehdr import parse_slice_header
from ..mb.parse import PictureParse
from ..mb.types import MB_IPCM
from .deblock import DeblockMeta, deblock_frame
from .reconstruct import Reconstructor


def build_deblock_meta(pic: PictureParse) -> DeblockMeta:
    mb_h, mb_w = pic.mb_h, pic.mb_w
    is_intra = np.zeros((mb_h, mb_w), bool)
    tr8 = np.zeros((mb_h, mb_w), bool)
    qp = np.zeros((mb_h, mb_w), np.int32)
    nz = np.zeros((mb_h, mb_w, 4, 4), bool)
    mv = np.zeros((mb_h, mb_w, 4, 4, 2, 2), np.int32)
    refid = np.full((mb_h, mb_w, 4, 4, 2), -1, np.int32)
    slice_id = np.zeros((mb_h, mb_w), np.int32)
    disable = np.zeros((mb_h, mb_w), np.int32)
    a_off = np.zeros((mb_h, mb_w), np.int32)
    b_off = np.zeros((mb_h, mb_w), np.int32)
    for mb in pic.mbs:
        my, mx = mb.mb_y, mb.mb_x
        is_intra[my, mx] = mb.is_intra
        tr8[my, mx] = mb.transform_8x8
        qp[my, mx] = 0 if mb.category == MB_IPCM else mb.qp
        blk_nz = mb.tc_luma > 0
        if mb.transform_8x8:
            # bS=2 test uses 8x8 coded status when transform_size_8x8 (8.7.2.1)
            for y8 in range(2):
                for x8 in range(2):
                    q = blk_nz[2 * y8:2 * y8 + 2, 2 * x8:2 * x8 + 2].any()
                    blk_nz[2 * y8:2 * y8 + 2, 2 * x8:2 * x8 + 2] = q
        nz[my, mx] = blk_nz
        if mb.mvs is not None:
            mv[my, mx] = np.moveaxis(mb.mvs, 0, 2)  # [y4,x4,list,2]
        if mb.refidx is not None:
            refid[my, mx] = np.moveaxis(mb.refidx, 0, 2)
        slice_id[my, mx] = mb.slice_id
        hdr = pic.headers[mb.slice_id]
        disable[my, mx] = hdr.disable_deblocking_filter_idc
        a_off[my, mx] = 2 * hdr.slice_alpha_c0_offset_div2
        b_off[my, mx] = 2 * hdr.slice_beta_offset_div2
    return DeblockMeta(
        is_intra=is_intra, tr8=tr8, qp=qp, nz=nz, mv=mv, refid=refid,
        slice_id=slice_id, disable_idc=disable, alpha_off=a_off, beta_off=b_off,
        chroma_qp_off=(pic.pps.chroma_qp_index_offset,
                       pic.pps.chroma_qp_offset(1)),
    )


def crop_planes(sps: SPS, y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    if not sps.frame_cropping_flag:
        return y, cb, cr
    # 4:2:0 frame: CropUnitX = 2, CropUnitY = 2 (spec 7.4.2.1.1)
    l, r_, t, b = (2 * sps.crop_left, 2 * sps.crop_right,
                   2 * sps.crop_top, 2 * sps.crop_bottom)
    h, w = y.shape
    y = y[t:h - b, l:w - r_]
    cb = cb[t // 2:(h - b) // 2, l // 2:(w - r_) // 2]
    cr = cr[t // 2:(h - b) // 2, l // 2:(w - r_) // 2]
    return y, cb, cr


class OracleDecoder:
    """Minimal decode driver: currently I-only CAVLC pictures (config 1)."""

    def __init__(self) -> None:
        self.sps_map: dict[int, SPS] = {}
        self.pps_map: dict[int, PPS] = {}

    def decode_annexb(self, data: bytes):
        """Yield (y, cb, cr) uint8 planes in output order."""
        cur_pic: PictureParse | None = None
        for u in nal.parse_annexb(data):
            if u.nal_unit_type == nal.NAL_SPS:
                s = parse_sps(u.rbsp)
                self.sps_map[s.seq_parameter_set_id] = s
            elif u.nal_unit_type == nal.NAL_PPS:
                p = parse_pps(u.rbsp, self.sps_map)
                self.pps_map[p.pic_parameter_set_id] = p
            elif u.is_slice:
                r = BitReader(u.rbsp)
                # peek pps id: first_mb ue, slice_type ue, pps ue
                first_mb = r.ue()
                r.pos = 0
                # need pps to parse header fully; pre-scan pps id
                r2 = BitReader(u.rbsp)
                r2.ue()
                r2.ue()
                pps = self.pps_map[r2.ue()]
                sps = self.sps_map[pps.seq_parameter_set_id]
                hdr = parse_slice_header(r, sps, pps, u.nal_unit_type,
                                         u.nal_ref_idc)
                if hdr.first_mb_in_slice == 0:
                    if cur_pic is not None:
                        yield self._finish_picture(cur_pic)
                    cur_pic = PictureParse(sps, pps)
                if cur_pic is None:
                    raise ValueError("slice without picture start")
                cur_pic.parse_slice(r, hdr)
        if cur_pic is not None:
            yield self._finish_picture(cur_pic)

    def _finish_picture(self, pic: PictureParse):
        y, cb, cr = Reconstructor(pic).run()
        y = y.astype(np.uint8)
        cb = cb.astype(np.uint8)
        cr = cr.astype(np.uint8)
        meta = build_deblock_meta(pic)
        deblock_frame(y, cb, cr, meta)
        return crop_planes(pic.sps, y, cb, cr)
