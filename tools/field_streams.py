"""Hand-authored PAFF (all-field) conformance streams.

x264 cannot encode PAFF field pictures (its --interlaced mode is MBAFF
only) and the container has no JM conformance set (zero egress), so the
field-decoding path (SURVEY.md §2 picture/slice driver "field/frame
handling" row; spec 7.4.3 field_pic_flag, 8.2.1 field POC, 8.2.4.2.5
field reference lists, Tables 8-13/8-14 field scans) is exercised with
hand-authored Main-profile streams: each frame is coded as a top field
picture + a bottom field picture.  Unlike FMO, libavcodec DOES decode
PAFF, so `tools.streams.golden_decode` is a true independent oracle for
every stream authored here — including the CAVLC residual ones that pin
the field scan order.
"""

from __future__ import annotations

import numpy as np

from arrow_h264_tpu.bitstream.bits import BitWriter
from arrow_h264_tpu.bitstream.nal import rbsp_to_ebsp
from arrow_h264_tpu.bitstream.params import PPS, SPS, write_pps, write_sps
from arrow_h264_tpu.bitstream.slicehdr import SliceHeader, write_slice_header

from tools.fmo_streams import _nal, _pcm_mb, _write_pcm_samples


def field_sps(mb_w: int, map_units: int, **kw) -> SPS:
    """Main-profile interlaced SPS: frame height = 2 * map_units MBs;
    each coded field is mb_w x map_units MBs."""
    return SPS(profile_idc=77, level_idc=30, pic_width_in_mbs=mb_w,
               pic_height_in_map_units=map_units, max_num_ref_frames=2,
               frame_mbs_only_flag=0, mb_adaptive_frame_field_flag=0,
               log2_max_frame_num=4, log2_max_pic_order_cnt_lsb=4, **kw)


def _field_hdr(frame: int, parity: int, slice_type: int, sps: SPS,
               idr: bool) -> SliceHeader:
    hdr = SliceHeader(
        first_mb_in_slice=0, slice_type=slice_type,
        frame_num=frame % (1 << sps.log2_max_frame_num),
        idr_pic_id=0,
        # top field POC lsb 2f, bottom 2f+1 (display order top-first)
        pic_order_cnt_lsb=(2 * frame + (parity - 1)) %
            (1 << sps.log2_max_pic_order_cnt_lsb),
        slice_qp_delta=0)
    hdr.field_pic_flag = 1
    hdr.bottom_field_flag = parity - 1
    hdr.is_idr = idr
    hdr.nal_ref_idc = 3
    return hdr


def make_field_pcm_stream(mb_w: int = 6, map_units: int = 4,
                          n_frames: int = 3) -> bytes:
    """All-I_PCM PAFF stream: per frame, a top field picture then a
    bottom field picture (IDR first field only).  Exercises field
    picture framing, field POC, pairing, and woven output."""
    sps = field_sps(mb_w, map_units)
    pps = PPS()
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * map_units
    for f in range(n_frames):
        for parity in (1, 2):
            idr = f == 0 and parity == 1
            w = BitWriter()
            hdr = _field_hdr(f, parity, 2, sps, idr)
            write_slice_header(w, hdr, sps, pps)
            for addr in range(n):
                w.ue(25)         # mb_type I_PCM
                _write_pcm_samples(
                    w, *_pcm_mb(addr, 2 * f + (parity - 1), mb_w))
            w.rbsp_trailing_bits()
            out.append(_nal(5 if idr else 1, 3, w.get_bytes()))
    return b"".join(out)


def field_pcm_golden(mb_w: int = 6, map_units: int = 4,
                     n_frames: int = 3) -> list[np.ndarray]:
    """Constructed golden for make_field_pcm_stream: PCM carries pixels
    verbatim and PCM MBs deblock with QPY=0 (every edge filter off), so
    the woven output frame IS the authored content row-interleaved."""
    out = []
    for f in range(n_frames):
        y = np.zeros((map_units * 32, mb_w * 16), np.uint8)
        cb = np.zeros((map_units * 16, mb_w * 8), np.uint8)
        cr = np.zeros_like(cb)
        for parity in (1, 2):
            yf = np.zeros((map_units * 16, mb_w * 16), np.uint8)
            cbf = np.zeros((map_units * 8, mb_w * 8), np.uint8)
            crf = np.zeros_like(cbf)
            for addr in range(mb_w * map_units):
                my, mx = divmod(addr, mb_w)
                ym, cbm, crm = _pcm_mb(addr, 2 * f + (parity - 1), mb_w)
                yf[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = ym
                cbf[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = cbm
                crf[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = crm
            y[parity - 1::2] = yf
            cb[parity - 1::2] = cbf
            cr[parity - 1::2] = crf
        out.append(np.concatenate([y.ravel(), cb.ravel(), cr.ravel()]))
    return out


def _i16_plan(addr: int, fidx: int, dense: bool) -> tuple:
    """Deterministic I16 residual plan (DC + optional AC) per MB."""
    rng = np.random.default_rng(31000 + 211 * fidx + addr)
    dc = np.zeros(16, np.int64)
    k = int(rng.integers(1, 5))
    pos = np.sort(rng.choice(16, k, replace=False))
    dc[pos] = rng.integers(1, 4, k) * rng.choice([-1, 1], k)
    if not dense or addr % 4 == 3:
        return dc, None
    ac = np.zeros((16, 15), np.int64)
    for b in range(16):
        kb = int(rng.integers(0, 6))
        if kb:
            p = np.sort(rng.choice(15, kb, replace=False))
            ac[b][p] = rng.integers(1, 3, kb) * rng.choice([-1, 1], kb)
    return dc, ac


def make_field_cavlc_stream(mb_w: int = 6, map_units: int = 4,
                            n_frames: int = 2) -> bytes:
    """I16 CAVLC PAFF stream with DC+AC residuals: the residual levels
    travel through the FIELD inverse scan (Table 8-13 field column), so
    a wrong field scan breaks byte-equality against libavcodec."""
    from tools.fmo_streams import _CavlcPicState, _ZBLK
    from arrow_h264_tpu.entropy.cavlc import encode_residual_block
    sps = field_sps(mb_w, map_units)
    pps = PPS()
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * map_units
    for f in range(n_frames):
        for parity in (1, 2):
            idr = f == 0 and parity == 1
            fidx = 2 * f + (parity - 1)
            w = BitWriter()
            hdr = _field_hdr(f, parity, 2, sps, idr)
            write_slice_header(w, hdr, sps, pps)
            st = _CavlcPicState(mb_w, map_units, np.zeros(n, np.int32))
            for addr in range(n):
                my, mx = divmod(addr, mb_w)
                by0, bx0 = my * 4, mx * 4
                dc, ac = _i16_plan(addr, fidx, dense=True)
                icode = 3 if ac is None else 15   # DC pred, cbpC 0, cbpY
                w.ue(icode)
                w.ue(0)                           # chroma pred DC
                w.se(0)                           # mb_qp_delta
                encode_residual_block(w, st.nc(addr, by0, bx0), list(dc), 16)
                if ac is not None:
                    for b, (dy, dx) in enumerate(_ZBLK):
                        tc, _ = encode_residual_block(
                            w, st.nc(addr, by0 + dy, bx0 + dx),
                            list(ac[b]), 15)
                        st.nz[by0 + dy, bx0 + dx] = tc
            w.rbsp_trailing_bits()
            out.append(_nal(5 if idr else 1, 3, w.get_bytes()))
    return b"".join(out)


def make_field_b_stream(mb_w: int = 6, map_units: int = 4) -> bytes:
    """PAFF stream with B fields (spec 8.2.4.2.4 + 8.2.4.2.5 field B
    lists): decode order = I pair (display 0), P pair (display 2), B
    pair (display 1, non-reference).  Each B field's list0 holds past
    fields and list1 future fields through the parity-alternating field
    list construction; MBs mix B_L0/B_L1/B_Bi_16x16 with explicit refs
    and small MVDs (no direct modes, no residual), so a wrong field B
    list, PicNum, or bipred average breaks byte-equality against the
    libavcodec golden."""
    sps = field_sps(mb_w, map_units)
    pps = PPS()
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * map_units

    def emit(disp: int, fn: int, parity: int, stype: int, idr: bool,
             ref: bool) -> None:
        w = BitWriter()
        hdr = _field_hdr(fn, parity, stype, sps, idr)
        hdr.pic_order_cnt_lsb = (2 * disp + (parity - 1)) % \
            (1 << sps.log2_max_pic_order_cnt_lsb)
        hdr.frame_num = fn % (1 << sps.log2_max_frame_num)
        hdr.nal_ref_idc = 3 if ref else 0
        if stype in (0, 1):
            hdr.num_ref_idx_active_override_flag = 1
            hdr.num_ref_idx_l0_active = 2
            if stype == 1:
                hdr.num_ref_idx_l1_active = 2
        write_slice_header(w, hdr, sps, pps)
        rng = np.random.default_rng(5600 + 4 * disp + parity)
        if stype == 2:
            for addr in range(n):
                w.ue(25)
                _write_pcm_samples(w, *_pcm_mb(addr, 2 * disp + parity - 1,
                                               mb_w))
        elif stype == 0:
            for addr in range(n):
                w.ue(0)                       # mb_skip_run
                w.ue(0)                       # P_L0_16x16
                w.te(int(rng.integers(0, 2)), 1)
                w.se(int(rng.integers(-6, 7)))
                w.se(int(rng.integers(-6, 7)))
                w.ue(0)                       # cbp 0
        else:                                 # B slice
            for addr in range(n):
                w.ue(0)                       # mb_skip_run
                bt = int(rng.integers(1, 4))  # B_L0/B_L1/B_Bi_16x16
                w.ue(bt)
                if bt in (1, 3):
                    w.te(int(rng.integers(0, 2)), 1)   # ref_idx_l0
                if bt in (2, 3):
                    w.te(int(rng.integers(0, 2)), 1)   # ref_idx_l1
                for _ in range(2 if bt == 3 else 1):
                    w.se(int(rng.integers(-6, 7)))     # mvd x
                    w.se(int(rng.integers(-6, 7)))     # mvd y
                w.ue(0)                       # cbp 0
        w.rbsp_trailing_bits()
        out.append(_nal(5 if idr else 1, hdr.nal_ref_idc, w.get_bytes()))

    for parity in (1, 2):                     # I pair, display 0
        emit(0, 0, parity, 2, idr=parity == 1, ref=True)
    for parity in (1, 2):                     # P pair, display 2
        emit(2, 1, parity, 0, idr=False, ref=True)
    for parity in (1, 2):                     # B pair, display 1, non-ref
        emit(1, 2, parity, 1, idr=False, ref=False)
    return b"".join(out)


def make_field_p_stream(mb_w: int = 6, map_units: int = 4,
                        n_frames: int = 3) -> bytes:
    """PAFF stream with P fields: frame 0 is an I field pair (PCM), the
    rest are P field pairs of P_L0_16x16 MBs with small MVDs (no
    residual).  Each P field's list0[0] is the opposite-parity field of
    the previous coded field (8.2.4.2.5 alternation starts with the
    SAME parity as current, so list0[0] is the same-parity field of the
    newest reference frame; the MC path must still get the cross-parity
    chroma offset right for refs further down the list — covered by
    using refidx 0 only, same-parity, plus the sibling at refidx 1)."""
    sps = field_sps(mb_w, map_units)
    pps = PPS()
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * map_units
    for f in range(n_frames):
        for parity in (1, 2):
            idr = f == 0 and parity == 1
            fidx = 2 * f + (parity - 1)
            w = BitWriter()
            stype = 2 if f == 0 else 0
            hdr = _field_hdr(f, parity, stype, sps, idr)
            if stype == 0:
                hdr.num_ref_idx_active_override_flag = 1
                hdr.num_ref_idx_l0_active = 2
            write_slice_header(w, hdr, sps, pps)
            rng = np.random.default_rng(4200 + fidx)
            if stype == 2:
                for addr in range(n):
                    w.ue(25)
                    _write_pcm_samples(w, *_pcm_mb(addr, fidx, mb_w))
            else:
                for addr in range(n):
                    w.ue(0)                       # mb_skip_run
                    w.ue(0)                       # P_L0_16x16
                    ref2 = int(rng.integers(0, 2))
                    w.te(ref2, 1)                 # ref_idx_l0 (0 or 1)
                    w.se(int(rng.integers(-6, 7)))   # mvd x
                    w.se(int(rng.integers(-6, 7)))   # mvd y
                    w.ue(0)                       # cbp 0
            w.rbsp_trailing_bits()
            out.append(_nal(5 if idr else 1, 3, w.get_bytes()))
    return b"".join(out)


# One global integer-pel MV per P field of the gap stream (pixels, even
# so chroma shifts stay integer): the constructed golden is a plain
# clamped shift of the PCM reference field.
_GAP_MV = {1: (2, -2), 2: (-2, 2)}


def make_field_gap_stream(mb_w: int = 6, map_units: int = 4) -> bytes:
    """PAFF stream with a frame_num GAP (spec 8.2.5.2 in field coding):
    I field pair at frame_num 0, then a P field pair at frame_num 2 with
    gaps_in_frame_num_value_allowed_flag=1 — the decoder must synthesize
    a non-existing reference frame (entering the field lists as a
    complementary non-existing field pair) for frame_num 1, shifting the
    field list indices of the REAL fields: each P field codes ref_idx 2,
    which lands on its same-parity I field ONLY if the gap pair was
    inserted (top list0 = [gap_t, gap_b, I_t, I_b]).  libavcodec does
    not synthesize gap refs in field mode ("Missing reference
    picture"), so — like FMO — the golden is constructed: one global
    even-integer-pel MV per P field, no residual, deblocking off, makes
    the expected output a clamped shift of the authored PCM content
    (field_gap_golden)."""
    sps = field_sps(mb_w, map_units,
                    gaps_in_frame_num_value_allowed_flag=1)
    sps.max_num_ref_frames = 3          # I pair + gap pair + current
    pps = PPS()
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * map_units
    for parity in (1, 2):               # I pair, frame_num 0, display 0
        w = BitWriter()
        hdr = _field_hdr(0, parity, 2, sps, idr=parity == 1)
        write_slice_header(w, hdr, sps, pps)
        for addr in range(n):
            w.ue(25)
            _write_pcm_samples(w, *_pcm_mb(addr, parity - 1, mb_w))
        w.rbsp_trailing_bits()
        out.append(_nal(5 if parity == 1 else 1, 3, w.get_bytes()))
    # P pair at frame_num 2 (frame_num 1 skipped), all MBs P_L0_16x16
    # ref_idx 2 with one shared MV: first MB codes the full MVD (pred is
    # (0,0) with no neighbors), every later MB codes MVD 0 (the median
    # of same-ref neighbors is the shared MV itself).
    for parity in (1, 2):
        w = BitWriter()
        hdr = _field_hdr(2, parity, 0, sps, idr=False)
        hdr.pic_order_cnt_lsb = (4 + (parity - 1)) % \
            (1 << sps.log2_max_pic_order_cnt_lsb)
        hdr.num_ref_idx_active_override_flag = 1
        hdr.num_ref_idx_l0_active = 4
        hdr.disable_deblocking_filter_idc = 1
        write_slice_header(w, hdr, sps, pps)
        mvx, mvy = _GAP_MV[parity]
        for addr in range(n):
            w.ue(0)                       # mb_skip_run
            w.ue(0)                       # P_L0_16x16
            w.te(2, 3)                    # ref_idx_l0 = 2 (real field)
            w.se(4 * mvx if addr == 0 else 0)   # mvd x (quarter-pel)
            w.se(4 * mvy if addr == 0 else 0)   # mvd y
            w.ue(0)                       # cbp 0
        w.rbsp_trailing_bits()
        out.append(_nal(1, 3, w.get_bytes()))
    return b"".join(out)


def field_gap_golden(mb_w: int = 6, map_units: int = 4) -> list[np.ndarray]:
    """Constructed golden for make_field_gap_stream: frame 0 is the
    woven PCM pair; frame 1 is each field's same-parity PCM reference
    shifted by its global integer MV with spec edge clamping (no
    residual, deblocking off)."""
    H, W = map_units * 16, mb_w * 16

    def field_planes(parity):
        y = np.zeros((H, W), np.uint8)
        cb = np.zeros((H // 2, W // 2), np.uint8)
        cr = np.zeros_like(cb)
        for addr in range(mb_w * map_units):
            my, mx = divmod(addr, mb_w)
            ym, cbm, crm = _pcm_mb(addr, parity - 1, mb_w)
            y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = ym
            cb[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = cbm
            cr[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = crm
        return y, cb, cr

    def shifted(plane, mvx, mvy):
        h, w = plane.shape
        ys = np.clip(np.arange(h) + mvy, 0, h - 1)
        xs = np.clip(np.arange(w) + mvx, 0, w - 1)
        return plane[ys[:, None], xs[None, :]]

    def weave(tp, bp):
        t_y, t_cb, t_cr = tp
        b_y, b_cb, b_cr = bp
        y = np.zeros((2 * H, W), np.uint8)
        cb = np.zeros((H, W // 2), np.uint8)
        cr = np.zeros_like(cb)
        y[0::2], y[1::2] = t_y, b_y
        cb[0::2], cb[1::2] = t_cb, b_cb
        cr[0::2], cr[1::2] = t_cr, b_cr
        return np.concatenate([y.ravel(), cb.ravel(), cr.ravel()])

    i_t, i_b = field_planes(1), field_planes(2)
    out = [weave(i_t, i_b)]
    p_fields = []
    for parity, ref in ((1, i_t), (2, i_b)):
        mvx, mvy = _GAP_MV[parity]
        p_fields.append((shifted(ref[0], mvx, mvy),
                         shifted(ref[1], mvx // 2, mvy // 2),
                         shifted(ref[2], mvx // 2, mvy // 2)))
    out.append(weave(*p_fields))
    return out
