"""POC derivation (spec 8.2.1) unit tests: type 0 MSB wrap (both
directions), type 1 cyclic offsets, type 2 frame_num-based — the wrap
and type-1 paths are unreachable with x264-encodable content."""

from arrow_h264_tpu.bitstream.params import SPS
from arrow_h264_tpu.bitstream.slicehdr import SliceHeader
from arrow_h264_tpu.dpb import DPB


def _hdr(frame_num=0, lsb=0, *, idr=False, ref=True, delta=(0, 0)):
    h = SliceHeader(frame_num=frame_num, pic_order_cnt_lsb=lsb,
                    delta_pic_order_cnt=delta)
    h.is_idr = idr
    h.nal_ref_idc = 3 if ref else 0
    return h


def test_poc_type0_msb_wrap_forward():
    # log2_max_pic_order_cnt_lsb=4 -> max_lsb=16
    d = DPB(SPS(pic_order_cnt_type=0, log2_max_pic_order_cnt_lsb=4))
    assert d.compute_poc(_hdr(0, 0, idr=True)) == 0
    assert d.compute_poc(_hdr(1, 6)) == 6
    assert d.compute_poc(_hdr(2, 12)) == 12
    # lsb wraps 12 -> 2 (backward gap >= 8): MSB += 16 -> POC 18
    assert d.compute_poc(_hdr(3, 2)) == 18
    # and keeps counting in the new window
    assert d.compute_poc(_hdr(4, 6)) == 22


def test_poc_type0_msb_wrap_backward():
    d = DPB(SPS(pic_order_cnt_type=0, log2_max_pic_order_cnt_lsb=4))
    d.compute_poc(_hdr(0, 0, idr=True))
    d.compute_poc(_hdr(1, 2))        # prev_lsb = 2
    # a B picture BEFORE the wrap point: lsb 14, 14 - 2 > 8 -> MSB -= 16
    assert d.compute_poc(_hdr(1, 14, ref=False)) == -2


def test_poc_type0_nonref_does_not_update_state():
    d = DPB(SPS(pic_order_cnt_type=0, log2_max_pic_order_cnt_lsb=4))
    d.compute_poc(_hdr(0, 0, idr=True))
    d.compute_poc(_hdr(1, 6))
    assert d.compute_poc(_hdr(1, 15, ref=False)) == -1   # backward wrap
    # ...but a non-ref must NOT move prev_lsb/msb (spec 8.2.1.1)
    assert d.prev_poc_lsb == 6 and d.prev_poc_msb == 0


def test_poc_type2():
    sps = SPS(pic_order_cnt_type=2, log2_max_frame_num=4)
    d = DPB(sps)
    assert d.compute_poc(_hdr(0, idr=True)) == 0
    assert d.compute_poc(_hdr(1)) == 2
    assert d.compute_poc(_hdr(2)) == 4
    # non-ref: 2 * frame_num - 1
    assert d.compute_poc(_hdr(3, ref=False)) == 5
    # frame_num wrap at max_frame_num=16
    for fn in range(3, 16):
        d.compute_poc(_hdr(fn))
    assert d.compute_poc(_hdr(0)) == 2 * 16
    assert d.compute_poc(_hdr(1)) == 2 * 17


def test_poc_type1_cycle():
    # expectedDeltaPerPicOrderCntCycle = 4 + 6 = 10, 2 ref frames/cycle
    sps = SPS(pic_order_cnt_type=1, log2_max_frame_num=4,
              offset_for_ref_frame=[4, 6], offset_for_non_ref_pic=-1,
              delta_pic_order_always_zero_flag=1)
    d = DPB(sps)
    assert d.compute_poc(_hdr(0, idr=True)) == 0
    assert d.compute_poc(_hdr(1)) == 4           # cycle 0, idx 0
    assert d.compute_poc(_hdr(2)) == 10          # cycle 0, idx 1 (4+6)
    assert d.compute_poc(_hdr(3)) == 14          # cycle 1, idx 0 (10+4)
    # non-ref between refs: abs_frame_num-1, + offset_for_non_ref_pic
    assert d.compute_poc(_hdr(4, ref=False)) == 14 - 1
    assert d.compute_poc(_hdr(4)) == 20          # cycle 1, idx 1


def test_poc_type1_delta():
    sps = SPS(pic_order_cnt_type=1, log2_max_frame_num=4,
              offset_for_ref_frame=[2])
    d = DPB(sps)
    d.compute_poc(_hdr(0, idr=True))
    assert d.compute_poc(_hdr(1, delta=(3, 0))) == 2 + 3
