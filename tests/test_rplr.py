"""Reference-picture-list reordering (RPLR, spec 8.2.4.3) unit tests:
short-term picNum subtract/add chains (with the running-predictor
semantics) and long-term moves — x264 emits RPLR only rarely, so the op
semantics are pinned directly at the DPB level."""

from arrow_h264_tpu.bitstream.params import SPS
from arrow_h264_tpu.bitstream.slicehdr import (
    MMCO, RefPicListMod, SliceHeader,
)
from arrow_h264_tpu.dpb import DPB


def _hdr(frame_num, *, idr=False, mods=(), n_active=3, mmcos=()):
    h = SliceHeader(frame_num=frame_num, slice_type=0)   # P
    h.is_idr = idr
    h.nal_ref_idc = 3
    h.num_ref_idx_l0_active = n_active
    h.ref_pic_list_mods_l0 = list(mods)
    h.adaptive_ref_pic_marking_mode_flag = 1 if mmcos else 0
    h.mmcos = list(mmcos)
    h.pic_order_cnt_lsb = (2 * frame_num) % 16
    return h


def _fill(d, n):
    for fn in range(n):
        h = _hdr(fn, idr=(fn == 0))
        d.store(f"pic{fn}", h, d.compute_poc(h))


def test_rplr_default_order_is_picnum_desc():
    d = DPB(SPS(max_num_ref_frames=4))
    _fill(d, 4)
    l0 = d.init_list_p(_hdr(4))
    assert [p.frame_num for p in l0] == [3, 2, 1]   # num_active=3


def test_rplr_short_term_subtract():
    d = DPB(SPS(max_num_ref_frames=4))
    _fill(d, 4)
    # pred=4; idc=0 diff=3 -> picNum 1 moved to the front
    l0 = d.init_list_p(_hdr(4, mods=[RefPicListMod(0, 2)]))
    assert [p.frame_num for p in l0] == [1, 3, 2]


def test_rplr_chained_predictor():
    d = DPB(SPS(max_num_ref_frames=4))
    _fill(d, 4)
    # pred=4 -(2)-> 2 at idx0; pred=2 -(1)-> wait idc=1 ADDS: 2+1=3 at idx1
    mods = [RefPicListMod(0, 1), RefPicListMod(1, 0)]
    l0 = d.init_list_p(_hdr(4, mods=mods))
    assert [p.frame_num for p in l0] == [2, 3, 1]


def test_rplr_long_term():
    d = DPB(SPS(max_num_ref_frames=4))
    _fill(d, 3)
    # mark picNum 0 (3 - (2+1)) as long-term index 5
    h = _hdr(3, mmcos=[MMCO(3, 2, 5)])
    d.store("pic3", h, d.compute_poc(h))
    l0 = d.init_list_p(_hdr(4, mods=[RefPicListMod(2, 5)]))
    assert l0[0].long_term and l0[0].frame_num == 0
    assert [p.frame_num for p in l0[1:]] == [3, 2]
