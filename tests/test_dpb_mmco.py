"""DPB memory-management control operations 1-6 (spec 8.2.5.4; SURVEY.md
§2 DPB row).  x264 never emits MMCO (it uses sliding-window marking), so
the ops are driven directly with synthetic slice headers."""

import numpy as np

from arrow_h264_tpu.bitstream.params import SPS
from arrow_h264_tpu.bitstream.slicehdr import MMCO, SliceHeader
from arrow_h264_tpu.dpb import DPB


def _hdr(frame_num, *, idr=False, ref=True, mmcos=(), lt_flag=0):
    h = SliceHeader(frame_num=frame_num)
    h.is_idr = idr
    h.nal_ref_idc = 3 if ref else 0
    h.adaptive_ref_pic_marking_mode_flag = 1 if mmcos else 0
    h.mmcos = list(mmcos)
    h.long_term_reference_flag = lt_flag
    h.pic_order_cnt_lsb = (2 * frame_num) % 16
    return h


def _dpb(max_refs=4):
    sps = SPS(max_num_ref_frames=max_refs, level_idc=40)
    return DPB(sps)


def _store(d, fn, **kw):
    h = _hdr(fn, **kw)
    poc = d.compute_poc(h)
    return d.store(f"pic{fn}", h, poc)


def _short_fns(d):
    return sorted(p.frame_num for p in d.pics if p.is_ref and not p.long_term)


def _long_idx(d):
    return sorted(p.lt_idx for p in d.pics if p.is_ref and p.long_term)


def test_mmco1_unmark_short_term():
    d = _dpb()
    _store(d, 0, idr=True)
    _store(d, 1)
    _store(d, 2)
    # difference_of_pic_nums_minus1 = 1 -> picNum = 3 - 2 = 1 unmarked
    _store(d, 3, mmcos=[MMCO(1, 1)])
    assert _short_fns(d) == [0, 2, 3]


def test_mmco3_and_2_long_term():
    d = _dpb()
    _store(d, 0, idr=True)
    _store(d, 1)
    # mark picNum 0 (2 - (1+1)) long-term index 0
    _store(d, 2, mmcos=[MMCO(3, 1, 0)])
    assert _long_idx(d) == [0]
    assert _short_fns(d) == [1, 2]
    # MMCO 2: unmark long-term index 0
    _store(d, 3, mmcos=[MMCO(2, 0)])
    assert _long_idx(d) == []
    assert _short_fns(d) == [1, 2, 3]


def test_mmco4_max_long_term_idx():
    d = _dpb()
    _store(d, 0, idr=True)
    _store(d, 1)
    _store(d, 2, mmcos=[MMCO(3, 1, 0)])     # fn 0 -> lt 0
    _store(d, 3, mmcos=[MMCO(3, 1, 1)])     # fn 1 -> lt 1
    assert _long_idx(d) == [0, 1]
    # max_long_term_frame_idx_plus1 = 1 -> keep lt_idx <= 0
    _store(d, 4, mmcos=[MMCO(4, 1)])
    assert _long_idx(d) == [0]


def test_mmco5_reset():
    d = _dpb()
    _store(d, 0, idr=True)
    _store(d, 1)
    _store(d, 2)
    _store(d, 3, mmcos=[MMCO(5)])
    # everything unmarked; only the current picture remains a reference?
    # spec: MMCO5 unmarks ALL pictures (current stays stored unmarked
    # unless also marked by another op); our store appends cur after
    refs = [p for p in d.pics if p.is_ref]
    assert [p.frame_num for p in refs] == [3]
    assert d.mmco5_seen


def test_mmco6_current_long_term():
    d = _dpb()
    _store(d, 0, idr=True)
    _store(d, 1, mmcos=[MMCO(6, 2)])
    assert _long_idx(d) == [2]


def test_idr_long_term_flag():
    d = _dpb()
    _store(d, 0, idr=True, lt_flag=1)
    assert _long_idx(d) == [0]


def test_mmco1_with_frame_num_wrap():
    d = _dpb(max_refs=3)
    mfn = d.sps.max_frame_num        # 16 (log2=4)
    _store(d, 0, idr=True)
    for fn in range(1, mfn):         # fns 1..15 (sliding window keeps 3)
        _store(d, fn)
    _store(d, 0)                     # wrapped frame_num
    assert _short_fns(d) == [0, 14, 15]
    # CurrPicNum = 1; diff_minus1 = 1 -> PicNumX = -1 = fn 15's
    # FrameNumWrap (15 > 1 -> 15 - 16)
    _store(d, 1, mmcos=[MMCO(1, 1)])
    assert _short_fns(d) == [0, 1, 14]
