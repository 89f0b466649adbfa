"""gaps_in_frame_num handling (spec 8.2.5.2; SURVEY.md §2 mbuffer.c row)."""

import numpy as np

from arrow_h264_tpu.bitstream.params import SPS
from arrow_h264_tpu.dpb import DPB


class _Hdr:
    def __init__(self, frame_num, is_idr=False, ref=1):
        self.frame_num = frame_num
        self.is_idr = is_idr
        self.nal_ref_idc = ref
        self.pic_order_cnt_lsb = 0
        self.delta_pic_order_cnt = (0, 0)
        self.no_output_of_prior_pics_flag = False
        self.long_term_reference_flag = False
        self.adaptive_ref_pic_marking_mode_flag = False
        self.mmcos = []
        self.ref_pic_list_mods_l0 = []
        self.ref_pic_list_mods_l1 = []
        self.num_ref_idx_l0_active = 4
        self.num_ref_idx_l1_active = 4


def _sps():
    s = SPS()
    s.log2_max_frame_num = 4
    s.pic_order_cnt_type = 2
    s.max_num_ref_frames = 4
    s.gaps_in_frame_num_value_allowed_flag = 1
    s.pic_width_in_mbs = 2
    s.pic_height_in_map_units = 2
    s.level_idc = 40
    return s


def test_gap_generates_non_existing_refs():
    dpb = DPB(_sps())
    h0 = _Hdr(0, is_idr=True)
    dpb.store("f0", h0, dpb.compute_poc(h0))
    # next reference arrives with frame_num 4: gap of 1,2,3
    h4 = _Hdr(4)
    gen, bumped = dpb.fill_frame_num_gaps(h4)
    assert bumped == []
    assert [p.frame_num for p in gen] == [1, 2, 3]
    assert all(p.non_existing and p.is_ref and not p.output_needed
               for p in gen)
    dpb.store("f4", h4, dpb.compute_poc(h4))
    # P-list ordering: most recent frame_num_wrap first
    lst = dpb.init_list_p(_Hdr(5))
    assert [p.frame_num for p in lst[:4]] == [4, 3, 2, 1]
    # sliding window evicted frame 0 (max_num_ref_frames=4)
    assert all(p.frame_num != 0 for p in lst)


def test_no_gap_no_generation():
    dpb = DPB(_sps())
    h0 = _Hdr(0, is_idr=True)
    dpb.store("f0", h0, dpb.compute_poc(h0))
    assert dpb.fill_frame_num_gaps(_Hdr(1)) == ([], [])
    # same frame_num (second field/non-ref repeat) -> no generation
    assert dpb.fill_frame_num_gaps(_Hdr(0)) == ([], [])


def test_gap_disabled_flag():
    sps = _sps()
    sps.gaps_in_frame_num_value_allowed_flag = 0
    dpb = DPB(sps)
    h0 = _Hdr(0, is_idr=True)
    dpb.store("f0", h0, dpb.compute_poc(h0))
    assert dpb.fill_frame_num_gaps(_Hdr(5)) == ([], [])


def test_gap_poc_type0_state_untouched():
    """Advisor r2: gap frames must not run the type-0 POC derivation
    (it would corrupt prev_poc_msb/lsb for following real pictures)."""
    sps = _sps()
    sps.pic_order_cnt_type = 0
    sps.log2_max_pic_order_cnt_lsb = 4
    dpb = DPB(sps)
    h0 = _Hdr(0, is_idr=True)
    h0.pic_order_cnt_lsb = 0
    dpb.store("f0", h0, dpb.compute_poc(h0))
    prev = (dpb.prev_poc_msb, dpb.prev_poc_lsb)
    gen, _ = dpb.fill_frame_num_gaps(_Hdr(3))
    assert len(gen) == 2
    assert (dpb.prev_poc_msb, dpb.prev_poc_lsb) == prev


def test_gap_overflow_returns_bumped_outputs():
    """Advisor r2: output-pending pictures bumped by gap insertion must be
    returned for emission, not dropped."""
    sps = _sps()
    sps.max_num_ref_frames = 2
    dpb = DPB(sps)
    dpb.max_dpb_frames = 2
    h0 = _Hdr(0, is_idr=True, ref=0)
    h0.nal_ref_idc = 1
    dpb.store("f0", h0, dpb.compute_poc(h0))
    # a non-ref output-pending picture fills the DPB
    h1 = _Hdr(1, ref=0)
    dpb.store("f1", h1, dpb.compute_poc(h1))
    pend = [p.planes for p in dpb.pics if p.output_needed]
    assert pend, "precondition: something is output-pending"
    gen, bumped = dpb.fill_frame_num_gaps(_Hdr(8))
    assert len(gen) == 7
    # every pre-existing output-pending payload was emitted, none dropped
    for p in pend:
        still = [q for q in dpb.pics if q.planes is p and q.output_needed]
        assert still == [] and p in bumped
