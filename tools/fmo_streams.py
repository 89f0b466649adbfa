"""Hand-authored FMO / ASO conformance streams (test infrastructure).

x264 cannot encode FMO, and the container has no JM conformance set
(zero egress), so the FMO decode path (SURVEY.md §2 "FMO / ASO" row;
spec 8.2.2) is exercised with bit-exact hand-authored Baseline CAVLC
streams: one I_PCM picture per frame, one slice per slice group, each
slice walking its group's MBs in NextMbAddress order.  I_PCM carries
the pixels verbatim, so the authored content is fully deterministic
while still exercising the FMO-specific machinery end to end: PPS
slice-group syntax, per-slice map derivation (incl. the changing types'
slice_group_change_cycle), decode-order MB iteration, picture
assembly across interleaved slices, ASO, and deblocking with per-MB
slice ids.  The golden oracle is the system libavcodec
(tools.streams.golden_decode), same as every other conformance test.
"""

from __future__ import annotations

import numpy as np

from arrow_h264_tpu.bitstream.bits import BitWriter
from arrow_h264_tpu.bitstream.fmo import mb_slice_group_map
from arrow_h264_tpu.bitstream.nal import rbsp_to_ebsp
from arrow_h264_tpu.bitstream.params import PPS, SPS, write_pps, write_sps
from arrow_h264_tpu.bitstream.slicehdr import SliceHeader, write_slice_header


def _nal(nal_unit_type: int, nal_ref_idc: int, rbsp: bytes) -> bytes:
    hdr = bytes([(nal_ref_idc << 5) | nal_unit_type])
    return b"\x00\x00\x00\x01" + hdr + rbsp_to_ebsp(rbsp)


def _pcm_mb(addr: int, frame: int, mb_w: int) -> tuple[np.ndarray, ...]:
    """Deterministic PCM samples for one MB (y [16,16], cb/cr [8,8])."""
    rng = np.random.default_rng(1000 * frame + addr)
    y = rng.integers(16, 236, (16, 16)).astype(np.uint8)
    cb = rng.integers(16, 240, (8, 8)).astype(np.uint8)
    cr = rng.integers(16, 240, (8, 8)).astype(np.uint8)
    return y, cb, cr


def _write_pcm_samples(w: BitWriter, y, cb, cr) -> None:
    while not w.byte_aligned():          # pcm_alignment_zero_bit
        w.put_bit(0)
    for arr in (y, cb, cr):
        for v in arr.ravel():
            w.u(int(v), 8)


def make_fmo_stream(pps_kwargs: dict, n_frames: int = 2,
                    mb_w: int = 11, mb_h: int = 9,
                    slice_order=None, change_cycle: int = 0) -> bytes:
    """Authored Annex-B stream: IDR + n_frames-1 more I pictures, all
    I_PCM, one slice per slice group.  slice_order permutes the slices
    within each picture (ASO); change_cycle feeds map types 3..5."""
    sps = SPS(profile_idc=66, level_idc=20, pic_width_in_mbs=mb_w,
              pic_height_in_map_units=mb_h, max_num_ref_frames=1)
    pps = PPS(**pps_kwargs)
    out = [_nal(7, 3, write_sps(sps)), _nal(8, 3, write_pps(pps))]
    n = mb_w * mb_h
    sgmap = mb_slice_group_map(sps, pps, change_cycle)
    groups = sorted(set(sgmap.tolist()))
    order = slice_order if slice_order is not None else groups
    for f in range(n_frames):
        for g in order:
            members = np.flatnonzero(sgmap == g)
            if not len(members):
                continue
            w = BitWriter()
            hdr = SliceHeader(
                first_mb_in_slice=int(members[0]), slice_type=7 % 5,
                frame_num=0 if f == 0 else f % (1 << sps.log2_max_frame_num),
                idr_pic_id=0, pic_order_cnt_lsb=(2 * f) %
                    (1 << sps.log2_max_pic_order_cnt_lsb),
                slice_qp_delta=0)
            hdr.is_idr = f == 0
            hdr.nal_ref_idc = 3
            hdr.slice_group_change_cycle = change_cycle
            # IDR slice_type signalled as 7 (I, all-slices-same flavor)
            hdr.slice_type = 2
            write_slice_header(w, hdr, sps, pps)
            for addr in members:
                w.ue(25)                 # mb_type I_PCM
                _write_pcm_samples(w, *_pcm_mb(int(addr), f, mb_w))
            w.rbsp_trailing_bits()
            out.append(_nal(5 if f == 0 else 1, 3, w.get_bytes()))
    return b"".join(out)


def pcm_golden(pps_kwargs: dict, n_frames: int = 2,
               mb_w: int = 11, mb_h: int = 9,
               change_cycle: int = 0) -> list[np.ndarray]:
    """Spec-exact decode of make_fmo_stream's output, constructed
    directly: I_PCM carries pixels verbatim and PCM MBs deblock with
    QPY = 0 where alpha(0) = beta(0) = 0 disables every edge filter
    (spec 8.7.2), so the decoded picture IS the authored PCM content.
    (libavcodec cannot decode FMO, so this constructed golden stands in
    for golden_decode; the map formulas are unit-pinned separately.)"""
    out = []
    for f in range(n_frames):
        y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        cb = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        cr = np.zeros_like(cb)
        for addr in range(mb_w * mb_h):
            my, mx = divmod(addr, mb_w)
            ym, cbm, crm = _pcm_mb(addr, f, mb_w)
            y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = ym
            cb[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = cbm
            cr[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = crm
        out.append(np.concatenate([y.ravel(), cb.ravel(), cr.ravel()]))
    return out


# (pps_kwargs, change_cycle) per FMO scenario; QCIF-class 11x9 geometry
SCENARIOS = {
    "interleave_t0": (dict(num_slice_groups=2, slice_group_map_type=0,
                           run_length=[3, 5]), 0),
    "dispersed_t1": (dict(num_slice_groups=3, slice_group_map_type=1), 0),
    "fg_bg_t2": (dict(num_slice_groups=2, slice_group_map_type=2,
                      top_left=[13], bottom_right=[41]), 0),
    "boxout_t3": (dict(num_slice_groups=2, slice_group_map_type=3,
                       slice_group_change_direction_flag=0,
                       slice_group_change_rate=7), 4),
    "raster_t4": (dict(num_slice_groups=2, slice_group_map_type=4,
                       slice_group_change_direction_flag=1,
                       slice_group_change_rate=11), 3),
    "wipe_t5": (dict(num_slice_groups=2, slice_group_map_type=5,
                     slice_group_change_direction_flag=0,
                     slice_group_change_rate=9), 5),
    "explicit_t6": (dict(num_slice_groups=2, slice_group_map_type=6,
                         slice_group_id=[i % 2 for i in range(99)]), 0),
}
