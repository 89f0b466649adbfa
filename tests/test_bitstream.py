"""Bit I/O, NAL framing, and parameter-set tests (spec Annex B, 7.3, 9.1)."""

import numpy as np
import pytest

from arrow_h264_tpu.bitstream.bits import BitReader, BitWriter
from arrow_h264_tpu.bitstream import nal
from arrow_h264_tpu.bitstream.params import (
    parse_sps, parse_pps, write_sps, write_pps, SPS, PPS,
    DEFAULT_4x4_INTRA, DEFAULT_8x8_INTRA,
)
from arrow_h264_tpu.bitstream.slicehdr import parse_slice_header
from tools import streams


def test_expgolomb_roundtrip():
    rng = np.random.default_rng(1)
    vals_ue = list(rng.integers(0, 100000, 200)) + [0, 1, 2, 254, 255, 256]
    vals_se = list(rng.integers(-5000, 5000, 200)) + [0, 1, -1, 127, -128]
    w = BitWriter()
    for v in vals_ue:
        w.ue(int(v))
    for v in vals_se:
        w.se(int(v))
    w.u(0b1011, 4)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in vals_ue:
        assert r.ue() == int(v)
    for v in vals_se:
        assert r.se() == int(v)
    assert r.u(4) == 0b1011


def test_ue_known_codes():
    # spec 9.1 Table 9-2: 0->1, 1->010, 2->011, 3->00100 ...
    w = BitWriter()
    for v in (0, 1, 2, 3, 4, 5, 6, 7, 8):
        w.ue(v)
    w.rbsp_trailing_bits()
    bits = "".join(f"{b:08b}" for b in w.get_bytes())
    expect = "1" "010" "011" "00100" "00101" "00110" "00111" "0001000" "0001001"
    assert bits.startswith(expect)


def test_more_rbsp_data():
    w = BitWriter()
    w.ue(5)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.ue()
    assert not r.more_rbsp_data()


def test_epb_roundtrip():
    cases = [
        b"\x00\x00\x00\x00\x01\x02\x03",
        b"\x00\x00\x01",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x00\x00\x00",
        bytes(range(256)) + b"\x00\x00\x00\x00",
        b"",
        b"\x00\x00",
    ]
    for rbsp in cases:
        ebsp = nal.rbsp_to_ebsp(rbsp)
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert nal.ebsp_to_rbsp(ebsp) == rbsp


def test_nal_roundtrip():
    # NB: a legal RBSP never ends in 0x00 (rbsp_trailing_bits stop bit), so
    # Annex-B trailing-zero stripping is unambiguous.
    payloads = [b"\x01\x02\x00\x00\x00\x05", b"\xff" * 10, b"\x00\x00\x01\x80"]
    stream = b"".join(
        nal.write_nal(3, 5, p, long_start_code=(i % 2 == 0))
        for i, p in enumerate(payloads)
    )
    units = list(nal.parse_annexb(stream))
    assert [u.rbsp for u in units] == payloads
    assert all(u.nal_unit_type == 5 and u.nal_ref_idc == 3 for u in units)


def test_sps_pps_roundtrip():
    s = SPS(profile_idc=100, level_idc=40, log2_max_frame_num=6,
            pic_order_cnt_type=0, log2_max_pic_order_cnt_lsb=8,
            max_num_ref_frames=4, pic_width_in_mbs=80, pic_height_in_map_units=45,
            seq_scaling_matrix_present_flag=1,
            seq_scaling_list_present=[1, 0, 0, 1, 0, 0, 1, 0])
    s.scaling_lists_4x4[0] = list(DEFAULT_4x4_INTRA)
    s.scaling_lists_4x4[3] = [16 + (i % 5) for i in range(16)]
    s.scaling_lists_8x8[0] = list(DEFAULT_8x8_INTRA)
    rbsp = write_sps(s)
    s2 = parse_sps(rbsp)
    assert s2.profile_idc == 100 and s2.pic_width_in_mbs == 80
    assert s2.scaling_lists_4x4[0] == DEFAULT_4x4_INTRA
    assert s2.scaling_lists_4x4[1] == DEFAULT_4x4_INTRA  # fallback copy of prev
    assert s2.scaling_lists_4x4[3] == s.scaling_lists_4x4[3]
    assert s2.scaling_lists_4x4[4] == s.scaling_lists_4x4[3]
    assert s2.scaling_lists_8x8[0] == DEFAULT_8x8_INTRA
    assert s2.max_num_ref_frames == 4

    p = PPS(entropy_coding_mode_flag=1, pic_init_qp=28, chroma_qp_index_offset=-2,
            deblocking_filter_control_present_flag=1, transform_8x8_mode_flag=1,
            second_chroma_qp_index_offset=3)
    rbsp = write_pps(p, high_tail=True)
    p2 = parse_pps(rbsp, {0: s2})
    assert p2.entropy_coding_mode_flag == 1
    assert p2.pic_init_qp == 28
    assert p2.chroma_qp_index_offset == -2
    assert p2.transform_8x8_mode_flag == 1
    assert p2.second_chroma_qp_index_offset == 3


@pytest.mark.parametrize("config", [1, 3, 4])
def test_parse_real_x264_headers(h264ref, config, tmp_path):
    """Parse SPS/PPS/slice headers from a real libx264 stream."""
    w, h = 176, 144
    yuv = streams.make_content(w, h, 3, seed=config)
    path = str(tmp_path / f"c{config}.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[config])
    data = open(path, "rb").read()

    sps_map, pps_map = {}, {}
    n_slices = 0
    for u in nal.parse_annexb(data):
        if u.nal_unit_type == nal.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps_map[s.seq_parameter_set_id] = s
            assert s.pic_width_in_mbs == w // 16
            assert s.pic_height_in_map_units == h // 16
            assert s.frame_mbs_only_flag == 1
            if config == 1:
                assert s.profile_idc == 66
            if config == 4:
                assert s.profile_idc == 100
        elif u.nal_unit_type == nal.NAL_PPS:
            p = parse_pps(u.rbsp, sps_map)
            pps_map[p.pic_parameter_set_id] = p
            assert p.entropy_coding_mode_flag == (0 if config == 1 else 1)
            if config == 4:
                assert p.transform_8x8_mode_flag == 1
        elif u.is_slice:
            pps = pps_map[0]
            sps = sps_map[pps.seq_parameter_set_id]
            r = BitReader(u.rbsp)
            hdr = parse_slice_header(r, sps, pps, u.nal_unit_type, u.nal_ref_idc)
            n_slices += 1
            if config == 1:
                assert hdr.is_i and hdr.is_idr
    assert n_slices == 3
    assert sps_map and pps_map
