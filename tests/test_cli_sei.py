"""CLI driver + SEI parser coverage (SURVEY.md §2 Config/CLI, SEI, output)."""

import numpy as np

from arrow_h264_tpu.__main__ import main
from arrow_h264_tpu.api import Decoder
from arrow_h264_tpu.bitstream import nal
from arrow_h264_tpu.bitstream.sei import (SEI_RECOVERY_POINT, SEIMessage,
                                          parse_sei_rbsp, write_sei_rbsp)
from tools import streams


def test_sei_roundtrip_and_fields():
    msgs = [
        SEIMessage(SEI_RECOVERY_POINT, bytes([0b10110000])),  # ue(0)=1bit...
        SEIMessage(300, b"\x01\x02\x03" * 100),               # long type+size
    ]
    # recovery point: recovery_frame_cnt=ue -> craft via bit writer instead
    from arrow_h264_tpu.bitstream.bits import BitWriter
    w = BitWriter()
    w.ue(3)      # recovery_frame_cnt
    w.u(1, 1)    # exact_match_flag
    w.u(0, 1)    # broken_link_flag
    w.u(2, 2)    # changing_slice_group_idc
    w.u(0, (8 - w.bitpos % 8) % 8)  # pad to byte
    msgs[0] = SEIMessage(SEI_RECOVERY_POINT, w.get_bytes())
    rt = parse_sei_rbsp(write_sei_rbsp(msgs))
    assert [m.payload_type for m in rt] == [SEI_RECOVERY_POINT, 300]
    assert rt[0].fields["recovery_frame_cnt"] == 3
    assert rt[0].fields["exact_match_flag"] == 1
    assert rt[1].payload == msgs[1].payload


def test_decoder_collects_x264_sei(h264ref, tmp_path):
    w, h = 176, 144
    yuv = streams.make_content(w, h, 1, seed=3)
    path = str(tmp_path / "sei.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[1])
    data = open(path, "rb").read()
    assert any(u.nal_unit_type == nal.NAL_SEI for u in nal.parse_annexb(data))
    dec = Decoder(entropy="python")
    list(dec.decode_annexb(data))
    assert dec.sei_messages, "x264 userdata SEI should be collected"


def test_cli_decode_matches_golden(h264ref, tmp_path):
    w, h = 176, 144
    yuv = streams.make_content(w, h, 3, seed=9)
    path = str(tmp_path / "cli.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[2])
    golden, gw, gh = streams.golden_decode(path)
    ref = str(tmp_path / "golden.yuv")
    open(ref, "wb").write(golden.tobytes())
    out = str(tmp_path / "out.yuv")
    assert main(["decode", path, out, "--ref", ref,
                 "--entropy", "python"]) == 0
    assert open(out, "rb").read() == golden.tobytes()
    assert main(["info", path]) == 0


def test_decode_trace_jsonl(h264ref, tmp_path):
    """JSONL decode trace (JM TRACE analog, SURVEY.md §5)."""
    import json
    from tools import streams
    from arrow_h264_tpu.api import Decoder

    w, h = 64, 64
    yuv = streams.make_content(w, h, 2, seed=9)
    path = str(tmp_path / "t.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[2])
    tpath = tmp_path / "trace.jsonl"
    dec = Decoder(trace=str(tpath))
    list(dec.decode_annexb(open(path, "rb").read()))
    recs = [json.loads(l) for l in open(tpath)]
    slices = [r for r in recs if r["t"] == "slice"]
    mbs = [r for r in recs if r["t"] == "mb"]
    assert len(slices) >= 2
    assert len(mbs) == 2 * (w // 16) * (h // 16)
    assert all("kind" in r and "qp" in r for r in mbs)
    # P-frame MBs carry motion info
    assert any("mv" in r for r in mbs if r["frame"] == 1)


def test_trace_se(h264ref, tmp_path):
    """SE-level trace: every entropy read logged with bit position; two
    runs produce identical decode sequences (the JM TRACE use case)."""
    from arrow_h264_tpu.api import Decoder
    w, h = 176, 144
    yuv = streams.make_content(w, h, 2, seed=5)
    path = str(tmp_path / "t.264")
    opts = ["profile=main", "qp=30", "g=250", "bf=0", "refs=1",
            f"x264-params=cabac=1:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    data = open(path, "rb").read()
    logs = []
    for run in range(2):
        p = tmp_path / f"se{run}.txt"
        dec = Decoder(trace_se=str(p))
        assert dec.entropy == "cpp"   # tracing works on the shipped engine
        n = sum(1 for _ in dec.decode_annexb(data))
        assert n == 2
        logs.append(p.read_text())
    assert logs[0] == logs[1]
    lines = logs[0].splitlines()
    assert len(lines) > 1000                       # every SE, not a summary
    # CABAC decisions carry context indices; bit positions are monotonic
    # within a slice
    kinds = {ln.split()[3] for ln in lines}
    assert "cab" in kinds and "ue" in kinds
    prev_key, prev_pos = None, -1
    for ln in lines:
        _, fr, sl, kind, pos, nbits, val = ln.split()
        key = (fr, sl)
        if key != prev_key:
            prev_key, prev_pos = key, -1
        assert int(pos) >= prev_pos, ln
        prev_pos = int(pos)


def test_sei_new_payload_parsers():
    """Round-trip the r5 payload parsers (pan-scan, film grain, frame
    packing, display orientation) through hand-written payloads."""
    from arrow_h264_tpu.bitstream.bits import BitWriter
    from arrow_h264_tpu.bitstream.sei import (
        SEI_DISPLAY_ORIENTATION, SEI_FILM_GRAIN, SEI_FRAME_PACKING,
        SEI_PAN_SCAN_RECT, parse_sei_rbsp, write_sei_rbsp,
    )

    def _aligned(w):
        while w.bitpos % 8:
            w.u(0, 1)
        return w.get_bytes()

    w = BitWriter()                      # pan_scan_rect, D.2.4
    w.ue(3); w.u(0, 1); w.ue(1)          # id 3, not cancelled, 2 rects
    for v in (4, -4, 8, -8, 2, -2, 6, -6):
        w.se(v)
    w.ue(5)
    pan = _aligned(w)

    w = BitWriter()                      # film_grain, D.2.21
    w.u(0, 1); w.u(1, 2); w.u(0, 1)      # no sep colour desc
    w.u(0, 2); w.u(4, 4)                 # blending 0, log2 scale 4
    w.u(1, 1); w.u(0, 1); w.u(0, 1)      # luma comp only
    w.u(0, 8); w.u(1 - 1, 3)             # 1 interval, 1 model value
    w.u(10, 8); w.u(250, 8); w.se(7)
    w.ue(0)
    grain = _aligned(w)

    w = BitWriter()                      # frame_packing, D.2.25
    w.ue(1); w.u(0, 1); w.u(3, 7)        # side-by-side
    w.u(0, 1); w.u(1, 6)
    for _ in range(6):
        w.u(0, 1)
    for v in (0, 0, 0, 0):
        w.u(v, 4)
    w.u(0, 8); w.ue(0); w.u(0, 1)
    pack = _aligned(w)

    w = BitWriter()                      # display_orientation, D.2.27
    w.u(0, 1); w.u(0, 1); w.u(1, 1)      # cancel 0, hor 0, ver 1
    w.u(90 * 65536 // 360, 16); w.ue(0); w.u(0, 1)
    orient = _aligned(w)

    rbsp = write_sei_rbsp([
        SEIMessage(SEI_PAN_SCAN_RECT, pan),
        SEIMessage(SEI_FILM_GRAIN, grain),
        SEIMessage(SEI_FRAME_PACKING, pack),
        SEIMessage(SEI_DISPLAY_ORIENTATION, orient),
    ])
    msgs = parse_sei_rbsp(rbsp)
    assert [m.payload_type for m in msgs] == [2, 19, 45, 47]
    ps, fg, fp, do = (m.fields for m in msgs)
    assert ps["pan_scan_rect_id"] == 3
    assert len(ps["rects"]) == 2
    assert ps["rects"][1] == {"left_offset": 2, "right_offset": -2,
                              "top_offset": 6, "bottom_offset": -6}
    assert ps["pan_scan_rect_repetition_period"] == 5
    assert fg["model_id"] == 1 and fg["log2_scale_factor"] == 4
    assert fg["comp_model_present_flag"] == [1, 0, 0]
    assert fg["comp_models"][0][0]["comp_model_values"] == [7]
    assert fg["comp_models"][0][0]["intensity_interval_upper_bound"] == 250
    assert fp["arrangement_type"] == 3
    assert do["ver_flip"] == 1 and do["hor_flip"] == 0
    assert do["anticlockwise_rotation"] == 90 * 65536 // 360


def test_sei_new_parsers_malformed_safe():
    """Truncated payloads of the new types keep raw bytes, no raise."""
    from arrow_h264_tpu.bitstream.sei import parse_sei_rbsp, write_sei_rbsp
    for t in (2, 19, 45, 47):
        rbsp = write_sei_rbsp([SEIMessage(t, b"\xff")])
        msgs = parse_sei_rbsp(rbsp)
        assert msgs[0].payload_type == t
        assert msgs[0].payload == b"\xff"
