"""Golden-stream conformance tests for the numpy oracle decoder (SURVEY.md §4.1).

Streams are synthesized in-repo with libx264; golden YUV comes from the
system libavcodec h264 decoder (the JM stand-in).  The contract is bit-exact
equality.
"""

import numpy as np
import pytest

from arrow_h264_tpu.oracle.decoder import OracleDecoder
from tools import streams


def _decode_ours(path: str) -> np.ndarray:
    dec = OracleDecoder()
    frames = []
    for y, cb, cr in dec.decode_annexb(open(path, "rb").read()):
        frames.append(np.concatenate([y.ravel(), cb.ravel(), cr.ravel()]))
    return np.stack(frames)


def _compare(ours: np.ndarray, golden: np.ndarray, w: int, h: int):
    assert ours.shape == golden.shape, (ours.shape, golden.shape)
    if not np.array_equal(ours, golden):
        nfr = ours.shape[0]
        ysz = w * h
        for f in range(nfr):
            dy = (ours[f, :ysz] != golden[f, :ysz]).sum()
            dc = (ours[f, ysz:] != golden[f, ysz:]).sum()
            if dy or dc:
                yo = ours[f, :ysz].reshape(h, w).astype(int)
                yg = golden[f, :ysz].reshape(h, w).astype(int)
                pos = np.argwhere(yo != yg)
                detail = ""
                if len(pos):
                    py, px = pos[0]
                    detail = (f" first luma diff at ({px},{py}): "
                              f"{yo[py, px]} vs {yg[py, px]}")
                raise AssertionError(
                    f"frame {f}: {dy} luma / {dc} chroma mismatches;{detail}")


@pytest.mark.parametrize("qp", [10, 26, 38, 48])
def test_config1_i_only_qcif_cavlc(h264ref, tmp_path, qp):
    w, h = 176, 144
    yuv = streams.make_content(w, h, 3, seed=qp)
    path = str(tmp_path / f"c1_qp{qp}.264")
    opts = ["profile=baseline", f"qp={qp}", "g=1", "bf=0", "refs=1",
            f"x264-params=cabac=0:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    assert (gw, gh) == (w, h)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


@pytest.mark.parametrize("qp", [22, 30])
def test_config2_p_frames_cif_cavlc(h264ref, tmp_path, qp):
    """Config 2: Baseline P-frames, quarter-pel MC, single reference."""
    w, h = 352, 288
    yuv = streams.make_content(w, h, 6, seed=qp)
    path = str(tmp_path / f"c2_qp{qp}.264")
    opts = ["profile=baseline", f"qp={qp}", "g=250", "bf=0", "refs=1",
            "keyint_min=25",
            f"x264-params=cabac=0:subme=6:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    assert (gw, gh) == (w, h)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


def test_config2_multiref_and_slices(h264ref, tmp_path):
    """P-frames with 4 refs (te(v) ref_idx, sliding window) + 2 slices/frame."""
    w, h = 320, 240
    yuv = streams.make_content(w, h, 8, seed=5)
    path = str(tmp_path / "c2_mr.264")
    opts = ["profile=baseline", "qp=27", "g=250", "bf=0", "refs=4",
            "keyint_min=25",
            "x264-params=cabac=0:subme=7:slices=2:threads=1:scenecut=0:rc-lookahead=0"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


@pytest.mark.parametrize("direct", ["spatial", "temporal"])
def test_config3_b_frames_cavlc(h264ref, tmp_path, direct):
    """B-frames with CAVLC: direct modes, bi-pred, implicit weighting."""
    w, h = 320, 240
    yuv = streams.make_content(w, h, 9, seed=11)
    path = str(tmp_path / f"b_{direct}.264")
    opts = ["profile=main", "qp=26", "g=250", "bf=2", "refs=3",
            "keyint_min=25",
            f"x264-params=cabac=0:weightb=1:b-pyramid=0:direct={direct}:"
            f"subme=7:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


@pytest.mark.parametrize("direct", ["spatial", "temporal"])
def test_config3_cabac_bframes(h264ref, tmp_path, direct):
    """Config 3: CABAC + B-frames + multi-ref (CIF for oracle speed)."""
    w, h = 352, 288
    yuv = streams.make_content(w, h, 8, seed=13)
    path = str(tmp_path / f"c3_{direct}.264")
    opts = ["profile=main", "qp=27", "g=250", "bf=2", "refs=4", "keyint_min=25",
            f"x264-params=cabac=1:weightb=1:b-pyramid=0:direct={direct}:"
            f"subme=7:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


def test_config3_720p_smoke(h264ref, tmp_path):
    """Config 3 at full 720p (few frames; oracle is slow at this size)."""
    w, h = 1280, 720
    yuv = streams.make_content(w, h, 3, seed=1)
    path = str(tmp_path / "c3_720p.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[3])
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


def test_config4_high_profile(h264ref, tmp_path):
    """Config 4: High profile - 8x8 transform, weighted pred, CABAC."""
    w, h = 352, 288
    yuv = streams.make_content(w, h, 8, seed=17)
    path = str(tmp_path / "c4.264")
    opts = ["profile=high", "qp=26", "g=250", "bf=2", "refs=4", "keyint_min=25",
            "x264-params=cabac=1:8x8dct=1:weightp=2:weightb=1:b-pyramid=0:"
            f"{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)


def test_config4_custom_scaling_lists(h264ref, tmp_path):
    """Config 4 with custom quant matrices (cqm=jvt -> SPS scaling lists)."""
    w, h = 176, 144
    yuv = streams.make_content(w, h, 5, seed=19)
    path = str(tmp_path / "c4_cqm.264")
    opts = ["profile=high", "qp=28", "g=250", "bf=1", "refs=2", "keyint_min=25",
            "x264-params=cabac=1:8x8dct=1:cqm=jvt:b-pyramid=0:"
            f"{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_ours(path)
    _compare(ours, golden, w, h)
