"""Pallas-path conformance at non-QCIF widths (round-2 regression class).

The packed-plane Pallas kernels quantize widths into power-of-two lane
tiles (mc_kernel._round128); every width class is a distinct code shape,
and the round-2 720p corruption (commit 22f41c5) was exactly a width-
dependent bug QCIF could never catch.  These tests force the Pallas
kernels (interpret mode on CPU) at geometries covering three distinct
luma lane counts:

  176px  -> 128 lanes   (covered by test_device_pipeline at QCIF)
  512px  -> 256 lanes
  976px  -> 512 lanes

with P-frame MC + deblock + intra exercised against the libavcodec
golden.
"""

import os

import numpy as np
import pytest

from tools import streams


def _decode_pallas(path: str, monkeypatch) -> np.ndarray:
    monkeypatch.setenv("ARROW_H264_PALLAS", "1")
    from arrow_h264_tpu.api import Decoder
    dec = Decoder()
    frames = [np.frombuffer(f.planar(), np.uint8)
              for f in dec.decode_annexb(open(path, "rb").read())]
    return np.stack(frames)


@pytest.mark.parametrize("w,h", [(512, 80), (976, 64)])
def test_pallas_width_classes_p(h264ref, tmp_path, monkeypatch, w, h):
    yuv = streams.make_content(w, h, 3, seed=w)
    path = str(tmp_path / f"w{w}.264")
    opts = ["profile=baseline", "qp=28", "g=250", "bf=0", "refs=1",
            "keyint_min=250",
            f"x264-params=cabac=0:subme=6:{streams.X264_COMMON}"]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_pallas(path, monkeypatch)
    assert ours.shape == golden.shape
    for f in range(ours.shape[0]):
        assert np.array_equal(ours[f], golden[f]), \
            f"{w}x{h} frame {f}: {int((ours[f] != golden[f]).sum())} diffs"


def test_pallas_width_256_high_cabac(h264ref, tmp_path, monkeypatch):
    """256-lane geometry through the High/CABAC path (8x8 + B-frames)."""
    w, h = 512, 80
    yuv = streams.make_content(w, h, 4, seed=9)
    path = str(tmp_path / "w512high.264")
    opts = ["profile=high", "qp=28", "g=250", "bf=1", "refs=2",
            "keyint_min=250",
            "x264-params=cabac=1:8x8dct=1:weightb=1:b-pyramid=0:"
            + streams.X264_COMMON]
    streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    ours = _decode_pallas(path, monkeypatch)
    assert ours.shape == golden.shape
    for f in range(ours.shape[0]):
        assert np.array_equal(ours[f], golden[f]), \
            f"frame {f}: {int((ours[f] != golden[f]).sum())} diffs"
