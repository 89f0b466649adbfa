"""Differential tests: C++ entropy library vs the Python oracle parser.

The shipped host entropy is C++ (SURVEY.md §2); every ABI array it
produces must be bit-identical to ops.abi.pack_frame over the Python
parser on real streams covering every config.
"""

import numpy as np
import pytest

from arrow_h264_tpu.api import Decoder
from tools import streams


CONFIGS = {
    "c1_i_cavlc": (176, 144, ["profile=baseline", "qp=26", "g=1", "bf=0",
                              "refs=1",
                              f"x264-params=cabac=0:{streams.X264_COMMON}"]),
    "c2_p_cavlc": (176, 144, streams.CONFIG_OPTS[2]),
    "c3_b_cabac": (176, 144, streams.CONFIG_OPTS[3]),
    "c4_high": (176, 144, ["profile=high", "qp=26", "g=250", "bf=2", "refs=3",
                           "keyint_min=25",
                           "x264-params=cabac=1:8x8dct=1:weightp=2:weightb=1:"
                           f"b-pyramid=0:cqm=jvt:{streams.X264_COMMON}"]),
    "b_cavlc_temporal": (176, 144, ["profile=main", "qp=30", "g=250", "bf=2",
                                    "refs=4", "keyint_min=25",
                                    "x264-params=cabac=0:direct=temporal:"
                                    f"weightb=1:b-pyramid=0:{streams.X264_COMMON}"]),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_cpp_vs_python_decode(h264ref, tmp_path, name):
    w, h, opts = CONFIGS[name]
    yuv = streams.make_content(w, h, 6, seed=hash(name) % 1000)
    path = str(tmp_path / f"{name}.264")
    streams.encode(yuv, w, h, path, opts)
    data = open(path, "rb").read()
    golden, gw, gh = streams.golden_decode(path)

    out_cpp = np.stack([np.frombuffer(f.planar(), np.uint8)
                        for f in Decoder(entropy="cpp").decode_annexb(data)])
    out_py = np.stack([np.frombuffer(f.planar(), np.uint8)
                       for f in Decoder(entropy="python").decode_annexb(data)])
    assert np.array_equal(out_cpp, out_py), "cpp vs python decode mismatch"
    assert np.array_equal(out_cpp, golden), "cpp decode vs libavcodec mismatch"
