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


def test_select_inter_mode_cpp_matches_numpy():
    """The C++ MC-variant selector must reproduce the numpy oracle
    exactly (mode, slot list, patch list) across the whole decision
    lattice: all-intra, clean P, envelope violations, slot pressure,
    per-band candidate-cap overflow, and patch-capacity overflow."""
    from arrow_h264_tpu.host import centropy
    from arrow_h264_tpu.models.pipeline import (
        CAP, DX_MAX, DX_MIN, DY_MAX, DY_MIN, MAX_SLOTS,
        select_inter_mode_np,
    )
    from arrow_h264_tpu.ops.abi import patch_capacity

    try:
        centropy.load_lib()
    except Exception:
        pytest.skip("C++ entropy lib unavailable")

    mb_w, mb_h = 11, 5
    n = mb_w * mb_h
    rng = np.random.default_rng(42)
    cases = []
    # all-intra
    cases.append((np.zeros(n, np.int32), np.zeros((n, 4, 4, 2, 2), np.int32),
                  np.full((n, 4, 4, 2), -1, np.int32)))
    for trial in range(30):
        kind = rng.integers(0, 6, n).astype(np.int32)
        # coherent base MVs (a handful of distinct values, like real
        # streams) so the clean trials stay under the band cap
        pool = rng.integers(-40, 40, (6, 2))
        mv = pool[rng.integers(0, 6, (n, 4, 4, 2))].astype(np.int32)
        refslot = rng.integers(-1, 3, (n, 4, 4, 2)).astype(np.int32)
        if trial % 5 == 1:     # envelope violations on a few cells -> "p"
            wild = rng.random((n, 4, 4)) < 0.02
            mv = np.where(wild[..., None, None],
                          rng.integers(-500, 500, mv.shape), mv)
        if trial % 5 == 2:     # slot pressure: more than MAX_SLOTS slots
            refslot = rng.integers(-1, MAX_SLOTS + 4, refslot.shape)
        if trial % 5 == 3:     # band cap overflow: many distinct MVs
            mv = rng.integers(-120, 120, mv.shape)
        if trial % 5 == 4:     # patch overflow -> gather
            mv = rng.integers(-4000, 4000, mv.shape)
        cases.append((kind.astype(np.int32), mv.astype(np.int32),
                      refslot.astype(np.int32)))
    saw = set()
    for kind, mv, refslot in cases:
        abi = {"kind": kind, "mv": mv, "refslot": refslot}
        m_np, sl_np, p_np = select_inter_mode_np(abi, mb_w, mb_h)
        m_c, sl_c, p_c = centropy.select_inter_mode_cpp(
            kind, mv, refslot, mb_w, mb_h,
            max_slots=MAX_SLOTS, cap=CAP, dx_min=DX_MIN, dx_max=DX_MAX,
            dy_min=DY_MIN, dy_max=DY_MAX,
            patch_cap=patch_capacity(mb_w, mb_h))
        assert m_c == m_np
        assert np.array_equal(sl_c, sl_np), m_np
        assert np.array_equal(p_c, p_np), m_np
        saw.add(m_np)
    assert "none" in saw and "gather" in saw, saw
    assert any(m.endswith("p") for m in saw), saw
