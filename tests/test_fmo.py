"""FMO / ASO conformance (SURVEY.md §2 "FMO / ASO" row, spec 8.2.2).

The system libavcodec does NOT implement FMO ("FMO is not implemented"),
so the usual golden-decode oracle is unavailable.  The streams are
therefore all-I_PCM: PCM carries pixels verbatim and PCM macroblocks
deblock with QPY = 0 (spec 8.7.2), where alpha(0) = beta(0) = 0 disables
every edge filter — the spec-exact output IS the authored PCM content
assembled at each MB's address.  That golden verifies the whole FMO
machinery end to end (PPS syntax, per-slice map derivation,
NextMbAddress iteration, out-of-order assembly): a decoder that walked
raster order would place MBs at the wrong addresses.  The map formulas
themselves are additionally pinned by hand-computed unit cases below so
the authored golden cannot share a map bug with the decoder."""

import numpy as np
import pytest

from arrow_h264_tpu.bitstream.fmo import mb_slice_group_map
from arrow_h264_tpu.bitstream.params import PPS, SPS
from tools.fmo_streams import SCENARIOS, make_fmo_stream, pcm_golden


def _ours(data: bytes):
    from arrow_h264_tpu.api import Decoder
    dec = Decoder()
    out = []
    for f in dec.decode_annexb(data):
        out.append(np.concatenate([f.y.ravel(), f.cb.ravel(),
                                   f.cr.ravel()]))
    return out


@pytest.mark.parametrize("scenario", sorted(SCENARIOS))
def test_fmo_map_types_bit_exact(scenario):
    pps_kwargs, cycle = SCENARIOS[scenario]
    data = make_fmo_stream(pps_kwargs, n_frames=2, change_cycle=cycle)
    golden = pcm_golden(pps_kwargs, n_frames=2, change_cycle=cycle)
    got = _ours(data)
    assert len(got) == len(golden), (len(got), len(golden))
    for j, ours in enumerate(got):
        assert np.array_equal(ours, golden[j]), (scenario, j)


def test_fmo_rides_cpp_engine(monkeypatch):
    """FMO pictures must parse on the shipped C++ engine (the slice
    loop follows SliceParams.next_mb), not silently fall back to the
    Python path: instantiating the Python PictureParse here is a
    routing regression."""
    import arrow_h264_tpu.api as api_mod
    from arrow_h264_tpu.api import Decoder

    def boom(*a, **k):
        raise AssertionError("FMO fell back to the Python parser")

    monkeypatch.setattr(api_mod, "PictureParse", boom)
    pps_kwargs, cycle = SCENARIOS["dispersed_t1"]
    data = make_fmo_stream(pps_kwargs, n_frames=2, change_cycle=cycle)
    golden = pcm_golden(pps_kwargs, n_frames=2, change_cycle=cycle)
    dec = Decoder(entropy="cpp")
    got = [np.concatenate([f.y.ravel(), f.cb.ravel(), f.cr.ravel()])
           for f in dec.decode_annexb(data)]
    assert len(got) == len(golden)
    for j, ours in enumerate(got):
        assert np.array_equal(ours, golden[j]), j


def test_aso_slice_order_bit_exact():
    """ASO: the slices of each picture arrive in reverse group order
    (the MB-0 slice mid-picture), exercising the header-change picture
    boundary detector."""
    pps_kwargs, _ = SCENARIOS["dispersed_t1"]
    data = make_fmo_stream(pps_kwargs, n_frames=2, slice_order=[2, 1, 0])
    golden = pcm_golden(pps_kwargs, n_frames=2)
    got = _ours(data)
    assert len(got) == len(golden)
    for j, ours in enumerate(got):
        assert np.array_equal(ours, golden[j]), j


def test_change_cycle_bits_ceiling_division():
    """spec 7.4.3: slice_group_change_cycle is read with
    Ceil(Log2(Ceil(PicSizeInMapUnits / SliceGroupChangeRate) + 1)) bits
    — the inner division is a CEILING.  Floor division under-reads for
    ~1/3 of geometries (e.g. 20 units, rate 6: 2 bits vs 3)."""
    import math
    from arrow_h264_tpu.bitstream.slicehdr import change_cycle_bits
    for n_units in (1, 2, 6, 20, 99, 396, 8160):
        for rate in (1, 2, 3, 6, 7, 11, 40):
            sps = SPS(pic_width_in_mbs=n_units, pic_height_in_map_units=1)
            pps = PPS(num_slice_groups=2, slice_group_map_type=3,
                      slice_group_change_rate=rate)
            want = max(1, math.ceil(math.log2(math.ceil(n_units / rate) + 1)))
            assert change_cycle_bits(sps, pps) == want, (n_units, rate)


def test_fmo_nondivisible_change_rate_bit_exact():
    """End-to-end FMO at a geometry where Ceil != Floor in the
    slice_group_change_cycle width (20 map units, rate 6 -> 3 bits;
    the old floor formula read 2 and corrupted all slice data)."""
    pps_kwargs = dict(num_slice_groups=2, slice_group_map_type=5,
                      slice_group_change_direction_flag=0,
                      slice_group_change_rate=6)
    data = make_fmo_stream(pps_kwargs, n_frames=2, mb_w=5, mb_h=4,
                           change_cycle=4)      # needs the 3rd bit
    golden = pcm_golden(pps_kwargs, n_frames=2, mb_w=5, mb_h=4,
                        change_cycle=4)
    got = _ours(data)
    assert len(got) == len(golden)
    for j, ours in enumerate(got):
        assert np.array_equal(ours, golden[j]), j


# ---- map-formula pins (hand-computed from spec 8.2.2.1-8.2.2.7) ----------

def _map(mb_w, mb_h, cycle=0, **pps_kwargs):
    sps = SPS(pic_width_in_mbs=mb_w, pic_height_in_map_units=mb_h)
    return mb_slice_group_map(sps, PPS(**pps_kwargs), cycle).tolist()


def test_map_type0_interleave():
    assert _map(4, 2, num_slice_groups=2, slice_group_map_type=0,
                run_length=[2, 1]) == [0, 0, 1, 0, 0, 1, 0, 0]


def test_map_type1_dispersed():
    # map[i] = ((i % W) + (((i / W) * num) / 2)) % num ; W=4, num=2
    assert _map(4, 2, num_slice_groups=2, slice_group_map_type=1) == \
        [0, 1, 0, 1, 1, 0, 1, 0]


def test_map_type2_fg_bg():
    # rect top_left=5 (y=1,x=1), bottom_right=10 (y=2,x=2) in a 4x3 grid
    assert _map(4, 3, num_slice_groups=2, slice_group_map_type=2,
                top_left=[5], bottom_right=[10]) == \
        [1, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 1]


def test_map_type4_raster():
    # mu0 = min(cycle * rate, n) = 3; direction 0: first 3 units group 0
    assert _map(4, 2, cycle=1, num_slice_groups=2, slice_group_map_type=4,
                slice_group_change_direction_flag=0,
                slice_group_change_rate=3) == [0, 0, 0, 1, 1, 1, 1, 1]
    # direction 1: upper-left group size n - mu0 = 5, group ids swapped
    assert _map(4, 2, cycle=1, num_slice_groups=2, slice_group_map_type=4,
                slice_group_change_direction_flag=1,
                slice_group_change_rate=3) == [1, 1, 1, 1, 1, 0, 0, 0]


def test_map_type5_wipe():
    # column-major fill, direction 0, mu0 = 3 -> first 3 column-major
    # units (column 0 rows 0..1, column 1 row 0) are group 0
    assert _map(4, 2, cycle=1, num_slice_groups=2, slice_group_map_type=5,
                slice_group_change_direction_flag=0,
                slice_group_change_rate=3) == [0, 0, 1, 1, 0, 1, 1, 1]


def test_map_type6_explicit():
    assert _map(4, 2, num_slice_groups=3, slice_group_map_type=6,
                slice_group_id=[2, 1, 0, 1, 2, 0, 0, 1]) == \
        [2, 1, 0, 1, 2, 0, 0, 1]


def test_map_type3_boxout_properties():
    # box-out is a spiral: group 0 is exactly mu0 units and CONTIGUOUS
    # growth around the center (spec 8.2.2.4); pin size + center seed
    m = np.asarray(_map(5, 5, cycle=2, num_slice_groups=2,
                        slice_group_map_type=3,
                        slice_group_change_direction_flag=0,
                        slice_group_change_rate=3))
    assert (m == 0).sum() == 6           # mu0 = min(2*3, 25)
    assert m[2 * 5 + 2] == 0             # center (x,y)=(2,2) seeds group 0


@pytest.mark.parametrize("map_kind", ["interleave", "explicit"])
def test_fmo_cavlc_residual_bit_exact(h264ref, tmp_path, map_kind):
    """FMO with REAL syntax (not PCM): I16 DC+AC CAVLC residuals, P
    slices with skip runs / mvd / intra-in-P, parsed through slice
    groups.  Oracle: the raster twin carries identical per-MB content
    with slices cut at group row boundaries (equal neighbor
    availability), and decodes through libavcodec — so the FMO stream's
    decode is pinned to an independent golden.  Covers map types 0 and
    6 with residual-bearing slice data (the all-PCM streams above carry
    no residual syntax)."""
    from tools.fmo_streams import make_fmo_cavlc_pair
    from tools import streams

    fmo, ras = make_fmo_cavlc_pair(map_kind, n_frames=3)
    p = tmp_path / f"fmo_{map_kind}_twin.264"
    p.write_bytes(ras)
    golden, gw, gh = streams.golden_decode(str(p))
    assert len(golden) == 3

    ours_ras = np.stack(_ours(ras))
    assert np.array_equal(ours_ras, golden), "raster twin mismatch"

    got = _ours(fmo)
    assert len(got) == len(golden)
    for j, ours in enumerate(got):
        assert np.array_equal(ours, golden[j]), (map_kind, j)
