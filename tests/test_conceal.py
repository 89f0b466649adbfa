"""Lost-slice error concealment (SURVEY.md §2 erc_*.c row)."""

import numpy as np
import pytest

from tools import streams
from arrow_h264_tpu.api import Decoder
from arrow_h264_tpu.bitstream import nal


def _drop_one_slice(data: bytes, drop_idx: int) -> bytes:
    """Remove the drop_idx'th slice NAL from an Annex-B stream."""
    out = bytearray()
    k = 0
    for unit, raw in _iter_units(data):
        if unit.is_slice:
            if k == drop_idx:
                k += 1
                continue
            k += 1
        out += raw
    return bytes(out)


def _iter_units(data: bytes):
    """(NALUnit, raw bytes incl. start code) pairs."""
    starts = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j)
        i = j + 3
    units = list(nal.parse_annexb(data))
    assert len(units) == len(starts)
    for k, u in enumerate(units):
        end = starts[k + 1] if k + 1 < len(units) else len(data)
        beg = starts[k]
        if beg >= 1 and data[beg - 1] == 0:
            beg -= 1
        yield u, data[beg:end]


@pytest.mark.parametrize("entropy", ["python", "cpp"])
def test_lost_slice_concealed(h264ref, tmp_path, entropy):
    w, h = 64, 64
    yuv = streams.make_content(w, h, 3, seed=11)
    path = str(tmp_path / "c.264")
    # two slices per picture so one can be lost
    opts = ["profile=high", "qp=26", "g=8", "bf=0", "refs=1",
            "x264-params=cabac=1:slices=2:threads=1"]
    streams.encode(yuv, w, h, path, opts)
    data = open(path, "rb").read()
    golden, gw, gh = streams.golden_decode(path)
    # drop the second slice of frame 1 (slice index 3: f0 has 2 slices)
    cut = _drop_one_slice(data, 3)

    dec = Decoder(entropy=entropy, conceal=True)
    frames = list(dec.decode_annexb(cut))
    assert len(frames) == 3, "concealment must preserve frame count"
    assert dec.concealed and dec.concealed[0][1] > 0
    # frame 0 (undamaged) still bit-exact
    assert np.frombuffer(frames[0].planar(), np.uint8).tobytes() == \
        np.asarray(golden[0]).tobytes()
    # damaged frame: undamaged (first-slice) rows still match golden
    ysz = gw * gh
    g1 = np.asarray(golden[1])[:ysz].reshape(gh, gw)
    o1 = np.frombuffer(frames[1].planar(), np.uint8)[:ysz].reshape(gh, gw)
    assert np.array_equal(o1[:16], g1[:16]), "parsed region changed"
    # concealed region == co-located pixels of the reference frame
    ref = np.frombuffer(frames[0].planar(), np.uint8)[:ysz].reshape(gh, gw)
    assert np.array_equal(o1[48:], ref[48:]), "frame-copy concealment"


def test_no_conceal_still_raises(h264ref, tmp_path):
    w, h = 64, 64
    yuv = streams.make_content(w, h, 2, seed=12)
    path = str(tmp_path / "c2.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[2])
    data = open(path, "rb").read()
    bad = data[:len(data) - 40] + b"\x55" * 8
    with pytest.raises(Exception):
        list(Decoder(conceal=False).decode_annexb(bad))


def test_motion_copy_concealment_unit():
    """conceal_abi copies the co-located motion field into repaired MBs
    (JM erc motion extrapolation) when the nearest ref provides one."""
    from arrow_h264_tpu.conceal import conceal_abi
    from arrow_h264_tpu.ops.abi import KIND_P, empty_frame_abi
    mb_w, mb_h = 4, 3
    abi = empty_frame_abi(mb_w, mb_h)
    covered = np.ones((mb_h, mb_w), bool)
    covered[1, :] = False                       # middle MB row lost
    col = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)
    col[..., 0] = 8                             # uniform pan +2px
    col[..., 1] = -4
    n = conceal_abi(abi, covered, ref_slot=1, col_mv=col)
    assert n == mb_w
    lost = np.arange(mb_w, 2 * mb_w)
    assert (abi["kind"][lost] == KIND_P).all()
    assert (abi["mv"][lost, :, :, 0, 0] == 8).all()
    assert (abi["mv"][lost, :, :, 0, 1] == -4).all()
    assert (abi["refslot"][lost, :, :, 0] == 1).all()
    # parsed MBs untouched
    kept = np.arange(0, mb_w)
    assert (abi["mv"][kept] == 0).all()
