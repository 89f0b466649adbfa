"""Binding-shape lockstep decode (VERDICT r3 #5): a multi-GOP 720p
batch through the full wire path, where spec growth, bucket ladders and
the sharded store actually happen (the 64x64 lockstep tests never leave
the smallest wire buckets).

Marked slow: XLA:CPU compiles of the 720p banded pipeline dominate the
first run; the persistent compile cache keeps re-runs fast.
"""

import numpy as np
import jax
import pytest

from tools import streams


@pytest.mark.slow
def test_batch_720p_two_gops_wire_sticky(h264ref, tmp_path):
    from arrow_h264_tpu.ops import wire
    from arrow_h264_tpu.parallel.batch import BatchDecoder

    w, h, frames, gop = 1280, 720, 20, 10   # >= 2 GOPs
    n = len(jax.devices())
    paths = []
    for i in range(n):
        yuv = streams.make_content(w, h, frames, seed=300 + i, noise=3)
        p = str(tmp_path / f"s{i}.264")
        streams.encode(yuv, w, h, p, [
            "profile=high", "qp=30", f"g={gop}", "bf=2", "refs=3",
            "keyint_min=" + str(gop),
            "x264-params=cabac=1:8x8dct=1:weightp=2:weightb=1:"
            "b-pyramid=0:" + streams.X264_COMMON])
        paths.append(p)
    datas = [open(p, "rb").read() for p in paths]
    goldens = [streams.golden_decode(p)[0] for p in paths]

    info0 = wire.unpack_fn.cache_info()
    bd = BatchDecoder(n)
    outs = bd.decode(datas)
    assert all(e is None for e in bd.errors), bd.errors

    # bit-exactness at the binding shape
    for i, (frs, golden) in enumerate(zip(outs, goldens)):
        ours = np.stack([np.frombuffer(f.planar(), np.uint8) for f in frs])
        assert np.array_equal(ours, golden), f"stream {i} mismatch"

    # sticky-spec convergence: the merged wire spec may only GROW, and
    # each growth is one new unpack structure (one jit trace).  Over 20
    # rounds x 8 lanes of real High/CABAC content the spec must settle
    # after a handful of growths — a flapping spec would recompile the
    # sharded pipeline every round (round-3 sticky-spec design goal).
    info1 = wire.unpack_fn.cache_info()
    new_specs = info1.misses - info0.misses
    assert new_specs <= 5, f"wire spec flapped: {new_specs} distinct specs"
    # mode lattice must also settle into few compiled variants
    assert len(bd._fns) <= 3, sorted(bd._fns)
