"""CAVLC codec tests: table consistency + encode/decode roundtrip (spec 9.2)."""

import numpy as np
import pytest

from arrow_h264_tpu.bitstream.bits import BitReader, BitWriter
from arrow_h264_tpu.entropy import cavlc_tables as T
from arrow_h264_tpu.entropy.cavlc import decode_residual_block, encode_residual_block


def _check_prefix_free(codes):
    codes = sorted(codes)
    for i, c in enumerate(codes):
        for d in codes:
            if c is not d and d.startswith(c):
                raise AssertionError(f"{c} prefix of {d}")


def test_tables_prefix_free_and_complete():
    for cls, tab in enumerate(T.COEFF_TOKEN):
        _check_prefix_free(tab.values())
        max_tc = 4 if cls == 3 else 16
        keys = set(tab)
        for tc in range(max_tc + 1):
            for t1 in range(min(tc, 3) + 1):
                assert (tc, t1) in keys, (cls, tc, t1)
        # spec coeff_token tables are valid prefix codes but intentionally
        # leave a few codewords unused (Kraft sum slightly < 1)
        kraft = sum(2.0 ** -len(c) for c in tab.values())
        assert 1.0 - 2.0 ** -9 < kraft <= 1.0 + 1e-12, (cls, kraft)
    for tc, lst in T.TOTAL_ZEROS_4x4.items():
        _check_prefix_free(lst)
        assert len(lst) == 16 - tc + 1
        k = sum(2.0 ** -len(c) for c in lst)
        assert 1.0 - 2.0 ** -8 < k <= 1.0 + 1e-12, (tc, k)
    for tc, lst in T.TOTAL_ZEROS_CHROMA_DC.items():
        _check_prefix_free(lst)
        assert len(lst) == 4 - tc + 1
        assert abs(sum(2.0 ** -len(c) for c in lst) - 1.0) < 1e-9
    for zl, lst in T.RUN_BEFORE.items():
        _check_prefix_free(lst)


@pytest.mark.parametrize("nc", [-1, 0, 1, 2, 3, 4, 7, 8, 16])
def test_roundtrip_random(nc):
    rng = np.random.default_rng(nc + 100)
    max_num = 4 if nc == -1 else 16
    blocks = []
    for _ in range(500):
        n_nz = int(rng.integers(0, max_num + 1))
        lv = np.zeros(max_num, np.int64)
        pos = rng.permutation(max_num)[:n_nz]
        mag = rng.choice([1, 1, 1, 2, 3, 9, 100, 2000])
        lv[pos] = rng.integers(1, mag + 1, n_nz) * rng.choice([-1, 1], n_nz)
        blocks.append(lv.tolist())
    # edge cases
    blocks.append([0] * max_num)
    blocks.append([1] * max_num)
    blocks.append([-1] * max_num)
    blocks.append([2047] + [0] * (max_num - 1))
    blocks.append([0] * (max_num - 1) + [-2047])

    w = BitWriter()
    for b in blocks:
        encode_residual_block(w, nc, b, max_num)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for b in blocks:
        got = decode_residual_block(r, nc, max_num)
        assert got == b, (nc, b, got)
