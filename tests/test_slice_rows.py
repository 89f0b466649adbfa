"""Slice -> device parameter-row assignment (ops.abi.assign_slice_rows).

The device ships per-slice parameters (weight tables, slogwd, deblock
offsets) as MAX_SLICES fixed rows.  Slice-per-MB-row encoders emit far
more than 15 slices per picture at HD; legal streams must not be
rejected — slices with identical device-visible parameters share a row
(ADVICE r3: the old hard reject failed such streams)."""

from types import SimpleNamespace

import numpy as np
import pytest

from arrow_h264_tpu.ops.abi import (
    CONCEAL_SLICE, MAX_SLICES, assign_slice_rows, empty_frame_abi,
    fill_weight_tables,
)


def _pps(**kw):
    d = dict(weighted_pred_flag=0, weighted_bipred_idc=0)
    d.update(kw)
    return SimpleNamespace(**d)


def _hdr(idc=0, a=0, b=0, is_p=False, is_b=False, **kw):
    d = dict(disable_deblocking_filter_idc=idc,
             slice_alpha_c0_offset_div2=a, slice_beta_offset_div2=b,
             is_p=is_p, is_b=is_b, pred_weights_l0=None,
             pred_weights_l1=None, luma_log2_weight_denom=0,
             chroma_log2_weight_denom=0)
    d.update(kw)
    return SimpleNamespace(**d)


def test_identity_when_rows_suffice():
    hdrs = [_hdr(a=i % 3) for i in range(MAX_SLICES - 1)]
    rl = [((), ())] * len(hdrs)
    assert assign_slice_rows(_pps(), hdrs, rl) == list(range(len(hdrs)))


def test_many_identical_slices_share_one_row():
    hdrs = [_hdr() for _ in range(68)]        # slice-per-MB-row 1080p
    rl = [((), ())] * 68
    rows = assign_slice_rows(_pps(), hdrs, rl)
    assert rows == [0] * 68
    assert max(rows) < CONCEAL_SLICE


def test_mixed_params_dedup():
    hdrs = [_hdr(a=i % 4, b=i % 2) for i in range(40)]
    rl = [((), ())] * 40
    rows = assign_slice_rows(_pps(), hdrs, rl)
    assert len(set(rows)) == len({(h.slice_alpha_c0_offset_div2,
                                   h.slice_beta_offset_div2)
                                  for h in hdrs})
    # equal params -> equal row, distinct params -> distinct row
    for i in range(40):
        for j in range(40):
            same = (hdrs[i].slice_alpha_c0_offset_div2,
                    hdrs[i].slice_beta_offset_div2) == \
                   (hdrs[j].slice_alpha_c0_offset_div2,
                    hdrs[j].slice_beta_offset_div2)
            assert (rows[i] == rows[j]) == same


def test_idc2_kept_unique_while_rows_remain():
    # 5 idc==2 slices among 20 identical idc==0: the boundary test for
    # idc==2 needs exact slice identity, so they stay unique
    hdrs = [_hdr(idc=2 if i < 5 else 0) for i in range(20)]
    rl = [((), ())] * 20
    rows = assign_slice_rows(_pps(), hdrs, rl)
    idc2 = [rows[i] for i in range(5)]
    assert len(set(idc2)) == 5
    assert len({rows[i] for i in range(5, 20)}) == 1
    assert not set(idc2) & {rows[i] for i in range(5, 20)}


def test_idc2_merges_only_on_overflow():
    # 30 identical idc==2 slices cannot all stay unique: they merge
    # (bounded deblock-only deviation) instead of failing the picture
    hdrs = [_hdr(idc=2) for _ in range(30)]
    rl = [((), ())] * 30
    rows = assign_slice_rows(_pps(), hdrs, rl)
    assert rows == [0] * 30


def test_truly_distinct_overflow_rejected():
    hdrs = [_hdr(a=i % 6, b=(i // 6) % 6, idc=i % 2) for i in range(24)]
    rl = [((), ())] * 24
    assert len({(h.disable_deblocking_filter_idc,
                 h.slice_alpha_c0_offset_div2,
                 h.slice_beta_offset_div2) for h in hdrs}) > MAX_SLICES - 1
    with pytest.raises(NotImplementedError):
        assign_slice_rows(_pps(), hdrs, rl)


def test_fill_weight_tables_remaps_slice_id():
    mb_w = mb_h = 6
    abi = empty_frame_abi(mb_w, mb_h)
    n = mb_w * mb_h
    # one slice per MB row: 6 rows -> fits; then 36 slices -> remap
    hdrs = [_hdr() for _ in range(n)]          # slice per MB (36 slices)
    abi["slice_id"] = np.arange(n, dtype=np.int32) % n
    fill_weight_tables(abi, _pps(), hdrs, [((), ())] * n, cur_poc=0)
    sid = np.asarray(abi["slice_id"])
    assert (sid == 0).all()
    assert sid.max() < MAX_SLICES - 1
