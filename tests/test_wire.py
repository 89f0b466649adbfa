"""Wire-format round-trip: pack_wire -> flatten -> unpack must reproduce
the dense ABI exactly (the wire is pure transport, ops/wire.py).  The
one deliberate exception is refid, which is replaced by refslot — an
equality-preserving substitution the deblock bS test can't distinguish."""

import numpy as np
import pytest

import jax.numpy as jnp

from arrow_h264_tpu.models.pipeline import ABI_DEVICE_KEYS
from arrow_h264_tpu.ops.abi import empty_frame_abi
from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
from arrow_h264_tpu.ops.wire import (
    conform_sections, flatten_wire, merge_specs, pack_wire, unpack_fn,
    wire_nbytes,
)

MB_W, MB_H = 11, 9


def _roundtrip(abi, mb_w=MB_W, mb_h=MB_H):
    sec, spec = pack_wire(abi, mb_w, mb_h)
    buf = flatten_wire(sec, spec, mb_w * mb_h)
    dense = unpack_fn(mb_w, mb_h, spec)(jnp.asarray(buf))
    return buf, spec, dense


def _check(abi, dense):
    for k in ABI_DEVICE_KEYS:
        if k not in dense:
            # all-zero coeff/pcm tensors are omitted by the unpack
            # (residual_planes skips their compute path entirely)
            assert k in ("luma4", "luma8", "luma_dc", "chroma_dc",
                         "chroma_ac", "pcm"), k
            assert not np.asarray(abi[k]).any(), k
            continue
        got = np.asarray(dense[k])
        want = np.asarray(abi[k])
        assert got.shape == want.shape, k
        if k == "refid":
            # substituted by refslot host-side; only the equality
            # structure must survive (deblock bS compares, never reads)
            neg = want < 0
            assert np.array_equal(got < 0, neg), k
            f_w = want.reshape(-1)
            f_g = got.reshape(-1)
            rng = np.random.default_rng(0)
            ii = rng.integers(0, f_w.size, 512)
            jj = rng.integers(0, f_w.size, 512)
            assert np.array_equal(f_w[ii] == f_w[jj], f_g[ii] == f_g[jj]), k
            continue
        assert np.array_equal(got, want), k


def test_roundtrip_p_frame():
    abi = synthetic_abi_p(MB_W, MB_H, seed=3, n_slots=2)
    buf, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    dense_bytes = sum(np.asarray(abi[k]).nbytes for k in ABI_DEVICE_KEYS)
    # synthetic_abi_p is dense-random (worst case); real broadcast
    # content packs ~50x — this only guards gross regressions
    assert wire_nbytes(buf) < dense_bytes // 4


def test_roundtrip_empty_and_edge_values():
    abi = empty_frame_abi(MB_W, MB_H)
    # int8-range coefficients stay on the bm8 sparse path
    abi["luma4"][0, 0, 0, 0] = 127
    abi["luma4"][1, 5, 3, 3] = -128
    abi["alpha_off"][:] = -12
    abi["beta_off"][:] = 12
    abi["pcm"][7] = np.arange(384) % 256
    abi["kind"][7] = 3
    _, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    d = dict((f, s) for f, s, _ in spec)
    assert d["l4"] == "bm8" and d["pcm"] == "sparse"


def test_int8_overflow_falls_back_dense16():
    abi = empty_frame_abi(MB_W, MB_H)
    abi["luma4"][0, 0, 0, 0] = 32767     # > int8, fits int16
    _, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    assert ("l4", "dense16", 0) in spec


def test_int16_overflow_falls_back_dense():
    abi = empty_frame_abi(MB_W, MB_H)
    abi["luma4"][0, 0, 0, 0] = 40000     # > int16
    _, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    assert ("l4", "dense", 0) in spec


def test_subpartitioned_mbs_nonuniform_rows():
    abi = synthetic_abi_p(MB_W, MB_H, seed=3, n_slots=2)
    # broadcast cell 0 across each MB (16x16-like content), then
    # sub-partition a handful so the base scheme must carry
    # non-uniform full-grid rows
    for k in ("mv", "refidx", "refslot", "refid"):
        abi[k][:] = abi[k][:, :1, :1]
    abi["mv"][5, 2, 3, 0, 0] += 4
    abi["refidx"][17, 1, 1, 0] = 1
    abi["refslot"][17, 1, 1, 0] = 1
    _, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    d = dict((f, (s, b)) for f, s, b in spec)
    assert d["inter"][0] == "base" and d["inter"][1] >= 2


def test_weighted_tables_sparse_rows():
    abi = synthetic_abi_p(MB_W, MB_H, seed=1, n_slots=2)
    abi["wtab"][2, 5, 0, 1] = (3, -4, 1, 0)
    abi["slogwd"][2] = (6, 5)
    _, spec, dense = _roundtrip(abi)
    _check(abi, dense)
    d = dict((f, s) for f, s, _ in spec)
    assert d["wtab"] == "sparse"


def test_merge_and_conform_batch():
    a0 = synthetic_abi_p(MB_W, MB_H, seed=5, n_slots=2)
    a1 = empty_frame_abi(MB_W, MB_H)
    a1["luma4"][3, 2, 1, 1] = 9          # tiny sparse
    s0, sp0 = pack_wire(a0, MB_W, MB_H)
    s1, sp1 = pack_wire(a1, MB_W, MB_H)
    tgt = merge_specs([sp0, sp1])
    n = MB_W * MB_H
    b0 = flatten_wire(conform_sections(s0, sp0, tgt, MB_W, MB_H), tgt, n)
    b1 = flatten_wire(conform_sections(s1, sp1, tgt, MB_W, MB_H), tgt, n)
    assert b0.shape == b1.shape
    up = unpack_fn(MB_W, MB_H, tgt, batched=True)
    dense = up(jnp.asarray(np.stack([b0, b1])))
    _check(a0, {k: v[0] for k, v in dense.items()})
    _check(a1, {k: v[1] for k, v in dense.items()})


def test_conceal_deblock_override_survives_wire():
    """Per-MB deblock-disable written by concealment must survive the
    wire's per-slice disable_idc renormalization: flagged MBs read back
    disable_idc==1 while the rest of their slice keeps the true header
    value (the last-writer-wins scatter used to let a flagged raster-last
    MB disable deblocking for its whole slice, or drop the flag)."""
    n = MB_W * MB_H
    abi = synthetic_abi_p(MB_W, MB_H, seed=2, n_slots=2)
    abi["deblock_off"] = np.zeros(n, np.int32)
    abi["slice_id"][:] = 0
    abi["disable_idc"][:] = 0
    # concealment wrote the override on the slice's raster-LAST MBs —
    # exactly the MBs whose scatter would have polluted the slice row
    abi["disable_idc"][-3:] = 1
    abi["deblock_off"][-3:] = 1
    _, _, dense = _roundtrip(abi)
    got = np.asarray(dense["disable_idc"])
    assert (got[-3:] == 1).all()
    assert (got[:-3] == 0).all()
    assert np.array_equal(np.asarray(dense["slice_id"]), abi["slice_id"])


def test_nonexisting_ref_refid_stays_distinct():
    """A cell referencing a non-existing (frame_num-gap) picture bound
    to device slot 0 must not unpack with the same refid as a cell
    referencing the REAL picture at slot 0 (deblock bS same-ref test),
    while both gather from slot 0 for MC."""
    abi = synthetic_abi_p(MB_W, MB_H, seed=4, n_slots=2)
    for k in ("refid", "refslot", "refidx"):
        abi[k][:2] = -1
    abi["refid"][0, :, :, 0] = 5      # real picture, slot 0
    abi["refid"][1, :, :, 0] = 7      # non-existing gap picture, slot 0
    abi["refslot"][0, :, :, 0] = 0
    abi["refslot"][1, :, :, 0] = 0
    abi["refidx"][0, :, :, 0] = 0
    abi["refidx"][1, :, :, 0] = 0
    abi["nx_uids"] = np.asarray([7], np.int32)
    _, _, dense = _roundtrip(abi)
    rid = np.asarray(dense["refid"])
    rsl = np.asarray(dense["refslot"])
    assert rid[0, 0, 0, 0] != rid[1, 0, 0, 0]
    assert rsl[0, 0, 0, 0] == 0 and rsl[1, 0, 0, 0] == 0
    assert (np.asarray(dense["refidx"])[:2] == np.asarray(abi["refidx"])[:2]).all()


def test_decode_matches_dense_upload(monkeypatch):
    """End-to-end: decoding a real stream with the wire path produces
    byte-identical frames to the direct dense upload."""
    from tools import streams
    from arrow_h264_tpu.api import Decoder
    path = "/tmp/wire_e2e.264"
    yuv = streams.make_content(176, 144, 4)
    streams.encode(yuv, 176, 144, path, streams.CONFIG_OPTS[2])
    data = open(path, "rb").read()
    monkeypatch.setenv("ARROW_H264_WIRE", "0")
    ref = [f.planar() for f in Decoder().decode_annexb(data)]
    monkeypatch.setenv("ARROW_H264_WIRE", "1")
    got = [f.planar() for f in Decoder().decode_annexb(data)]
    assert len(ref) == len(got) and ref == got


def test_emit_wire_matches_sections_path():
    """The shipped raw+emit path (pack_wire_raw/emit_wire) must be
    byte-equal to the reference sections path (pack_wire ->
    conform_sections -> flatten_wire) for every own->target scheme
    combination the merge lattice can produce."""
    from arrow_h264_tpu.ops.wire import emit_wire, pack_wire_raw

    n = MB_W * MB_H
    abis = [
        empty_frame_abi(MB_W, MB_H),                     # all-zero
        synthetic_abi_p(MB_W, MB_H, seed=3, n_slots=2),  # P mix
        synthetic_abi_p(MB_W, MB_H, seed=9, n_slots=2),  # another mix
    ]
    # an intra-heavy ABI: dense intra + dense16 coeffs
    heavy = synthetic_abi_p(MB_W, MB_H, seed=5, n_slots=2)
    heavy["kind"] = np.zeros(n, np.int32)            # all I4
    heavy["i4_modes"] = np.full((n, 16), 2, np.int32)
    rng = np.random.default_rng(0)
    heavy["luma4"] = rng.integers(-100, 100, (n, 16, 4, 4)).astype(np.int32)
    heavy["refidx"] = np.full((n, 4, 4, 2), -1, np.int32)
    heavy["refslot"] = np.full((n, 4, 4, 2), -1, np.int32)
    heavy["refid"] = np.full((n, 4, 4, 2), -1, np.int32)
    heavy["mv"] = np.zeros((n, 4, 4, 2, 2), np.int32)
    abis.append(heavy)

    specs, raws, secs = [], [], []
    for a in abis:
        sec, spec = pack_wire(a, MB_W, MB_H)
        raw, spec_r = pack_wire_raw(a, MB_W, MB_H)
        assert spec_r == spec
        specs.append(spec)
        raws.append(raw)
        secs.append(sec)
    # own spec == target (no conforming)
    for sec, raw, spec in zip(secs, raws, specs):
        ref = flatten_wire(sec, spec, n)
        got = emit_wire(raw, spec, spec, n)
        assert np.array_equal(ref, got)
    # conform every ABI up to the merged superset
    target = merge_specs(specs)
    for sec, raw, spec in zip(secs, raws, specs):
        ref = flatten_wire(conform_sections(sec, spec, target, MB_W, MB_H),
                           target, n)
        got = emit_wire(raw, spec, target, n)
        assert np.array_equal(ref, got)


def test_nz_row_hints_match_full_scan():
    """The decode-time nonzero-row hints (cpp/entropy_mb.inc nzr_push;
    PicBuf::nzr_*) must make pack_wire_raw byte-identical to the
    hint-less full scan on a real CABAC stream — specs, buffers, and
    the gather's skip-zero-rows semantics all pinned."""
    from tools import streams
    from arrow_h264_tpu.api import Decoder
    from arrow_h264_tpu.ops.wire import emit_wire, pack_wire_raw
    path = "/tmp/wire_nzr.264"
    yuv = streams.make_content(176, 144, 5)
    streams.encode(yuv, 176, 144, path, streams.CONFIG_OPTS[4])
    data = open(path, "rb").read()
    zero = (np.zeros((144, 176), np.uint8),
            np.zeros((72, 88), np.uint8), np.zeros((72, 88), np.uint8))
    dec = Decoder(entropy="cpp")
    nf = 0
    for pic, poc in dec.parse_pictures(data):
        mb_w = pic.sps.pic_width_in_mbs
        mb_h = pic.sps.pic_height_in_map_units
        n = mb_w * mb_h
        abi = dec.pack_abi(pic, poc)
        assert "_nzr" in abi           # cpp engine records hints
        raw_h, spec_h = pack_wire_raw(abi, mb_w, mb_h)
        bare = dict(abi)
        bare.pop("_nzr")
        raw_s, spec_s = pack_wire_raw(bare, mb_w, mb_h)
        assert spec_h == spec_s
        assert emit_wire(raw_h, spec_h, spec_h, n).tobytes() == \
            emit_wire(raw_s, spec_s, spec_s, n).tobytes()
        list(dec.commit(pic, poc, *zero, 4, lambda *a: None))
        nf += 1
    assert nf == 5


def test_nz_row_hints_unsorted_falls_back():
    """gather_blocks8 returns None on a non-ascending hint (the ASO
    case) so pack_wire_raw silently falls back to the full scan."""
    from arrow_h264_tpu.host.centropy import gather_blocks8
    src = np.zeros((8, 16), np.int32)
    src[2, 3] = 7
    src[5, 0] = -4
    ok = gather_blocks8(src, np.array([2, 5], np.int32), 5, 33)
    assert ok is not None and ok[0] == 2
    assert gather_blocks8(src, np.array([5, 2], np.int32), 5, 33) is None
    assert gather_blocks8(src, np.array([5, 99], np.int32), 5, 33) is None
