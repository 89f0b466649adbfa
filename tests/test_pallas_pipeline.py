"""Pallas deblock kernel equivalence vs the XLA-scan reference (interpret
mode on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arrow_h264_tpu.models.pipeline import (
    decode_frame_fn, dpb_alloc, ABI_DEVICE_KEYS,
)
from arrow_h264_tpu.ops.transforms import make_ws_consts
from arrow_h264_tpu.bitstream import nal
from arrow_h264_tpu.bitstream.bits import BitReader
from arrow_h264_tpu.bitstream.params import parse_sps, parse_pps
from arrow_h264_tpu.bitstream.slicehdr import parse_slice_header
from tools import streams


def _dpb_dummy(mb_w, mb_h):
    slots = jnp.asarray(np.array([0, 1, -1, -1], np.int32))
    return (*dpb_alloc(mb_w, mb_h, 2), slots)


def test_pallas_pipeline_matches_xla(h264ref, tmp_path):
    """Decode a real I-frame ABI through both backends (intra + deblock)."""
    from arrow_h264_tpu.host.centropy import CppPictureParse, pack_frame_cpp
    w, h = 176, 144
    yuv = streams.make_content(w, h, 1, seed=77)
    path = str(tmp_path / "pk.264")
    streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[1])
    data = open(path, "rb").read()
    sps = pps = None
    pic = None
    for u in nal.parse_annexb(data):
        if u.nal_unit_type == nal.NAL_SPS:
            sps = parse_sps(u.rbsp)
        elif u.nal_unit_type == nal.NAL_PPS:
            pps = parse_pps(u.rbsp, {0: sps})
        elif u.is_slice and pic is None:
            r = BitReader(u.rbsp)
            hdr = parse_slice_header(r, sps, pps, u.nal_unit_type, u.nal_ref_idc)
            pic = CppPictureParse(sps, pps)
            pic.parse_slice(r, hdr, ((), ()), 0)
    abi = pack_frame_cpp(pic)
    dev = {k: jnp.asarray(abi[k]) for k in ABI_DEVICE_KEYS}
    ws4, ws8 = make_ws_consts(sps.scaling_lists_4x4, sps.scaling_lists_8x8)
    mb_w, mb_h = sps.pic_width_in_mbs, sps.pic_height_in_map_units
    dpb = _dpb_dummy(mb_w, mb_h)
    kw = dict(mb_w=mb_w, mb_h=mb_h, ws4=jnp.asarray(ws4),
              ws8=jnp.asarray(ws8), cqp_off=(0, 0))
    ref = decode_frame_fn(dev, *dpb, pallas=False, **kw)
    import os
    os.environ["ARROW_H264_PALLAS"] = "1"  # interpret via CPU backend
    try:
        got = decode_frame_fn(dev, *dpb, pallas=True, **kw)
    finally:
        del os.environ["ARROW_H264_PALLAS"]
    for a, b, name in zip(got, ref, "y cb cr".split()):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"{name}: {int((np.asarray(a) != np.asarray(b)).sum())} diffs"
