"""The flagship decode pipeline: MB tensors -> reconstructed frame (JAX).

Reference parity: this is the device half of the JM-lineage
`decode_one_macroblock` + `DeblockPicture` flow (SURVEY.md §3.2), as one
jitted function over the frame's MB tensors:

    residual (batched dequant+IDCT)  ->  intra wavefront  ->  deblock wavefront

Compiled once per (resolution, scaling-list) configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream.params import PPS, SPS
from ..ops.abi import FrameABI
from ..ops.deblock import deblock_planes
from ..ops.intra import intra_reconstruct
from ..ops.transforms import make_ws_consts, residual_planes

ABI_DEVICE_KEYS = (
    "kind", "qp", "luma4", "luma8", "luma_dc", "chroma_dc", "chroma_ac",
    "i4_modes", "i8_modes", "i16_mode", "chroma_mode", "i4_avail", "i8_avail",
    "mb_avail", "pcm", "nz", "tr8", "slice_id", "disable_idc", "alpha_off",
    "beta_off", "mv", "refid",
)


def decode_frame_fn(abi: dict, *, mb_w: int, mb_h: int, ws4, ws8, cqp_off):
    """Pure function: ABI dict of int32 arrays -> (y, cb, cr) uint8 planes."""
    res_y, res_cb, res_cr = residual_planes(abi, mb_w, mb_h, ws4, ws8, cqp_off)
    y, cb, cr = intra_reconstruct(abi, res_y, res_cb, res_cr, mb_w, mb_h)
    y, cb, cr = deblock_planes(abi, y, cb, cr, mb_w, mb_h, cqp_off)
    return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)


class DevicePipeline:
    """Jit-compiled per (sps, pps) frame reconstruction."""

    def __init__(self, sps: SPS, pps: PPS):
        self.sps, self.pps = sps, pps
        self.mb_w, self.mb_h = sps.pic_width_in_mbs, sps.pic_height_in_map_units
        sl4 = pps.scaling_lists_4x4 if pps.scaling_lists_4x4 is not None \
            else sps.scaling_lists_4x4
        sl8 = pps.scaling_lists_8x8 if pps.scaling_lists_8x8 is not None \
            else sps.scaling_lists_8x8
        ws4, ws8 = make_ws_consts(sl4, sl8)
        self._fn = jax.jit(functools.partial(
            decode_frame_fn, mb_w=self.mb_w, mb_h=self.mb_h,
            ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8),
            cqp_off=(pps.chroma_qp_index_offset, pps.chroma_qp_offset(1)),
        ))

    def decode_frame(self, abi: FrameABI):
        dev = {k: jnp.asarray(abi[k]) for k in ABI_DEVICE_KEYS}
        y, cb, cr = self._fn(dev)
        return (np.asarray(y), np.asarray(cb), np.asarray(cr))
