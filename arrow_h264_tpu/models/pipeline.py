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

import os

from ..bitstream.params import PPS, SPS
from ..ops.abi import KIND_P, FrameABI
from ..ops.deblock import deblock_planes, deblock_tables
from ..ops.inter import (MV_BAND, PAD, halfpel_planes, inter_predict,
                         inter_predict_banded)
from ..ops.intra import intra_reconstruct
from ..ops.pallas.deblock_kernel import deblock_pallas
from ..ops.pallas.intra_kernel import intra_reconstruct_pallas
from ..ops.transforms import _mb_mask_to_plane, make_ws_consts, residual_planes


def _use_pallas() -> bool:
    env = os.environ.get("ARROW_H264_PALLAS")
    if env is not None:
        return env == "1"
    import jax as _jax
    return _jax.default_backend() not in ("cpu",)

ABI_DEVICE_KEYS = (
    "kind", "qp", "luma4", "luma8", "luma_dc", "chroma_dc", "chroma_ac",
    "i4_modes", "i8_modes", "i16_mode", "chroma_mode", "i4_avail", "i8_avail",
    "mb_avail", "pcm", "nz", "tr8", "slice_id", "disable_idc", "alpha_off",
    "beta_off", "mv", "refid", "refslot", "wp", "logwd",
)


def decode_frame_fn(abi: dict, dpb_y, dpb_cb, dpb_cr, *,
                    mb_w: int, mb_h: int, ws4, ws8, cqp_off,
                    pallas: bool | None = None, inter_mode: str = "banded"):
    """Pure function: ABI dict + device DPB -> (y, cb, cr) uint8 planes.

    dpb_y [S, 4, Hp, Wp]: (G, b, h, j) half-pel planes per slot.
    pallas=None resolves by backend (TPU -> Pallas kernels).
    inter_mode: "banded" (gather-free MC, |mv_int| <= MV_BAND), "gather"
    (arbitrary MVs), or "none" (all-intra frame) — picked per frame by the
    host (DevicePipeline.decode_frame)."""
    if pallas is None:
        pallas = _use_pallas()
    res_y, res_cb, res_cr = residual_planes(abi, mb_w, mb_h, ws4, ws8, cqp_off)
    H, W = mb_h * 16, mb_w * 16
    if inter_mode == "none":
        init_y = jnp.zeros((H, W), jnp.int32)
        init_cb = jnp.zeros((H // 2, W // 2), jnp.int32)
        init_cr = init_cb
    else:
        mc = inter_predict_banded if inter_mode == "banded" else inter_predict
        pred_y, pred_cb, pred_cr = mc(abi, dpb_y, dpb_cb, dpb_cr, mb_w, mb_h)
        # fusion fence: without it XLA re-fuses the banded MC select chain
        # into downstream consumers and pessimizes it by ~two orders
        pred_y, pred_cb, pred_cr = jax.lax.optimization_barrier(
            (pred_y, pred_cb, pred_cr))
        inter_y = _mb_mask_to_plane(abi["kind"] >= KIND_P, mb_w, mb_h, 16)
        inter_c = _mb_mask_to_plane(abi["kind"] >= KIND_P, mb_w, mb_h, 8)
        init_y = jnp.where(inter_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        init_cb = jnp.where(inter_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        init_cr = jnp.where(inter_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    if pallas:
        y, cb, cr = intra_reconstruct_pallas(
            abi, res_y, res_cb, res_cr, init_y, init_cb, init_cr, mb_w, mb_h)
        tables = deblock_tables(abi, mb_w, mb_h, cqp_off)
        y, cb, cr = deblock_pallas(y, cb, cr, tables, mb_w, mb_h)
    else:
        y, cb, cr = intra_reconstruct(abi, res_y, res_cb, res_cr, mb_w, mb_h,
                                      init_y, init_cb, init_cr)
        y, cb, cr = deblock_planes(abi, y, cb, cr, mb_w, mb_h, cqp_off)
    return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)


def store_ref_fn(dpb_y, dpb_cb, dpb_cr, slot, y, cb, cr):
    """Compute half-pel planes, pad, and write into the DPB slot.

    Amortizes the 6-tap interpolation once per stored reference frame
    (SURVEY.md §7: MC gathers never touch the host OR recompute filters).
    """
    g, b, h, j = halfpel_planes(y)
    y4 = jnp.stack([g, b, h, j])[None]                  # [1, 4, Hp, Wp]
    cbp = jnp.pad(cb, PAD // 2, mode="edge")[None]
    crp = jnp.pad(cr, PAD // 2, mode="edge")[None]
    return (jax.lax.dynamic_update_slice(dpb_y, y4, (slot, 0, 0, 0)),
            jax.lax.dynamic_update_slice(dpb_cb, cbp, (slot, 0, 0)),
            jax.lax.dynamic_update_slice(dpb_cr, crp, (slot, 0, 0)))


class DevicePipeline:
    """Jit-compiled per (sps, pps) frame reconstruction + device DPB slots."""

    def __init__(self, sps: SPS, pps: PPS):
        self.sps, self.pps = sps, pps
        self.mb_w, self.mb_h = sps.pic_width_in_mbs, sps.pic_height_in_map_units
        H, W = self.mb_h * 16, self.mb_w * 16
        sl4 = pps.scaling_lists_4x4 if pps.scaling_lists_4x4 is not None \
            else sps.scaling_lists_4x4
        sl8 = pps.scaling_lists_8x8 if pps.scaling_lists_8x8 is not None \
            else sps.scaling_lists_8x8
        ws4, ws8 = make_ws_consts(sl4, sl8)
        self._base = functools.partial(
            decode_frame_fn, mb_w=self.mb_w, mb_h=self.mb_h,
            ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8),
            cqp_off=(pps.chroma_qp_index_offset, pps.chroma_qp_offset(1)),
        )
        self._fns: dict = {}
        self._store = jax.jit(store_ref_fn, donate_argnums=(0, 1, 2))
        self.n_slots = max(2, min(sps.max_num_ref_frames, 16) + 1)
        self.dpb_y = jnp.zeros((self.n_slots, 4, H + 2 * PAD, W + 2 * PAD),
                               jnp.uint8)
        self.dpb_cb = jnp.zeros((self.n_slots, H // 2 + PAD, W // 2 + PAD),
                                jnp.uint8)
        self.dpb_cr = jnp.zeros_like(self.dpb_cb)

    def _select_inter_mode(self, abi: FrameABI) -> str:
        if not bool(np.any(np.asarray(abi["kind"]) >= KIND_P)):
            return "none"
        mv_int = np.asarray(abi["mv"]) >> 2
        if mv_int.min(initial=0) >= -MV_BAND - 1 and \
                mv_int.max(initial=0) <= MV_BAND:
            return "banded"
        return "gather"

    def decode_frame(self, abi: FrameABI):
        dev = {k: jnp.asarray(abi[k]) for k in ABI_DEVICE_KEYS}
        mode = self._select_inter_mode(abi)
        if mode not in self._fns:
            self._fns[mode] = jax.jit(
                functools.partial(self._base, inter_mode=mode))
        return self._fns[mode](dev, self.dpb_y, self.dpb_cb, self.dpb_cr)

    def store_ref(self, slot: int, y, cb, cr) -> None:
        self.dpb_y, self.dpb_cb, self.dpb_cr = self._store(
            self.dpb_y, self.dpb_cb, self.dpb_cr, slot,
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr))
