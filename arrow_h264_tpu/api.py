"""Public decode API (SURVEY.md §1 L7).

Reference parity: arrow-h264's public decode surface (exact names unknown —
reference mount empty, SURVEY.md §0/§7 API-surface note): a decoder object,
an Annex-B one-shot helper, and a batch entry point.

    dec = Decoder()
    for frame in dec.decode_annexb(stream_bytes):
        frame.y, frame.cb, frame.cr, frame.planar()

The host entropy layer (bitstream + mb.parse) runs on CPU; reconstruction
runs as jitted JAX on the accelerator (models.pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitstream import nal
from .bitstream.bits import BitReader
from .bitstream.params import PPS, SPS, parse_pps, parse_sps
from .bitstream.slicehdr import parse_slice_header
from .mb.parse import PictureParse
from .models.pipeline import DevicePipeline
from .oracle.decoder import crop_planes
from .ops.abi import pack_frame


@dataclass
class Frame:
    y: np.ndarray
    cb: np.ndarray
    cr: np.ndarray
    poc: int = 0

    @property
    def width(self) -> int:
        return self.y.shape[1]

    @property
    def height(self) -> int:
        return self.y.shape[0]

    def planar(self) -> bytes:
        """Planar YUV420 bytes (the JM-comparison format)."""
        return (self.y.tobytes() + self.cb.tobytes() + self.cr.tobytes())


class Decoder:
    """TPU-pipeline H.264 decoder (Baseline I-only CAVLC so far — config 1)."""

    def __init__(self) -> None:
        self.sps_map: dict[int, SPS] = {}
        self.pps_map: dict[int, PPS] = {}
        self._pipelines: dict[tuple, DevicePipeline] = {}

    def _pipeline(self, sps: SPS, pps: PPS) -> DevicePipeline:
        key = (sps.seq_parameter_set_id, pps.pic_parameter_set_id,
               sps.pic_width_in_mbs, sps.pic_height_in_map_units)
        if key not in self._pipelines:
            self._pipelines[key] = DevicePipeline(sps, pps)
        return self._pipelines[key]

    def decode_annexb(self, data: bytes):
        """Yield Frames in output order."""
        cur: PictureParse | None = None
        for u in nal.parse_annexb(data):
            if u.nal_unit_type == nal.NAL_SPS:
                s = parse_sps(u.rbsp)
                self.sps_map[s.seq_parameter_set_id] = s
            elif u.nal_unit_type == nal.NAL_PPS:
                p = parse_pps(u.rbsp, self.sps_map)
                self.pps_map[p.pic_parameter_set_id] = p
            elif u.is_slice:
                r2 = BitReader(u.rbsp)
                r2.ue()
                r2.ue()
                pps = self.pps_map[r2.ue()]
                sps = self.sps_map[pps.seq_parameter_set_id]
                r = BitReader(u.rbsp)
                hdr = parse_slice_header(r, sps, pps, u.nal_unit_type,
                                         u.nal_ref_idc)
                if hdr.first_mb_in_slice == 0:
                    if cur is not None:
                        yield self._finish(cur)
                    cur = PictureParse(sps, pps)
                if cur is None:
                    raise ValueError("slice without picture start")
                cur.parse_slice(r, hdr)
        if cur is not None:
            yield self._finish(cur)

    def _finish(self, pic: PictureParse) -> Frame:
        abi = pack_frame(pic)
        y, cb, cr = self._pipeline(pic.sps, pic.pps).decode_frame(abi)
        y, cb, cr = crop_planes(pic.sps, y, cb, cr)
        return Frame(y=y, cb=cb, cr=cr)


def decode_annexb(data: bytes):
    """One-shot convenience: bytes -> list[Frame]."""
    return list(Decoder().decode_annexb(data))
