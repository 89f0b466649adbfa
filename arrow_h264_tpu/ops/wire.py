"""Compact host->device wire format for the frame ABI.

The dense MB-tensor ABI (ops.abi) is the device-side contract, but
shipping it over the host->HBM link costs ~44 MB/frame at 1080p — almost
all of it zeros (coefficient arrays are ~97% empty on broadcast-grade
streams, PCM is all-but-never present, every scalar rides in an int32).
On the bench rig the axon tunnel moves ~0.05-0.13 GB/s, so the dense
upload alone would cap end-to-end decode at ~4 fps; on production PCIe
hosts it is still 10-20x more traffic than needed.

Wire layout (per frame):
  meta8     [n, 66]  u8   every per-MB scalar, packed (modes, avails,
                          qp, kind, nz flags, deblock offsets, ...)
  mv16      [n, 64]  i16  inter only (zero-skipped for I frames)
  ref8      [n, 96]  i8   refidx | refslot | refid (uids remapped to
                          small ints host-side; equality-preserving)
  <coeff>_idx/[K]i32 + <coeff>_val/[K,w]i16
            sparse nonzero-block lists for luma4 / luma8 / chroma_ac /
            luma_dc / chroma_dc / pcm, padded to a power-of-2 bucket
            (pad index = grid size -> device trash row).  Falls back to
            the dense int32 array if a frame is unusually dense or a
            level overflows int16.
  wtab_idx/_val   sparse non-identity weight-table rows (weighted pred)
  slogwd    [16, 2] i32  always dense (128 B)

`pack_wire` (host, numpy) -> (wire dict, spec); `unpack_wire_frame`
(jit-able) scatters the wire back into the dense ABI on device.  The
spec — a tuple of (field, scheme, bucket) — is static per compiled
unpack variant; buckets are power-of-2 so variant count stays small.
For lockstep batches `merge_specs` + `conform_wire` bring every stream
of a round onto one shared spec so a single sharded unpack serves the
whole batch.

Reference parity: the reference class has no host->device link at all
(single-address-space C); this layer exists because the TPU-native
design splits entropy (host) from reconstruction (HBM-resident device
pipeline) per SURVEY.md §7 step 2.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .abi import MAX_SLICES, identity_wtab

# (field, source key, grid cells per MB, values per cell)
_COEFF_FIELDS = (
    ("l4", "luma4", 16, 16),
    ("l8", "luma8", 4, 64),
    ("ca", "chroma_ac", 8, 16),
    ("ldc", "luma_dc", 1, 16),
    ("cdc", "chroma_dc", 1, 8),
    ("pcm", "pcm", 1, 384),
)

_META_COLS = 66
_MIN_BUCKET = 64
# a frame denser than this fraction of the grid ships the dense array
_DENSE_FRAC = 0.5


def _bucket(k: int, grid: int) -> int:
    """Next bucket >= k from the {2^i, 3*2^i} ladder (<=33% padding;
    coarse enough to keep the unpack-jit variant count small)."""
    b = _MIN_BUCKET
    while True:
        if b >= k:
            return min(b, grid)
        if (b + (b >> 1)) >= k:
            return min(b + (b >> 1), grid)
        b <<= 1


def _pack_meta8(abi, n: int) -> np.ndarray:
    m = np.zeros((n, _META_COLS), np.uint8)
    m[:, 0] = abi["kind"]
    m[:, 1] = abi["qp"]
    m[:, 2] = abi["tr8"]
    m[:, 3] = abi["slice_id"]
    m[:, 4] = abi["disable_idc"]
    m[:, 5] = np.asarray(abi["alpha_off"]) + 12
    m[:, 6] = np.asarray(abi["beta_off"]) + 12
    m[:, 7] = abi["i16_mode"]
    m[:, 8] = abi["chroma_mode"]
    mba = np.asarray(abi["mb_avail"], np.uint8)
    m[:, 9] = mba[:, 0] | (mba[:, 1] << 1) | (mba[:, 2] << 2)
    m[:, 10:26] = abi["i4_modes"]
    av4 = np.asarray(abi["i4_avail"], np.uint8)
    m[:, 26:42] = (av4[:, :, 0] | (av4[:, :, 1] << 1) | (av4[:, :, 2] << 2)
                   | (av4[:, :, 3] << 3))
    m[:, 42:46] = abi["i8_modes"]
    av8 = np.asarray(abi["i8_avail"], np.uint8)
    m[:, 46:50] = (av8[:, :, 0] | (av8[:, :, 1] << 1) | (av8[:, :, 2] << 2)
                   | (av8[:, :, 3] << 3))
    m[:, 50:66] = np.asarray(abi["nz"], np.uint8).reshape(n, 16)
    return m


def _remap_refid(refid: np.ndarray) -> np.ndarray:
    """Equality-preserving shrink of DPB uids to int16 (-1 kept).

    All refids of one frame come from the live DPB window (<= 16 pics +
    frame_num gaps), whose uids span far less than 2^15 — so masking to
    15 bits can never collide two distinct uids within a frame."""
    return np.where(refid < 0, np.int32(-1),
                    refid & 0x7FFF).astype(np.int16)


def pack_wire(abi, mb_w: int, mb_h: int):
    """Host side: dense numpy ABI -> (wire dict, spec tuple)."""
    n = mb_w * mb_h
    wire = {"meta8": _pack_meta8(abi, n)}
    spec = []

    kind = np.asarray(abi["kind"])
    from .abi import KIND_IPCM, KIND_P
    if (kind >= KIND_P).any():
        spec.append(("inter", "dense", 0))
        wire["mv16"] = np.asarray(abi["mv"], np.int16).reshape(n, 64)
        ref8 = np.empty((n, 64), np.int8)
        ref8[:, 0:32] = np.asarray(abi["refidx"], np.int8).reshape(n, 32)
        ref8[:, 32:64] = np.asarray(abi["refslot"], np.int8).reshape(n, 32)
        wire["ref8"] = ref8
        wire["refid16"] = _remap_refid(np.asarray(abi["refid"])) \
            .reshape(n, 32)
    else:
        spec.append(("inter", "zero", 0))

    try:
        from ..host.centropy import scan_rows32
    except Exception:
        scan_rows32 = None

    for f, key, cpm, w in _COEFF_FIELDS:
        grid = n * cpm
        src = np.asarray(abi[key]).reshape(grid, w)
        if f == "pcm":
            # gated on MB kind: no IPCM MB -> nothing to scan or send
            rows = np.nonzero(kind == KIND_IPCM)[0]
            if not len(rows):
                spec.append((f, "zero", 0))
                continue
            k = len(rows)
            b = _bucket(k, grid)
            if b >= grid:
                spec.append((f, "dense16", 0))
                wire[f + "_dense"] = src.astype(np.uint8)
                continue
            spec.append((f, "sparse", b))
            idx = np.full(b, grid, np.int32)
            idx[:k] = rows
            vals = np.zeros((b, w), np.uint8)
            vals[:k] = src[rows]
            wire[f + "_idx"] = idx
            wire[f + "_val"] = vals
            continue
        cap = int(grid * _DENSE_FRAC) + 1
        if scan_rows32 is not None and src.flags.c_contiguous and \
                src.dtype == np.int32:
            k, idx_buf, val_buf, overflow = scan_rows32(src, cap)
        else:
            mask = src.any(axis=1)
            nzi = np.nonzero(mask)[0]
            k = len(nzi)
            idx_buf = nzi
            block = src[nzi[:cap]]
            overflow = bool(block.size) and (
                int(block.min()) < -32768 or int(block.max()) > 32767)
            val_buf = block.astype(np.int16)
        if k == 0:
            spec.append((f, "zero", 0))
            continue
        b = _bucket(k, grid)
        if k >= cap or b >= grid:
            spec.append((f, "dense16" if not overflow else "dense", 0))
            wire[f + "_dense"] = src.astype(
                np.int16 if not overflow else np.int32)
            continue
        if overflow:
            spec.append((f, "dense", 0))
            wire[f + "_dense"] = src.astype(np.int32)
            continue
        spec.append((f, "sparse", b))
        idx = np.full(b, grid, np.int32)
        idx[:k] = idx_buf[:k]
        vals = np.zeros((b, w), np.int16)
        vals[:k] = val_buf[:k]
        wire[f + "_idx"] = idx
        wire[f + "_val"] = vals

    wt = np.asarray(abi["wtab"])
    ident = identity_wtab()
    rows = np.nonzero((wt != ident).any(axis=(1, 2, 3, 4)))[0]
    if len(rows):
        spec.append(("wtab", "sparse", MAX_SLICES))
        idx = np.full(MAX_SLICES, MAX_SLICES, np.int32)
        idx[:len(rows)] = rows
        vals = np.zeros((MAX_SLICES,) + wt.shape[1:], np.int16)
        vals[:len(rows)] = wt[rows]
        wire["wtab_idx"] = idx
        wire["wtab_val"] = vals
    else:
        spec.append(("wtab", "zero", 0))
    wire["slogwd"] = np.asarray(abi["slogwd"], np.int32)
    return wire, tuple(spec)


def wire_nbytes(wire) -> int:
    return sum(np.asarray(v).nbytes for v in wire.values())


# ---------------------------------------------------------------------------
# spec merge / conform (lockstep batches share one spec per round)
# ---------------------------------------------------------------------------

_ORDER = {"zero": 0, "sparse": 1, "dense16": 2, "dense": 3}


def merge_specs(specs):
    """Superset spec: per field the max scheme / bucket across streams."""
    out = []
    for entries in zip(*specs):
        f = entries[0][0]
        assert all(e[0] == f for e in entries)
        scheme = max((e[1] for e in entries), key=_ORDER.__getitem__)
        b = max((e[2] for e in entries if e[1] == "sparse"), default=0)
        out.append((f, scheme, b if scheme == "sparse" else 0))
    return tuple(out)


def conform_wire(wire, spec, target, mb_w: int, mb_h: int):
    """Pad / densify a stream's wire dict up to the merged round spec."""
    if spec == target:
        return wire
    n = mb_w * mb_h
    out = dict(wire)
    for (f, sch, b), (_, tsch, tb) in zip(spec, target):
        if (sch, b) == (tsch, tb):
            continue
        if f == "inter":
            out["mv16"] = np.zeros((n, 64), np.int16)
            out["ref8"] = np.full((n, 64), -1, np.int8)
            out["refid16"] = np.full((n, 32), -1, np.int16)
            continue
        if f == "wtab":
            out["wtab_idx"] = np.full(MAX_SLICES, MAX_SLICES, np.int32)
            out["wtab_val"] = np.zeros(
                (MAX_SLICES, 33, 33, 3, 4), np.int16)
            continue
        cpm, w = next((c, w) for ff, _, c, w in _COEFF_FIELDS if ff == f)
        grid = n * cpm
        vdt = np.uint8 if f == "pcm" else np.int16
        if tsch == "sparse":
            idx = np.full(tb, grid, np.int32)
            vals = np.zeros((tb, w), vdt)
            if sch == "sparse":
                idx[:b] = out.pop(f + "_idx")
                vals[:b] = out.pop(f + "_val")
            out[f + "_idx"] = idx
            out[f + "_val"] = vals
        else:  # dense / dense16 target
            ddt = np.uint8 if f == "pcm" else (
                np.int16 if tsch == "dense16" else np.int32)
            dense = np.zeros((grid, w), ddt)
            if sch == "sparse":
                idx = out.pop(f + "_idx")
                vals = out.pop(f + "_val")
                live = idx < grid
                dense[idx[live]] = vals[live]
            elif sch in ("dense", "dense16"):
                dense = out[f + "_dense"].astype(ddt)
            out[f + "_dense"] = dense
    return out


# ---------------------------------------------------------------------------
# device-side unpack (jit per spec; vmap for batches)
# ---------------------------------------------------------------------------

def _scatter_rows(idx, vals, grid: int, w: int):
    dense = jnp.zeros((grid + 1, w), jnp.int32)
    dense = dense.at[idx].set(vals.astype(jnp.int32))
    return dense[:grid]


def unpack_wire_frame(wire, *, mb_w: int, mb_h: int, spec):
    """Wire dict (device arrays) -> dense int32 ABI dict (jit-able)."""
    n = mb_w * mb_h
    md = wire["meta8"].astype(jnp.int32)
    out = {
        "kind": md[:, 0], "qp": md[:, 1], "tr8": md[:, 2],
        "slice_id": md[:, 3], "disable_idc": md[:, 4],
        "alpha_off": md[:, 5] - 12, "beta_off": md[:, 6] - 12,
        "i16_mode": md[:, 7], "chroma_mode": md[:, 8],
        "mb_avail": jnp.stack([(md[:, 9] >> b) & 1 for b in range(3)], 1),
        "i4_modes": md[:, 10:26],
        "i4_avail": jnp.stack(
            [(md[:, 26:42] >> b) & 1 for b in range(4)], 2),
        "i8_modes": md[:, 42:46],
        "i8_avail": jnp.stack(
            [(md[:, 46:50] >> b) & 1 for b in range(4)], 2),
        "nz": md[:, 50:66].reshape(n, 4, 4),
    }
    sd = dict((f, (sch, b)) for f, sch, b in spec)

    sch, _ = sd["inter"]
    if sch == "zero":
        out["mv"] = jnp.zeros((n, 4, 4, 2, 2), jnp.int32)
        out["refidx"] = jnp.full((n, 4, 4, 2), -1, jnp.int32)
        out["refslot"] = jnp.full((n, 4, 4, 2), -1, jnp.int32)
        out["refid"] = jnp.full((n, 4, 4, 2), -1, jnp.int32)
    else:
        out["mv"] = wire["mv16"].astype(jnp.int32).reshape(n, 4, 4, 2, 2)
        r8 = wire["ref8"].astype(jnp.int32)
        out["refidx"] = r8[:, 0:32].reshape(n, 4, 4, 2)
        out["refslot"] = r8[:, 32:64].reshape(n, 4, 4, 2)
        out["refid"] = wire["refid16"].astype(jnp.int32) \
            .reshape(n, 4, 4, 2)

    shapes = {"l4": (n, 16, 4, 4), "l8": (n, 4, 8, 8),
              "ca": (n, 2, 2, 2, 4, 4), "ldc": (n, 4, 4),
              "cdc": (n, 2, 2, 2), "pcm": (n, 384)}
    for f, key, cpm, w in _COEFF_FIELDS:
        grid = n * cpm
        sch, b = sd[f]
        if sch == "zero":
            out[key] = jnp.zeros(shapes[f], jnp.int32)
        elif sch in ("dense", "dense16"):
            out[key] = wire[f + "_dense"].astype(jnp.int32) \
                .reshape(shapes[f])
        else:
            dense = _scatter_rows(wire[f + "_idx"], wire[f + "_val"],
                                  grid, w)
            out[key] = dense.reshape(shapes[f])

    sch, _ = sd["wtab"]
    ident = jnp.asarray(identity_wtab())
    if sch == "zero":
        out["wtab"] = ident
    else:
        upd = jnp.concatenate(
            [ident, jnp.zeros((1,) + ident.shape[1:], jnp.int16)])
        upd = upd.at[wire["wtab_idx"]].set(wire["wtab_val"])
        out["wtab"] = upd[:MAX_SLICES]
    out["slogwd"] = wire["slogwd"].astype(jnp.int32)
    return out


@functools.lru_cache(maxsize=64)
def unpack_fn(mb_w: int, mb_h: int, spec, batched: bool = False):
    """jit-compiled unpack for one spec (optionally vmapped over B)."""
    f = functools.partial(unpack_wire_frame, mb_w=mb_w, mb_h=mb_h,
                          spec=spec)
    return jax.jit(jax.vmap(f) if batched else f)
