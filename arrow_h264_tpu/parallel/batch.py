"""Config 5: batched multi-stream decode sharded across a TPU mesh.

Reference parity: the reference decoder is single-stream (SURVEY.md §2);
the TPU-native scale-out axis is DATA PARALLELISM over independent streams:
host entropy parses each stream (embarrassingly parallel across host
cores), pictures are grouped into lockstep rounds, and ONE jitted sharded
reconstruction step decodes the whole round with the stream axis sharded
over the `stream` mesh (ICI, no cross-chip collectives in the decode
path).  Reference stores go through a matching sharded step into stacked
per-stream DPB slots (plus one trash slot for non-reference rounds).

Per-stream error isolation (SURVEY.md §5 failure detection): a stream
that raises during host parse or commit is marked failed and dropped from
subsequent rounds; the other streams keep decoding.  `BatchDecoder.errors`
records the exception per failed stream.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import Decoder, Frame
from ..models.pipeline import (
    ABI_DEVICE_KEYS, dpb_alloc, make_ws_consts, select_inter_mode,
)
from ..ops.abi import empty_frame_abi
from ..ops.pallas.mc_kernel import MAX_SLOTS


class BatchDecoder:
    """Decode N same-resolution streams in lockstep, batch-sharded."""

    def __init__(self, n_streams: int, mesh: Mesh | None = None,
                 entropy: str = "cpp"):
        if mesh is None:
            n_dev = max(1, len(jax.devices()))
            use = n_dev if n_streams % n_dev == 0 else 1
            mesh = Mesh(np.array(jax.devices()[:use]), ("stream",))
        self.mesh = mesh
        self.n_streams = n_streams
        self.decoders = [Decoder(entropy=entropy) for _ in range(n_streams)]
        self._sharding = NamedSharding(mesh, P("stream"))
        self.errors: list = [None] * n_streams
        self._geom = None
        # host entropy parse is embarrassingly parallel across streams:
        # the C++ slice parser runs with the GIL released (ctypes), so
        # worker threads scale it across host cores (SURVEY.md §2 host
        # parallelism row).  1 worker on a 1-core host degenerates to the
        # serial path.
        self._pool = ThreadPoolExecutor(
            max_workers=max(1, min(n_streams, os.cpu_count() or 1)))

    @property
    def stats(self):
        """Aggregated per-stream DecodeStats (dicts)."""
        return [d.stats.as_dict() for d in self.decoders]

    # ---- batched device state --------------------------------------------

    def _init_device(self, sps, pps):
        from ..parallel.sharding import sharded_decode_fn, sharded_store_fn
        mb_w = sps.pic_width_in_mbs
        mb_h = sps.pic_height_in_map_units
        self._geom = (mb_w, mb_h)
        sl4 = pps.scaling_lists_4x4 if pps.scaling_lists_4x4 is not None \
            else sps.scaling_lists_4x4
        sl8 = pps.scaling_lists_8x8 if pps.scaling_lists_8x8 is not None \
            else sps.scaling_lists_8x8
        self._ws = make_ws_consts(sl4, sl8)
        self._cqp = (pps.chroma_qp_index_offset, pps.chroma_qp_offset(1))
        self.n_slots = max(2, min(sps.max_num_ref_frames, 16) + 1)
        B = self.n_streams
        dpbs = [dpb_alloc(mb_w, mb_h, self.n_slots + 1) for _ in range(B)]
        self._dpb_y = jax.device_put(
            jnp.stack([d[0] for d in dpbs]), self._sharding)
        self._dpb_c = jax.device_put(
            jnp.stack([d[1] for d in dpbs]), self._sharding)
        self._fns = {}
        self._mk_fn = lambda mode: sharded_decode_fn(
            self.mesh, mb_w, mb_h, *self._ws, cqp_off=self._cqp,
            n_streams=B, inter_mode=mode)
        self._store = sharded_store_fn(self.mesh, B)
        self._dummy = empty_frame_abi(mb_w, mb_h)
        self._use_wire = os.environ.get("ARROW_H264_WIRE") != "0"
        if self._use_wire:
            from ..ops.wire import pack_wire
            self._dummy_wire = pack_wire(self._dummy, mb_w, mb_h)

    def _decode_fn(self, mode: str):
        if mode not in self._fns:
            self._fns[mode] = self._mk_fn(mode)
        return self._fns[mode]

    # ---- lockstep decode --------------------------------------------------

    def decode(self, streams: list[bytes]) -> list[list[Frame]]:
        """Decode the Annex-B streams in lockstep through the sharded
        reconstruction + store steps; returns per-stream frame lists.
        Failed streams yield partial lists; see self.errors."""
        B = self.n_streams
        assert len(streams) == B, (len(streams), B)
        gens = [d.parse_pictures(s)
                for d, s in zip(self.decoders, streams)]
        pending: list = [None] * B
        frames: list[list[Frame]] = [[] for _ in range(B)]
        self.errors = [None] * B

        def advance(i):
            if gens[i] is None:
                return
            try:
                pending[i] = next(gens[i])
            except StopIteration:
                gens[i] = None
                pending[i] = None
            except Exception as e:           # corrupt lane: isolate
                self.errors[i] = e
                gens[i] = None
                pending[i] = None

        list(self._pool.map(advance, range(B)))

        use_wire = os.environ.get("ARROW_H264_WIRE") != "0"

        def pack(i):
            pic, poc = pending[i]
            try:
                abi = self.decoders[i].pack_abi(pic, poc)
                if use_wire:
                    from ..ops.wire import pack_wire
                    sps = pic.sps
                    ws = pack_wire(abi, sps.pic_width_in_mbs,
                                   sps.pic_height_in_map_units)
                    return i, (abi, ws)
                return i, (abi, None)
            except Exception as e:
                self.errors[i] = e
                gens[i] = None
                pending[i] = None
                return i, None

        while any(p is not None for p in pending):
            live = [i for i in range(B) if pending[i] is not None]
            abis = {}
            wires = {}
            for i, packed in self._pool.map(pack, live):
                if packed is not None:
                    abis[i], wires[i] = packed
            live = [i for i in live if i in abis]
            if not live:
                break
            pic0 = pending[live[0]][0]
            if self._geom is None:
                self._init_device(pic0.sps, pic0.pps)
            mb_w, mb_h = self._geom
            assert (pic0.sps.pic_width_in_mbs,
                    pic0.sps.pic_height_in_map_units) == self._geom, \
                "lockstep streams must share resolution"

            # unify the round's MC variant (superset order)
            modes = []
            slot_lists = {}
            for i in live:
                m, sl = select_inter_mode(abis[i], mb_w, mb_h)
                modes.append(m)
                slot_lists[i] = sl
            if "gather" in modes:
                mode = "gather"
            elif "pl01" in modes:
                mode = "pl01"
            elif "pl0" in modes:
                mode = "pl0"
            else:
                mode = "none"

            if self._use_wire:
                # bring every lane onto the round's merged wire spec so
                # ONE sharded upload + unpack serves the whole batch
                # (the tunnel's per-transfer latency makes one buffer
                # per round as important as the byte count)
                from ..ops.wire import (
                    conform_sections, flatten_wire, merge_specs, unpack_fn,
                )
                target = merge_specs(
                    [wires[i][1] for i in live] + [self._dummy_wire[1]])
                n = mb_w * mb_h
                bufs = [
                    flatten_wire(
                        conform_sections(*(wires[i] if i in wires
                                           else self._dummy_wire),
                                         target, mb_w, mb_h),
                        target, n)
                    for i in range(B)]
                batchw = jax.device_put(jnp.asarray(np.stack(bufs)),
                                        self._sharding)
                batch = unpack_fn(mb_w, mb_h, target, batched=True)(batchw)
            else:
                batch = {}
                for k in ABI_DEVICE_KEYS:
                    rows = [abis[i][k] if i in abis else self._dummy[k]
                            for i in range(B)]
                    batch[k] = jax.device_put(
                        jnp.stack([jnp.asarray(r) for r in rows]),
                        self._sharding)
            slots_arr = np.full((B, MAX_SLOTS), -1, np.int32)
            for i, sl in slot_lists.items():
                slots_arr[i] = sl
            slots_dev = jax.device_put(jnp.asarray(slots_arr),
                                       self._sharding)
            yb, cbb, crb = self._decode_fn(mode)(
                batch, self._dpb_y, self._dpb_c, slots_dev)

            # commit per stream; collect reference stores for one batched
            # sharded store (trash slot self.n_slots for non-storing lanes)
            store_slots = np.full(B, self.n_slots, np.int32)
            for i in live:
                pic, poc = pending[i]

                def _rec(slot, y, cb, cr, i=i):
                    store_slots[i] = slot

                try:
                    frames[i].extend(self.decoders[i].commit(
                        pic, poc, yb[i], cbb[i], crb[i],
                        self.n_slots, _rec))
                except Exception as e:
                    self.errors[i] = e
                    gens[i] = None
                    pending[i] = None
            self._dpb_y, self._dpb_c = self._store(
                self._dpb_y, self._dpb_c,
                jax.device_put(jnp.asarray(store_slots), self._sharding),
                yb, cbb, crb)
            abis.clear()   # release ABI views so parse buffers can recycle
            wires.clear()
            todo = [i for i in live if self.errors[i] is None]
            for i in todo:
                pending[i] = None
            # parse the next round's pictures across host cores while the
            # device round above is still executing (pipeline overlap)
            list(self._pool.map(advance, todo))

        for i in range(B):
            if self.errors[i] is None and self.decoders[i].dpb is not None:
                frames[i].extend(self.decoders[i]._emit(p)
                                 for p in self.decoders[i].dpb.flush())
        return frames


def decode_batch_lockstep(fn, abis: list[dict], dpbs, slot_lists,
                          mesh: Mesh):
    """One lockstep reconstruction step over a sharded stream batch.

    fn: sharded decode fn (parallel.sharding.sharded_decode_fn).
    abis: per-stream ABI dicts (same geometry); dpbs: per-stream packed
    DPB pairs (y4p, cp); slot_lists: per-stream [MAX_SLOTS] i32.
    """
    shard = NamedSharding(mesh, P("stream"))
    batch = {k: jax.device_put(jnp.stack([jnp.asarray(a[k]) for a in abis]),
                               shard)
             for k in ABI_DEVICE_KEYS}
    dpb_y = jax.device_put(jnp.stack([d[0] for d in dpbs]), shard)
    dpb_c = jax.device_put(jnp.stack([d[1] for d in dpbs]), shard)
    slots = jax.device_put(jnp.stack([jnp.asarray(s) for s in slot_lists]),
                           shard)
    return fn(batch, dpb_y, dpb_c, slots)
