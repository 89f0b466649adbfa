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

import functools
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import Decoder, Frame
from ..models.pipeline import (
    ABI_DEVICE_KEYS, decode_frame_fn, dpb_alloc, make_ws_consts,
    select_inter_mode,
)
from ..ops.abi import empty_frame_abi
from ..ops.pallas.mc_kernel import MAX_SLOTS


class BatchDecoder:
    """Decode N same-resolution streams in lockstep, batch-sharded."""

    def __init__(self, n_streams: int, mesh: Mesh | None = None,
                 entropy: str = "cpp", materialize: bool = True,
                 on_frame=None):
        if mesh is None:
            n_dev = max(1, len(jax.devices()))
            use = n_dev if n_streams % n_dev == 0 else 1
            mesh = Mesh(np.array(jax.devices()[:use]), ("stream",))
        self.mesh = mesh
        self.n_streams = n_streams
        # materialize=False keeps output planes as device-resident
        # api.PendingFrame objects (caller finalizes or consumes them
        # on device — e.g. feeding another TPU model)
        self.materialize = materialize
        # on_frame(lane, frame) -> value: streaming consumer.  Each
        # newly emitted frame is handed over the moment its round
        # commits and REPLACED in the returned list by on_frame's
        # return value, so decode()'s peak HBM residency is bounded by
        # the DPB + one round instead of every output frame (a 32-lane
        # 1080p batch holds multi-GB of outputs otherwise).  Requires
        # materialize=False (frames arrive as device PendingFrames).
        self.on_frame = on_frame
        assert on_frame is None or not materialize, \
            "on_frame streams device frames; use materialize=False"
        self.decoders = [Decoder(entropy=entropy) for _ in range(n_streams)]
        for d in self.decoders:
            # one overlapped device->host copy per ROUND instead of a
            # blocking np.asarray per FRAME (api.PendingFrame): the
            # per-frame sync pays the link's round-trip latency B times
            # per round and serializes host parse behind it
            d.deferred_emit = True
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
        per_frame = 1 if sps.frame_mbs_only_flag else 2
        self.n_slots = max(2, min(sps.max_num_ref_frames * per_frame,
                                  32) + 1)
        B = self.n_streams
        dpbs = [dpb_alloc(mb_w, mb_h, self.n_slots + 1) for _ in range(B)]
        self._dpb_y = jax.device_put(
            jnp.stack([d[0] for d in dpbs]), self._sharding)
        self._dpb_c = jax.device_put(
            jnp.stack([d[1] for d in dpbs]), self._sharding)
        self._fns = {}
        self._bypass = bool(sps.qpprime_y_zero_transform_bypass_flag)
        self._field = not sps.frame_mbs_only_flag
        self._mk_fn = lambda mode: sharded_decode_fn(
            self.mesh, mb_w, mb_h, *self._ws, cqp_off=self._cqp,
            n_streams=B, inter_mode=mode, bypass=self._bypass,
            field=self._field)
        self._store = sharded_store_fn(self.mesh, B)
        self._dummy = empty_frame_abi(mb_w, mb_h)
        self._use_wire = os.environ.get("ARROW_H264_WIRE") != "0"
        # seed the per-class sticky specs from the cross-process cache:
        # repeat runs then compile the SAME settled structures and hit
        # the persistent XLA compile cache instead of walking a fresh
        # spec-growth sequence of compiles (ops.wire.load_sticky_specs)
        from ..ops.wire import load_sticky_specs
        self._spec_sticky: dict = load_sticky_specs(mb_w, mb_h)
        self._gather_fn = None
        self.demotions = 0   # lane-rounds decoded via the per-lane
                             # gather fallback (observability + tests)
        if self._use_wire:
            from ..ops.wire import pack_wire_raw
            self._dummy_wire = pack_wire_raw(self._dummy, mb_w, mb_h)

    def _decode_fn(self, mode: str):
        if mode not in self._fns:
            self._fns[mode] = self._mk_fn(mode)
        return self._fns[mode]

    def _gather_lane(self, i: int, abi, wire, target):
        """Full-frame gather decode for ONE adversarial lane whose
        evictions overflow the patch capacity.  The round's pl-mode
        launch keeps serving the other lanes; only this lane pays the
        gather cost (per-stream perf isolation, SURVEY.md §5) — one
        wild lane no longer demotes the whole round."""
        mb_w, mb_h = self._geom
        if self._gather_fn is None:
            self._gather_fn = jax.jit(functools.partial(
                decode_frame_fn, mb_w=mb_w, mb_h=mb_h,
                ws4=jnp.asarray(self._ws[0]), ws8=jnp.asarray(self._ws[1]),
                cqp_off=self._cqp, inter_mode="gather",
                bypass=self._bypass, field=self._field))
        if wire is not None:
            from ..ops.wire import emit_wire, unpack_fn
            buf = emit_wire(*wire, target, mb_w * mb_h)
            dev = unpack_fn(mb_w, mb_h, target)(jnp.asarray(buf))
        elif "wp" in abi:
            # slice-row overflow lane (ops.abi._fill_dense_weights):
            # dense per-cell weights, wire bypass
            dev = {k: jnp.asarray(abi[k]) for k in ABI_DEVICE_KEYS
                   if k not in ("wtab", "slogwd")}
            dev["wp"] = jnp.asarray(abi["wp"])
            dev["logwd"] = jnp.asarray(abi["logwd"])
        else:
            dev = {k: jnp.asarray(abi[k]) for k in ABI_DEVICE_KEYS}
        if "cvoff" in abi:
            dev["cvoff"] = jnp.asarray(abi["cvoff"])
        slot_list = jnp.full((MAX_SLOTS,), -1, jnp.int32)
        self.demotions += 1
        return self._gather_fn(dev, self._dpb_y[i], self._dpb_c[i],
                               slot_list)

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
        in_flight: list[tuple[int, int]] = []   # deferred (lane, idx)
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
                sps = pic.sps
                mb_w = sps.pic_width_in_mbs
                mb_h = sps.pic_height_in_map_units
                abi = self.decoders[i].pack_abi(pic, poc)
                # mode selection (incl. hybrid-MC patch compaction) runs
                # in the parse pool, before the wire pack ships the
                # patch list as a wire section
                mode, sl, patch = select_inter_mode(abi, mb_w, mb_h)
                if mode != "none" and "cvoff" in abi \
                        and abi["cvoff"].any():
                    mode = "gather"   # cross-parity field refs: the
                                      # chroma adjustment lives on the
                                      # gather path (8.4.1.4.1)
                abi["patch"] = patch
                if "wp" in abi:
                    # slice-row overflow: dense weights can't ride the
                    # wire; decode this lane via the per-lane path
                    return i, (abi, None, "gather", sl)
                if use_wire:
                    from ..ops.wire import pack_wire_raw
                    ws = pack_wire_raw(abi, mb_w, mb_h)
                    return i, (abi, ws, mode, sl)
                return i, (abi, None, mode, sl)
            except Exception as e:
                self.errors[i] = e
                gens[i] = None
                pending[i] = None
                return i, None

        while any(p is not None for p in pending):
            live = [i for i in range(B) if pending[i] is not None]
            abis = {}
            wires = {}
            lane_modes = {}
            slot_lists = {}
            for i, packed in self._pool.map(pack, live):
                if packed is not None:
                    abis[i], wires[i], lane_modes[i], slot_lists[i] = packed
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

            # per-lane mode independence (VERDICT r3 #4): a lane whose
            # evictions overflow the patch capacity is DEMOTED ALONE —
            # it ships the dummy ABI through the round's batched launch
            # and is decoded by a separate per-lane gather call against
            # its own DPB row.  The remaining lanes unify on the pl
            # superset lattice ({list1} x {patched}) as before, so one
            # adversarial lane no longer taxes the other B-1.
            demoted = {i for i in live if lane_modes[i] == "gather"}
            modes = [lane_modes[i] for i in live if i not in demoted]
            if any(m.startswith("pl") for m in modes):
                mode = "pl01" if any(m.startswith("pl01") for m in modes) \
                    else "pl0"
                if any(m.endswith("p") for m in modes):
                    mode += "p"
            else:
                mode = "none"

            target = None
            if self._use_wire:
                # bring every lane onto the round's merged wire spec so
                # ONE sharded upload + unpack serves the whole batch
                # (the tunnel's per-transfer latency makes one buffer
                # per round as important as the byte count)
                from ..ops.wire import (
                    emit_wire, merge_specs, spec_class, unpack_fn,
                )
                # sticky across rounds PER CLASS (see
                # DevicePipeline.upload_abi): spec growth is monotone
                # within a class so the sharded decode fn's input
                # structure settles after a few rounds instead of
                # recompiling whenever a coeff class (dis)appears; the
                # class split keeps I-frame rounds' dense schemes from
                # poisoning every P/B round's upload (ops.wire.spec_class)
                target = merge_specs(
                    [wires[i][1] for i in live if wires[i] is not None]
                    + [self._dummy_wire[1]])
                cls = spec_class(target)
                prev = self._spec_sticky.get(cls)
                if prev is not None:
                    target = merge_specs([prev, target])
                if target != prev:
                    # persist each growth immediately: a killed process
                    # (driver timeout) must not lose the settled spec
                    from ..ops.wire import save_sticky_specs
                    self._spec_sticky[cls] = target
                    save_sticky_specs(*self._geom, {cls: target})
                n = mb_w * mb_h
                bufs = [
                    emit_wire(
                        *(wires[i] if i in wires and i not in demoted
                          else self._dummy_wire),
                        target, n)
                    for i in range(B)]
                batchw = jax.device_put(jnp.asarray(np.stack(bufs)),
                                        self._sharding)
                batch = unpack_fn(mb_w, mb_h, target, batched=True)(batchw)
                if self._field:
                    batch["cvoff"] = jax.device_put(jnp.asarray(np.stack(
                        [np.asarray(abis[i]["cvoff"])
                         if i in abis and i not in demoted
                         else np.zeros(64, np.int32)
                         for i in range(B)])), self._sharding)
            else:
                batch = {}
                keys = ABI_DEVICE_KEYS + (("cvoff",) if self._field else ())
                zero_cv = np.zeros(64, np.int32)
                for k in keys:
                    rows = [abis[i].get(k, zero_cv)
                            if i in abis and i not in demoted
                            else self._dummy.get(k, zero_cv)
                            for i in range(B)]
                    batch[k] = jax.device_put(
                        jnp.stack([jnp.asarray(r) for r in rows]),
                        self._sharding)
            slots_arr = np.full((B, MAX_SLOTS), -1, np.int32)
            for i, sl in slot_lists.items():
                if i not in demoted:
                    slots_arr[i] = sl
            slots_dev = jax.device_put(jnp.asarray(slots_arr),
                                       self._sharding)
            yb, cbb, crb = self._decode_fn(mode)(
                batch, self._dpb_y, self._dpb_c, slots_dev)
            for i in sorted(demoted):
                y1, cb1, cr1 = self._gather_lane(
                    i, abis[i],
                    wires[i] if self._use_wire else None, target)
                yb = yb.at[i].set(y1)
                cbb = cbb.at[i].set(cb1)
                crb = crb.at[i].set(cr1)

            # commit per stream; collect reference stores for one batched
            # sharded store (trash slot self.n_slots for non-storing lanes)
            store_slots = np.full(B, self.n_slots, np.int32)
            mark = [len(frames[i]) for i in range(B)]
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
            # start ONE overlapped device->host copy for this round's
            # emitted frames; materialize LAST round's (whose transfer
            # has been riding the link during this round's device work)
            if self.materialize:
                new_fetch = [(i, j) for i in range(B)
                             for j in range(mark[i], len(frames[i]))]
                for i, j in new_fetch:
                    frames[i][j].start_fetch()
                for i, j in in_flight:
                    frames[i][j] = self._finalize_timed(i, frames[i][j])
                in_flight = new_fetch
            elif self.on_frame is not None:
                for i in range(B):
                    for j in range(mark[i], len(frames[i])):
                        frames[i][j] = self.on_frame(i, frames[i][j])
            # parse the next round's pictures across host cores while the
            # device round above is still executing (pipeline overlap)
            list(self._pool.map(advance, todo))

        for i in range(B):
            if self.errors[i] is None and self.decoders[i].dpb is not None:
                tail = len(frames[i])
                frames[i].extend(self.decoders[i]._emit(p)
                                 for p in self.decoders[i].dpb.flush())
                if self.on_frame is not None:
                    for j in range(tail, len(frames[i])):
                        frames[i][j] = self.on_frame(i, frames[i][j])
        # finalize everything still deferred (tail rounds + DPB flush):
        # start every remaining copy first, then materialize
        if self.materialize:
            from ..api import PendingFrame
            for row in frames:
                for f in row:
                    if isinstance(f, PendingFrame):
                        f.start_fetch()
            for i in range(B):
                frames[i] = [self._finalize_timed(i, f)
                             if isinstance(f, PendingFrame) else f
                             for f in frames[i]]
        return frames

    def _finalize_timed(self, i: int, pending):
        """Materialize a deferred frame, attributing the device->host
        sync to the lane's DecodeStats (deferred emission otherwise
        leaves emit_sync_s at 0 and fps_wall overstates)."""
        import time
        t0 = time.perf_counter()
        f = pending.finalize()
        self.decoders[i].stats.emit_sync_s += time.perf_counter() - t0
        return f


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
