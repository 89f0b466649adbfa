"""Config 5: batched multi-stream decode sharded across a TPU mesh.

Reference parity: the reference decoder is single-stream (SURVEY.md §2);
the TPU-native scale-out axis is DATA PARALLELISM over independent streams:
host entropy parses each stream (embarrassingly parallel across host cores),
frames are grouped into lockstep batches, and one jitted sharded
reconstruction step runs with the batch axis sharded over the `stream` mesh
(ICI, no cross-chip collectives in the decode path).

Streams in a batch must share resolution (one compiled pipeline per
geometry); DPB slots are per-stream.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import Decoder, Frame
from ..models.pipeline import ABI_DEVICE_KEYS


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

    def decode(self, streams: list[bytes]) -> list[list[Frame]]:
        """Decode each Annex-B stream; returns per-stream frame lists.

        v1 semantics: per-stream decode loops share the device via the
        per-resolution jitted pipeline; the sharded lockstep path is
        exercised by decode_batch_lockstep below (used by bench/dryrun).
        """
        return [list(d.decode_annexb(s))
                for d, s in zip(self.decoders, streams)]


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
