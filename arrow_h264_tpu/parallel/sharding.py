"""Multi-stream / multi-chip decode sharding (SURVEY.md §2 parallelism).

The decode dataflow is embarrassingly parallel across streams: every kernel
takes [B, ...] MB tensors, and the batch axis shards across chips via a 1-D
`stream` mesh.  No cross-chip collectives exist in the decode path — the
only transport is the host->HBM MB-tensor upload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pipeline import decode_frame_fn


def make_stream_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), ("stream",))


def batched_decode_fn(mb_w: int, mb_h: int, ws4, ws8, cqp_off):
    """vmapped decode over (abi, dpb_y, dpb_cb, dpb_cr), batch = streams."""
    fn = functools.partial(decode_frame_fn, mb_w=mb_w, mb_h=mb_h,
                           ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8),
                           cqp_off=cqp_off)
    return jax.vmap(fn)


def sharded_decode_fn(mesh: Mesh, mb_w: int, mb_h: int, ws4, ws8,
                      cqp_off=(0, 0)):
    """jit the batched decode with the stream batch sharded over the mesh."""
    fn = batched_decode_fn(mb_w, mb_h, ws4, ws8, cqp_off)
    shard = NamedSharding(mesh, P("stream"))
    return jax.jit(fn, in_shardings=(shard, shard, shard, shard),
                   out_shardings=shard)
