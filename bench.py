"""Benchmark: batched 1080p P-frame reconstruction throughput on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1000 decoded 1080p frames/sec/chip.

Measures the BATCHED device reconstruction pipeline
(models.pipeline.decode_frames_batch_fn: per-stream residual + Pallas MC
+ intra, one lane-packed knight-phase deblock across the whole batch) on
1080p P-frame MB tensors (~95% inter MBs, realistic MV palette, sparse
residuals), B concurrent streams on one chip — the config-5 workload.
Host entropy runs concurrently on CPU cores (see bench_host.py).

Timing uses tools.devtime (chained iterations + host readback): on this
tunneled backend block_until_ready returns before execution completes,
so naive wall-clocks measure dispatch, not device time.
"""

import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from arrow_h264_tpu.models.pipeline import (
    ABI_DEVICE_KEYS, decode_frames_batch_fn, dpb_alloc, store_ref_fn,
)
from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
from arrow_h264_tpu.ops.transforms import make_ws_consts
from tools.devtime import devtime


def main() -> None:
    mb_w, mb_h = 120, 68           # 1920x1088
    batch = 32
    n_slots = 2
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    fn = functools.partial(
        decode_frames_batch_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0),
        n_streams=batch, inter_mode="pl0")
    abi_b = {}
    hosts = [synthetic_abi_p(mb_w, mb_h, seed=i, n_slots=n_slots)
             for i in range(batch)]
    for k in ABI_DEVICE_KEYS:
        abi_b[k] = jnp.asarray(np.stack([h[k] for h in hosts]))
    H, W = mb_h * 16, mb_w * 16
    rng = np.random.default_rng(0)
    store = jax.jit(store_ref_fn, donate_argnums=(0, 1))
    dpbs = []
    for i in range(batch):
        dpb = dpb_alloc(mb_w, mb_h, n_slots)
        for s in range(n_slots):
            dpb = store(
                *dpb, s,
                jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8)),
                jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8)))
        dpbs.append(dpb)
    dpb_y = jnp.stack([d[0] for d in dpbs])
    dpb_c = jnp.stack([d[1] for d in dpbs])
    slots = jnp.broadcast_to(
        jnp.asarray(np.array([0, 1, -1, -1], np.int32)), (batch, 4))
    t = devtime(fn, abi_b, dpb_y, dpb_c, slots, n1=2, n2=6)
    fps = batch / t
    print(json.dumps({
        "metric": "1080p P-frame device reconstruction frames/sec/chip "
                  f"(batch={batch} streams)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
