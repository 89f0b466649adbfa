"""Benchmark: batched 1080p P-frame reconstruction throughput on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1000 decoded 1080p frames/sec/chip.

Measures the device reconstruction pipeline (residual + Pallas MC +
intra + Pallas deblock) on 1080p P-frame MB tensors (~95% inter MBs with a
realistic MV palette, sparse residuals — the workload class that dominates
real streams), over a batch of independent streams sharing the chip.  Host
entropy decode runs on CPU cores concurrently and is excluded here; see
bench_host.py and README Performance.
"""

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from arrow_h264_tpu.models.pipeline import (
    ABI_DEVICE_KEYS, decode_frame_fn, dpb_alloc, store_ref_fn,
)
from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
from arrow_h264_tpu.ops.transforms import make_ws_consts


def main() -> None:
    mb_w, mb_h = 120, 68           # 1920x1088
    batch = 4
    n_slots = 2
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    fn = jax.jit(functools.partial(
        decode_frame_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0),
        inter_mode="pl0"))
    abis = []
    for i in range(batch):
        host = synthetic_abi_p(mb_w, mb_h, seed=i, n_slots=n_slots)
        abis.append({k: jnp.asarray(host[k]) for k in ABI_DEVICE_KEYS})
    H, W = mb_h * 16, mb_w * 16
    rng = np.random.default_rng(0)
    store = jax.jit(store_ref_fn, donate_argnums=(0, 1))
    dpbs = []
    for i in range(batch):
        dpb = dpb_alloc(mb_w, mb_h, n_slots)
        for s in range(n_slots):
            y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
            cb = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
            cr = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
            dpb = store(*dpb, s, y, cb, cr)
        dpbs.append(dpb)
    slots = jnp.asarray(np.array([0, 1, -1, -1], np.int32))
    # compile + warmup
    outs = [fn(abis[i], *dpbs[i], slots) for i in range(batch)]
    jax.block_until_ready(outs)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [fn(abis[i], *dpbs[i], slots) for i in range(batch)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(json.dumps({
        "metric": "1080p P-frame device reconstruction frames/sec/chip "
                  "(batch=4 streams)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
