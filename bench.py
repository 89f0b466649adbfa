"""Benchmark: batched frame reconstruction throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1000 decoded 1080p frames/sec/chip.

Measures the device reconstruction pipeline (residual + inter MC + intra
wavefront + Pallas deblock) on 1080p I-frame MB tensors (worst case for the
wavefront stages), batched over streams.  Host entropy decode runs on CPU
cores concurrently (cpp/entropy.cpp, ~15 fps/core at dense 1080p CABAC) and
is excluded here; see README Performance.
"""

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from arrow_h264_tpu.models.pipeline import ABI_DEVICE_KEYS, decode_frame_fn
from arrow_h264_tpu.ops.synthetic import synthetic_abi
from arrow_h264_tpu.ops.transforms import make_ws_consts


def main() -> None:
    mb_w, mb_h = 120, 68           # 1920x1088
    batch = 4
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    fn = jax.jit(jax.vmap(functools.partial(
        decode_frame_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0))))
    host = {}
    for k in ABI_DEVICE_KEYS:
        arrs = [synthetic_abi(mb_w, mb_h, seed=i)[k] for i in range(batch)]
        host[k] = np.stack(arrs)
    abi = {k: jnp.asarray(v) for k, v in host.items()}
    from arrow_h264_tpu.ops.inter import PAD
    H, W = mb_h * 16, mb_w * 16
    dpb = (jnp.zeros((batch, 2, 4, H + 2 * PAD, W + 2 * PAD), jnp.uint8),
           jnp.zeros((batch, 2, H // 2 + PAD, W // 2 + PAD), jnp.uint8),
           jnp.zeros((batch, 2, H // 2 + PAD, W // 2 + PAD), jnp.uint8))
    # compile + warmup
    y, cb, cr = fn(abi, *dpb)
    y.block_until_ready()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y, cb, cr = fn(abi, *dpb)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(json.dumps({
        "metric": "1080p I-frame device reconstruction frames/sec/chip (batch=4)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
