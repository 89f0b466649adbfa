"""Per-stage 1080p timing on the TPU (devtime slope timing — block_until_ready
lies on the axon backend, see tools/devtime.py)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from arrow_h264_tpu.models.pipeline import ABI_DEVICE_KEYS, dpb_alloc, store_ref_fn
from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
from arrow_h264_tpu.ops.transforms import make_ws_consts, residual_planes
from arrow_h264_tpu.ops.pallas.mc_kernel import inter_predict_pallas
from arrow_h264_tpu.ops.pallas.intra_kernel import intra_reconstruct_pallas
from arrow_h264_tpu.ops.pallas.deblock_phase import deblock_phase_batch
from arrow_h264_tpu.ops.deblock import deblock_tables
from arrow_h264_tpu.ops.inter import halfpel_planes

mb_w, mb_h = 120, 68
H, W = mb_h * 16, mb_w * 16
ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
ws4 = jnp.asarray(ws4)
ws8 = jnp.asarray(ws8)
host = synthetic_abi_p(mb_w, mb_h, seed=0)
abi = {k: jnp.asarray(host[k]) for k in ABI_DEVICE_KEYS}
rng = np.random.default_rng(0)
dpb = dpb_alloc(mb_w, mb_h, 2)
store = jax.jit(store_ref_fn, donate_argnums=(0, 1))
yref = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
cbref = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
for s in range(2):
    dpb = store(*dpb, s, yref, cbref, cbref)
slots = jnp.asarray(np.array([0, 1, -1, -1], np.int32))


from tools.devtime import devtime  # noqa: E402


def timeit(name, fn, *args):
    dt = devtime(fn, *args)
    print(f"{name:28s} {dt*1e3:8.2f} ms/frame", flush=True)
    return jax.jit(fn)(*args)


f_res = jax.jit(functools.partial(residual_planes, mb_w=mb_w, mb_h=mb_h,
                                  ws4=ws4, ws8=ws8, cqp_off=(0, 0)))
res = timeit("residual_planes", f_res, abi)

f_mc = jax.jit(functools.partial(inter_predict_pallas, mb_w=mb_w, mb_h=mb_h,
                                 lists=(0,)))
pred = timeit("inter_predict_pallas l0", f_mc, abi, dpb[0], dpb[1], slots)

init_y = jnp.clip(pred[0] + res[0], 0, 255)
init_cb = jnp.clip(pred[1] + res[1], 0, 255)
init_cr = jnp.clip(pred[2] + res[2], 0, 255)
f_intra = jax.jit(functools.partial(intra_reconstruct_pallas,
                                    mb_w=mb_w, mb_h=mb_h))
y3 = timeit("intra_pallas (5% intra)", f_intra, abi, *res,
            init_y, init_cb, init_cr)

f_tab = jax.jit(functools.partial(deblock_tables, mb_w=mb_w, mb_h=mb_h,
                                  cqp_off=(0, 0)))
tables = timeit("deblock_tables (XLA)", f_tab, abi)
f_db = jax.jit(functools.partial(deblock_phase_batch, mb_w=mb_w, mb_h=mb_h))
tb1 = {k: v[None] for k, v in tables.items()}
timeit("deblock_phase (B=1)", f_db, y3[0][None], y3[1][None], y3[2][None], tb1)

f_store = jax.jit(functools.partial(store_ref_fn))
timeit("store_ref (halfpel+pack)", f_store, *dpb, 0, yref, cbref, cbref)
