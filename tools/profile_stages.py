"""Per-stage 1080p timing on the TPU at batch=B (devtime slope timing —
block_until_ready lies on the axon backend, see tools/devtime.py).

Splits the MC stage into its XLA prep (per-band candidate-list build —
contains a device sort), the Pallas kernels, and the weighted combine,
so the "move prep to host?" question is answerable with numbers.

    python tools/profile_stages.py [B]      # default B=8
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from arrow_h264_tpu.models.pipeline import (
    ABI_DEVICE_KEYS, INTRA_ABI_KEYS, decode_frames_batch_fn, dpb_alloc,
    resolve_weights, store_ref_fn,
)
from arrow_h264_tpu.ops.deblock import deblock_tables
from arrow_h264_tpu.ops.pallas.deblock_phase import deblock_phase_batch
from arrow_h264_tpu.ops.pallas.intra_phase import intra_phase_batch
from arrow_h264_tpu.ops.pallas.mc_kernel import (
    inter_predict_pallas_batch, mc_luma_pallas_batch, mc_prepare_chroma,
    mc_prepare_luma,
)
from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
from arrow_h264_tpu.ops.transforms import make_ws_consts, residual_planes
from tools.devtime import devtime

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
mb_w, mb_h = 120, 68
H, W = mb_h * 16, mb_w * 16
n_slots = 2
ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
ws4 = jnp.asarray(ws4)
ws8 = jnp.asarray(ws8)
hosts = [synthetic_abi_p(mb_w, mb_h, seed=i, n_slots=n_slots)
         for i in range(B)]
abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
         for k in ABI_DEVICE_KEYS}
rng = np.random.default_rng(0)
store = jax.jit(store_ref_fn, donate_argnums=(0, 1))
dpbs = []
for i in range(B):
    dpb = dpb_alloc(mb_w, mb_h, n_slots)
    for s in range(n_slots):
        dpb = store(*dpb, s,
                    jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)),
                    jnp.asarray(rng.integers(0, 256,
                                             (H // 2, W // 2), np.uint8)),
                    jnp.asarray(rng.integers(0, 256,
                                             (H // 2, W // 2), np.uint8)))
    dpbs.append(dpb)
dpb_y = jnp.stack([d[0] for d in dpbs])
dpb_c = jnp.stack([d[1] for d in dpbs])
slots_b = jnp.broadcast_to(
    jnp.asarray(np.array([0, 1, -1, -1], np.int32)), (B, 4)) + 0


def timeit(name, fn, *args):
    dt = devtime(fn, *args)
    print(f"{name:32s} {dt / B * 1e3:8.3f} ms/frame "
          f"({dt * 1e3:7.2f} ms/batch of {B})", flush=True)
    return jax.jit(fn)(*args)


f_res = jax.jit(jax.vmap(functools.partial(
    residual_planes, mb_w=mb_w, mb_h=mb_h, ws4=ws4, ws8=ws8,
    cqp_off=(0, 0))))
res = timeit("residual_planes (vmap)", f_res, abi_b)

mv_rs = {"mv": abi_b["mv"], "refslot": abi_b["refslot"]}
f_prep = jax.jit(jax.vmap(
    lambda a, s: mc_prepare_luma(a, mb_w, mb_h, s, 0)))
prep = timeit("mc_prepare_luma (sort)", f_prep, mv_rs, slots_b)
f_prepc = jax.jit(jax.vmap(
    lambda a, s: mc_prepare_chroma(a, mb_w, mb_h, s, 0)))
timeit("mc_prepare_chroma (sort)", f_prepc, mv_rs, slots_b)

f_mck = jax.jit(functools.partial(mc_luma_pallas_batch,
                                  mb_w=mb_w, mb_h=mb_h))
timeit("mc_luma kernel", f_mck, dpb_y, *prep, slots_b)

abi_w = jax.jit(jax.vmap(resolve_weights))(abi_b)
sub = {k: abi_w[k] for k in ("mv", "refslot", "wp", "logwd")}
f_mc = jax.jit(functools.partial(inter_predict_pallas_batch,
                                 mb_w=mb_w, mb_h=mb_h, lists=(0,)))
pred = timeit("inter_predict full l0", f_mc, sub, dpb_y, dpb_c, slots_b)

init_y = jnp.clip(pred[0] + res[0], 0, 255)
init_cb = jnp.clip(pred[1] + res[1], 0, 255)
init_cr = jnp.clip(pred[2] + res[2], 0, 255)
abi_i = {k: abi_b[k] for k in INTRA_ABI_KEYS}
f_intra = jax.jit(functools.partial(intra_phase_batch, mb_w=mb_w, mb_h=mb_h))
y3 = timeit("intra_phase_batch (5% intra)", f_intra, abi_i, *res,
            init_y, init_cb, init_cr)

f_tab = jax.jit(jax.vmap(functools.partial(
    deblock_tables, mb_w=mb_w, mb_h=mb_h, cqp_off=(0, 0))))
tables = timeit("deblock_tables (XLA vmap)", f_tab, abi_b)
f_db = jax.jit(functools.partial(deblock_phase_batch, mb_w=mb_w, mb_h=mb_h))
timeit("deblock_phase", f_db, *y3, tables)

f_store = jax.jit(jax.vmap(store_ref_fn))
timeit("store_ref (vmap halfpel+pack)", f_store, dpb_y, dpb_c,
       jnp.zeros((B,), jnp.int32),
       y3[0].astype(jnp.uint8), y3[1].astype(jnp.uint8),
       y3[2].astype(jnp.uint8))

# free every per-stage output before the full-pipeline probe: at B=32
# 1080p the retained intermediates (preds, residuals, initials, tables)
# exhaust HBM alongside the full graph's own live set (observed r4)
del prep, pred, res, init_y, init_cb, init_cr, y3, tables, abi_w, sub, abi_i

f_all = jax.jit(functools.partial(
    decode_frames_batch_fn, mb_w=mb_w, mb_h=mb_h, ws4=ws4, ws8=ws8,
    cqp_off=(0, 0), n_streams=B, inter_mode="pl0"))
timeit("decode_frames_batch (full)", f_all, abi_b, dpb_y, dpb_c, slots_b)
