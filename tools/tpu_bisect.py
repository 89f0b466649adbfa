"""Bisect the on-chip TPU worker crash seen in bench stages at batch=8.

Each probe runs ONE suspect component on the real TPU; `python
tools/tpu_bisect.py` drives every probe in its own subprocess (a kernel
fault kills the worker process, so probes must be isolated) and prints a
pass/fail table.  `python tools/tpu_bisect.py PROBE` runs one inline.

Observed (2026-08-18, /tmp/bench_r4.log): bench stages device_intra_fps
(B=8, all-intra) and device_patch_fps (B=8, pl0p) crash the TPU worker
("kernel fault"); device_recon_fps (B=32, pl0) passes.  Suspects: the
phase-batched intra/deblock kernels at B=8 (128-lane blocks) — which
would also break single-stream decode (B0=1 pads to B=8).
"""

from __future__ import annotations

import functools
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MB_W, MB_H = 120, 68


def _planes(B, mb_w=MB_W, mb_h=MB_H, seed=0):
    import numpy as np
    H, W = mb_h * 16, mb_w * 16
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    cb = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    cr = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    return y, cb, cr


def probe_intra(B, mb_w=MB_W, mb_h=MB_H):
    import jax.numpy as jnp
    import numpy as np
    from arrow_h264_tpu.models.pipeline import INTRA_ABI_KEYS
    from arrow_h264_tpu.ops.pallas.intra_phase import intra_phase_batch
    from arrow_h264_tpu.ops.synthetic import synthetic_abi
    hosts = [synthetic_abi(mb_w, mb_h, seed=i) for i in range(B)]
    abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
             for k in INTRA_ABI_KEYS}
    y, cb, cr = _planes(B, mb_w, mb_h)
    z = jnp.zeros_like(jnp.asarray(y))
    zc = jnp.zeros_like(jnp.asarray(cb))
    yo, cbo, cro = intra_phase_batch(
        abi_b, z, zc, zc, jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
        mb_w, mb_h)
    print("intra ok", int(jnp.sum(yo.astype(jnp.uint32))),
          int(jnp.sum(cbo.astype(jnp.uint32))))


def probe_deblock(B, mb_w=MB_W, mb_h=MB_H):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from arrow_h264_tpu.ops.deblock import deblock_tables
    from arrow_h264_tpu.ops.pallas.deblock_phase import deblock_phase_batch
    from arrow_h264_tpu.ops.synthetic import synthetic_abi
    hosts = [synthetic_abi(mb_w, mb_h, seed=i) for i in range(B)]
    tabs = [jax.jit(functools.partial(deblock_tables, mb_w=mb_w, mb_h=mb_h,
                                      cqp_off=(0, 0)))(dict(h))
            for h in hosts]   # plain dict: FrameABI is not a pytree
    tb = {k: jnp.stack([t[k] for t in tabs]) for k in tabs[0]}
    y, cb, cr = _planes(B, mb_w, mb_h)
    yo, cbo, cro = deblock_phase_batch(
        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr), tb, mb_w, mb_h)
    print("deblock ok", int(jnp.sum(yo.astype(jnp.uint32))))


def probe_mc(B, mb_w=MB_W, mb_h=MB_H, mode="pl0"):
    import jax.numpy as jnp
    import numpy as np
    from arrow_h264_tpu.models.pipeline import (
        ABI_DEVICE_KEYS, _mc_pred_batch, dpb_alloc, select_inter_mode,
        store_ref_fn,
    )
    import jax
    from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
    n_slots = 2
    hosts, sls = [], []
    for i in range(B):
        abi = synthetic_abi_p(mb_w, mb_h, seed=i, n_slots=n_slots)
        if mode.endswith("p"):
            # mirror bench_device_patch: 5% wild out-of-envelope MVs so
            # the hybrid patch repair actually engages
            rng = np.random.default_rng(77 + i)
            n = mb_w * mb_h
            wild = rng.random((n, 4, 4)) < 0.05
            wmv = rng.integers(-512, 512, (n, 4, 4, 2, 2)).astype(np.int32)
            abi["mv"] = np.where(wild[..., None, None], wmv, abi["mv"])
        m, sl, patch = select_inter_mode(abi, mb_w, mb_h)
        if mode.endswith("p"):
            assert m.endswith("p"), m
            mode = m
        abi["patch"] = patch
        hosts.append(abi)
        sls.append(sl)
    abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
             for k in ABI_DEVICE_KEYS}
    rng = np.random.default_rng(1)
    store = jax.jit(store_ref_fn, donate_argnums=(0, 1))
    H, W = mb_h * 16, mb_w * 16
    dpbs = []
    for i in range(B):
        dpb = dpb_alloc(mb_w, mb_h, n_slots)
        for s in range(n_slots):
            dpb = store(*dpb, s,
                        jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)),
                        jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                                 np.uint8)),
                        jnp.asarray(rng.integers(0, 256, (H // 2, W // 2),
                                                 np.uint8)))
        dpbs.append(dpb)
    dpb_y = jnp.stack([d[0] for d in dpbs])
    dpb_c = jnp.stack([d[1] for d in dpbs])
    slots = jnp.asarray(np.stack(sls))
    preds = _mc_pred_batch(abi_b, dpb_y, dpb_c, slots, mb_w=mb_w, mb_h=mb_h,
                           inter_mode=mode)
    print("mc ok", int(jnp.sum(preds[0].astype(jnp.uint32))))


PROBES = {
    "intra_b8": lambda: probe_intra(8),
    "intra_b16": lambda: probe_intra(16),
    "intra_b32": lambda: probe_intra(32),
    "intra_b8_qcif": lambda: probe_intra(8, 11, 9),
    "intra_b8_vga": lambda: probe_intra(8, 40, 30),
    "intra_b8_720p": lambda: probe_intra(8, 80, 45),
    "deblock_b8": lambda: probe_deblock(8),
    "deblock_b32": lambda: probe_deblock(32),
    "mc_b8": lambda: probe_mc(8),
    "mc_b32": lambda: probe_mc(32),
    "mc_b8_pl0p": lambda: probe_mc(8, mode="pl0p"),
    "mc_b32_pl0p": lambda: probe_mc(32, mode="pl0p"),
}

# Hang bisection (VERDICT r4 #3): each entry re-runs an intra probe with
# the wide-geometry lane pad DISABLED (ARROW_H264_INTRA_MINB=8) and part
# of the kernel compiled out (ARROW_H264_INTRA_DEBUG) — run
# `python tools/tpu_bisect.py --hang` on the chip; the narrowest failing
# component pins the Mosaic-level trigger.  Geometry mb_h=8 keeps each
# probe's compile small; mb_w sweeps the width threshold (pad engages at
# mb_w>=40 in production).
HANG_ENV = {"ARROW_H264_INTRA_MINB": "8"}
HANG_PROBES = {
    # width sweep, full kernel
    "hang_w32": ({}, lambda: probe_intra(8, 32, 8)),
    "hang_w40": ({}, lambda: probe_intra(8, 40, 8)),
    "hang_w64": ({}, lambda: probe_intra(8, 64, 8)),
    "hang_w120": ({}, lambda: probe_intra(8, 120, 8)),
    "hang_1080p": ({}, lambda: probe_intra(8, 120, 68)),
    # component skips at the smallest failing width
    "hang_noluma": ({"ARROW_H264_INTRA_DEBUG": "noluma"},
                    lambda: probe_intra(8, 120, 8)),
    "hang_nochroma": ({"ARROW_H264_INTRA_DEBUG": "nochroma"},
                      lambda: probe_intra(8, 120, 8)),
    "hang_noi4": ({"ARROW_H264_INTRA_DEBUG": "noi4"},
                  lambda: probe_intra(8, 120, 8)),
    "hang_noi8": ({"ARROW_H264_INTRA_DEBUG": "noi8"},
                  lambda: probe_intra(8, 120, 8)),
    "hang_noi16": ({"ARROW_H264_INTRA_DEBUG": "noi16"},
                   lambda: probe_intra(8, 120, 8)),
    "hang_dma_only": ({"ARROW_H264_INTRA_DEBUG": "noi16,noi4,noi8"},
                      lambda: probe_intra(8, 120, 8)),
}


def main():
    import os
    if "--hang" in sys.argv:
        import time
        for name, (env, _fn) in HANG_PROBES.items():
            e = dict(os.environ, **HANG_ENV, **env)
            try:
                r = subprocess.run([sys.executable, __file__, name],
                                   timeout=900, capture_output=True,
                                   text=True, env=e)
                ok = r.returncode == 0
                tail = (r.stdout.strip().splitlines() or [""])[-1] if ok \
                    else (r.stderr.strip().splitlines() or [""])[-1][-160:]
            except subprocess.TimeoutExpired:
                ok, tail = False, "TIMEOUT/HANG"
            print(f"{name:16s} {'PASS' if ok else 'FAIL'}  {tail}",
                  flush=True)
            if not ok:
                print("# hang/crash; 75s cooldown", flush=True)
                time.sleep(75)
        return
    if len(sys.argv) > 1:
        name = sys.argv[1]
        if name in HANG_PROBES:
            HANG_PROBES[name][1]()
            return
        PROBES[name]()
        return
    import time
    for name in PROBES:
        try:
            r = subprocess.run([sys.executable, __file__, name],
                               timeout=1200, capture_output=True, text=True)
            ok = r.returncode == 0
            tail = (r.stdout.strip().splitlines() or [""])[-1] if ok \
                else (r.stderr.strip().splitlines() or [""])[-1][-160:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "TIMEOUT"
        print(f"{name:16s} {'PASS' if ok else 'FAIL'}  {tail}", flush=True)
        if not ok and "crashed" in tail:
            # a kernel fault kills the TPU worker; give it time to
            # restart so the NEXT probe measures itself, not the corpse
            print("# worker crash; 75s cooldown", flush=True)
            time.sleep(75)


if __name__ == "__main__":
    main()
