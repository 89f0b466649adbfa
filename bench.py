"""Benchmark: END-TO-END batched 1080p decode throughput on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): >= 1000 decoded 1080p frames/sec/chip.

The headline measures the BINDING metric — decoded frames per second
through `parallel.batch.BatchDecoder` on real x264-encoded 1080p
High/CABAC streams: host C++ entropy parse -> ABI upload -> sharded
batched reconstruction (Pallas MC/intra/deblock) -> reference store ->
output emission, wall-clocked end-to-end with every output frame
materialized on the host (the emission readback is a real device sync,
so the axon block_until_ready issue does not apply).

Extra JSON fields report the two halves separately:
  device_recon_fps  — device-only reconstruction throughput on synthetic
                      1080p P-frame ABIs at batch=32 (tools.devtime
                      chained-slope timing; the round-2 headline metric).
  host_parse_fps    — the host entropy side alone for the same streams
                      (this 1-core box; parse scales linearly in cores
                      via BatchDecoder's parse thread pool).
  stream_kbit_per_frame — honesty: the measured stream density.

Content: tools/streams.make_content at noise=3, High profile qp=30,
bf=2 refs=4 — broadcast-grade ~5-15 Mbps 1080p, not the adversarial
~100 Mbps noise streams (bench_host.py reports that case).
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

W, H = 1920, 1088
N_SRC = 4            # distinct encoded streams
# 12 frames/stream (r4 used 24): the materialized e2e stage is link-bound
# on this rig (~2-4 fps through the axon tunnel), so the frame count sets
# the stage wall-clock almost linearly — 384 frames keeps the timed pass
# inside the driver's capture window while still spanning IDR+P+B rounds.
N_FRAMES = 12        # frames per stream
BATCH = 32           # concurrent lanes (each source used BATCH//N_SRC times)

# Global wall-clock budget for the whole bench (VERDICT r4 #1: the driver's
# capture window timed out with NO parseable output).  run_all_stages stops
# scheduling stages when the budget is nearly spent, and main() emits a
# cumulative headline line after EVERY stage, so a hard kill at any point
# still leaves a parseable JSON line in the output tail.
BUDGET_S = float(os.environ.get("ARROW_BENCH_BUDGET_S", "2700"))
T0 = time.time()


def _remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def make_streams():
    from tools import streams
    paths = []
    for s in range(N_SRC):
        path = f"/tmp/bench_e2e_1080p_s{s}_f{N_FRAMES}.264"
        if not os.path.exists(path):
            yuv = streams.make_content(W, H, N_FRAMES, seed=100 + s, noise=3)
            opts = ["profile=high", "qp=30", "g=250", "bf=2", "refs=4",
                    "keyint_min=250",
                    "x264-params=cabac=1:8x8dct=1:weightp=2:weightb=1:"
                    "b-pyramid=0:" + streams.X264_COMMON]
            streams.encode(yuv, W, H, path, opts)
        paths.append(path)
    return [open(p, "rb").read() for p in paths]


def _truncate_aus(data: bytes, k: int) -> bytes:
    """First k access units (single-slice streams): parameter sets plus
    the first k VCL NALs — a short warmup prefix that still touches
    every pipeline mode (I round, P rounds, B rounds)."""
    from arrow_h264_tpu.bitstream.nal import split_annexb
    out, vcl = [], 0
    for ebsp in split_annexb(data):          # payloads, header byte first
        t = ebsp[0] & 0x1F
        if t in (1, 5):
            vcl += 1
            if vcl > k:
                break
        out.append(b"\x00\x00\x00\x01" + ebsp)
    return b"".join(out)


def bench_e2e(datas):
    from arrow_h264_tpu.parallel.batch import BatchDecoder
    lanes = [datas[i % N_SRC] for i in range(BATCH)]
    # warmup/compile pass: a short prefix per lane (same geometry and
    # mode sequence; the persisted sticky specs keep the jitted
    # structures identical to the full run, so the timed pass compiles
    # nothing) — the materialized warmup decode is link-bound on this
    # rig, so frame count is wall-clock
    warm_lanes = [_truncate_aus(d, 6) for d in lanes]
    bd = BatchDecoder(n_streams=BATCH)
    t0 = time.perf_counter()
    frames = bd.decode(warm_lanes)
    warm_s = time.perf_counter() - t0
    n = sum(len(f) for f in frames)
    errs = [e for e in bd.errors if e is not None]
    assert not errs, errs[:2]
    assert n == BATCH * 6, (n, BATCH)
    # free the warmup decoder's batched DPB (2+ GB at batch=32 1080p)
    # BEFORE the timed decoder allocates its own — both alive at once
    # OOMed the worker (observed 2026-08-20 attempt 1)
    frames = bd = None
    # timed pass, everything warm
    bd = BatchDecoder(n_streams=BATCH)
    t0 = time.perf_counter()
    frames = bd.decode(lanes)
    dt = time.perf_counter() - t0
    n = sum(len(f) for f in frames)
    assert n == BATCH * N_FRAMES, (n, BATCH, N_FRAMES)
    return n / dt, warm_s, dt


def bench_e2e_device_resident(datas):
    """Same end-to-end decode, but output frames stay HBM-resident
    (BatchDecoder(materialize=False)) — the natural TPU-native consumer
    is another device model (or a device encoder), not a host YUV dump.
    A device checksum over EVERY output frame forces the whole pipeline
    to have executed; only the (tiny) checksum crosses the link."""
    import jax.numpy as jnp
    from arrow_h264_tpu.parallel.batch import BatchDecoder
    lanes = [datas[i % N_SRC] for i in range(BATCH)]
    sums = []
    chk_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.uint32)))

    def consume(i, f):
        # streaming consumer: checksum the frame on device the moment
        # it is emitted, then DROP the planes — holding every output
        # frame HBM-resident to the end OOMs (observed r4: 32 lanes x
        # 24 frames x 1080p on top of the DPB + recon intermediates).
        # One jitted program (not op-by-op), and a one-scalar readback
        # every BATCH frames: with no materialization the host otherwise
        # runs arbitrarily far ahead and the axon tunnel chokes on the
        # unbounded dispatch queue (observed 2026-08-19/20: this stage
        # hung in wait_woken while the materialized e2e ran clean — the
        # periodic sync is the back-pressure the d2h copies provide
        # in materialized mode).
        sums.append(chk_fn(f.y))
        if len(sums) % BATCH == 0:
            # cross-lane reduction so the sync drains every shard's
            # dispatch queue, not just the lane holding sums[-1]
            # (ADVICE r4: one-lane checksum under-drains a pod slice)
            int(jnp.sum(jnp.stack(sums[-BATCH:])))
        return None

    # warmup decode first (compiles; the resident path traces its own
    # program variants — a single cold pass reports compile time, not
    # throughput), then the timed pass everything-warm
    bd = BatchDecoder(n_streams=BATCH, materialize=False,
                      on_frame=consume)
    frames = bd.decode(lanes)
    int(jnp.sum(jnp.stack(sums)))
    n = sum(len(f) for f in frames)
    assert n == BATCH * N_FRAMES, (n, BATCH, N_FRAMES)
    sums.clear()
    frames = bd = None          # free the warmup DPB before reallocating
    bd = BatchDecoder(n_streams=BATCH, materialize=False,
                      on_frame=consume)
    t0 = time.perf_counter()
    frames = bd.decode(lanes)
    chk = int(jnp.sum(jnp.stack(sums)))         # sync: all frames decoded
    dt = time.perf_counter() - t0
    n = sum(len(f) for f in frames)
    assert n == BATCH * N_FRAMES, (n, BATCH, N_FRAMES)
    assert len(sums) == n
    return n / dt, chk


def bench_tunnel_bw():
    """Measured device->host link bandwidth (GB/s) for one 1080p-frame-
    sized plane batch, so the gap between the two e2e numbers is
    attributable: on a production TPU host (PCIe, ~10+ GB/s) the
    materialized number converges to the device-resident one."""
    import jax.numpy as jnp
    x = jnp.ones((BATCH, H, W), jnp.uint8) + 0
    np.asarray(x[0, 0, 0])          # force materialization on device
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    return x.nbytes / dt / 1e9


def bench_host(datas):
    """Host side alone: the full per-lane pipeline BatchDecoder runs in
    its parse pool (C++ parse + ABI pack + MC-mode select + wire pack +
    commit bookkeeping), no device."""
    from arrow_h264_tpu.api import Decoder
    from arrow_h264_tpu.models.pipeline import select_inter_mode
    from arrow_h264_tpu.ops.wire import (
        emit_wire, merge_specs, pack_wire_raw, spec_class,
    )
    zero = (np.zeros((H, W), np.uint8), np.zeros((H // 2, W // 2), np.uint8),
            np.zeros((H // 2, W // 2), np.uint8))
    n = 0
    t0 = time.perf_counter()
    for data in datas:
        dec = Decoder(entropy="cpp")
        spec_sticky: dict = {}
        for pic, poc in dec.parse_pictures(data):
            mb_w = pic.sps.pic_width_in_mbs
            mb_h = pic.sps.pic_height_in_map_units
            abi = dec.pack_abi(pic, poc)
            _mode, _sl, patch = select_inter_mode(abi, mb_w, mb_h)
            abi["patch"] = patch
            raw, spec = pack_wire_raw(abi, mb_w, mb_h)
            cls = spec_class(spec)
            spec_sticky[cls] = spec if cls not in spec_sticky \
                else merge_specs([spec_sticky[cls], spec])
            emit_wire(raw, spec, spec_sticky[cls], mb_w * mb_h)
            list(dec.commit(pic, poc, *zero, 4, lambda *a: None))
            n += 1
    return n / (time.perf_counter() - t0)


def bench_device_only():
    from arrow_h264_tpu.models.pipeline import (
        ABI_DEVICE_KEYS, decode_frames_batch_fn, dpb_alloc, store_ref_fn,
    )
    from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
    from arrow_h264_tpu.ops.transforms import make_ws_consts
    from tools.devtime import devtime
    mb_w, mb_h = 120, 68
    batch = 32
    n_slots = 2
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    fn = functools.partial(
        decode_frames_batch_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0),
        n_streams=batch, inter_mode="pl0")
    hosts = [synthetic_abi_p(mb_w, mb_h, seed=i, n_slots=n_slots)
             for i in range(batch)]
    abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
             for k in ABI_DEVICE_KEYS}
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
    return batch / t


def bench_device_intra():
    """All-intra 1080p device reconstruction (the phase-batched intra
    kernel path, inter_mode="none") at batch=32 — the shipping
    BatchDecoder batch.  (batch=8 at 1080p faulted the TPU worker on
    2026-08-19 — a narrow-lane kernel corner under investigation; the
    same kernel at the 32-lane shipping width ran clean inside the
    device_recon stage.)"""
    from arrow_h264_tpu.models.pipeline import (
        ABI_DEVICE_KEYS, decode_frames_batch_fn, dpb_alloc,
    )
    from arrow_h264_tpu.ops.synthetic import synthetic_abi
    from arrow_h264_tpu.ops.transforms import make_ws_consts
    from tools.devtime import devtime
    mb_w, mb_h = 120, 68
    batch = 32
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    fn = functools.partial(
        decode_frames_batch_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0),
        n_streams=batch, inter_mode="none")
    hosts = [synthetic_abi(mb_w, mb_h, seed=i) for i in range(batch)]
    abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
             for k in ABI_DEVICE_KEYS}
    dpb = dpb_alloc(mb_w, mb_h, 1)
    dpb_y = jnp.broadcast_to(dpb[0][None], (batch,) + dpb[0].shape) + 0
    dpb_c = jnp.broadcast_to(dpb[1][None], (batch,) + dpb[1].shape) + 0
    slots = jnp.broadcast_to(
        jnp.asarray(np.array([-1, -1, -1, -1], np.int32)), (batch, 4))
    t = devtime(fn, abi_b, dpb_y, dpb_c, slots, n1=2, n2=6)
    return batch / t


def bench_device_patch():
    """Adversarial MC: 5% of cells get random +-128-px MVs (outside the
    Pallas envelope).  The hybrid path runs the kernel with those cells
    masked and repairs exactly them with the XLA gather pass — measures
    the round-2 "gather cliff" replacement at 1080p batch=8."""
    from arrow_h264_tpu.models.pipeline import (
        ABI_DEVICE_KEYS, decode_frames_batch_fn, dpb_alloc,
        select_inter_mode, store_ref_fn,
    )
    from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
    from arrow_h264_tpu.ops.transforms import make_ws_consts
    from tools.devtime import devtime
    mb_w, mb_h = 120, 68
    batch = 8
    n_slots = 2
    ws4, ws8 = make_ws_consts([[16] * 16] * 6, [[16] * 64] * 2)
    hosts, slots_rows, mode = [], [], None
    for i in range(batch):
        abi = synthetic_abi_p(mb_w, mb_h, seed=50 + i, n_slots=n_slots)
        rng = np.random.default_rng(77 + i)
        n = mb_w * mb_h
        wild = rng.random((n, 4, 4)) < 0.05
        wmv = rng.integers(-512, 512, (n, 4, 4, 2, 2)).astype(np.int32)
        abi["mv"] = np.where(wild[..., None, None], wmv, abi["mv"])
        mode, sl, patch = select_inter_mode(abi, mb_w, mb_h)
        abi["patch"] = patch
        hosts.append(abi)
        slots_rows.append(sl)
    assert mode.endswith("p"), mode     # the hybrid path must engage
    fn = functools.partial(
        decode_frames_batch_fn, mb_w=mb_w, mb_h=mb_h,
        ws4=jnp.asarray(ws4), ws8=jnp.asarray(ws8), cqp_off=(0, 0),
        n_streams=batch, inter_mode=mode)
    abi_b = {k: jnp.asarray(np.stack([h[k] for h in hosts]))
             for k in ABI_DEVICE_KEYS}
    rng = np.random.default_rng(1)
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
    slots = jnp.asarray(np.stack(slots_rows))
    t = devtime(fn, abi_b, dpb_y, dpb_c, slots, n1=2, n2=6)
    return batch / t


def probe_tpu(timeout_s: int = 180) -> bool:
    """The axon tunnel can be down for hours (observed 2026-08-18); a
    bare `jax.devices()` then blocks indefinitely inside backend init.
    Probe in a subprocess with a hard timeout so the bench fails FAST
    and explains itself instead of hanging the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _log(obj: dict) -> None:
    """Append every successful (or failed) bench run to an append-only
    log so a mid-round tunnel window is never wasted (VERDICT r3 #1)."""
    obj = dict(obj)
    obj["ts"] = time.time()
    try:
        with open(Path(__file__).resolve().parent / "BENCH_LOG.jsonl",
                  "a") as f:
            f.write(json.dumps(obj) + "\n")
    except OSError:
        pass


def wait_for_tpu(max_hours: float, poll_s: float = 600.0) -> bool:
    """--wait mode: poll probe_tpu until the axon tunnel answers (or the
    bound expires).  Returns True when a backend is available."""
    deadline = time.time() + max_hours * 3600
    while time.time() < deadline:
        if probe_tpu(timeout_s=120):
            return True
        print(f"# tunnel down, retrying (until {deadline:.0f})",
              file=sys.stderr, flush=True)
        time.sleep(min(poll_s, max(1.0, deadline - time.time())))
    return False


# ---------------------------------------------------------------------------
# Stage harness.  The axon tunnel is an ADVERSARY (VERDICT r3 #1): probes
# can answer while an individual device op later hangs forever (observed
# 2026-08-18: bench stuck 45+ min in wait_woken with the tunnel green).
# Every stage therefore runs in its OWN subprocess with a hard timeout
# and one retry; a hung stage is reported as null instead of eating the
# round.  The persistent compile cache makes retries cheap.

STAGES = {
    # name -> (fn producing a float, timeout_s).  CHEAP, compile-free
    # stages FIRST (host parse needs no device; the link probe is one
    # transfer): even when the e2e stage loses its whole window to the
    # axon compile grind (~10 min PER pipeline variant, r5 measured),
    # the final JSON carries fresh host/link numbers and the
    # stale-marked headline from the last logged real run.
    "host_parse_fps": ("bench_host", 1200),
    "d2h_link_GBps": ("bench_tunnel_bw", 600),
    "e2e_fps": ("bench_e2e", 5400),
    "e2e_device_resident_fps": ("bench_e2e_device_resident", 3600),
    "device_recon_fps": ("bench_device_only", 2400),
    "device_patch_fps": ("bench_device_patch", 1800),
    "device_intra_fps": ("bench_device_intra", 1800),
}


def run_stage(name: str) -> None:
    """--stage NAME: run one stage, print one JSON line to stdout."""
    fnname, _ = STAGES[name]
    fn = globals()[fnname]
    if fnname in ("bench_host", "bench_e2e", "bench_e2e_device_resident"):
        res = fn(make_streams())
    else:
        res = fn()
    if name == "e2e_fps":
        fps, warm_s, timed_s = res
        print(json.dumps({"e2e_fps": fps, "warmup_s": warm_s,
                          "timed_s": timed_s}))
    elif name == "e2e_device_resident_fps":
        print(json.dumps({name: res[0]}))
    else:
        print(json.dumps({name: res}))


def run_all_stages(on_stage=None) -> dict:
    import subprocess
    vals: dict = {}
    for name, (_fn, timeout_s) in STAGES.items():
        if _remaining() < 180:
            print(f"# budget spent ({BUDGET_S:.0f}s); skipping {name}+",
                  file=sys.stderr, flush=True)
            break
        for attempt in (1, 2):
            stage_to = min(timeout_s, max(60.0, _remaining() - 60))
            print(f"# stage {name} (attempt {attempt}, timeout "
                  f"{stage_to:.0f}s)", file=sys.stderr, flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--stage", name],
                    timeout=stage_to, capture_output=True, text=True)
            except subprocess.TimeoutExpired:
                print(f"# stage {name} HUNG >{stage_to}s, "
                      f"{'retrying' if attempt == 1 else 'giving up'}",
                      file=sys.stderr, flush=True)
                if _remaining() < 240:
                    break
                continue
            # full per-stage log for post-mortem (the inline tail below
            # truncates OOM allocation dumps past usefulness)
            try:
                with open(f"/tmp/bench_stage_{name}_a{attempt}.log",
                          "w") as f:
                    f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
            except OSError:
                pass
            if r.returncode == 0 and r.stdout.strip():
                vals.update(json.loads(r.stdout.strip().splitlines()[-1]))
                if on_stage is not None:
                    on_stage(vals)
                break
            print(f"# stage {name} rc={r.returncode}: "
                  f"{r.stderr[-800:]}", file=sys.stderr, flush=True)
            if "TPU worker process crashed" in r.stderr:
                # give the worker time to restart before the next probe
                print("# TPU worker crashed; pausing 60s for restart",
                      file=sys.stderr, flush=True)
                time.sleep(60)
    return vals


def _last_good_log() -> dict | None:
    """Newest BENCH_LOG.jsonl entry with a real measured headline, so the
    provisional line the driver may capture carries a true number."""
    try:
        best = None
        with open(Path(__file__).resolve().parent / "BENCH_LOG.jsonl") as f:
            for line in f:
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                if obj.get("value", 0) and "error" not in obj:
                    best = obj
        return best
    except OSError:
        return None


def build_headline(vals: dict, kbit: float | None, *,
                   partial: bool) -> dict:
    """Cumulative headline JSON from whatever stages have completed.
    If e2e_fps hasn't completed yet, fall back to the last logged real
    run, marked stale."""
    e2e_fps = vals.get("e2e_fps", 0)
    stale = None
    if not e2e_fps:
        stale = _last_good_log()
        if stale:
            e2e_fps = stale.get("value", 0)
    out = {
        "metric": "1080p decoded frames/sec/chip, end-to-end batched "
                  f"(host parse + upload + recon + store + emit, "
                  f"batch={BATCH} real High/CABAC streams)",
        "value": round(e2e_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(e2e_fps / 1000.0, 4),
        "host_cores": os.cpu_count(),
        "n_frames": BATCH * N_FRAMES,
    }
    if kbit is not None:
        out["stream_kbit_per_frame"] = round(kbit, 1)
    if stale:
        out["stale"] = True
        out["stale_ts"] = stale.get("ts")
        # carry the logged run's secondary numbers until fresh ones land
        for k in ("device_recon_fps", "device_intra_fps", "host_parse_fps",
                  "d2h_link_GBps", "e2e_device_resident_fps"):
            if k in stale and k not in vals:
                out[k] = stale[k]
    for k, v in vals.items():
        if k not in ("e2e_fps",):
            out[k] = round(v, 3) if isinstance(v, float) else v
    if partial:
        out["partial"] = True
    # Attribution (VERDICT r3 weak #2): on this rig the headline is bound
    # by min(host cores x host fps/core, link, device).  State which term
    # binds so vs_baseline indicts the right component.
    host_cap = out.get("host_parse_fps", 0) * (os.cpu_count() or 1)
    link = out.get("d2h_link_GBps", 0)
    link_cap = link * 1e9 / (W * H * 1.5) if link else 0
    dev = out.get("e2e_device_resident_fps", 0)
    caps = {"host_parse": host_cap, "d2h_link": link_cap,
            "device_pipeline": dev}
    binding = min((v, k) for k, v in caps.items() if v > 0)[1] \
        if any(v > 0 for v in caps.values()) else "unknown"
    out["attribution"] = {
        "host_cap_fps_at_n_cores": round(host_cap, 1),
        "d2h_link_cap_fps_materialized": round(link_cap, 1),
        "device_resident_fps": round(dev, 1),
        "binding_term_on_this_rig": binding,
        "note": "e2e_fps is the materialized headline on a 1-core host "
                "behind a ~0.1 GB/s tunnel; e2e_device_resident_fps is "
                "the chip-side number a production host (8+ cores, PCIe) "
                "would see.",
    }
    return out


def warm_all() -> None:
    """--warm: compile every stage's pipeline variants into the
    persistent cache, no timing, no per-stage timeouts.  Run in-round so
    the driver's capture (and any cold restart) loads instead of
    compiling — the big batched pipeline compiles take ~10 min EACH over
    the axon tunnel (measured 2026-08-20: 678 s and 546 s for the first
    two variants), which is what blew the r4 capture window."""
    datas = make_streams()
    t0 = time.time()

    def step(name, fn, *a):
        print(f"# warm {name} (t={time.time() - t0:.0f}s)", file=sys.stderr,
              flush=True)
        try:
            fn(*a)
        except Exception as e:
            print(f"# warm {name} FAILED: {e!r}", file=sys.stderr,
                  flush=True)

    step("e2e", bench_e2e, datas)
    step("e2e_resident", bench_e2e_device_resident, datas)
    step("device_recon", bench_device_only)
    step("device_patch", bench_device_patch)
    step("device_intra", bench_device_intra)
    step("tunnel_bw", bench_tunnel_bw)
    print(f"# warm done (t={time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)


def main() -> None:
    if "--warm" in sys.argv:
        warm_all()
        return
    if "--stage" in sys.argv:
        run_stage(sys.argv[sys.argv.index("--stage") + 1])
        return
    # Emit a provisional headline IMMEDIATELY (last logged real run,
    # marked stale) so a driver kill at ANY later point still finds a
    # parseable JSON line in the output tail (VERDICT r4 #1: the r4
    # capture timed out with parsed=null).  Each completed stage then
    # re-emits the cumulative headline; the FINAL line is authoritative.
    print(json.dumps(build_headline({}, None, partial=True)), flush=True)
    if "--wait" in sys.argv:
        i = sys.argv.index("--wait")
        hours = (float(sys.argv[i + 1])
                 if len(sys.argv) > i + 1 else 11.0)
        ok = wait_for_tpu(hours)
        if not ok:
            _log({"error": f"tunnel never answered in {hours}h of polling"})
            sys.exit(2)
    elif not probe_tpu():
        out = build_headline({}, None, partial=False)
        out["error"] = ("TPU backend unavailable (axon tunnel down / "
                        "jax.devices() hung >180s); bench aborted fast; "
                        "value is the last logged run" if out["value"]
                        else "TPU backend unavailable; no logged run")
        print(json.dumps(out), flush=True)
        _log(out)
        sys.exit(0 if out["value"] else 2)
    datas = make_streams()       # encoded once; stages reuse the files
    kbit = sum(len(d) for d in datas) * 8 / (N_SRC * N_FRAMES) / 1000

    def on_stage(vals):
        print(json.dumps(build_headline(vals, kbit, partial=True)),
              flush=True)

    vals = run_all_stages(on_stage)
    out = build_headline(vals, kbit, partial=False)
    missing = [k for k in STAGES if k not in vals and k != "e2e_fps"]
    if "e2e_fps" not in vals:
        missing.append("e2e_fps")
    if missing:
        out["hung_stages"] = missing
    print(json.dumps(out), flush=True)
    _log(out)


if __name__ == "__main__":
    main()
