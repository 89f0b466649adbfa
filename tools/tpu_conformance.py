"""On-TPU conformance gate: decode one stream per config on the real chip
and byte-compare against the libavcodec golden (VERDICT round-1 item #6).

Runs standalone (persistent compile cache keeps re-runs fast):

    python tools/tpu_conformance.py            # configs 1-4
    python tools/tpu_conformance.py 3 4        # subset
    python tools/tpu_conformance.py --res 1080 # override config resolutions

Config resolutions follow BASELINE.md: 1 QCIF, 2 CIF, 3 720p, 4 1080p.
Exit code 0 iff every decoded frame is bit-exact.
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402

# config -> (width, height, frames) per BASELINE.md staged configs.
# Config 5 here = the 4K end of BASELINE config 5 (batched 1080p/4K):
# a single-stream 4K High decode through the same pipeline.
RES = {1: (176, 144, 3), 2: (352, 288, 5), 3: (1280, 720, 5),
       4: (1920, 1088, 5), 5: (3840, 2160, 3),
       6: (352, 288, 4)}     # 6 = FRExt lossless bypass (CONFIG_OPTS["lossless"])


def run_config(cfg: int, w: int, h: int, n: int) -> bool:
    from tools import streams
    from arrow_h264_tpu.api import Decoder

    path = f"/tmp/tpuconf_c{cfg}_{w}x{h}.264"
    opts = streams.CONFIG_OPTS["lossless" if cfg == 6 else min(cfg, 4)]
    if not Path(path).exists():
        yuv = streams.make_content(w, h, n, seed=40 + cfg)
        streams.encode(yuv, w, h, path, opts)
    golden, gw, gh = streams.golden_decode(path)
    data = open(path, "rb").read()
    t0 = time.time()
    dec = Decoder()
    frames = list(dec.decode_annexb(data))
    dt = time.time() - t0
    ok = len(frames) == len(golden)
    bad = 0
    for i, f in enumerate(frames):
        got = np.frombuffer(f.planar(), np.uint8)
        ref = np.asarray(golden[i])
        if got.tobytes() != ref.tobytes():
            ok = False
            bad += 1
            d = int((got != ref).sum())
            print(f"  config {cfg} frame {i}: {d} byte diffs")
    status = "BIT-EXACT" if ok else f"FAIL ({bad} frames differ)"
    print(f"config {cfg} ({w}x{h}, {len(frames)} frames, "
          f"{dt:.1f}s incl. compile): {status}", flush=True)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", type=int, default=[1, 2, 3, 4])
    args = ap.parse_args()
    cfgs = args.configs or [1, 2, 3, 4]
    print(f"backend: {jax.default_backend()}", flush=True)
    ok = True
    for c in cfgs:
        w, h, n = RES[c]
        ok &= run_config(c, w, h, n)
    print("ALL BIT-EXACT" if ok else "CONFORMANCE FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
