"""Host entropy throughput: C++ CAVLC/CABAC slice parse, fps per core.

Prints ONE JSON line.  This is the host half of the decode pipeline
(SURVEY.md §7 "CABAC throughput on host"): at N streams x F fps of device
throughput, the host must parse N*F frames/sec across its cores; streams
are independent, so host scaling is linear in cores (this box: `nproc`).
"""

import json
import multiprocessing
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")   # no device work here


def main() -> None:
    from tools import streams
    from arrow_h264_tpu.api import Decoder

    w, h = 1920, 1088
    n_frames = 8
    path = "/tmp/bench_host_1080p.264"
    if not os.path.exists(path):
        yuv = streams.make_content(w, h, n_frames, seed=7)
        streams.encode(yuv, w, h, path, streams.CONFIG_OPTS[4])  # High/CABAC
    data = open(path, "rb").read()

    dec = Decoder(entropy="cpp")
    assert dec.entropy == "cpp", "C++ entropy lib unavailable"
    # warm: first picture (lib load, allocations)
    gen = dec.parse_pictures(data)
    t0 = time.perf_counter()
    n = 0
    zero = None
    for pic, poc in gen:
        abi = dec.pack_abi(pic, poc)
        if zero is None:
            import numpy as np
            zero = (np.zeros((h, w), np.uint8),
                    np.zeros((h // 2, w // 2), np.uint8),
                    np.zeros((h // 2, w // 2), np.uint8))
        list(dec.commit(pic, poc, *zero, 4, lambda *a: None))
        n += 1
    dt = time.perf_counter() - t0
    fps_core = n / dt
    cores = multiprocessing.cpu_count()
    print(json.dumps({
        "metric": "1080p High/CABAC host entropy parse frames/sec/core",
        "value": round(fps_core, 2),
        "unit": "frames/sec/core",
        "host_cores": cores,
        "projected_host_fps": round(fps_core * cores, 1),
    }))


if __name__ == "__main__":
    main()
