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

    import numpy as np

    w, h = 1920, 1088
    zero = (np.zeros((h, w), np.uint8),
            np.zeros((h // 2, w // 2), np.uint8),
            np.zeros((h // 2, w // 2), np.uint8))

    def run(path, make):
        if not os.path.exists(path):
            make(path)
        data = open(path, "rb").read()
        dec = Decoder(entropy="cpp")
        assert dec.entropy == "cpp", "C++ entropy lib unavailable"
        gen = dec.parse_pictures(data)
        t0 = time.perf_counter()
        n = 0
        for pic, poc in gen:
            dec.pack_abi(pic, poc)
            list(dec.commit(pic, poc, *zero, 4, lambda *a: None))
            n += 1
        kbit = len(data) * 8 / n / 1000
        return n / (time.perf_counter() - t0), kbit

    # adversarial: noise=12 under qp26 High/CABAC (~4 Mbit/frame) — the
    # worst-case bin density; broadcast: noise=3 qp30 (~1 Mbit/frame),
    # the content class bench.py's end-to-end line decodes
    adv_fps, adv_kbit = run(
        "/tmp/bench_host_1080p.264",
        lambda p: streams.encode(streams.make_content(w, h, 8, seed=7),
                                 w, h, p, streams.CONFIG_OPTS[4]))
    bro_fps, bro_kbit = run(
        "/tmp/bench_host_1080p_broadcast.264",
        lambda p: streams.encode(
            streams.make_content(w, h, 16, seed=100, noise=3), w, h, p,
            ["profile=high", "qp=30", "g=250", "bf=2", "refs=4",
             "keyint_min=250",
             "x264-params=cabac=1:8x8dct=1:weightp=2:weightb=1:"
             "b-pyramid=0:" + streams.X264_COMMON]))
    cores = multiprocessing.cpu_count()
    print(json.dumps({
        "metric": "1080p High/CABAC host entropy parse frames/sec/core",
        "value": round(bro_fps, 2),
        "unit": "frames/sec/core",
        "content_kbit_per_frame": round(bro_kbit, 1),
        "adversarial_fps_core": round(adv_fps, 2),
        "adversarial_kbit_per_frame": round(adv_kbit, 1),
        "host_cores": cores,
        "scaling": "linear in cores (independent streams; "
                   "BatchDecoder parse pool, GIL released)",
    }))


if __name__ == "__main__":
    main()
