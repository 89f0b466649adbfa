"""Fuzz the C++ slice parser under ASAN/UBSAN (SURVEY.md §5 sanitizers).

The C++ entropy library is the untrusted-input surface; the clean-stream
sanitize test (test_cpp_sanitize.py) never exercises the crafted
first_mb_in_slice / sub-partition / level-code paths that ASAN exists to
catch.  This test drives a seeded corpus of mutated conformance streams
— bit flips, truncations, duplicated and spliced slice NALs — through
the sanitized library in one subprocess and asserts every case either
parses or raises a clean Python exception (no sanitizer report, no
crash).  Only slice NAL payloads are mutated: SPS/PPS stay intact so
picture geometry (and therefore allocation size) stays sane, which keeps
the fuzz aimed at the slice parser rather than the allocator.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
from tools import streams
from arrow_h264_tpu.bitstream import nal
from arrow_h264_tpu.api import Decoder
from arrow_h264_tpu.models.pipeline import select_inter_mode
from arrow_h264_tpu.ops.wire import flatten_wire, pack_wire

# two content/config classes: CABAC with B-frames, CAVLC P-only
cases = [
    ("/tmp/fuzz_base_cabac.264", streams.CONFIG_OPTS[3]),
    ("/tmp/fuzz_base_cavlc.264", streams.CONFIG_OPTS[2]),
]
bases = []
for path, opts in cases:
    yuv = streams.make_content(64, 64, 4, seed=11)
    streams.encode(yuv, 64, 64, path, opts)
    bases.append(open(path, "rb").read())


def nal_spans(data):
    # byte spans of slice NAL payloads (start-code excluded)
    spans = []
    i = 0
    starts = []
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, s in enumerate(starts):
        e = data.find(b"\x00\x00\x01", s)
        e = len(data) if e < 0 else (e - 1 if data[e - 1:e] == b"\x00" else e)
        t = data[s] & 0x1F
        if t in (1, 5):
            spans.append((s, e))
    return spans


def mutate(data, rng):
    spans = nal_spans(data)
    b = bytearray(data)
    kind = rng.integers(0, 4)
    if not spans:
        return bytes(b)
    s, e = spans[rng.integers(0, len(spans))]
    if kind == 0:      # random bit flips inside one slice NAL
        for _ in range(int(rng.integers(1, 12))):
            p = int(rng.integers(s, e))
            b[p] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1:    # truncate mid-slice
        del b[int(rng.integers(s + 1, e)):]
    elif kind == 2:    # duplicate a slice NAL (start code included)
        chunk = bytes(b[s - 3:e])
        p = int(rng.integers(s, len(b)))
        b[p:p] = chunk
    else:              # splice random bytes into the slice payload
        p = int(rng.integers(s, e))
        b[p:p] = bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                    dtype=np.uint8))
    return bytes(b)


rng = np.random.default_rng(1234)
n_ok = n_err = 0
for case in range(300):
    data = mutate(bases[case %% len(bases)], rng)
    try:
        dec = Decoder(entropy="cpp")
        assert dec.entropy == "cpp"
        for pic, poc in dec.parse_pictures(data):
            mb_w = pic.sps.pic_width_in_mbs
            mb_h = pic.sps.pic_height_in_map_units
            abi = dec.pack_abi(pic, poc)
            # fuzz the ABI consumers on the parse thread too: the
            # mode-selection scan and the wire pack read every array
            # the parser filled
            mode, sl, patch = select_inter_mode(abi, mb_w, mb_h)
            abi["patch"] = patch
            sec, spec = pack_wire(abi, mb_w, mb_h)
            flatten_wire(sec, spec, mb_w * mb_h)
            if hasattr(pic, "retire"):
                pic.retire()
        n_ok += 1
    except Exception:
        n_err += 1
print("FUZZ-OK", n_ok, n_err)
"""


@pytest.mark.slow
def test_cpp_fuzz_asan(h264ref, tmp_path):
    """300 seeded mutations through the sanitized parser: every case
    parses or raises cleanly; any OOB read/write aborts under ASAN."""
    asan = subprocess.run(["g++", "-print-file-name=libasan.so"],
                          capture_output=True, text=True).stdout.strip()
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "LD_PRELOAD": asan,
        "ARROW_H264_SANITIZE": "1",
        "JAX_PLATFORMS": "cpu",
        "ASAN_OPTIONS": "detect_leaks=0:detect_odr_violation=0:"
                        "detect_container_overflow=0",
    }
    r = subprocess.run([sys.executable, "-c", _SCRIPT % str(REPO)],
                       capture_output=True, text=True, env=env,
                       timeout=1800)
    assert "FUZZ-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-4000:])
    # both outcomes must occur: mutations that still parse and mutations
    # rejected cleanly — otherwise the corpus isn't exercising anything
    ok, err = map(int, r.stdout.split("FUZZ-OK")[1].split())
    assert ok > 0 and err > 0, (ok, err)
