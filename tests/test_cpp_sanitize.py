"""ASAN/UBSAN build of the host entropy library (SURVEY.md §5 sanitizers).

The library parses untrusted bitstreams; this test builds it with
-fsanitize=address,undefined and runs a slice parse under the sanitizers
in a subprocess (ASAN needs to own the process to intercept allocation).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Runs the sanitized C++ entropy library over a full multi-picture stream
# (the untrusted-input surface).  The jax device pipeline is skipped: XLA
# under ASAN reports unrelated noise.  DPB stores use placeholder pixels.
_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
from tools import streams
from arrow_h264_tpu.api import Decoder

yuv = streams.make_content(64, 64, 3, seed=3)
streams.encode(yuv, 64, 64, "/tmp/asan_t.264", streams.CONFIG_OPTS[2])
dec = Decoder(entropy="cpp")
assert dec.entropy == "cpp"
n = 0
zeros = (np.zeros((64, 64), np.uint8), np.zeros((32, 32), np.uint8),
         np.zeros((32, 32), np.uint8))
for pic, poc in dec.parse_pictures(open("/tmp/asan_t.264", "rb").read()):
    abi = dec.pack_abi(pic, poc)
    assert abi["kind"].shape == (16,)
    list(dec.commit(pic, poc, *zeros, 4, lambda *a: None))
    n += 1
assert n == 3, n
print("ASAN-CLEAN-DECODE-OK")
"""


def test_asan_ubsan_entropy(h264ref, tmp_path):
    # build the sanitized .so and find the asan runtime for LD_PRELOAD
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
                       timeout=900)
    assert "ASAN-CLEAN-DECODE-OK" in r.stdout, \
        (r.stdout[-2000:], r.stderr[-4000:])
