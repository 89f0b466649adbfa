"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path can be
exercised without a pod slice (SURVEY.md §4.4).  The real-TPU benchmark path
is exercised by bench.py, not pytest.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU platform at interpreter
# start; jax.config wins over it if set before first backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# big fused graphs (banded MC) compile slowly on XLA:CPU — cache them
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def h264ref():
    """Path to the libavcodec conformance-oracle CLI, built on demand
    (single build path: tools.streams.ensure_h264ref, ADVICE r4)."""
    from tools.streams import ensure_h264ref
    return ensure_h264ref()
