"""Test config: force an 8-device virtual CPU mesh before jax imports.

This mirrors the reference-free distributed test strategy from
SURVEY.md §4: CI has no TPU pod, so sharding correctness is asserted on
a faked multi-device CPU backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: repeat suite runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
