"""Test config: force an 8-device virtual CPU mesh.

This mirrors the reference-free distributed test strategy from
SURVEY.md §4: CI has no TPU pod, so sharding correctness is asserted
on a faked multi-device CPU backend.

Note: the environment may pre-import jax via a sitecustomize that
registers a remote-TPU PJRT plugin and pins JAX_PLATFORMS at interpreter
startup; env vars set here are then too late for jax's config snapshot,
so the platform is forced via jax.config.update instead. XLA_FLAGS is
still read lazily at backend init, so the virtual-device flag works
as long as no computation ran yet.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8")
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 device threads share ONE vCPU here: a collective rendezvous
    # can legitimately sit un-scheduled past XLA's hard terminate
    # window under load, and XLA then EXITS the whole process
    # ("Termination timeout ... Exiting to ensure a consistent
    # program state" — observed as sporadic 'Fatal Python error:
    # Aborted' killing full-suite runs). The 20 s warn stays; only
    # the process-killing deadline is raised.
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags.strip()
# persistent compile cache: repeat suite runs skip XLA recompiles.
# The cache dir is keyed by a hash of the host's CPU feature flags:
# this VM migrates between hosts with DIFFERENT CPU features, and
# XLA:CPU AOT entries compiled on one host abort the process
# ("SIGILL" / Fatal Python error) when loaded on the other — a
# per-machine cache sidesteps the poisoning (CLAUDE.md env notes).


def _cpu_cache_dir():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1(
                        line.encode()).hexdigest()[:10]
                    return f"/tmp/jax_test_cache_{tag}"
    except OSError:
        pass
    return "/tmp/jax_test_cache"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()}")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
