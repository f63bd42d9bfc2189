"""Test configuration.

Runs the suite on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  The env vars must be set before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize imports jax and registers a TPU plugin before any
# test code runs, so the env var alone is too late — force the platform via
# the config API (backends initialize lazily).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache, keyed by the host CPU feature set (XLA:CPU
# AOT artifacts built under a different vector-extension profile SIGILL when
# loaded).  The cache matters doubly here: the box has a single CPU core, and
# XLA:CPU has crashed sporadically very deep into single-process runs with
# many large compilations — cached runs do far fewer.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags_line = next(line for line in _f if line.startswith("flags"))
    _cpu_key = hashlib.sha1(_flags_line.encode()).hexdigest()[:10]
except Exception:  # pragma: no cover
    _cpu_key = "generic"
jax.config.update("jax_compilation_cache_dir", f"/tmp/ngp_jax_cache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Deep single-process runs have segfaulted in compilation-cache IO once RSS
# grows past ~the box's budget (observed repeatedly around test #148 of the
# full suite); dropping JAX's in-memory executable caches at each module
# boundary keeps the footprint bounded (the persistent cache makes any
# re-compiles cheap).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jax_memory():
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
