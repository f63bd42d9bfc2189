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
# single-threaded LLVM codegen: parallel codegen intermittently segfaulted
# XLA:CPU deep into long single-process runs (many large compilations)
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize imports jax and registers a TPU plugin before any
# test code runs, so the env var alone is too late — force the platform via
# the config API (backends initialize lazily).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# XLA:CPU AOT executable (de)serialization is unstable in this environment:
# artifacts written under one CPU-feature profile SIGILL when loaded under
# another, and the serializer itself segfaulted on some programs.  Tests pay
# first-compile each run instead; the TPU bench keeps its own (TPU-artifact)
# cache, which has been stable.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
