"""Persistent XLA compilation cache, keyed safely per backend.

First compiles on this class of hardware are expensive (minutes through the
tunneled-TPU compile helper; tens of seconds per program on XLA:CPU), and
XLA:CPU AOT artifacts built under a different CPU vector-extension profile
SIGILL when loaded — so the CPU cache key folds in the host's cpuinfo flags
while the TPU cache is shared.  The test suite (tests/conftest.py) and
``bench.py`` configure the same locations; this helper gives examples and
user scripts the identical behavior with one call.
"""

from __future__ import annotations

import hashlib


def enable_persistent_cache() -> str:
    """Point JAX at the platform-appropriate persistent compile cache.

    Returns the cache directory chosen.  Call before the first jitted
    execution (configs are process-global; calling again is a no-op-like
    overwrite with the same values).
    """
    import os

    import jax

    # Prefer the env declaration: jax.default_backend() would *initialize*
    # the backend, and a remote platform (the tunneled TPU) may block on its
    # chip claim — picking a cache dir must never do that.
    plat = os.environ.get("JAX_PLATFORMS", "").lower()
    plats = [p.strip() for p in plat.split(",") if p.strip()]
    # only force CPU when it is the env's FIRST choice — "tpu,cpu" is a
    # valid priority list meaning "prefer tpu"
    if plats and plats[0] == "cpu":
        backend = "cpu"
        # The environment's TPU site hook may patch jax's backend getter in
        # a way that only honors the *config* value, initializing the remote
        # platform even under JAX_PLATFORMS=cpu.  Sync the config from the
        # env so `JAX_PLATFORMS=cpu python examples/...` behaves as
        # documented (harmless when no hook is installed; must run before
        # backends initialize, which is why examples call this first).
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # pragma: no cover - backends already initialized
            pass
    elif plats:
        backend = plats[0]
    else:
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover - uninitializable backend
            backend = "cpu"
    if backend == "cpu":
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(line for line in f if line.startswith("flags"))
            key = hashlib.sha1(flags.encode()).hexdigest()[:10]
        except Exception:  # pragma: no cover - non-Linux host
            key = "generic"
        path = f"/tmp/ngp_jax_cache_{key}"
    else:
        path = "/tmp/ngp_jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
