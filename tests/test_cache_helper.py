"""utils/cache.py: platform/env parsing for the persistent compile cache."""

import os
import subprocess
import sys


def _run(env_extra, code):
    env = dict(os.environ)
    env.update(env_extra)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=240,
    )


_CODE = """
from nowcastautogp_tpu.utils.cache import enable_persistent_cache
import jax
path = enable_persistent_cache()
print("PATH", path)
print("PLAT", jax.config.jax_platforms)
"""


def test_cpu_env_selects_cpu_cache_and_syncs_config():
    proc = _run({"JAX_PLATFORMS": "cpu"}, _CODE)
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "PATH /tmp/ngp_jax_cache_" in proc.stdout
    assert "ngp_jax_cache_tpu" not in proc.stdout
    assert "PLAT cpu" in proc.stdout


def test_priority_list_preferring_accelerator_is_not_forced_to_cpu():
    # 'tpu,cpu' means "prefer tpu": the helper must NOT override the config
    # to cpu, and must pick the shared TPU cache for the first choice
    code = """
from nowcastautogp_tpu.utils.cache import enable_persistent_cache
import jax
path = enable_persistent_cache()
print("PATH", path)
print("PLAT", repr(jax.config.jax_platforms))
"""
    proc = _run({"JAX_PLATFORMS": "tpu,cpu"}, code)
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "PATH /tmp/ngp_jax_cache_tpu" in proc.stdout
    assert "PLAT 'cpu'" not in proc.stdout
