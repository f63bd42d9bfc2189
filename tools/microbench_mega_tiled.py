"""Microbenchmark: tiled-plane megacov vs jnp interpreter at large n on TPU.

The tiled path (``pallas_megacov._tiled``: n_pad > 512, (256, 256) plane
tiles, accumulating dparams output) is numerics-validated in interpret mode
(``tests/test_pallas_megacov.py::TestTiledPlane``) but needs on-chip
timings before ``auto`` may route large-n fits through it.  This prints
fwd / weighted-grad times for megacov vs the jnp level-vectorized
interpreter at daily-cadence sizes.

Usage: python tools/microbench_mega_tiled.py [--p 200] [--n 640 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(f, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=200)
    ap.add_argument("--n", type=int, nargs="+", default=[640, 1024])
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.ops import pallas_megacov as mega
    from nowcastautogp_tpu.ops.kernels import eval_cov_impl

    cfg = GPConfig(max_depth=args.depth)
    rng = np.random.default_rng(0)
    P = args.p
    ts, ps = [], []
    for _ in range(P):
        t, p, _ = sample_particle(rng, cfg)
        ts.append(t), ps.append(p)
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))

    for n in args.n:
        assert mega.megacov_supported(types.shape[1], n), n
        x = jnp.asarray(
            np.broadcast_to(np.linspace(0, 1, n, dtype=np.float32),
                            (P, n)).copy())
        W = jnp.asarray(
            rng.standard_normal((P, n, n)).astype(np.float32))

        def loss_mega(p_):
            return jnp.sum(W * mega.cov_batched_fused(types, p_, x))

        def loss_jnp(p_):
            K = jax.vmap(eval_cov_impl, in_axes=(0, 0, 0, 0))(
                types, p_, x, x)
            return jnp.sum(W * K)

        fm = jax.jit(lambda p_: mega.cov_batched_fused(types, p_, x))
        fj = jax.jit(lambda p_: jax.vmap(eval_cov_impl,
                                         in_axes=(0, 0, 0, 0))(types, p_, x, x))
        gm = jax.jit(jax.grad(loss_mega))
        gj = jax.jit(jax.grad(loss_jnp))

        # parity first (fwd bit-exact, grads to tolerance)
        np.testing.assert_allclose(np.asarray(fm(params)),
                                   np.asarray(fj(params)),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm(params)),
                                   np.asarray(gj(params)),
                                   rtol=5e-3, atol=5e-3)

        tag = "tiled" if mega._tiled(n) else "plane"
        print(f"P={P} n={n} ({tag})"
              f"  mega fwd {_time(fm, params):8.2f} ms"
              f"  grad {_time(gm, params):8.2f} ms"
              f"  |  jnp fwd {_time(fj, params):8.2f} ms"
              f"  grad {_time(gj, params):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
