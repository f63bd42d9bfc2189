"""Microbenchmark: tiled-plane megacov vs jnp interpreter at large n on TPU.

The tiled path (``pallas_megacov._tiled``: n_pad > 512, (256, 256) plane
tiles, accumulating dparams output) is numerics-validated in interpret mode
(``tests/test_pallas_megacov.py::TestTiledPlane``) and measured on the v5e
(P=200 depth 5, chained-scan: n=640 fwd 22.4 ms / grad 31.8 ms, n=1024
grad 52.1 ms — sublinear in the n^2 plane growth), so ``auto`` routes
large-n fits through it.  This prints fwd / weighted-grad times for
megacov vs the jnp level-vectorized interpreter at daily-cadence sizes.

NOTE when extending: pass the cotangent W as a jit ARGUMENT, not a
closure capture — a captured (P, n, n) W is embedded in the program as a
literal and the remote-compile request exceeds the tunnel body limit
(HTTP 413) from n=640 up.

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


def _time_chain(fn, params, iters=10):
    """Chained-scan ground truth: `iters` data-dependent applications of
    ``fn(params)`` inside ONE jit, timed around a scalar readback.

    On the axon tunnel ``block_until_ready`` on array outputs does NOT
    synchronize (only value readbacks do — PLAN.md round-3), so per-call
    dispatch timing lies; this is the trusted methodology from
    tools/profile_sweep.py / exp_mosaic_dots.py."""
    from jax import lax

    @jax.jit
    def chain(p):
        def body(carry, _):
            out = fn(p * (1.0 + 1e-6 * carry))
            s = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))
            return carry + 1e-20 * s, ()

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chain(params))  # compile + warm
    t0 = time.perf_counter()
    float(chain(params))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


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

        # Each path measured independently: at daily-cadence n the XLA
        # interpreter's autodiff HLO is enormous and the tunnel's
        # remote-compile proxy rejects it (HTTP 413 request-body limit,
        # observed at n=640) — an infra cap of THIS tunnel, not the chip.
        # Interpret-mode numerics parity for the tiled kernel is pinned in
        # tests/test_pallas_megacov.py; on-chip fwd parity is checked here
        # when both sides compile (f32 last-ULP tolerance: transcendental
        # reassociation across tile boundaries, measured max rel 1.8e-4).
        tag = "tiled" if mega._tiled(n) else "plane"
        results = {}
        for name, fn in (("mega fwd", fm), ("jnp fwd", fj),
                         ("mega grad", gm), ("jnp grad", gj)):
            try:
                results[name] = _time_chain(fn, params)
                print(f"P={P} n={n} ({tag})  {name:9s} "
                      f"{results[name]:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001 — diagnostic tool
                print(f"P={P} n={n} ({tag})  {name:9s} unavailable: "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        if "mega fwd" in results and "jnp fwd" in results:
            np.testing.assert_allclose(np.asarray(fm(params)),
                                       np.asarray(fj(params)),
                                       rtol=5e-4, atol=5e-4)
            print(f"P={P} n={n}  fwd parity OK", flush=True)
        if "mega grad" in results and "jnp grad" in results:
            np.testing.assert_allclose(np.asarray(gm(params)),
                                       np.asarray(gj(params)),
                                       rtol=5e-3, atol=5e-3)
            print(f"P={P} n={n}  grad parity OK", flush=True)


if __name__ == "__main__":
    main()
