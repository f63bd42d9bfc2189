"""On-chip A/B: fused LML value+grad kernel vs the composed megacov path.

Measures the exact object the fit differentiates — the batched HMC
potential's ``value_and_grad`` — via the trusted chained-scan methodology
(20 data-dependent applications inside ONE jit, timed around a scalar
readback; ``block_until_ready`` does not synchronize on the axon tunnel,
PLAN.md round-3).

Usage: python tools/microbench_megalml.py [--p 200] [--caps 160 192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time_chain(make_fn, params, iters=20, reps=3):
    from jax import lax

    @jax.jit
    def chain(p):
        def body(carry, _):
            out = make_fn(p * (1.0 + 1e-6 * carry))
            return jnp.tanh(out), None

        c, _ = lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    t0 = time.perf_counter()
    v = float(chain(params))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(chain(params))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, compile_s, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=200)
    ap.add_argument("--caps", type=int, nargs="+", default=[160, 192])
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--dup", type=int, default=0)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.inference.hmc import make_batched_potential
    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.models.structures_device import (
        config_arrays, device_prior_arrays,
    )
    from nowcastautogp_tpu.ops import lml as lml_mod

    cfg = GPConfig(max_depth=args.depth)
    ca = config_arrays(cfg)
    rng = np.random.default_rng(0)
    P = args.p
    if args.dup:
        base = [sample_particle(rng, cfg) for _ in range(args.dup)]
        parts = [base[i] for i in rng.integers(0, args.dup, size=P)]
    else:
        parts = [sample_particle(rng, cfg) for _ in range(P)]
    types = jnp.asarray(np.stack([p[0] for p in parts]).astype(np.int32))
    params0 = jnp.asarray(np.stack([p[1] for p in parts]).astype(np.float32))
    ln = jnp.asarray(np.full(P, -2.0, np.float32))
    mu, sg, act = jax.vmap(
        device_prior_arrays, in_axes=(0, None))(types, ca)

    for cap in args.caps:
        x = jnp.broadcast_to(
            jnp.linspace(0, 1, cap), (P, cap)).astype(jnp.float32)
        y = jnp.sin(7 * x) + 0.1 * jnp.cos(19 * x)
        mask = jnp.broadcast_to(
            (jnp.arange(cap) < cap - 10).astype(jnp.float32), (P, cap))

        for mode in ("off", "auto"):
            lml_mod.set_megalml(mode)
            pot = make_batched_potential(
                types, mu, sg, act, x, y, mask, 1e-5, -2.0, 1.0, 1.0,
                lml_backend="mega")

            def vag_sum(p):
                (gp, gn), (U, _lml) = jax.grad(
                    pot, argnums=(0, 1), has_aux=True)(p, ln)
                return jnp.sum(U) + jnp.sum(gp) + jnp.sum(gn)

            ms, comp, v = _time_chain(vag_sum, params0)
            print(f"cap {cap:4d}  megalml={mode:4s}  vag "
                  f"{ms:7.2f} ms/eval  (compile {comp:.0f}s, chk {v:.4f})",
                  flush=True)

            def val_sum(p):
                _, (U, _lml) = pot(p, ln)
                return jnp.sum(U)

            ms, comp, v = _time_chain(val_sum, params0)
            print(f"cap {cap:4d}  megalml={mode:4s}  val "
                  f"{ms:7.2f} ms/eval  (compile {comp:.0f}s, chk {v:.4f})",
                  flush=True)
    lml_mod.set_megalml("auto")


if __name__ == "__main__":
    main()
