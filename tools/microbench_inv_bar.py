"""Composed-only experiment: static-Schur cholesky behind a barrier.

Question (round-3): the static recursion is 3.6 ms standalone vs the
expander's 12.4, but composed after the Pallas covariance it LOSES ~12 ms.
Hypothesis: standalone its many slices read a jit *argument* (free); composed
they consume a fused producer and XLA re-materializes/copies per slice.  If
so, forcing ONE materialization of A (optimization_barrier) should recover
most of the standalone speed.  Prints composed fwd/vgrad for:
  inv        — expander cholesky + analytic-VJP core (shipped TPU default)
  inv_st     — static cholesky, no barrier (known loser)
  inv_st_bar — static cholesky behind lax.optimization_barrier(A)

Usage: python tools/microbench_inv_bar.py [--cap 192] [--p 200]
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

HI = jax.lax.Precision.HIGHEST


def _time(f, *args, n=20, warmup=3):
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
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--cap", type=int, default=192)
    ap.add_argument("--p", type=int, default=200)
    ap.add_argument("--active", type=int, default=150)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle
    from nowcastautogp_tpu.ops import lml as lml_mod
    from nowcastautogp_tpu.ops import pallas_megacov as mega
    from nowcastautogp_tpu.ops.chol_static import (
        cholesky_static, solve_lower_static)
    from tools.microbench_inv import _make_inv_core, _inv_fwd_trtri

    cfg = GPConfig(max_depth=args.depth)
    rng = np.random.default_rng(0)
    P, cap = args.p, args.cap
    ts, ps, lns = [], [], []
    for _ in range(P):
        t, p, ln = sample_particle(rng, cfg)
        ts.append(t), ps.append(p), lns.append(ln)
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))
    log_noise = jnp.asarray(np.asarray(lns, np.float32))
    x = jnp.broadcast_to(jnp.linspace(0, 1, cap), (P, cap)).astype(jnp.float32)
    y = jnp.sin(7 * x) + 0.1 * jnp.cos(19 * x)
    mask = jnp.broadcast_to(
        (jnp.arange(cap) < args.active).astype(jnp.float32), (P, cap))
    ym = y * mask

    def _inv_fwd_static(A):
        L = cholesky_static(A)
        n = A.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        Linv = solve_lower_static(L, eye)
        Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return Ainv, logdet

    from nowcastautogp_tpu.ops.chol_panel import cholesky_panel

    def _inv_fwd_panel_xla_trtri(A):
        # NON-shipped alternative: panel factorization but XLA's While-loop
        # n-RHS solve (the shipped 'panel' impl is lml._ainv_logdet_panel —
        # panel chol + blocked panel trtri, zero While loops)
        L = cholesky_panel(A)
        n = A.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        Linv = jax.lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True)
        Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return Ainv, logdet

    cores = {
        "inv": _make_inv_core(_inv_fwd_trtri),
        "inv_panel_xla": _make_inv_core(_inv_fwd_panel_xla_trtri),
        "inv_panel": _make_inv_core(lml_mod._ainv_logdet_panel),
        "inv_st": _make_inv_core(_inv_fwd_static),
        "inv_st_bar": _make_inv_core(
            lambda A: _inv_fwd_static(jax.lax.optimization_barrier(A))),
    }

    def make_lml(core):
        def lml(p_, ln_):
            K = mega.cov_batched_fused(types, p_, x)
            mm = mask[:, :, None] * mask[:, None, :]
            noise = jnp.exp(ln_)
            diag = mask * (noise[:, None] + 1e-5) + (1.0 - mask)
            A = K * mm + diag[:, :, None] * jnp.eye(cap, dtype=K.dtype)
            n_active = jnp.sum(mask, axis=-1)
            out = core(A, ym) - 0.5 * n_active * lml_mod.LOG_2PI
            return jnp.sum(jnp.where(jnp.isfinite(out), out, -1e10))
        return lml

    print(f"P={P} cap={cap} depth={args.depth}  (composed only)", flush=True)
    for name, core in cores.items():
        lml = make_lml(core)
        f = jax.jit(lml)
        vg = jax.jit(jax.value_and_grad(lml, argnums=(0, 1)))
        tf = _time(f, params, log_noise)
        tg = _time(vg, params, log_noise)
        v, _ = vg(params, log_noise)
        print(f"{name:10s} fwd {tf:7.2f} ms   vgrad {tg:7.2f} ms   "
              f"value {float(v):.3f}", flush=True)


if __name__ == "__main__":
    main()
