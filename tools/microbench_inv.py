"""Microbenchmark: inverse-based LML core vs the autodiffed cho_solve core.

Round-3 targeting (PLAN.md): at the bench's hot shapes the Cholesky+solve
cycle is ~17 ms of the ~28 ms LML grad.  Candidate replacement: a
custom-VJP core whose forward materializes A^{-1} (cholesky -> batched
triangular solve against I -> L^{-T} L^{-1} matmul) so the backward is the
pure elementwise dA = c * 0.5(alpha alpha^T - A^{-1}) with NO autodiff
through cholesky / triangular_solve (both latency-bound While expansions
on TPU for 1-RHS).

Variants measured, standalone on a fixed SPD batch AND composed in the real
megacov LML program (fresh jits each — module-level jit caches don't
retrace on backend flips):
  xla   — jnp.linalg.cholesky + cho_solve(1 RHS), XLA autodiff (shipped)
  inv   — fwd materializes A^{-1} via trtri+matmul; analytic elementwise bwd
  inv2  — fwd materializes A^{-1} via cho_solve(L, I) (2 n-RHS trsms)
  lazy  — fwd = shipped; bwd computes A^{-1} analytically from residual L

Usage: python tools/microbench_inv.py [--cap 192] [--p 200]
"""

from __future__ import annotations

import argparse
import functools
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


def core_xla(A, ym):
    L = jnp.linalg.cholesky(A)
    alpha = jax.scipy.linalg.cho_solve((L, True), ym[..., None])[..., 0]
    quad = jnp.einsum("pn,pn->p", ym, alpha)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (quad + logdet)


def _inv_fwd_trtri(A):
    L = jnp.linalg.cholesky(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _inv_fwd_chosolve(A):
    L = jnp.linalg.cholesky(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Ainv = jax.scipy.linalg.cho_solve((L, True), eye)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _make_inv_core(fwd_impl):
    @jax.custom_vjp
    def core(A, ym):
        Ainv, logdet = fwd_impl(A)
        alpha = jnp.einsum("pij,pj->pi", Ainv, ym, precision=HI)
        quad = jnp.einsum("pn,pn->p", ym, alpha)
        return -0.5 * (quad + logdet)

    def fwd(A, ym):
        Ainv, logdet = fwd_impl(A)
        alpha = jnp.einsum("pij,pj->pi", Ainv, ym, precision=HI)
        quad = jnp.einsum("pn,pn->p", ym, alpha)
        return -0.5 * (quad + logdet), (Ainv, alpha)

    def bwd(res, c):
        Ainv, alpha = res
        dA = (0.5 * c[:, None, None]) * (
            jnp.einsum("pi,pj->pij", alpha, alpha) - Ainv)
        dym = -c[:, None] * alpha
        return dA, dym

    core.defvjp(fwd, bwd)
    return core


core_inv = _make_inv_core(_inv_fwd_trtri)
core_inv2 = _make_inv_core(_inv_fwd_chosolve)


def _inv_fwd_static(A):
    from nowcastautogp_tpu.ops.chol_static import (
        cholesky_static, solve_lower_static)

    L = cholesky_static(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Linv = solve_lower_static(L, eye)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


def _inv_fwd_static_xsolve(A):
    from nowcastautogp_tpu.ops.chol_static import cholesky_static

    L = cholesky_static(A)
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


core_inv_st = _make_inv_core(_inv_fwd_static)
core_inv_stx = _make_inv_core(_inv_fwd_static_xsolve)


@jax.custom_vjp
def core_lazy(A, ym):
    return core_xla(A, ym)


def _lazy_fwd(A, ym):
    L = jnp.linalg.cholesky(A)
    alpha = jax.scipy.linalg.cho_solve((L, True), ym[..., None])[..., 0]
    quad = jnp.einsum("pn,pn->p", ym, alpha)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (quad + logdet), (L, alpha)


def _lazy_bwd(res, c):
    L, alpha = res
    n = L.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    Ainv = jnp.einsum("pki,pkj->pij", Linv, Linv, precision=HI)
    dA = (0.5 * c[:, None, None]) * (
        jnp.einsum("pi,pj->pij", alpha, alpha) - Ainv)
    dym = -c[:, None] * alpha
    return dA, dym


core_lazy.defvjp(_lazy_fwd, _lazy_bwd)


def _inv_fwd_mxu(A):
    from nowcastautogp_tpu.ops.lml import _ainv_logdet_mxu

    return _ainv_logdet_mxu(A)


core_mxu = _make_inv_core(_inv_fwd_mxu)

CORES = {"xla": core_xla, "inv": core_inv, "inv2": core_inv2,
         "lazy": core_lazy, "inv_st": core_inv_st, "inv_stx": core_inv_stx,
         "mxu": core_mxu}


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

    # fixed SPD batch for the standalone comparison
    Kmat = jax.jit(jax.vmap(
        lml_mod.masked_kernel_matrix, in_axes=(0, 0, 0, 0, 0, None)))(
        types, params, log_noise, x, mask, 1e-5)
    Kmat = jax.block_until_ready(Kmat)

    print(f"P={P} cap={cap} depth={args.depth}")
    print("== standalone core (fixed SPD batch) ==")
    ref_g = None
    for name, core in CORES.items():
        f = jax.jit(lambda K_, core=core: jnp.sum(core(K_, ym)))
        g = jax.jit(jax.grad(lambda K_, core=core: jnp.sum(core(K_, ym))))
        tf = _time(f, Kmat)
        tg = _time(g, Kmat)
        gv = np.asarray(g(Kmat))
        if ref_g is None:
            ref_g = gv
            err = 0.0
        else:
            err = float(np.max(np.abs(gv - ref_g)) / (np.max(np.abs(ref_g)) + 1e-30))
        print(f"{name:5s} fwd {tf:7.2f} ms   grad {tg:7.2f} ms   "
              f"grad relerr vs xla {err:.2e}")

    # composed: megacov covariance -> masked A -> core, value+grad wrt params
    if not mega.megacov_supported(types.shape[1], cap):
        print("megacov unsupported at this shape; skipping composed test")
        return

    print("== composed (megacov -> A -> core), value_and_grad wrt params ==")

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

    ref_gp = None
    for name, core in CORES.items():
        lml = make_lml(core)
        f = jax.jit(lml)
        vg = jax.jit(jax.value_and_grad(lml, argnums=(0, 1)))
        tf = _time(f, params, log_noise)
        tg = _time(vg, params, log_noise)
        v, (gp, gn) = vg(params, log_noise)
        gp = np.asarray(gp)
        if ref_gp is None:
            ref_gp = gp
            err = 0.0
        else:
            err = float(np.max(np.abs(gp - ref_gp)) / (np.max(np.abs(ref_gp)) + 1e-30))
        print(f"{name:5s} fwd {tf:7.2f} ms   vgrad {tg:7.2f} ms   "
              f"value {float(v):.3f}   dparam relerr vs xla {err:.2e}")


if __name__ == "__main__":
    main()
