"""Microbenchmark: depth-5 cap-192 LML+grad component breakdown on TPU.

Round-3 targeting tool (PLAN.md "Bench fit profile"): the cap-192 segment's
LML grad is the fit's hot op.  This prints fwd / fwd+bwd times for the whole
op and its two halves (covariance interpreter, Cholesky+solve core) so
optimization work attacks the right component.

Usage: python tools/microbench_lml.py [--depth 5] [--cap 192] [--p 200]
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
    from nowcastautogp_tpu.ops.kernels import eval_cov_impl

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

    n_nodes = types.shape[1]
    active = np.stack(ts)
    print(f"P={P} cap={cap} depth={args.depth} slots={n_nodes} "
          f"mean_active_nodes={np.mean(np.sum(active >= 0, axis=1)):.1f}"
          if np.min(active) < 0 else
          f"P={P} cap={cap} depth={args.depth} slots={n_nodes}")

    # ---- whole LML
    lml_fwd = jax.jit(lambda p_, ln_: jnp.sum(
        lml_mod.gp_lml_batched(types, p_, ln_, x, y, mask)))
    lml_grad = jax.jit(jax.grad(
        lambda p_, ln_: jnp.sum(
            lml_mod.gp_lml_batched(types, p_, ln_, x, y, mask)),
        argnums=(0, 1)))
    t_fwd = _time(lml_fwd, params, log_noise)
    t_grad = _time(lml_grad, params, log_noise)
    print(f"LML      fwd {t_fwd:7.2f} ms   grad {t_grad:7.2f} ms")

    # ---- covariance interpreter only
    cov_b = jax.vmap(eval_cov_impl, in_axes=(0, 0, 0, 0))
    cov_fwd = jax.jit(lambda p_: jnp.sum(cov_b(types, p_, x, x)))
    cov_grad = jax.jit(jax.grad(lambda p_: jnp.sum(cov_b(types, p_, x, x))))
    t_cf = _time(cov_fwd, params)
    t_cg = _time(cov_grad, params)
    print(f"cov      fwd {t_cf:7.2f} ms   grad {t_cg:7.2f} ms")

    # ---- chol+solve core only (fixed K)
    def chol_lml(K_, ym_):
        L = jnp.linalg.cholesky(K_)
        alpha = jax.scipy.linalg.cho_solve((L, True), ym_)
        quad = jnp.einsum("pn,pn->p", ym_, alpha)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * (quad + logdet)

    Kmat = jax.jit(jax.vmap(
        lml_mod.masked_kernel_matrix, in_axes=(0, 0, 0, 0, 0, None)))(
        types, params, log_noise, x, mask, 1e-5)
    Kmat = jax.block_until_ready(Kmat)
    ym = y * mask
    chol_fwd = jax.jit(lambda K_: jnp.sum(chol_lml(K_, ym)))
    chol_grad = jax.jit(jax.grad(lambda K_: jnp.sum(chol_lml(K_, ym))))
    t_hf = _time(chol_fwd, Kmat)
    t_hg = _time(chol_grad, Kmat)
    print(f"chol     fwd {t_hf:7.2f} ms   grad {t_hg:7.2f} ms")

    # ---- mega backend: fused batched Pallas covariance + XLA chol
    from nowcastautogp_tpu.ops import pallas_megacov as mega

    if mega.megacov_supported(types.shape[1], cap):
        mega_fwd = jax.jit(
            lambda p_: jnp.sum(mega.cov_batched_fused(types, p_, x)))
        mega_grad = jax.jit(jax.grad(
            lambda p_: jnp.sum(mega.cov_batched_fused(types, p_, x))))
        t_mf = _time(mega_fwd, params)
        t_mg = _time(mega_grad, params)
        print(f"megacov  fwd {t_mf:7.2f} ms   grad {t_mg:7.2f} ms")

        prior = lml_mod._LML_BACKEND
        try:
            lml_mod.set_lml_backend("mega")
            lml_m_fwd = jax.jit(lambda p_, ln_: jnp.sum(
                lml_mod.gp_lml_batched(types, p_, ln_, x, y, mask)))
            lml_m_grad = jax.jit(jax.grad(
                lambda p_, ln_: jnp.sum(
                    lml_mod.gp_lml_batched(types, p_, ln_, x, y, mask)),
                argnums=(0, 1)))
            t_lmf = _time(lml_m_fwd, params, log_noise)
            t_lmg = _time(lml_m_grad, params, log_noise)
            print(f"LML mega fwd {t_lmf:7.2f} ms   grad {t_lmg:7.2f} ms")
            # value sanity vs jnp
            v1 = float(lml_m_fwd(params, log_noise))
            lml_mod.set_lml_backend("jnp")
            v2 = float(lml_fwd(params, log_noise))
            print(f"value check: mega {v1:.4f} vs jnp {v2:.4f}")
        finally:
            lml_mod.set_lml_backend(prior)

    # ---- remat variant of the whole LML (cov recomputed in bwd)
    def lml_remat(p_, ln_):
        cov_ck = jax.checkpoint(
            lambda pp: jax.vmap(
                lml_mod.masked_kernel_matrix, in_axes=(0, 0, 0, 0, 0, None))(
                types, pp, ln_, x, mask, 1e-5))
        K_ = cov_ck(p_)
        return jnp.sum(chol_lml(K_, ym))

    t_rg = _time(jax.jit(jax.grad(lml_remat, argnums=(0, 1))),
                 params, log_noise)
    print(f"LML remat                    grad {t_rg:7.2f} ms")


if __name__ == "__main__":
    main()
