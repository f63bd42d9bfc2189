"""Isolate where time goes in the fused chol_mxu kernel (ops/chol_mxu.py).

Variants timed at (P=200, n=160) on TPU:
  full       — the shipped kernel (phase 1 chol + phase 2 trtri)
  phase1     — factorization only (L out)
  phase1_nf  — phase 1 with the two 32-step foris replaced by cheap
               stand-ins (identity diag blocks): times the MXU dots + copies
  phase2     — trtri only, fed identity diag inverses: times the batch dots
  c variants — full kernel at different chunk sizes

Usage: python tools/exp_mxu_phases.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nowcastautogp_tpu.ops import chol_mxu as cm


def _time(f, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _make(kernel_body, C, n, n_scratch_nn, with_d=True):
    scratch = [pltpu.VMEM((C, n, n), jnp.float32)
               for _ in range(n_scratch_nn)]
    if with_d:
        scratch.append(pltpu.VMEM((C, n, cm._B), jnp.float32))

    def call(A):
        P = A.shape[0]
        G = P // C
        return pl.pallas_call(
            kernel_body,
            grid=(G,),
            in_specs=[pl.BlockSpec((C, n, n), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((C, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, n, n), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=cm._VMEM_LIMIT),
        )(A)

    return jax.jit(call)


def kernel_phase1(A_ref, X_ref, L_ref, D_ref):
    C, n, _ = A_ref.shape
    b = cm._B
    nb = n // b
    L_ref[:, :, :] = A_ref[:, :, :]
    for k in range(nb):
        s = k * b
        Lb = cm._diag_chol(L_ref[:, s:s + b, s:s + b])
        Lbinv = cm._small_trtri(Lb)
        L_ref[:, s:s + b, s:s + b] = Lb
        D_ref[:, s:s + b, :] = Lbinv
        if k + 1 < nb:
            t = s + b
            Xp = cm._bdot(L_ref[:, t:, s:s + b], Lbinv, transpose_b=True)
            L_ref[:, t:, s:s + b] = Xp
            L_ref[:, t:, t:] = L_ref[:, t:, t:] - cm._bdot(
                Xp, Xp, transpose_b=True)
    X_ref[:, :, :] = L_ref[:, :, :]


def kernel_phase1_nofori(A_ref, X_ref, L_ref, D_ref):
    C, n, _ = A_ref.shape
    b = cm._B
    nb = n // b
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    eye_c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = jnp.broadcast_to(
        (eye_r == eye_c).astype(jnp.float32)[None], (C, b, b))
    L_ref[:, :, :] = A_ref[:, :, :]
    for k in range(nb):
        s = k * b
        Lb = L_ref[:, s:s + b, s:s + b] * 0.5 + eye      # stand-in
        Lbinv = eye
        L_ref[:, s:s + b, s:s + b] = Lb
        D_ref[:, s:s + b, :] = Lbinv
        if k + 1 < nb:
            t = s + b
            Xp = cm._bdot(L_ref[:, t:, s:s + b], Lbinv, transpose_b=True)
            L_ref[:, t:, s:s + b] = Xp
            L_ref[:, t:, t:] = L_ref[:, t:, t:] - cm._bdot(
                Xp, Xp, transpose_b=True)
    X_ref[:, :, :] = L_ref[:, :, :]


def kernel_phase2(A_ref, X_ref, L_ref, R_ref, D_ref):
    C, n, _ = A_ref.shape
    b = cm._B
    nb = n // b
    L_ref[:, :, :] = A_ref[:, :, :]
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    eye_c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = jnp.broadcast_to(
        (eye_r == eye_c).astype(jnp.float32)[None], (C, b, b))
    for k in range(nb):
        D_ref[:, k * b:(k + 1) * b, :] = eye
    er = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    R_ref[:, :, :] = jnp.broadcast_to(
        (er == ec).astype(jnp.float32)[None], (C, n, n))
    for k in range(nb):
        s = k * b
        Xrow = cm._bdot(D_ref[:, s:s + b, :], R_ref[:, s:s + b, :])
        X_ref[:, s:s + b, :] = Xrow
        if k + 1 < nb:
            t = s + b
            R_ref[:, t:, :] = R_ref[:, t:, :] - cm._bdot(
                L_ref[:, t:, s:s + b], Xrow)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    P, n = 200, 160
    rng = np.random.default_rng(0)
    B = rng.standard_normal((P, n, n)).astype(np.float32)
    A = jnp.asarray(B @ B.transpose(0, 2, 1) / n
                    + 2 * np.eye(n, dtype=np.float32))
    A = jax.block_until_ready(A)

    t = _time(jax.jit(cm.tri_inv_fused), A)
    print(f"full (shipped, C={min(cm._chunk_for(n), P)}): {t:7.2f} ms")

    for C in (25, 50, 100, 200):
        if P % C:
            continue
        try:
            f = _make(functools.partial(cm._tri_inv_kernel), C, n, 2)
            t = _time(f, A)
            print(f"full C={C}: {t:7.2f} ms")
        except Exception as e:
            print(f"full C={C}: FAILED {type(e).__name__} {str(e)[:160]}")

    for name, body, nsc in [("phase1", kernel_phase1, 1),
                            ("phase1_nofori", kernel_phase1_nofori, 1),
                            ("phase2", kernel_phase2, 2)]:
        for C in (50,):
            try:
                f = _make(body, C, n, nsc)
                t = _time(f, A)
                print(f"{name} C={C}: {t:7.2f} ms")
            except Exception as e:
                print(f"{name} C={C}: FAILED {type(e).__name__} "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
