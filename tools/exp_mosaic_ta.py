"""Mosaic capability probe for the fused LML kernel (ops/pallas_megalml.py):

  1. transpose_a batched dot: (C, k, m)^T @ (C, k, n) via dimension_numbers
     (((1,), (1,)), ((0,), (0,))) — needed for Ainv = X^T X and
     alpha = X^T z inside one kernel.
  2. jnp.swapaxes(v, 1, 2) on a (C, n, n) VMEM value — the fallback.

Usage: python tools/exp_mosaic_ta.py [--c 2] [--n 192]
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
from jax.experimental import pallas as pl


def _probe(name, kernel, args_np, out_shape, ref_fn):
    a = [jnp.asarray(x) for x in args_np]
    f = jax.jit(lambda *xs: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(*xs))
    try:
        t0 = time.perf_counter()
        out = f(*a)
        np_out = np.asarray(out)
        compile_s = time.perf_counter() - t0
        err = float(np.max(np.abs(np_out - ref_fn(*args_np))))
        print(f"{name}: OK compile {compile_s:.1f}s max_err {err:.2e}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=2)
    ap.add_argument("--n", type=int, default=192)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    C, n = args.c, args.n
    rng = np.random.default_rng(0)
    X = rng.standard_normal((C, n, n)).astype(np.float32)
    Y = rng.standard_normal((C, n, n)).astype(np.float32)
    z = rng.standard_normal((C, n, 1)).astype(np.float32)

    def k_ta(x_ref, y_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            x_ref[:, :, :], y_ref[:, :, :],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    _probe("transpose_a dot (C,k,m)T@(C,k,n)", k_ta, (X, Y), (C, n, n),
           lambda x, y: np.einsum("cki,ckj->cij", x, y))

    def k_ta_vec(x_ref, z_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            x_ref[:, :, :], z_ref[:, :, :],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    _probe("transpose_a matvec (C,k,n)T@(C,k,1)", k_ta_vec, (X, z),
           (C, n, 1),
           lambda x, v: np.einsum("cki,ckj->cij", x, v))

    def k_swap(x_ref, o_ref):
        o_ref[:, :, :] = jnp.swapaxes(x_ref[:, :, :], 1, 2)

    _probe("swapaxes(1,2) on (C,n,n)", k_swap, (X,), (C, n, n),
           lambda x: np.swapaxes(x, 1, 2))


if __name__ == "__main__":
    main()
