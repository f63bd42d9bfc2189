"""Mosaic capability probe: batched dot_general inside a Pallas TPU kernel.

Answers two questions for the fused Cholesky design (PLAN.md round-3):
  1. Does Mosaic lower a *batched* ``dot_general`` (C, m, k) @ (C, k, n)?
  2. If not, what do trace-time per-lane 2D MXU dots cost (compile + run)
     for a syrk-style rank-32 block downdate at chol panel shapes?

Usage: python tools/exp_mosaic_dots.py [--c 8] [--n 160]
"""

from __future__ import annotations

import argparse
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


def _time(f, *args, n=50, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def probe_batched_dot(C, m, k, n):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            a_ref[:, :, :], b_ref[:, :, :],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (C, m, k)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        (C, k, n)), jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, m, n), jnp.float32),
    )(a, b))
    t0 = time.perf_counter()
    out = f(a, b)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    ref = jnp.einsum("cmk,ckn->cmn", a, b)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"batched dot_general: OK compile {compile_s:.1f}s "
          f"max_err {err:.2e} run {_time(f, a, b):.3f} ms")


def probe_unrolled_lanes(C, m, k, n):
    """Per-lane 2D dots, trace-time unrolled over C."""

    def kernel(a_ref, b_ref, o_ref):
        for c in range(C):
            o_ref[c, :, :] = jnp.dot(
                a_ref[c, :, :], b_ref[c, :, :],
                preferred_element_type=jnp.float32,
            )

    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (C, m, k)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        (C, k, n)), jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, m, n), jnp.float32),
    )(a, b))
    t0 = time.perf_counter()
    out = f(a, b)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    ref = jnp.einsum("cmk,ckn->cmn", a, b)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"unrolled {C} lane dots: OK compile {compile_s:.1f}s "
          f"max_err {err:.2e} run {_time(f, a, b):.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--n", type=int, default=160)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    C = args.c
    m = args.n - 32  # largest trailing panel
    print(f"probe shapes: ({C},{m},32) @ ({C},32,{m})")
    try:
        probe_batched_dot(C, m, 32, m)
    except Exception as e:
        print(f"batched dot_general: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}")
    try:
        probe_unrolled_lanes(C, m, 32, m)
    except Exception as e:
        print(f"unrolled lane dots: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
