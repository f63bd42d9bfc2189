"""Isolated TPU bring-up for the megacov kernel: one stage per process.

Usage: python tools/debug_mega.py STAGE
  fwd-small | fwd-mid | fwd-full | bwd-small | bwd-mid | bwd-full | lml-full
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make(P, depth, n, seed=0):
    from nowcastautogp_tpu.models.config import GPConfig
    from nowcastautogp_tpu.models.structures import sample_particle

    cfg = GPConfig(max_depth=depth)
    rng = np.random.default_rng(seed)
    ts, ps = [], []
    for _ in range(P):
        t, p, _ = sample_particle(rng, cfg)
        ts.append(t), ps.append(p)
    types = jnp.asarray(np.stack(ts).astype(np.int32))
    params = jnp.asarray(np.stack(ps).astype(np.float32))
    x = jnp.broadcast_to(jnp.linspace(0, 1, n), (P, n)).astype(jnp.float32)
    return types, params, x


def main():
    from nowcastautogp_tpu.ops import pallas_megacov as mega
    from nowcastautogp_tpu.ops.kernels import eval_cov_impl

    stage = sys.argv[1]
    shapes = {"small": (4, 3, 64), "mid": (16, 5, 64), "full": (200, 5, 192)}
    kind, size = stage.split("-")
    if size.isdigit():  # e.g. bwd-128: P=200 depth-5 at that n
        P, depth, n = 200, 5, int(size)
    else:
        P, depth, n = shapes[size]
    types, params, x = make(P, depth, n)
    t0 = time.time()
    if kind == "fwd":
        fwd = jax.jit(mega.cov_batched_fused)
        K = jax.block_until_ready(fwd(types, params, x))
        print(f"fwd compile+run {time.time()-t0:.1f}s")
        K_ref = jax.vmap(eval_cov_impl, in_axes=(0, 0, 0, 0))(
            types, params, x, x)
        err = float(jnp.max(jnp.abs(K - K_ref)))
        rel = err / float(jnp.max(jnp.abs(K_ref)))
        print(f"max abs err {err:.3e} rel {rel:.3e}")
        t0 = time.time()
        for _ in range(20):
            K = fwd(types, params, x)
        jax.block_until_ready(K)
        print(f"fwd {(time.time()-t0)/20*1e3:.2f} ms")
    elif kind == "bwd":
        f = jax.jit(jax.grad(
            lambda p: jnp.sum(mega.cov_batched_fused(types, p, x) ** 2)))
        g = jax.block_until_ready(f(params))
        print(f"bwd compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(10):
            g = f(params)
        jax.block_until_ready(g)
        print(f"grad {(time.time()-t0)/10*1e3:.2f} ms", flush=True)
        if os.environ.get("SKIP_PARITY"):
            return
        fr = jax.jit(jax.grad(lambda p: jnp.sum(jax.vmap(
            eval_cov_impl, in_axes=(0, 0, 0, 0))(types, p, x, x) ** 2)))
        gr = jax.block_until_ready(fr(params))
        err = float(jnp.max(jnp.abs(g - gr)))
        scale = float(jnp.max(jnp.abs(gr))) or 1.0
        print(f"grad max abs err {err:.3e} rel {err/scale:.3e}")
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
