"""Microbench: statically-blocked Cholesky vs XLA's expander (TPU).

The fit's chol+solve core measured 12.4 ms fwd / 17.5 ms grad at
(200,192,192) via jnp.linalg.cholesky — latency-bound (While-loop expander).
This times ops/chol_static.py's trace-time Schur recursion on the same
shapes.
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


def _time(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax.scipy.linalg as jsl

    from nowcastautogp_tpu.ops.chol_static import (
        cho_solve_static, cholesky_static,
    )

    P, n = 200, 192
    rng = np.random.default_rng(0)
    M = rng.standard_normal((P, n, n)).astype(np.float32)
    A = jnp.asarray((M @ M.transpose(0, 2, 1)) / n
                    + 2 * np.eye(n, dtype=np.float32))
    ym = jnp.asarray(rng.standard_normal((P, n)).astype(np.float32))

    def lml_static(A_):
        L = cholesky_static(A_)
        al = cho_solve_static(L, ym)
        return jnp.sum(-0.5 * (
            jnp.einsum("pn,pn->p", ym, al)
            + 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)))

    def lml_xla(A_):
        L = jnp.linalg.cholesky(A_)
        al = jax.vmap(lambda l, b: jsl.cho_solve((l, True), b))(L, ym)
        return jnp.sum(-0.5 * (
            jnp.einsum("pn,pn->p", ym, al)
            + 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)))

    for name, f in (("static", lml_static), ("xla", lml_xla)):
        v = float(jax.jit(f)(A))
        t_f = _time(jax.jit(f), A)
        t_g = _time(jax.jit(jax.grad(f)), A)
        print(f"{name:7s} lml {v:.1f}  fwd {t_f:6.2f} ms  grad {t_g:6.2f} ms")

    chol_s = jax.jit(cholesky_static)
    chol_x = jax.jit(jnp.linalg.cholesky)
    print(f"chol only: static {_time(chol_s, A):.2f} ms  "
          f"xla {_time(chol_x, A):.2f} ms")


if __name__ == "__main__":
    main()
