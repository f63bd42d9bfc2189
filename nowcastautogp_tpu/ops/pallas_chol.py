"""Pallas batched blocked Cholesky + triangular solves for the masked LML core.

Why this kernel exists (measured on v5e, P=200, n=192, depth-4 trees): XLA
lowers ``jnp.linalg.cholesky`` / ``triangular_solve`` to loop-per-column
``while`` programs whose per-iteration control-flow + HBM round-trips are
latency-bound — 12 ms forward and ~17 ms backward of a 45 ms LML-grad, at
<5% of roofline.  Here the whole factorization + solve for a *chunk* of C
particles runs inside one Pallas program with everything VMEM-resident:

* particles ride the leading (sublane-friendly) axis, so every step of the
  right-looking blocked factorization is a wide VPU op over all C particles
  at once;
* the outer loop over the nb = n/16 column blocks is unrolled at trace time
  (static slices), while the b=16 inner column steps are ``fori_loop`` with
  a traced index — Mosaic has no scatter/gather, so all column selects and
  updates are where-masks over iota (keeps program size, and hence Mosaic
  compile time on the tunneled TPU, bounded);
* rank-b updates are b-term outer-product accumulations on the VPU (Mosaic
  cannot lower *batched* ``dot_general``); the one genuinely big product,
  ``K^{-1} = L^{-T} L^{-1}``, runs as a batched XLA matmul on the MXU
  outside the kernel.

The backward pass never differentiates through the factorization: the LML
gradient w.r.t. the kernel matrix is analytic,

    d lml / dK = 0.5 * (alpha alpha^T - K^{-1}),    alpha = K^{-1} y,

so the VJP only needs K^{-1} from the triangular-inverse kernel.  This
replaces the engine-internal Cholesky/LML machinery of the reference's
AutoGP dependency (SURVEY.md §2.3 "engine-internal machinery"); the
masked-identity contract matches ``ops/lml.py``.

Non-PSD proposals produce NaN (from ``rsqrt`` of a negative pivot) which
propagates to the LML exactly like XLA's Cholesky, so the ``-1e10``
rejection guard in ``ops/lml.py`` keeps working.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chol_solve_batched", "chol_inverse_batched", "lml_core"]

_BLOCK = 32  # factorization block size (n is always a multiple of 64)


def _interpret() -> bool:
    """Interpret mode off-TPU so CPU tests exercise the same code path."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def _chunk_for(n: int, p: int, bufs: float) -> int:
    """Particles per program, minimizing padding within the VMEM budget.

    ``bufs`` is the kernel's measured live-buffer count in units of
    (n, n) f32 per particle (solve ~2.75: in+out blocks + carries;
    inverse ~6.7: in+out+scratch + fori carries); the budget stays under
    the raised 32 MB scoped-vmem limit with headroom.
    """
    budget = min(64, max(16, int(26e6 // (bufs * n * n * 4)) // 8 * 8))
    if p <= budget:
        return p
    # prefer the least padding among chunks in [max(budget/2, 16), budget]
    best, best_pad = budget, (-p) % budget
    for c in range(budget, max(budget // 2, 16) - 1, -8):
        pad = (-p) % c
        if pad < best_pad:
            best, best_pad = c, pad
            if pad == 0:
                break
    return best


def _row_j(M, j):
    """M[:, j, :] for traced j via a one-hot reduce: (C, b, b) -> (C, b)."""
    b = M.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1) == j)
    return jnp.sum(jnp.where(onehot, M, 0.0), axis=1)


def _col_j(M, j):
    """M[:, :, j] for traced j: (C, r, b) -> (C, r)."""
    b = M.shape[2]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2) == j)
    return jnp.sum(jnp.where(onehot, M, 0.0), axis=2)


def _vec_j(v, j):
    """v[:, j] for traced j: (C, b) -> (C,)."""
    b = v.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) == j)
    return jnp.sum(jnp.where(onehot, v, 0.0), axis=1)


def _diag_chol(D):
    """Left-looking Cholesky of (C, b, b); fori over columns, masked selects."""
    C, b, _ = D.shape
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)       # row ids
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)    # col ids

    def body(j, L):
        Lrow = _row_j(L, j)                                     # (C, b)
        acc = jnp.sum(L * Lrow[:, None, :], axis=-1)            # (C, b)
        v = _col_j(D, j) - acc
        dj = _vec_j(v, j)
        inv_sqrt = jax.lax.rsqrt(dj)
        colj = jnp.where(rowv > j, v * inv_sqrt[:, None], 0.0)
        colj = jnp.where(rowv == j, (dj * inv_sqrt)[:, None], colj)
        return jnp.where(colm == j, colj[:, :, None], L)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(D))


def _panel_solve(Lb, B):
    """Solve X @ Lb^T = B for X: (C, r, b) given diag block Lb (C, b, b)."""
    b = Lb.shape[1]
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    def body(j, X):
        Lrow = _row_j(Lb, j)                                    # (C, b)
        ljj = _vec_j(Lrow, j)                                   # (C,)
        acc = jnp.sum(X * Lrow[:, None, :], axis=-1)            # (C, r)
        Xj = (_col_j(B, j) - acc) / ljj[:, None]
        return jnp.where(colm == j, Xj[:, :, None], X)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(B))


def _fwd_sub_block(Lb, r):
    """Solve Lb z = r within one block: Lb (C, b, b), r (C, b)."""
    b = Lb.shape[1]
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(j, zb):
        Lrow = _row_j(Lb, j)
        ljj = _vec_j(Lrow, j)
        acc = jnp.sum(Lrow * zb, axis=-1)
        zj = (_vec_j(r, j) - acc) / ljj
        return jnp.where(colv == j, zj[:, None], zb)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(r))


def _bwd_sub_block(Lb, r):
    """Solve Lb^T a = r within one block."""
    b = Lb.shape[1]
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(i, ab):
        j = b - 1 - i
        Lcol = _col_j(Lb, j)                                    # (C, b)
        ljj = _vec_j(Lcol, j)
        acc = jnp.sum(Lcol * ab, axis=-1)
        aj = (_vec_j(r, j) - acc) / ljj
        return jnp.where(colv == j, aj[:, None], ab)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(r))


_UNROLL = 1  # >1 crashes the Mosaic compile at n=192 (see PLAN.md)


def _rank_b_downdate(T, X):
    """T - X X^T: fori over b/_UNROLL chunks of rank-1 terms.

    One rank-1 term per fori body re-reads and re-writes the whole trailing
    matrix each iteration (measured 17 ms fwd vs XLA's 12 at P=200/n=192);
    unrolling _UNROLL terms inside the body amortizes that traffic.
    """
    b = X.shape[-1]

    def body(i, T):
        base = i * _UNROLL
        for d in range(_UNROLL):
            xk = _col_j(X, base + d)                            # (C, r)
            T = T - xk[:, :, None] * xk[:, None, :]
        return T

    return jax.lax.fori_loop(0, b // _UNROLL, body, T)


def _push_down(R, L_panel, Xb):
    """R - L_panel @ Xb, _UNROLL rank-1 terms per fori body."""
    b = L_panel.shape[-1]

    def body(i, R):
        base = i * _UNROLL
        for d in range(_UNROLL):
            R = R - (_col_j(L_panel, base + d)[:, :, None]
                     * _row_j(Xb, base + d)[:, None, :])
        return R

    return jax.lax.fori_loop(0, b // _UNROLL, body, R)


def _chol_solve_kernel(K_ref, ym_ref, L_ref, alpha_ref):
    """Factor K = L L^T and solve K alpha = ym for one particle chunk."""
    n = K_ref.shape[1]
    b = _BLOCK
    nb = n // b
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    L_ref[:, :, :] = K_ref[:, :, :]
    # ---- right-looking blocked factorization (outer blocks unrolled)
    for k in range(nb):
        s = k * b
        Lb = _diag_chol(L_ref[:, s:s + b, s:s + b])
        below = (row_ids >= s + b).astype(jnp.float32)
        X = _panel_solve(Lb, L_ref[:, :, s:s + b]) * below[None, :, None]
        L_ref[:, :, s:s + b] = X
        L_ref[:, s:s + b, s:s + b] = Lb
        if k + 1 < nb:
            t = s + b
            L_ref[:, t:, t:] = _rank_b_downdate(L_ref[:, t:, t:], X[:, t:, :])

    # ---- forward substitution: L z = ym  (right-looking: solve a block,
    # immediately push its contribution down to the remaining rhs)
    r = ym_ref[:, :]                                            # (C, n)
    for k in range(nb):
        s = k * b
        zb = _fwd_sub_block(L_ref[:, s:s + b, s:s + b], r[:, s:s + b])
        # place zb into the solution (reuse r's slots: rhs there is consumed)
        parts = ([r[:, :s]] if s else []) + [zb] + (
            [r[:, s + b:]] if s + b < n else [])
        r = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        if k + 1 < nb:
            t = s + b

            def push_z(j, rt, zb=zb, Lp=L_ref[:, s + b:, s:s + b]):
                return rt - _col_j(Lp, j) * _vec_j(zb, j)[:, None]

            r = jnp.concatenate(
                [r[:, :t], jax.lax.fori_loop(0, b, push_z, r[:, t:])],
                axis=1,
            )
    z = r

    # ---- backward substitution: L^T alpha = z (bottom block up, push up)
    r = z
    for k in range(nb - 1, -1, -1):
        s = k * b
        ab = _bwd_sub_block(L_ref[:, s:s + b, s:s + b], r[:, s:s + b])
        parts = ([r[:, :s]] if s else []) + [ab] + (
            [r[:, s + b:]] if s + b < n else [])
        r = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        if k > 0:
            def push_a(j, rh, ab=ab, Lp=L_ref[:, s:s + b, :s]):
                return rh - _row_j(Lp, j) * _vec_j(ab, j)[:, None]

            r = jnp.concatenate(
                [jax.lax.fori_loop(0, b, push_a, r[:, :s]), r[:, s:]],
                axis=1,
            )
    alpha_ref[:, :] = r


def _tri_inverse_kernel(L_ref, X_ref, R_ref):
    """X = L^{-1} via right-looking blocked forward substitution.

    R_ref is a (C, n, n) VMEM scratch holding the running RHS (init I);
    after each block solve its contribution is pushed down to later rows,
    so every correction is one rank-b product instead of a growing sum.
    """
    C, n, _ = L_ref.shape
    b = _BLOCK
    nb = n // b
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    eye_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    R_ref[:, :, :] = jnp.broadcast_to(
        (eye_r == eye_c).astype(jnp.float32)[None], (C, n, n)
    )

    rowm = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    for k in range(nb):
        s = k * b
        Rk = R_ref[:, s:s + b, :]                               # (C, b, n)
        Lb = L_ref[:, s:s + b, s:s + b]

        def body(j, Xb):
            Lrow = _row_j(Lb, j)                                # (C, b)
            ljj = _vec_j(Lrow, j)
            acc = jnp.sum(Lrow[:, :, None] * Xb, axis=1)        # (C, n)
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, b, 1), 1) == j)
            Rj = jnp.sum(jnp.where(onehot, Rk, 0.0), axis=1)    # (C, n)
            Xj = (Rj - acc) / ljj[:, None]
            return jnp.where(rowm == j, Xj[:, None, :], Xb)

        Xb = jax.lax.fori_loop(0, b, body, jnp.zeros((C, b, n), jnp.float32))
        X_ref[:, s:s + b, :] = Xb
        if k + 1 < nb:
            t = s + b
            R_ref[:, t:, :] = _push_down(
                R_ref[:, t:, :], L_ref[:, t:, s:s + b], Xb
            )


def _pad_particles(arrs, P, C):
    """Pad the particle axis to a multiple of the chunk size."""
    rem = (-P) % C
    if rem == 0:
        return [a for a, _ in arrs], P
    out = []
    for a, fill in arrs:
        pad = [(0, rem)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad, constant_values=fill))
    return out, P + rem


@functools.partial(jax.jit, static_argnames=())
def chol_solve_batched(K, ym):
    """Batched (L, alpha) with L L^T = K and K alpha = ym.

    K: (P, n, n) with the masked-identity contract of ``ops/lml.py``;
    ym: (P, n).  Returns (L (P, n, n), alpha (P, n)).
    """
    P, n, _ = K.shape
    if n % _BLOCK != 0:
        raise ValueError(
            f"pallas Cholesky requires n to be a multiple of {_BLOCK} "
            f"(got n={n}); pad the capacity or use the jnp LML backend"
        )
    C = _chunk_for(n, P, bufs=4.0)
    (K_p, ym_p), Pp = _pad_particles(((K, 0.0), (ym, 0.0)), P, C)
    if Pp != P:
        # padded rows factor the identity: cheap and NaN-free
        eye = jnp.eye(n, dtype=K.dtype)
        K_p = K_p.at[P:].set(eye[None])
    grid = (Pp // C,)
    L, alpha = pl.pallas_call(
        _chol_solve_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((C, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, n, n), K.dtype),
            jax.ShapeDtypeStruct((Pp, n), K.dtype),
        ],
        interpret=_interpret(),
    )(K_p, ym_p)
    return L[:P], alpha[:P]


@functools.partial(jax.jit, static_argnames=())
def chol_inverse_batched(L):
    """Batched K^{-1} from Cholesky factors L (P, n, n)."""
    P, n, _ = L.shape
    if n % _BLOCK != 0:
        raise ValueError(
            f"pallas triangular inverse requires n to be a multiple of "
            f"{_BLOCK} (got n={n}); pad the capacity or use the jnp backend"
        )
    C = _chunk_for(n, P, bufs=6.8)
    (L_p,), Pp = _pad_particles(((L, 0.0),), P, C)
    if Pp != P:
        eye = jnp.eye(n, dtype=L.dtype)
        L_p = L_p.at[P:].set(eye[None])
    grid = (Pp // C,)
    X = pl.pallas_call(
        _tri_inverse_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((C, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, n, n), L.dtype),
        scratch_shapes=[pltpu.VMEM((C, n, n), jnp.float32)],
        interpret=_interpret(),
    )(L_p)
    # K^{-1} = X^T X: the one genuinely big product — batched MXU in XLA.
    # HIGHEST precision: the TPU MXU's default bf16 passes cost ~3 decimal
    # digits on K^{-1}, which feeds HMC gradients directly.
    Kinv = jax.lax.dot_general(
        X, X, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return Kinv[:P]


# --------------------------------------------------------------------------
# lml core with analytic VJP:  lml_core(K, ym) = -0.5 (ym^T K^{-1} ym + logdet K)
# --------------------------------------------------------------------------


@jax.custom_vjp
def lml_core(K, ym):
    """-0.5 * (quad + logdet) of the masked GP evidence, batched over P."""
    L, alpha = chol_solve_batched(K, ym)
    return _finish(L, alpha, ym)


def _finish(L, alpha, ym):
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(diag), axis=-1)
    quad = jnp.sum(ym * alpha, axis=-1)
    return -0.5 * (quad + logdet)


def _lml_core_fwd(K, ym):
    L, alpha = chol_solve_batched(K, ym)
    return _finish(L, alpha, ym), (L, alpha)


def _lml_core_bwd(res, g):
    L, alpha = res
    Kinv = chol_inverse_batched(L)
    outer = alpha[:, :, None] * alpha[:, None, :]
    dK = 0.5 * (outer - Kinv) * g[:, None, None]
    dym = -alpha * g[:, None]
    return dK, dym


lml_core.defvjp(_lml_core_fwd, _lml_core_bwd)
