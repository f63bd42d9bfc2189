"""Layout-stable panel Cholesky for composition with Pallas producers.

Why a third Cholesky implementation (after XLA's While-loop expander and
``chol_static.py``'s Schur recursion): composed after the fused Pallas
covariance kernel, XLA's layout assignment turns the *recursion* into a
layout ping-pong — the HLO for the composed forward carries ~1.5k copy ops
across layouts {2,1,0}/{1,2,0}/{0,2,1} and 16.8 GB of bytes accessed vs
1.2 GB for the expander path (tools/dump_hlo_inv.py), which is why a 3.6 ms
standalone factorization measured 18 ms in context (PLAN.md round-3 log).

This version is shaped so layout assignment has nothing to disagree about:

* a single static loop over 32-wide panels (n must be a 32-multiple — all
  fit capacities are, by the 32-granule bucketing);
* every matmul is an einsum contracting the LAST axis of both operands
  (``X = S21 @ M^T`` and ``S' = S22 - X @ X^T`` are the same ``pik,pjk->pij``
  form), so every dot prefers the same {2,1,0} operand layout the Pallas
  custom call produces;
* slices only ever take leading corners of the shrinking Schur complement;
* the 32x32 diagonal block is factorized and inverted by fully unrolled
  rank-1 steps on (P, 32, 32) tensors — trace-time control flow only.

Numerics match ``jnp.linalg.cholesky`` to f32 roundoff on SPD inputs; a
non-SPD pivot produces NaN in that batch element only (sqrt of a negative
leading minor), which the LML guard maps to −1e10 exactly like the other
implementations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cholesky_panel", "tri_inv_panel", "PANEL"]

PANEL = 32
_PREC = jax.lax.Precision.HIGHEST


def _chol_base(A):
    """Unrolled Cholesky-Banachiewicz for (..., b, b); b static and small."""
    b = A.shape[-1]
    L = jnp.zeros_like(A)
    for k in range(b):
        d = jnp.sqrt(A[..., k, k])
        col = A[..., :, k] / d[..., None]
        col = jnp.where(jnp.arange(b) >= k, col, 0.0)
        L = L + col[..., :, None] * (jnp.arange(b) == k)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def _tri_inv_base(L):
    """Unrolled inverse of a lower-triangular (..., b, b) block.

    Row-by-row forward substitution on the identity; b static and small.
    """
    b = L.shape[-1]
    eye = jnp.eye(b, dtype=L.dtype)
    M = jnp.zeros_like(L)
    for k in range(b):
        # row k of M: (e_k - L[k, :k] @ M[:k]) / L[k, k]
        lk = jnp.where(jnp.arange(b) < k, L[..., k, :], 0.0)   # (..., b)
        acc = jnp.einsum("...j,...ji->...i", lk, M, precision=_PREC)
        row = (eye[k] - acc) / L[..., k, k][..., None]
        M = M + row[..., None, :] * (jnp.arange(b) == k)[:, None]
    return M


def cholesky_panel(A):
    """Batched lower Cholesky of (P, n, n); n a positive multiple of 32."""
    n = A.shape[-1]
    assert n % PANEL == 0 and n > 0, n
    S = A
    panels = []          # panel k: (P, n - k*PANEL, PANEL)
    for k in range(n // PANEL):
        m = S.shape[-1]
        L11 = _chol_base(S[:, :PANEL, :PANEL])
        if m > PANEL:
            M = _tri_inv_base(L11)                       # L11^{-1}
            S21 = S[:, PANEL:, :PANEL]
            # X = S21 L11^{-T}; contract last axes of both operands
            X = jnp.einsum("pik,pjk->pij", S21, M, precision=_PREC)
            S = S[:, PANEL:, PANEL:] - jnp.einsum(
                "pik,pjk->pij", X, X, precision=_PREC)
            panels.append(jnp.concatenate([L11, X], axis=1))
        else:
            panels.append(L11)
    cols = []
    for k, pan in enumerate(panels):
        if k:
            pad = jnp.zeros(A.shape[:1] + (k * PANEL, PANEL), A.dtype)
            pan = jnp.concatenate([pad, pan], axis=1)
        cols.append(pan)
    return jnp.concatenate(cols, axis=2)


def tri_inv_panel(L):
    """Batched inverse of lower-triangular (P, n, n); n a multiple of 32.

    Blocked forward substitution: with block index over 32-wide panels,
    ``W[j][j] = inv(L[j][j])`` and
    ``W[i][j] = -inv(L[i][i]) @ (sum_{j<=k<i} L[i][k] @ W[k][j])`` —
    trace-time loops over block pairs, so the whole inverse is straight-line
    batched 32x32 matmuls instead of XLA's While-loop triangular-solve
    expansion.  Pairs with ``cholesky_panel`` to materialize ``A^{-1}`` for
    the analytic-VJP LML core without any sequential device loop.
    """
    n = L.shape[-1]
    assert n % PANEL == 0 and n > 0, n
    nb = n // PANEL

    def blk(i, j):
        return L[:, i * PANEL:(i + 1) * PANEL, j * PANEL:(j + 1) * PANEL]

    M = [_tri_inv_base(blk(i, i)) for i in range(nb)]
    W = {}
    for i in range(nb):
        W[(i, i)] = M[i]
        for j in range(i):
            acc = 0.0
            for k in range(j, i):
                acc = acc + jnp.einsum(
                    "pik,pkj->pij", blk(i, k), W[(k, j)], precision=_PREC)
            W[(i, j)] = -jnp.einsum(
                "pik,pkj->pij", M[i], acc, precision=_PREC)
    zero = jnp.zeros_like(M[0])
    rows = [
        jnp.concatenate([W.get((i, j), zero) for j in range(nb)], axis=2)
        for i in range(nb)
    ]
    return jnp.concatenate(rows, axis=1)
