"""Statically-blocked batched Cholesky / triangular solves in pure XLA.

XLA's built-in ``cholesky`` / ``triangular_solve`` on TPU expand into While
loops over dynamic-sliced panels — measured 11.7 ms fwd / +5.2 ms bwd for
the (200, 192, 192) batch the fit factorizes, ~1000x above the chip's FLOP
floor (it is latency/serialization-bound, not compute-bound).  This module
replaces them with a *trace-time* Schur-complement recursion: every block
index is static, so XLA sees straight-line code whose heavy steps are big
batched matmuls (MXU) and whose sequential tail is a small unrolled rank-1
base case.  No Pallas needed — the win is purely a better lowering shape.

    chol([[A11, A21ᵀ], [A21, A22]]) =
        L11 = chol(A11)
        X   = A21 L11⁻ᵀ                (triangular solve, recursive)
        L22 = chol(A22 − X Xᵀ)         (Schur complement)

All functions take batched ``(..., n, n)`` operands; matmul accumulation is
forced to f32 (``precision=HIGHEST``) — the TPU MXU default is bf16, which
costs ~3 decimal digits on K⁻¹-style products (PLAN.md round-2 learnings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cholesky_static", "solve_lower_static", "cho_solve_static"]

_BASE = 16
_PREC = jax.lax.Precision.HIGHEST


def _chol_base(A):
    """Unrolled Cholesky-Banachiewicz for (..., b, b), b <= _BASE (static)."""
    b = A.shape[-1]
    L = jnp.zeros_like(A)
    for k in range(b):
        d = jnp.sqrt(A[..., k, k])
        col = A[..., :, k] / d[..., None]                  # (..., b)
        keep = jnp.arange(b) >= k
        col = jnp.where(keep, col, 0.0)
        L = L + col[..., :, None] * (jnp.arange(b) == k)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def cholesky_static(A):
    """Batched lower Cholesky of (..., n, n); n a multiple of 8.

    Matches ``jnp.linalg.cholesky`` for SPD inputs (NaN columns, not rows,
    may differ for non-SPD inputs — the LML's isfinite guard treats both as
    rejection).
    """
    n = A.shape[-1]
    if n <= _BASE:
        return _chol_base(A)
    m = ((n // 2 + 7) // 8) * 8
    A11 = A[..., :m, :m]
    A21 = A[..., m:, :m]
    A22 = A[..., m:, m:]
    L11 = cholesky_static(A11)
    # X = A21 L11^{-T}  <=>  L11 X^T = A21^T; solve then transpose back
    X = _solve_lower_right_T(L11, A21)
    S = A22 - _mm(X, jnp.swapaxes(X, -1, -2))
    L22 = cholesky_static(S)
    top = jnp.concatenate(
        [L11, jnp.zeros_like(A[..., :m, m:])], axis=-1)
    bot = jnp.concatenate([X, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _solve_lower_base(L, B):
    """Forward substitution: solve L Y = B for (..., b, b) lower L (static)."""
    b = L.shape[-1]
    Y = jnp.zeros_like(B)
    R = B
    for k in range(b):
        yk = R[..., k, :] / L[..., k, k][..., None]        # (..., m)
        Y = Y + yk[..., None, :] * (jnp.arange(b) == k)[..., :, None]
        R = R - L[..., :, k][..., :, None] * yk[..., None, :]
    return Y


def solve_lower_static(L, B):
    """Solve L Y = B (L lower-triangular (..., n, n), B (..., n, m))."""
    n = L.shape[-1]
    if n <= _BASE:
        return _solve_lower_base(L, B)
    s = ((n // 2 + 7) // 8) * 8
    L11 = L[..., :s, :s]
    L21 = L[..., s:, :s]
    L22 = L[..., s:, s:]
    Y1 = solve_lower_static(L11, B[..., :s, :])
    Y2 = solve_lower_static(L22, B[..., s:, :] - _mm(L21, Y1))
    return jnp.concatenate([Y1, Y2], axis=-2)


def _solve_lower_right_T(L, B):
    """Solve X L^T = B for X (i.e. X = B L^{-T}), L lower (..., s, s),
    B (..., m, s) — the off-diagonal panel step of the Cholesky recursion."""
    Y = solve_lower_static(L, jnp.swapaxes(B, -1, -2))
    return jnp.swapaxes(Y, -1, -2)


def _solve_upper_static(L, B):
    """Solve L^T Y = B given lower L (back substitution, recursive)."""
    n = L.shape[-1]
    if n <= _BASE:
        b = n
        Y = jnp.zeros_like(B)
        R = B
        for k in range(b - 1, -1, -1):
            yk = R[..., k, :] / L[..., k, k][..., None]
            Y = Y + yk[..., None, :] * (jnp.arange(b) == k)[..., :, None]
            R = R - L[..., k, :][..., :, None] * yk[..., None, :]
        return Y
    s = ((n // 2 + 7) // 8) * 8
    L11 = L[..., :s, :s]
    L21 = L[..., s:, :s]
    L22 = L[..., s:, s:]
    Y2 = _solve_upper_static(L22, B[..., s:, :])
    Y1 = _solve_upper_static(
        L11, B[..., :s, :] - _mm(jnp.swapaxes(L21, -1, -2), Y2))
    return jnp.concatenate([Y1, Y2], axis=-2)


def cho_solve_static(L, b):
    """Solve (L L^T) x = b for (..., n) b given lower L."""
    y = solve_lower_static(L, b[..., :, None])
    x = _solve_upper_static(L, y)
    return x[..., 0]
