"""Fused Pallas TPU kernel: batched L^{-1} from A via blocked Cholesky on MXU.

Why this exists (measured v5e, P=200, n=160, tools/microbench_lml.py): the
LML forward is 13.4 ms of which ~11.5 ms is XLA's batched Cholesky — a
loop-per-column While program whose per-iteration latency dwarfs its FLOPs
(200 x 160^3/3 = 0.27 GFLOP -> 0.024 TFLOP/s).  Round 2's Pallas Cholesky
(``ops/pallas_chol.py``) could not beat it because Mosaic then had no
batched ``dot_general`` lowering, forcing the O(n^3) trailing updates into
rank-1 VPU fori loops.  That constraint is gone: current Mosaic lowers
``(C, m, k) @ (C, k, n)`` batch dots natively (tools/exp_mosaic_dots.py),
so this kernel keeps the whole factorization + triangular inverse
VMEM-resident with every panel update an MXU batch-matmul; only the 32x32
diagonal-block factorizations/inversions run as 32-step fori loops.

One output is enough for the whole LML core: with ``X = L^{-1}``,

    logdet A = -2 sum log diag X        (diag L^{-1} = 1/diag L)
    alpha    = A^{-1} ym = X^T (X ym)
    A^{-1}   = X^T X

so the analytic-VJP inverse core (``ops/lml.py:_make_inv_core``) plugs this
in as a drop-in ``ainv_logdet`` with the While-loop expander removed from
the whole forward.  Replaces the engine-internal Cholesky machinery of the
reference's AutoGP dependency (SURVEY.md §2.3); the masked-identity
contract of ``ops/lml.py`` (padded rows are identity) is preserved: padded
rows factor to identity and contribute log(1) = 0.

Non-PSD inputs produce NaN (``rsqrt`` of a negative pivot) that stays
within the particle's lane (batch dots never mix lanes) and propagates to
the LML exactly like XLA's Cholesky, so the ``-1e10`` rejection guard in
``ops/lml.py`` keeps working.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tri_inv_fused", "tri_inv_body", "mxu_supported"]

_B = 32                       # panel width (capacities are 32-granule)
# One chunk's A/X/R buffers are 3 n^2 f32 per lane — 12.6 MB at n=1024, so
# daily-cadence factorizations still fit VMEM at C>=2; beyond this the
# XLA expander (which never materializes the whole batch in VMEM) remains.
_MAX_N = 1024
_VMEM_LIMIT = 100 * 1024 * 1024
_PREC_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def mxu_supported(n: int) -> bool:
    return _B <= n <= _MAX_N and n % _B == 0


def _chunk_for(n: int) -> int:
    """Particles per grid step: ~6.2 live (n, n)-f32 units per particle
    (A in + X out, both double-buffered by the pipeline, + L and R scratch
    + the (n, 32) diag-inverse cache), under the scoped-VMEM budget."""
    per = 6.2 * n * n * 4
    for c in (64, 50, 40, 32, 25, 16, 8, 4, 2, 1):
        if c * per <= _VMEM_LIMIT - 16 * 1024 * 1024:
            return c
    return 1


def _bdot(a, b, transpose_b=False):
    """Batched (C, m, k) @ (C, k, n) on the MXU at f32 precision.

    ``transpose_b`` contracts b's last axis instead: (C, m, k) @ (C, n, k)^T.
    """
    db = ((2,), (2,)) if transpose_b else ((2,), (1,))
    return jax.lax.dot_general(
        a, b, dimension_numbers=(db, ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC_HI,
    )


# Every intermediate in the diagonal-block loops stays RANK 3: a rank-2
# reduction producing a vector<Cxf32> (C == 1) hits Mosaic's "unsupported
# output implicit dimension" (observed at the fused LML kernel's C=1
# chunks, caps 416-512), while rank-3 -> rank-2 reductions lower fine.


def _row_j(M, j):
    """M[:, j:j+1, :] for traced j via a one-hot reduce: (C,b,b)->(C,1,b)."""
    b = M.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1) == j)
    return jnp.sum(jnp.where(onehot, M, 0.0), axis=1, keepdims=True)


def _col_j(M, j):
    """M[:, :, j:j+1] for traced j: (C, b, b) -> (C, b, 1)."""
    b = M.shape[2]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2) == j)
    return jnp.sum(jnp.where(onehot, M, 0.0), axis=2, keepdims=True)


def _diag_chol(D):
    """Left-looking Cholesky of (C, b, b); fori over columns, masked
    selects (Mosaic has no scatter — same pattern as ops/pallas_chol.py)."""
    C, b, _ = D.shape
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    def body(j, L):
        Lrow = _row_j(L, j)                                     # (C, 1, b)
        acc = jnp.sum(L * Lrow, axis=2, keepdims=True)          # (C, b, 1)
        v = _col_j(D, j) - acc                                  # (C, b, 1)
        dj = jnp.sum(jnp.where(rowv == j, v, 0.0),
                     axis=1, keepdims=True)                     # (C, 1, 1)
        inv_sqrt = jax.lax.rsqrt(dj)
        colj = jnp.where(rowv > j, v * inv_sqrt, 0.0)
        colj = jnp.where(rowv == j, dj * inv_sqrt, colj)        # (C, b, 1)
        return jnp.where(colm == j, colj, L)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(D))


def _small_trtri(Lb):
    """M = Lb^{-1} for (C, b, b) lower-triangular; fori over rows."""
    C, b, _ = Lb.shape
    rowm = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    def body(i, M):
        Lrow = _row_j(Lb, i)                                    # (C, 1, b)
        lii = jnp.sum(jnp.where(colm == i, Lrow, 0.0),
                      axis=2, keepdims=True)                    # (C, 1, 1)
        acc = _bdot(Lrow, M)                                    # (C, 1, b)
        onehot_i = (colm == i).astype(jnp.float32)              # (1, 1, b)
        Mi = (onehot_i - acc) / lii                             # (C, 1, b)
        return jnp.where(rowm == i, Mi, M)

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(Lb))


def _diag_chol_inv(D):
    """Fused (Lb, Lb^{-1}) of a (C, b, b) diagonal block in ONE fori loop.

    Once column ``j`` of L lands, row ``j`` of L is complete, so the
    trtri row step can ride the same iteration — halving the sequential
    step count; 1/l_jj reuses the pivot rsqrt (no second one-hot extract,
    no division).  Same math as the two-loop pair (float rounding:
    multiply-by-rsqrt vs divide-by-sqrt).

    MEASURED NEGATIVE (round 5, kept for the record + re-measuring on
    future hardware): despite half the steps, this loses ~6% to the
    split ``_diag_chol`` + ``_small_trtri`` pair on the v5e (0.343 vs
    0.325 ms standalone tri_inv at (24, 160)) — each merged iteration
    serializes chol-col -> trtri-row, while the split loops' shorter
    per-step dependency chains schedule better.  Off by default; see
    ``tri_inv_body``'s ``NGP_CHOL_MERGED_DIAG`` knob.
    """
    C, b, _ = D.shape
    rowv = jax.lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)

    def body(j, LM):
        L, M = LM
        Lrow = _row_j(L, j)                                     # (C, 1, b)
        acc = jnp.sum(L * Lrow, axis=2, keepdims=True)          # (C, b, 1)
        v = _col_j(D, j) - acc                                  # (C, b, 1)
        dj = jnp.sum(jnp.where(rowv == j, v, 0.0),
                     axis=1, keepdims=True)                     # (C, 1, 1)
        inv_sqrt = jax.lax.rsqrt(dj)
        colj = jnp.where(rowv > j, v * inv_sqrt, 0.0)
        colj = jnp.where(rowv == j, dj * inv_sqrt, colj)        # (C, b, 1)
        L = jnp.where(colm == j, colj, L)
        # trtri row j on the same iteration: the completed row j of L is
        # the pre-update row plus the diagonal entry dj * rsqrt(dj)
        Lrow_full = jnp.where(colm == j, dj * inv_sqrt, Lrow)   # (C, 1, b)
        accM = _bdot(Lrow_full, M)                              # (C, 1, b)
        onehot_j = (colm == j).astype(jnp.float32)
        Mj = (onehot_j - accM) * inv_sqrt                       # (C, 1, b)
        M = jnp.where(rowv == j, Mj, M)
        return (L, M)

    return jax.lax.fori_loop(
        0, b, body, (jnp.zeros_like(D), jnp.zeros_like(D)))


def tri_inv_body(L_ref, X_ref, R_ref, D_ref):
    """In-place X = L^{-1} with L L^T = A for one chunk, all refs VMEM.

    ``L_ref`` (C, n, n) must hold A on entry and is destroyed (holds the
    Cholesky factor on exit); ``X_ref`` receives L^{-1}; ``R_ref`` (C, n, n)
    and ``D_ref`` (C, n, _B) are scratch.  Shared between the standalone
    ``tri_inv_fused`` kernel and the fused LML value+grad kernel
    (``ops/pallas_megalml.py``), which runs it between the covariance
    assembly and the analytic-gradient node walk.
    """
    C, n, _ = L_ref.shape
    b = _B
    nb = n // b

    import os as _os

    # Round-5 A/B (v5e, standalone tri_inv at (24, 160), 300-iter chain):
    # the MERGED diag factor+invert loop (_diag_chol_inv) measured 0.343
    # ms vs 0.325 ms for this two-loop pair — halving the step count
    # LOSES to the split form's shorter per-step dependency chains (the
    # merged iteration serializes chol-col -> trtri-row, while the split
    # loops overlap better in Mosaic's schedule).  Split stays default;
    # NGP_CHOL_MERGED_DIAG=1 re-enables the merged form for re-measuring.
    merged_diag = _os.environ.get("NGP_CHOL_MERGED_DIAG") == "1"

    # ---- phase 1: blocked right-looking Cholesky; panel updates on MXU
    for k in range(nb):
        s = k * b
        if merged_diag:
            Lb, Lbinv = _diag_chol_inv(L_ref[:, s:s + b, s:s + b])
        else:
            Lb = _diag_chol(L_ref[:, s:s + b, s:s + b])
            Lbinv = _small_trtri(Lb)
        L_ref[:, s:s + b, s:s + b] = Lb
        D_ref[:, s:s + b, :] = Lbinv
        if k + 1 < nb:
            t = s + b
            # panel solve X L_b^T = B  =>  X = B @ Lbinv^T   (MXU)
            Xp = _bdot(L_ref[:, t:, s:s + b], Lbinv, transpose_b=True)
            L_ref[:, t:, s:s + b] = Xp
            # trailing downdate T -= Xp Xp^T                  (MXU)
            L_ref[:, t:, t:] = L_ref[:, t:, t:] - _bdot(
                Xp, Xp, transpose_b=True)

    # ---- phase 2: blocked trtri, row blocks top-down; updates on MXU.
    # R holds the running RHS (init I); after solving row-block k its
    # contribution is pushed down so each correction is one batch matmul.
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    eye_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    R_ref[:, :, :] = jnp.broadcast_to(
        (eye_r == eye_c).astype(jnp.float32)[None], (C, n, n))
    for k in range(nb):
        s = k * b
        Xrow = _bdot(D_ref[:, s:s + b, :], R_ref[:, s:s + b, :])  # (C,b,n)
        X_ref[:, s:s + b, :] = Xrow
        if k + 1 < nb:
            t = s + b
            R_ref[:, t:, :] = R_ref[:, t:, :] - _bdot(
                L_ref[:, t:, s:s + b], Xrow)


def _tri_inv_kernel(A_ref, X_ref, L_ref, R_ref, D_ref):
    """Standalone-kernel wrapper: copy A into the in-place scratch, run
    the shared factorization + inverse body."""
    L_ref[:, :, :] = A_ref[:, :, :]
    tri_inv_body(L_ref, X_ref, R_ref, D_ref)


@functools.partial(jax.jit, static_argnames=())
def tri_inv_fused(A):
    """Batched X = L^{-1} with L L^T = A, one fused Pallas program.

    A: (P, n, n) SPD with the masked-identity contract of ``ops/lml.py``;
    n must be a multiple of 32 and <= 1024 (``mxu_supported``).
    """
    P, n, _ = A.shape
    if not mxu_supported(n):
        raise ValueError(
            f"tri_inv_fused requires n % {_B} == 0 and n <= {_MAX_N} "
            f"(got n={n}); use the inv/xla Cholesky impl instead")
    C = min(_chunk_for(n), P)
    rem = (-P) % C
    A_p = A
    if rem:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (rem, n, n))
        A_p = jnp.concatenate([A, eye], axis=0)
    Pp = P + rem
    X = pl.pallas_call(
        _tri_inv_kernel,
        grid=(Pp // C,),
        in_specs=[pl.BlockSpec((C, n, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((C, n, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, n, n), jnp.float32),
            pltpu.VMEM((C, n, n), jnp.float32),
            pltpu.VMEM((C, n, _B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(A_p)
    return X[:P]
