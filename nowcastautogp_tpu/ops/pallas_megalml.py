"""Pallas TPU kernel: fused LML value + analytic gradient in one program.

The VERDICT-r2 "mega-kernel" completed: covariance assembly from the heap
encoding, masked-identity augmentation, blocked MXU Cholesky + triangular
inverse, the analytic ``dA = 0.5(alpha alpha^T - A^{-1})`` cotangent, and the
top-down parameter-gradient node walk — all VMEM-resident in ONE kernel per
particle chunk.  This replaces, per HMC leapfrog step (the fit's unit of
work, ``inference/hmc.py:206-215``), the previous four-stage pipeline

    megacov fwd  ->  XLA chol/trtri/A^{-1}  ->  dA materialized in HBM
                 ->  megacov bwd (which RE-RUNS the whole forward walk)

with one ``pallas_call``.  The wins over the composed path, by construction:

* the backward node walk reuses the forward walk's VMEM ``vals`` planes —
  the two-kernel custom-VJP's full forward recompute disappears;
* K, dA, and A^{-1} never touch HBM (2 x (P, n, n) round trips per eval);
* the factorization is ``ops/chol_mxu.py``'s blocked MXU body (measured
  2.5x over XLA's While-loop expander standalone) instead of XLA's.

Gradients come out as residuals of a ``jax.custom_vjp``: the LML is linear
in itself, so the backward pass is a scalar rescale of the stored grads —
``jax.value_and_grad`` of the HMC potential costs exactly one kernel call.
Value-only callers (SMC reweights, predict paths) keep the existing
megacov + batched-Cholesky primal, so they never pay for gradients.

Covariance semantics are ``ops/pallas_megacov.py``'s (same node-walk bodies,
same symmetric-panel regions, mirrored to the full matrix in VMEM for the
factorization); LML semantics are ``ops/lml.py:_lml_from_K``'s including the
masked-identity contract and NaN propagation for non-SPD proposals (caught
by the caller's ``-1e10`` guard).  Engine role: the covariance/Cholesky/LML
internals of the reference's AutoGP dependency (SURVEY.md section 2.3).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_megacov as mega
from .chol_mxu import _B as _CHOL_B
from .chol_mxu import _bdot, tri_inv_body

__all__ = ["lml_core_fused", "megalml_supported"]

_PREC_HI = jax.lax.Precision.HIGHEST

# 2 (N, C, n, n_pad) walk scratches + 3 (C, n, n) chol buffers, C=1, must
# clear megacov's VMEM budget: n = 512 is 65 + 3 MB — still inside.
_MAX_LML_N = 512


def megalml_supported(n_nodes: int, n: int) -> bool:
    """Static-shape support: untiled covariance plane + 32-granule chol,
    and the C=1 scratch set must clear the VMEM budget (deep heaps at
    large n — e.g. 63 slots x n=512 — fall back to the composed path)."""
    if not (
        n_nodes <= 63
        and _CHOL_B <= n <= _MAX_LML_N
        and n % _CHOL_B == 0
        and not mega._tiled(n)
    ):
        return False
    return _scratch_bytes_per_lane(n, n_nodes) <= (
        mega._VMEM_LIMIT - 24 * 1024 * 1024)


import os as _os

_CHUNK_OVERRIDE = int(_os.environ.get("NGP_MEGALML_CHUNK", "0"))
# timing-only phase ablation (results are numerically invalid):
#   "nochol" replaces the factorization with a copy; "nobwd" skips the
#   cotangent seed + backward walk.  For kernel phase attribution.
_ABLATE = _os.environ.get("NGP_MEGALML_ABLATE", "")


def _scratch_bytes_per_lane(n: int, n_nodes: int) -> int:
    """Two compacted walk scratches + three (n, n) chol buffers, per lane."""
    n_pad = int(math.ceil(n / 128)) * 128
    rows_c, width_c, _ = mega._dest_layout(n, mega._make_regions(n, n_pad))
    return 2 * n_nodes * rows_c * width_c * 4 + 3 * n * n_pad * 4


def _chunk_for_lml(n: int, n_nodes: int) -> int:
    """Particles per grid step for the fused kernel.

    The kernel's phase ablation (PLAN.md round-3) puts ~2/3 of its time
    in the blocked Cholesky's serial 32-step diagonal fori loops, whose
    latency amortizes over the chunk lanes — so the policy picks the
    largest C whose two compacted walk scratches (``_dest_layout``) +
    three (C, n, n) chol buffers fit the VMEM budget.
    """
    if _CHUNK_OVERRIDE:
        return _CHUNK_OVERRIDE
    per = _scratch_bytes_per_lane(n, n_nodes)
    for c in (16, 8, 4, 2, 1):
        if c * per <= mega._VMEM_LIMIT - 24 * 1024 * 1024:
            return c
    return 1


def _bdot_ta(a, b):
    """Batched transpose-a dot (C, k, m)^T @ (C, k, n) -> (C, m, n) on MXU.

    Lowers in current Mosaic (tools/exp_mosaic_ta.py: compiles and matches
    einsum on the v5e) — the capability that makes A^{-1} = X^T X and
    alpha = X^T (X ym) computable in-kernel.
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC_HI,
    )


def _fwd_steps(flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref,
               maskr_ref, ym_ref, core_ref, vals, A, X, R, D, N, n, regions):
    """Kernel steps 1-4, shared by the value+grad and value-only variants
    (identical instruction sequence ⇒ bit-identical core values): forward
    node walk, masked-A assembly with the symmetric-panel mirror, blocked
    MXU Cholesky + triangular inverse, and the LML pieces.

    Writes ``core`` = -0.5 (quad + logdet); returns (regs, dests, eye,
    Xv, alpha) for the gradient steps.
    """
    C = A.shape[0]
    regs = mega._region_planes(xc_ref, xr_ref, regions)
    _, _, dests = mega._dest_layout(n, regions)

    # ---- 1. forward node walk (bottom-up), vals[0] = K on the regions
    def fwd_body(it, carry):
        mega._node_fwd_body(N - 1 - it, flags_ref, info_ref, regs, vals, N)
        return carry

    jax.lax.fori_loop(0, N, fwd_body, 0)

    # ---- 2. assemble the full masked A in VMEM (mirror the lower panels)
    for (r0, c0, c1), (drs, _dcs) in zip(regions, dests):
        cm = min(c1, n)
        if cm <= c0:
            continue
        mm_blk = maskc_ref[:, r0:n, :] * maskr_ref[:, :, c0:cm]
        A[:, r0:n, c0:cm] = vals[0, :, drs, 0:cm - c0] * mm_blk
        if r0 > 0:
            # upper block = transpose of the already-masked panel below
            A[:, 0:r0, c0:cm] = jnp.swapaxes(A[:, c0:cm, 0:r0], 1, 2)
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    eye_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = jnp.broadcast_to(
        (eye_r == eye_c).astype(jnp.float32)[None], (C, n, n))
    A[:, :, :] = A[:, :, :] + diag_ref[:, :, :] * eye

    # ---- 3. in-place blocked Cholesky + triangular inverse: X = L^{-1}
    if _ABLATE == "nochol":
        X[:, :, :] = A[:, :, :]
    else:
        tri_inv_body(A, X, R, D)

    # ---- 4. LML pieces (masked rows factor to identity: log diag = 0)
    Xv = X[:, :, :]
    diagX = jnp.sum(Xv * eye, axis=2, keepdims=True)           # (C, n, 1)
    logdet = -2.0 * jnp.sum(
        jnp.log(diagX), axis=1, keepdims=True)                 # (C, 1, 1)
    ym = ym_ref[:, :, :]                                       # (C, n, 1)
    t = _bdot(Xv, ym)                                          # (C, n, 1)
    alpha = _bdot_ta(Xv, t)                                    # (C, n, 1)
    quad = jnp.sum(ym * alpha, axis=1, keepdims=True)          # (C, 1, 1)
    core_ref[:, :, :] = -0.5 * (quad + logdet)
    return regs, dests, eye, Xv, alpha


def _megalml_val_kernel(
    flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref, maskr_ref,
    ym_ref, core_ref, vals, A, X, R, D, *, N, n, regions,
):
    """Value-only variant: the same steps 1-4, no gradient work — used by
    the custom_vjp primal so value and grad paths share one float path."""
    _fwd_steps(flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref,
               maskr_ref, ym_ref, core_ref, vals, A, X, R, D, N, n, regions)


def _megalml_kernel(
    flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref, maskr_ref,
    ym_ref,
    core_ref, dp_ref, gdiag_ref, alpha_ref,
    vals, dvals, A, X, R, D,
    *, N, n, regions,
):
    """One chunk of C particles: LML core value + all analytic gradients.

    Outputs: ``core`` (C, 1, 1) = -0.5 (quad + logdet); ``dp`` (N*3, C, 1, 1)
    = d core / d params; ``gdiag`` (C, n, 1) = d core / d diag-augmentation;
    ``alpha`` (C, n, 1) = A^{-1} ym (so d core / d ym = -alpha).
    """
    C = A.shape[0]
    regs, dests, eye, Xv, alpha = _fwd_steps(
        flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref,
        maskr_ref, ym_ref, core_ref, vals, A, X, R, D, N, n, regions)
    alpha_ref[:, :, :] = alpha

    # ---- 5. analytic cotangent dA = 0.5 (alpha alpha^T - A^{-1});
    # staged through the (free again) R scratch so the region slices below
    # read a REF, not a lane-offset value slice (Mosaic layout rule).
    Ainv = _bdot_ta(Xv, Xv)
    R[:, :, :] = 0.5 * (_bdot(alpha, alpha, transpose_b=True) - Ainv)
    gdiag_ref[:, :, :] = jnp.sum(R[:, :, :] * eye, axis=2, keepdims=True)

    if _ABLATE == "nobwd":
        dp_ref[0] = jnp.zeros_like(info_ref[0, 0])
        return

    # ---- 6. seed dvals[0]: masked cotangent folded onto the computed
    # regions (dK/dp is symmetric, so W'' = tril(W + W^T, -1) + diag W;
    # with W itself symmetric the fold factor is 2 below / 1 on / 0 above
    # the diagonal).  Lane-padding columns beyond n are zeroed.
    single = len(regions) == 1
    for (r0, c0, c1), (drs, _dcs) in zip(regions, dests):
        cm = min(c1, n)
        if cm > c0:
            rows_g = r0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, n - r0, cm - c0), 1)
            cols_g = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, n - r0, cm - c0), 2)
            if single:
                fold = jnp.ones((1, n - r0, cm - c0), jnp.float32)
            else:
                fold = jnp.where(
                    rows_g > cols_g, 2.0,
                    jnp.where(rows_g == cols_g, 1.0, 0.0))
            mm_blk = maskc_ref[:, r0:n, :] * maskr_ref[:, :, c0:cm]
            dvals[0, :, drs, 0:cm - c0] = R[:, r0:n, c0:cm] * fold * mm_blk
        if c1 > cm:
            dvals[0, :, drs, cm - c0:c1 - c0] = jnp.zeros(
                (C, n - r0, c1 - cm), jnp.float32)

    # ---- 7. backward node walk (top-down) -> parameter grads
    def bwd_body(i, carry):
        mega._node_bwd_body(
            i, flags_ref, info_ref, regs, vals, dvals, dp_ref, N, ())
        return carry

    jax.lax.fori_loop(0, N, bwd_body, 0)


def _val_call(types, params, diagv, mask, x, ym, interpret):
    if mega._SORT_CHUNKS and types.shape[0] > 1:
        perm = mega._struct_perm(types)
        inv = jnp.argsort(perm)
        core = _val_call_impl(
            types[perm], params[perm], diagv[perm], mask[perm], x[perm],
            ym[perm], interpret)
        return core[inv]
    return _val_call_impl(types, params, diagv, mask, x, ym, interpret)


def _val_call_impl(types, params, diagv, mask, x, ym, interpret):
    from jax.experimental import pallas as pl

    P, N = types.shape
    n = x.shape[1]
    # no dvals scratch: one walk set + chol buffers -> roughly 2x the
    # lanes of the value+grad variant at the same budget
    per = _scratch_bytes_per_lane(n, N) - N * _walk_bytes(n)
    C = _CHUNK_OVERRIDE or next(
        (c for c in (16, 8, 4, 2, 1)
         if c * per <= mega._VMEM_LIMIT - 24 * 1024 * 1024), 1)
    flags, info, xc, xr, G, Pp, n_pad = mega._pack(types, params, x, C)
    if Pp != P:
        pad = Pp - P
        diagv = jnp.concatenate(
            [diagv, jnp.ones((pad, n), diagv.dtype)], axis=0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, n), mask.dtype)], axis=0)
        ym = jnp.concatenate([ym, jnp.zeros((pad, n), ym.dtype)], axis=0)
    diagc = diagv[:, :, None]
    maskc = mask[:, :, None]
    maskr = jnp.pad(mask, ((0, 0), (0, n_pad - n)))[:, None, :]
    ymc = ym[:, :, None]

    regions = mega._make_regions(n, n_pad)
    rows_c, width_c, _ = mega._dest_layout(n, regions)
    fs, infs, xcs, xrs, _ks = mega._specs(C, N, n, interpret)
    col_spec = pl.BlockSpec((C, n, 1), lambda g: (g, 0, 0))
    maskr_spec = pl.BlockSpec((C, 1, n_pad), lambda g: (g, 0, 0))
    core_spec = pl.BlockSpec((C, 1, 1), lambda g: (g, 0, 0))
    core = pl.pallas_call(
        functools.partial(_megalml_val_kernel, N=N, n=n, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs, col_spec, col_spec, maskr_spec,
                  col_spec],
        out_specs=core_spec,
        out_shape=jax.ShapeDtypeStruct((Pp, 1, 1), jnp.float32),
        scratch_shapes=mega._scratch(
            [(N, C, rows_c, width_c), (C, n, n), (C, n, n), (C, n, n),
             (C, n, _CHOL_B)], interpret),
        interpret=interpret,
        **mega._compiler_kwargs(interpret),
    )(flags, info, xc, xr, diagc, maskc, maskr, ymc)
    return core.reshape(Pp)[:P]


def _walk_bytes(n: int) -> int:
    """Bytes of ONE compacted walk plane per node per lane."""
    n_pad = int(math.ceil(n / 128)) * 128
    rows_c, width_c, _ = mega._dest_layout(n, mega._make_regions(n, n_pad))
    return rows_c * width_c * 4


def _vag_call(types, params, diagv, mask, x, ym, interpret):
    if mega._SORT_CHUNKS and types.shape[0] > 1:
        perm = mega._struct_perm(types)
        inv = jnp.argsort(perm)
        core, gp, gd, al = _vag_call_impl(
            types[perm], params[perm], diagv[perm], mask[perm], x[perm],
            ym[perm], interpret)
        return core[inv], gp[inv], gd[inv], al[inv]
    return _vag_call_impl(types, params, diagv, mask, x, ym, interpret)


def _vag_call_impl(types, params, diagv, mask, x, ym, interpret):
    from jax.experimental import pallas as pl

    P, N = types.shape
    n = x.shape[1]
    C = _chunk_for_lml(n, N)
    flags, info, xc, xr, G, Pp, n_pad = mega._pack(types, params, x, C)
    if Pp != P:
        pad = Pp - P
        # padded lanes: mask 0 / diag 1 -> A = I, a clean well-posed chol
        diagv = jnp.concatenate(
            [diagv, jnp.ones((pad, n), diagv.dtype)], axis=0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, n), mask.dtype)], axis=0)
        ym = jnp.concatenate([ym, jnp.zeros((pad, n), ym.dtype)], axis=0)
    diagc = diagv[:, :, None]                                  # (Pp, n, 1)
    maskc = mask[:, :, None]                                   # (Pp, n, 1)
    maskr = jnp.pad(mask, ((0, 0), (0, n_pad - n)))[:, None, :]
    ymc = ym[:, :, None]                                       # (Pp, n, 1)

    regions = mega._make_regions(n, n_pad)
    rows_c, width_c, _ = mega._dest_layout(n, regions)
    fs, infs, xcs, xrs, _ks = mega._specs(C, N, n, interpret)
    col_spec = pl.BlockSpec((C, n, 1), lambda g: (g, 0, 0))
    maskr_spec = pl.BlockSpec((C, 1, n_pad), lambda g: (g, 0, 0))
    core_spec = pl.BlockSpec((C, 1, 1), lambda g: (g, 0, 0))
    dp_spec = pl.BlockSpec((None, N * 3, C, 1, 1),
                           lambda g: (g, 0, 0, 0, 0))
    core, dp_l, gdiag, alpha = pl.pallas_call(
        functools.partial(_megalml_kernel, N=N, n=n, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs, col_spec, col_spec, maskr_spec,
                  col_spec],
        out_specs=[core_spec, dp_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, N * 3, C, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, n, 1), jnp.float32),
        ],
        scratch_shapes=mega._scratch(
            [(N, C, rows_c, width_c), (N, C, rows_c, width_c), (C, n, n),
             (C, n, n), (C, n, n), (C, n, _CHOL_B)], interpret),
        interpret=interpret,
        **mega._compiler_kwargs(interpret),
    )(flags, info, xc, xr, diagc, maskc, maskr, ymc)
    gparams = dp_l.reshape(G, N, 3, C).transpose(0, 3, 1, 2)
    return (core.reshape(Pp)[:P], gparams.reshape(Pp, N, 3)[:P],
            gdiag[:P, :, 0], alpha[:P, :, 0])


@jax.custom_vjp
def lml_core_fused(types, params, diagv, mask, x, ym):
    """Batched masked LML core ``-0.5 (ym^T A^{-1} ym + logdet A)`` where
    ``A = K(x, x) (mask mask^T) + diag(diagv)``.

    The primal (value-only) path runs the SAME kernel steps as the forward
    rule minus the gradient work (``_fwd_steps`` is shared instruction for
    instruction), so value and value+grad paths agree bit-exactly —
    including non-SPD NaN propagation into the caller's ``-1e10`` guard.
    Under ``jax.grad``/``value_and_grad`` the forward rule runs the single
    fused value+gradient kernel and the backward is a scalar rescale of
    its residuals.  Gradients flow to ``params``, ``diagv`` (the caller
    chains d diag / d log_noise), and ``ym``.
    """
    return _val_call(types, params, diagv, mask, x, ym, mega._INTERPRET)


def _vjp_fwd(types, params, diagv, mask, x, ym):
    core, gp, gd, al = _vag_call(
        types, params, diagv, mask, x, ym, mega._INTERPRET)
    return core, (gp, gd, al)


def _vjp_bwd(res, c):
    gp, gd, al = res
    zero_types = np.zeros(gp.shape[:2], dtype=jax.dtypes.float0)
    return (
        zero_types,
        c[:, None, None] * gp,
        c[:, None] * gd,
        jnp.zeros_like(gd),            # mask: data buffer, no grad
        jnp.zeros_like(gd),            # x: data, no grad (as megacov)
        -c[:, None] * al,
    )


lml_core_fused.defvjp(_vjp_fwd, _vjp_bwd)
