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
  the two-kernel custom-VJP's full forward recompute disappears; the two
  walk scratches further share ONE (N+3)-plane pool via a static liveness
  map (``_dval_map``), nearly halving walk VMEM and doubling the chunk;
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

__all__ = ["lml_core_fused", "lml_core_fused_val", "megalml_supported",
           "megalml_fits", "megalml_fits_val"]

_PREC_HI = jax.lax.Precision.HIGHEST

# shared (N+3)-plane walk pool + 3 (C, n, n) chol buffers, C=1, must
# clear megacov's VMEM budget: n = 512 is ~27 + 3 MB at depth 5 — inside
# (and depth-6 heaps at n = 512 now fit too: ~52 + 3 MB).
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


def megalml_fits(n_nodes: int, n: int, P: int) -> bool:
    """P-aware launch check: the static envelope plus the full VMEM budget
    model (per-lane scratch + block buffers + the padded-POPULATION staged
    output/operand terms) at the chunk the policy would pick.

    The value+grad variant is the binding one — the value-only kernel has
    no dvals pool and no staged-xc term (``megalml_fits_val`` documents
    its own gate).  The population-scaled terms make this
    P-dependent: a depth-6 heap at n = 512 fits at P = 24 but not at
    P = 200 (the staged xc operand alone is 50 MB there), so the dispatch
    in ``ops/lml.py`` falls back to the composed megacov + batched-Cholesky
    path instead of launching a predicted-OOM program.

    Budget carries the full ~10 MB slack ``_blk_vmem_bytes``'s calibration
    note demands (``_SLACKED_LIMIT``, shared with the chunk policies): the
    footprint model is known inexact near the limit (not monotone in C),
    and the chunk policy can fall back to C=1 without re-checking — this
    gate must never approve a launch the policy itself deemed infeasible.
    """
    if not megalml_supported(n_nodes, n):
        return False
    return _fits_vag(_chunk_for_lml(n, n_nodes, P), n, n_nodes, P)


_SLACKED_LIMIT = mega._VMEM_LIMIT - 10 * 1024 * 1024
# calibrated multi-lane ceiling for the value+grad kernel (see
# _chunk_for_lml): at n >= this, only C=1 launches are hardware-verified
# (round-4 probes: n=288 multi-lane ok; n=320 C=6 and n=352/416/512
# C=3-5 are Mosaic VMEM OOMs; C=1 compiles at every probed shape)
_VAG_CAL_MAX_N_MULTIC = 320


def _fits_vag(c: int, n: int, n_nodes: int, P: int) -> bool:
    """THE value+grad footprint predicate — shared verbatim by the launch
    gate (``megalml_fits``) and the chunk policy (``_chunk_for_lml``), so
    the two can never drift into the gate-approves-what-the-policy-
    rejected OOM class."""
    per = _scratch_bytes_per_lane(n, n_nodes) + _blk_vmem_bytes(n, n_nodes)
    Pp = -(-P // c) * c
    return c * per + _out_vmem_bytes(Pp, n, n_nodes) <= _SLACKED_LIMIT


def _fits_val(c: int, n: int, n_nodes: int, P: int) -> bool:
    """Value-only footprint predicate (one walk set, no dvals pool; only
    the (Pp, 1, 1) core output scales with the padded population — the
    val kernel's measured OOM dumps show NO staged-xc term).  Shared by
    ``megalml_fits_val`` and ``_chunk_for_val``."""
    per = _scratch_bytes_val(n, n_nodes) + _blk_vmem_bytes(n, n_nodes)
    Pp = -(-P // c) * c
    return c * per + Pp * 128 * 4 <= _SLACKED_LIMIT


def megalml_fits_val(n_nodes: int, n: int, P: int) -> bool:
    """P-aware launch check for the VALUE-ONLY fused kernel
    (``lml_core_fused_val`` / the custom-VJP primal's own footprint).

    One walk set (no dvals pool) and only the (Pp, 1, 1) core output
    scales with the padded population, so shapes the value+grad variant
    rejects (e.g. depth-6 n=512 at P=200) often still fit here.  NOTE the
    fit chain deliberately does NOT dispatch on this check: every LML that
    enters an MH logit or reweight delta must come from the same numerical
    core as the value it is compared against (see ``gp_lml_batched``'s
    consistency contract), so where the value+grad variant falls back,
    value callers fall back WITH it.  This gate exists for genuinely
    standalone value-only consumers (none in-tree today) and for the VMEM
    policy tests.  Same 10 MB-slacked budget as ``megalml_fits``.
    """
    if not megalml_supported(n_nodes, n):
        return False
    return _fits_val(_chunk_for_val(n, n_nodes, P), n, n_nodes, P)


import os as _os

_CHUNK_OVERRIDE = int(_os.environ.get("NGP_MEGALML_CHUNK", "0"))
# timing-only phase ablation (results are numerically invalid):
#   "nochol" replaces the factorization with a copy; "nobwd" skips the
#   cotangent seed + backward walk.  For kernel phase attribution.
_ABLATE = _os.environ.get("NGP_MEGALML_ABLATE", "")
# per-body walk ablation (timing-only): comma list of
# fleaf/fge/fper/flin/fint/fcp (forward bodies, mega._node_fwd_body) and
# bnonempty/bge/bper/blin/bint/bcp (backward bodies, mega._node_bwd_body);
# drives tools/leaf_ablation.py's per-leaf decomposition of the fused eval.
_ABLATE_WALK = frozenset(
    s for s in _os.environ.get("NGP_MEGA_WALK_ABLATE", "").split(",") if s)


@functools.lru_cache(maxsize=None)
def _dval_map(n_nodes: int):
    """Static plane map sharing one scratch pool between the forward
    ``vals`` and backward ``dvals`` walk planes.

    Liveness (see ``mega._node_bwd_body``): ``vals[j]`` is last read at
    backward step ``j`` (leaf grads read their own plane) and ``dvals[j]``
    lives from its write at parent step ``(j-1)//2`` to its read at step
    ``j`` — so a greedy interval allocation needs only ``N + 3`` planes
    instead of the separate pools' ``2N``.  ``vals[j]`` keeps plane ``j``;
    this returns ``(dmap, n_pool)`` with ``dvals[j] -> pool[dmap[j]]``.
    """
    N = n_nodes
    free: list[int] = []
    nxt = N
    dmap = np.zeros(N, np.int32)
    dmap[0] = nxt
    nxt += 1
    for i in range(N):
        for j in (2 * i + 1, 2 * i + 2):
            if j < N:
                dmap[j] = free.pop() if free else nxt
                if dmap[j] == nxt:
                    nxt += 1
        free.append(i)              # vals[i] dies at end of step i
        free.append(int(dmap[i]))   # dvals[i] dies at end of step i
    return dmap, nxt


class _PlaneView:
    """First-axis remap view over a shared scratch pool ref: index ``j``
    resolves through an SMEM plane-map before touching the pool."""

    def __init__(self, ref, map_ref):
        self._ref = ref
        self._map = map_ref

    def _remap(self, idx):
        return (self._map[idx[0]],) + tuple(idx[1:])

    def __getitem__(self, idx):
        return self._ref[self._remap(idx)]

    def __setitem__(self, idx, v):
        self._ref[self._remap(idx)] = v


def _scratch_bytes_per_lane(n: int, n_nodes: int) -> int:
    """Shared walk pool (N+3 planes) + three (n, n) chol buffers, per lane
    (the value+grad kernel's VMEM footprint)."""
    _, n_pool = _dval_map(n_nodes)
    return n_pool * _walk_bytes(n) + 3 * n * _n_pad(n) * 4


def _scratch_bytes_val(n: int, n_nodes: int) -> int:
    """Value-only variant: one walk set (N planes), no dvals pool."""
    return n_nodes * _walk_bytes(n) + 3 * n * _n_pad(n) * 4


def _n_pad(n: int) -> int:
    return int(math.ceil(n / 128)) * 128


def _out_vmem_bytes(Pp: int, n: int, n_nodes: int) -> int:
    """Scoped-VMEM cost of the kernel outputs the per-lane model omits.

    Measured OOM dumps (PLAN.md round-3): XLA keeps small pallas outputs
    whole in scoped VMEM — so their footprint scales with the PADDED
    population, not the chunk.  ``gdiag``/``alpha`` are row-shaped
    (Pp, 1, n) (sublane pad 1 -> 8, lane pad to 128-multiple); ``dp``'s
    trailing (1, 1) dims pad to 128 lanes; ``core`` likewise.  The
    dominant term is the full col-shaped ``xc`` OPERAND (Pp, n, 1) —
    its lane dim pads to 128 and XLA stages the whole gathered array in
    scoped VMEM (the unexplained ~17-20 MB in both measured OOM dumps).
    """
    n_pad = _n_pad(n)
    return (_staged(2 * Pp * 8 * n_pad * 4)
            + _staged(Pp * n_nodes * 3 * 128 * 4)
            + Pp * 128 * 4 + _staged_xc_bytes(Pp, n))


def _staged(b: int) -> int:
    """A whole-array term only applies when the padded array is small
    enough for XLA to choose scoped VMEM at all — a 95 MB nowcast-panel
    dp (Pp = 2000) stays in HBM and costs nothing scoped."""
    return b if b <= mega._VMEM_LIMIT // 2 else 0


def _staged_xc_bytes(Pp: int, n: int) -> int:
    """Staged-xc operand term (see ``_staged``)."""
    return _staged(Pp * n * 128 * 4)


def _blk_vmem_bytes(n: int, n_nodes: int) -> int:
    """Double-buffered operand/output BLOCK bytes per lane, plus the D
    scratch: three col-shaped buffers (xc, mask, ym; lanes pad 1 -> 128),
    five row-shaped ones (diag, xr, maskr, gdiag, alpha; sublanes pad
    1 -> 8), the packed nodeinfo (11 N (1, 1)-planes padding to 128
    lanes) and the dp output block (3 N planes).  Calibrated against the
    measured C=15/C=16 n=160 OOM dumps (PLAN.md round-3); the true
    footprint is not exactly monotone in C (XLA buffering choices), so
    callers pair this with a ~10 MB slack.
    """
    n_pad = _n_pad(n)
    return (2 * 3 * n * 128 * 4          # col blocks
            + 2 * 5 * 8 * n_pad * 4      # row blocks
            + 2 * 14 * n_nodes * 128 * 4  # nodeinfo + dp planes
            + n * 128 * 4)               # D scratch (lane pad 32 -> 128)


def _chunk_for_lml(n: int, n_nodes: int, P: int) -> int:
    """Particles per grid step for the fused kernel.

    Measured on the v5e (PLAN.md round-3): the serial diagonal-chol
    latency amortization saturates by C = 8-16 on DIVERSE populations —
    pushing C to the VMEM-feasible max (C=14 at cap 160) measured
    slightly WORSE than C=8 (6.58 vs 6.38 ms/eval) because per-chunk
    activity gating coarsens (a chunk pays the union of its lanes' node
    slots).  So large ensembles keep the measured optimum (16 at
    n <= 128, 8 above); SMALL ensembles (the reference's canonical
    P=24, whose post-resample populations are duplicated and union-gate
    cheaply) instead minimize grid steps within the VMEM budget
    (fused P=24 cap-160 at G=2: 1.96 ms vs 2.75 composed).
    """
    if _CHUNK_OVERRIDE:
        return _CHUNK_OVERRIDE
    if n >= _VAG_CAL_MAX_N_MULTIC:
        # hardware calibration (tools/megalml_vmem_calibration.json,
        # tools/calibrate_megalml_vmem.py): at n >= 320 the value+grad
        # kernel's REAL footprint exceeds the model at multi-lane chunks —
        # Mosaic VMEM OOM at the model's C=6 for (320, 24) and C=3-5 for
        # (352, 416, 512) x P=24 — while C=1 compiled at every probed
        # shape.  The value-only variant's model held everywhere (no cap
        # there).
        return 1

    def fits(c: int) -> bool:
        return _fits_vag(c, n, n_nodes, P)

    if P > 32:
        c = 16 if n <= 128 else 8
        while c > 1 and not fits(c):
            c //= 2
        return c
    # fewest grid steps first (serial latency), smallest C within that G
    for G in range(1, P + 1):
        c = -(-P // G)
        if c <= 32 and fits(c):
            return c
    return 1


def _chunk_for_val(n: int, n_nodes: int, P: int) -> int:
    """Particles per grid step for the VALUE-ONLY kernel.

    No dvals planes: one walk set + chol buffers -> more lanes than the
    value+grad variant at the same budget.  Same policy shape as
    ``_chunk_for_lml``: measured optimum for large P, G-first for small P
    (C=16 is the measured optimum at every n <= 192: 5.03 / 6.02 ms at
    caps 160 / 192, PLAN.md round-3).
    """
    if _CHUNK_OVERRIDE:
        return _CHUNK_OVERRIDE

    def _fits(c: int) -> bool:
        return _fits_val(c, n, n_nodes, P)

    if P > 32:
        c = 16
        while c > 1 and not _fits(c):
            c //= 2
        return c
    for G in range(1, P + 1):
        c = -(-P // G)
        if c <= 32 and _fits(c):
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

    ``diag_ref`` is ROW-shaped (C, 1, n): col-shaped (.., n, 1) buffers
    pad their lane dim to 128 in VMEM (measured OOM dumps), so every
    operand/output that can live as a row does.
    """
    C = A.shape[0]
    regs = mega._region_planes(xc_ref, xr_ref, regions)
    _, _, dests = mega._dest_layout(n, regions)

    # ---- 1. forward node walk (bottom-up), vals[0] = K on the regions
    def fwd_body(it, carry):
        mega._node_fwd_body(N - 1 - it, flags_ref, info_ref, regs, vals, N,
                            _ABLATE_WALK)
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
    # diag_ref is (C, 1, n): broadcasts along sublanes onto the diagonal
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
    return regs, dests, eye, Xv, t, alpha


def _megalml_val_kernel(
    flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref, maskr_ref,
    ym_ref, core_ref, vals, A, X, R, D, *, N, n, regions,
):
    """Value-only variant: the same steps 1-4, no gradient work — used by
    the custom_vjp primal so value and grad paths share one float path."""
    _ = _fwd_steps(flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref,
                   maskr_ref, ym_ref, core_ref, vals, A, X, R, D, N, n,
                   regions)


def _megalml_kernel(
    flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref, maskr_ref,
    ym_ref, dmap_ref,
    core_ref, dp_ref, gdiag_ref, alpha_ref,
    pool, A, X, R, D,
    *, N, n, regions,
):
    """One chunk of C particles: LML core value + all analytic gradients.

    Outputs: ``core`` (C, 1, 1) = -0.5 (quad + logdet); ``dp`` (N*3, C, 1, 1)
    = d core / d params; ``gdiag`` (C, 1, n) = d core / d diag-augmentation;
    ``alpha`` (C, 1, n) = (A^{-1} ym)^T (so d core / d ym = -alpha).
    ``gdiag``/``alpha`` are ROW-shaped: (.., n, 1) cols pad lanes to 128
    and land whole in scoped VMEM (measured OOM dumps) — 10x the bytes.

    ``pool`` holds both walk scratches: forward ``vals[j]`` on plane ``j``,
    backward ``dvals[j]`` on plane ``dmap_ref[j]`` (``_dval_map`` liveness).
    """
    C = A.shape[0]
    vals = pool
    dvals = _PlaneView(pool, dmap_ref)
    regs, dests, eye, Xv, t, alpha = _fwd_steps(
        flags_ref, info_ref, xc_ref, xr_ref, diag_ref, maskc_ref,
        maskr_ref, ym_ref, core_ref, vals, A, X, R, D, N, n, regions)
    alpha_row = _bdot_ta(t, Xv)                     # (C, 1, n) = alpha^T
    alpha_ref[:, :, :] = alpha_row

    # ---- 5. analytic cotangent dA = 0.5 (alpha alpha^T - A^{-1});
    # staged through the (free again) R scratch so the region slices below
    # read a REF, not a lane-offset value slice (Mosaic layout rule).
    # The diag gradient comes straight from rows: A^{-1}_jj = sum_i X_ij^2
    # (column sums of the triangular inverse) — no (C, n, n) R*eye temp.
    Ainv = _bdot_ta(Xv, Xv)
    R[:, :, :] = 0.5 * (_bdot(alpha, alpha_row) - Ainv)
    ainv_diag = jnp.sum(Xv * Xv, axis=1, keepdims=True)       # (C, 1, n)
    gdiag_ref[:, :, :] = 0.5 * (alpha_row * alpha_row - ainv_diag)

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
            i, flags_ref, info_ref, regs, vals, dvals, dp_ref, N,
            _ABLATE_WALK)
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
    C = _chunk_for_val(n, N, P)
    flags, info, xc, xr, G, Pp, n_pad = mega._pack(types, params, x, C)
    if Pp != P:
        pad = Pp - P
        diagv = jnp.concatenate(
            [diagv, jnp.ones((pad, n), diagv.dtype)], axis=0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, n), mask.dtype)], axis=0)
        ym = jnp.concatenate([ym, jnp.zeros((pad, n), ym.dtype)], axis=0)
    diagr = diagv[:, None, :]
    maskc = mask[:, :, None]
    maskr = jnp.pad(mask, ((0, 0), (0, n_pad - n)))[:, None, :]
    ymc = ym[:, :, None]

    regions = mega._make_regions(n, n_pad)
    rows_c, width_c, _ = mega._dest_layout(n, regions)
    fs, infs, xcs, xrs, _ks = mega._specs(C, N, n, interpret)
    col_spec = pl.BlockSpec((C, n, 1), lambda g: (g, 0, 0))
    row_spec = pl.BlockSpec((C, 1, n), lambda g: (g, 0, 0))
    maskr_spec = pl.BlockSpec((C, 1, n_pad), lambda g: (g, 0, 0))
    core_spec = pl.BlockSpec((C, 1, 1), lambda g: (g, 0, 0))
    core = pl.pallas_call(
        functools.partial(_megalml_val_kernel, N=N, n=n, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs, row_spec, col_spec, maskr_spec,
                  col_spec],
        out_specs=core_spec,
        out_shape=jax.ShapeDtypeStruct((Pp, 1, 1), jnp.float32),
        scratch_shapes=mega._scratch(
            [(N, C, rows_c, width_c), (C, n, n), (C, n, n), (C, n, n),
             (C, n, _CHOL_B)], interpret),
        interpret=interpret,
        **mega._compiler_kwargs(interpret),
    )(flags, info, xc, xr, diagr, maskc, maskr, ymc)
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
    C = _chunk_for_lml(n, N, P)
    flags, info, xc, xr, G, Pp, n_pad = mega._pack(types, params, x, C)
    if Pp != P:
        pad = Pp - P
        # padded lanes: mask 0 / diag 1 -> A = I, a clean well-posed chol
        diagv = jnp.concatenate(
            [diagv, jnp.ones((pad, n), diagv.dtype)], axis=0)
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, n), mask.dtype)], axis=0)
        ym = jnp.concatenate([ym, jnp.zeros((pad, n), ym.dtype)], axis=0)
    diagr = diagv[:, None, :]                                  # (Pp, 1, n)
    maskc = mask[:, :, None]                                   # (Pp, n, 1)
    maskr = jnp.pad(mask, ((0, 0), (0, n_pad - n)))[:, None, :]
    ymc = ym[:, :, None]                                       # (Pp, n, 1)

    regions = mega._make_regions(n, n_pad)
    rows_c, width_c, _ = mega._dest_layout(n, regions)
    fs, infs, xcs, xrs, _ks = mega._specs(C, N, n, interpret)
    col_spec = pl.BlockSpec((C, n, 1), lambda g: (g, 0, 0))
    row_spec = pl.BlockSpec((C, 1, n), lambda g: (g, 0, 0))
    maskr_spec = pl.BlockSpec((C, 1, n_pad), lambda g: (g, 0, 0))
    core_spec = pl.BlockSpec((C, 1, 1), lambda g: (g, 0, 0))
    dp_spec = pl.BlockSpec((None, N * 3, C, 1, 1),
                           lambda g: (g, 0, 0, 0, 0))
    dmap_np, n_pool = _dval_map(N)
    if interpret:
        dmap_spec = pl.BlockSpec((None, N), lambda g: (0, 0))
    else:
        from jax.experimental.pallas import tpu as pltpu

        dmap_spec = pl.BlockSpec((None, N), lambda g: (0, 0),
                                 memory_space=pltpu.SMEM)
    core, dp_l, gdiag, alpha = pl.pallas_call(
        functools.partial(_megalml_kernel, N=N, n=n, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs, row_spec, col_spec, maskr_spec,
                  col_spec, dmap_spec],
        out_specs=[core_spec, dp_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, N * 3, C, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1, n), jnp.float32),
        ],
        scratch_shapes=mega._scratch(
            [(n_pool, C, rows_c, width_c), (C, n, n),
             (C, n, n), (C, n, n), (C, n, _CHOL_B)], interpret),
        interpret=interpret,
        **mega._compiler_kwargs(interpret),
    )(flags, info, xc, xr, diagr, maskc, maskr, ymc,
      jnp.asarray(dmap_np)[None, :])
    gparams = dp_l.reshape(G, N, 3, C).transpose(0, 3, 1, 2)
    return (core.reshape(Pp)[:P], gparams.reshape(Pp, N, 3)[:P],
            gdiag[:P, 0, :], alpha[:P, 0, :])


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


def lml_core_fused_val(types, params, diagv, mask, x, ym):
    """Value-only fused LML core — NOT differentiable.

    Runs the same ``_fwd_steps`` instruction sequence as ``lml_core_fused``
    (bit-identical values) but with no custom VJP.  Gate launches with
    ``megalml_fits_val``.  The fit chain does NOT use this (its LML
    comparisons must stay single-backend per ``gp_lml_batched``'s
    consistency contract); it exists for standalone value-only consumers.
    Differentiating through it raises a loud Pallas AD error rather than
    silently launching a predicted-OOM value+grad program.
    """
    return _val_call(types, params, diagv, mask, x, ym, mega._INTERPRET)
