"""Pallas TPU mega-kernel: chunk-batched covariance assembly + analytic VJP.

Round-3 hot-op work (VERDICT r2 "Next round" #1).  The jnp interpreter
(``ops/kernels.py``) is HBM-bound at depth 5: its per-level ``(P, w, n, n)``
value planes and their autodiff residuals dominate the fit's LML grad
(measured 51 of 70 ms at P=200, cap=192, depth 5).  The round-2 per-particle
fused kernel (``ops/pallas_cov.py``) fixed the traffic but ran one particle
per grid step — overhead-bound (155 ms).  This kernel batches ``C`` particles
per grid step so every vector op works on ``(C, n, n)`` planes:

* the whole heap walk lives in a ``(N, C, n, n)`` VMEM scratch — HBM traffic
  collapses to x in / K out (+ dK in, dparams out for the backward);
* per-node *activity gating*: an XLA-precomputed per-chunk flag table drives
  ``pl.when`` so all-empty heap slots cost one scalar test, and the GammaExp /
  Periodic / Linear / ChangePoint sub-planes are only computed when some
  particle in the chunk uses them (typical trees fill ~5-9 of 31 slots);
* select-the-argument leaf math identical to ``kernels._leaf_values``: one
  final ``exp`` per node, GE power via the shared ``log r`` plane with the
  clamp in log space;
* the backward recomputes the forward walk in VMEM (no residual traffic) and
  sweeps cotangents top-down with hand-derived per-type parameter gradients —
  each heap node has exactly one parent, so child cotangents are plain
  stores, no accumulation.

Mosaic layout rules this kernel is built around (the first attempt failed on
``infer-vector-layout: unsupported shape cast``):

* data never moves between Mosaic dimensions inside the kernel — a ``(C,)``
  lane vector cannot become a ``(C, 1, 1)`` outer-dim broadcast, so node
  type masks and parameters are precomputed by XLA as ``(C, 1, 1)`` planes
  (packed per node in a ``nodeinfo`` operand) and x arrives twice, as
  ``(C, n, 1)`` *and* ``(C, 1, n)``;
* every tensor in the kernel is rank-3 ``(C, ·, ·)`` with C outermost;
  reductions go one axis at a time with ``keepdims=True``;
* dynamic indexing only on the major axis of scratch/operand refs;
* the node loop is a ``fori_loop`` (compile time stays flat in heap size);
  no scatter, no ``dot_general``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.structures import CONST, CP, GE, LINEAR, PERIODIC, PLUS, SE, TIMES

__all__ = [
    "cov_batched_fused", "megacov_supported", "set_interpret_mode",
    "MAX_MEGA_N",
]

_LOG_EPS = -27.631021  # log(1e-12): GE power clamp, in log space
_PI = math.pi

# Odd minimax polynomial for sin(pi*s) on s in [-1, 1], degree 11 (max abs
# error 9.6e-8 — below f32 eps at 1.0, i.e. exact to working precision).
# Rationale (round-5 per-leaf ablation, tools/leaf_ablation_results.json):
# XLA's generic sin/cos lower to ~10x the VPU cost of exp, and the
# Periodic node bodies (one sin forward, sin+cos backward) were ~33% of
# the whole fused value+grad eval; a range-reduced polynomial cuts that
# to a handful of fmas.  Range reduction is u mod 2 in f32: above
# |u| ~ 1e3 (period thousands of times shorter than the time window —
# an aliased, likelihood-irrelevant regime) the reduction loses ~ulp(u)
# of phase, same class of degradation as any f32 trig at large args.
_SINPI_C = (3.141591396647e+00, -5.167677421884e+00, 2.549879327669e+00,
            -5.982787896424e-01, 8.047603768044e-02, -5.990644626448e-03)


def _sinpi(u):
    """sin(pi * u) for u >= 0 via mod-2 reduction + odd minimax poly."""
    v = u - 2.0 * jnp.floor(0.5 * u)          # [0, 2)
    s = v - 1.0                               # [-1, 1); sin(pi v) = -sin(pi s)
    s2 = s * s
    p = _SINPI_C[5]
    for c in _SINPI_C[4::-1]:
        p = p * s2 + c
    return -(s * p)


def _cospi(u):
    """cos(pi * u) for u >= 0 (phase-shifted :func:`_sinpi`)."""
    return _sinpi(u + 0.5)

# chunk-level gating flags (SMEM, per node)
(_F_NONEMPTY, _F_LEAFEXP, _F_GE, _F_PER, _F_LIN, _F_INTERNAL, _F_CP,
 _F_SE, _F_CONSTSE) = range(9)
_NF = 9

# nodeinfo rows (per node, each a (C, 1, 1) plane): type masks + params
(_M_CONST, _M_SE, _M_GE, _M_PER, _M_LIN, _M_PLUS, _M_TIMES, _M_CP,
 _M_P0, _M_P1, _M_P2) = range(11)
_NI = 11

# beyond this (padded) n a single grid step's (N, C, n, n) scratches exceed
# the VMEM budget even at C=1, so the covariance plane is tiled into
# (_TILE, _TILE) blocks with a revisited accumulating dparams output (every
# parameter gradient is a sum of elementwise-in-(row, col) terms, hence
# tile-additive); the cap below only bounds HBM for the (P, n, n) output
_PLANE_N = 512
_TILE = 256
MAX_MEGA_N = 2048
_VMEM_LIMIT = 100 * 1024 * 1024

_INTERPRET = False


def set_interpret_mode(enable: bool) -> None:
    """Run through the Pallas interpreter (CPU testing)."""
    global _INTERPRET
    _INTERPRET = bool(enable)


def megacov_supported(n_nodes: int, n: int) -> bool:
    """Static-shape support check for the fused batched covariance."""
    return n_nodes <= 63 and 8 <= n <= MAX_MEGA_N and n % 8 == 0


def _tiled(n: int) -> bool:
    return int(math.ceil(n / 128)) * 128 > _PLANE_N


def _chunk_for(n: int, n_nodes: int, n_scratch: int) -> int:
    """Particles per grid step keeping n_scratch (N, C, tr, tc) buffers
    (plus block operands) under the VMEM budget.

    Below the VMEM ceiling the chunk size trades per-grid-step overhead
    against activity-gating precision (a chunk pays the union of its
    lanes' node slots).  Measured on the v5e (P=200, depth 5, diverse
    200-structure population — the regime the fit actually runs in, per
    the sorting-neutral bench): C=2 wins clearly at n >= 96 (cap 128
    grad 2.55 -> 1.62 ms, cap 160 fwd 1.69 -> 1.18 ms) and washes at
    cap 32, where the VMEM-max chunk stays better on duplicated
    populations; C=1 regresses (step overhead).  See PLAN.md round-3."""
    if _tiled(n):
        tr = tc = _TILE
        cands = (16, 8, 4, 2, 1)
    else:
        n_pad = int(math.ceil(n / 128)) * 128
        # compacted walk-scratch footprint (see _dest_layout)
        tr, tc, _ = _dest_layout(n, _make_regions(n, n_pad))
        # the measured-preferred C=2 still has to clear the VMEM budget:
        # at n=416 the backward's two (31, 2, 416, 512) scratch buffers
        # are 105.7 MB — 768 KB over the scoped limit (observed as a
        # compile-time stack OOM on the daily-cadence end-to-end drive)
        cands = (2, 1) if n >= 96 else (16, 8, 4, 2, 1)
    per_particle = n_nodes * tr * tc * 4
    # 24 MB reserve for the pipelined in/out blocks + compiler stack: the
    # old 12 MB margin OOMed at n=160/C=16 (scoped alloc 102.7M vs the
    # 100M limit — non-128-multiple n pays a 1.6x lane-padding ratio)
    for c in cands:
        if n_scratch * c * per_particle <= _VMEM_LIMIT - 24 * 1024 * 1024:
            return c
    return 1


def _rsum11(m):
    """(C, n, n) -> (C, 1, 1) via two single-axis keepdims reductions."""
    return jnp.sum(jnp.sum(m, axis=2, keepdims=True), axis=1, keepdims=True)


def _make_regions(n: int, n_pad: int):
    """Static symmetric-panel compute regions for the untiled plane.

    K(x, x) is symmetric per particle (every leaf/combinator formula is
    invariant under row/col exchange), so only the lower part of each
    128-lane column panel needs evaluating: region ``j`` covers rows
    ``[128j, n)`` x cols ``[128j, 128(j+1))``.  At the fit's cap-160
    segment this cuts the kernel's plane work from 160x256 to
    160x128 + 32x128 lanes (40%); the full matrix is rebuilt from
    transposed panels in XLA (``_assemble_symmetric``) and the VJP folds
    the cotangent onto the same regions (always valid: dK_ij/dp ==
    dK_ji/dp identically in the parameters).  For n <= 128 there is a
    single full-plane region and the kernel behaves exactly as before.
    """
    if n <= 128:
        return ((0, 0, n_pad),)
    return tuple((128 * j, 128 * j, 128 * (j + 1))
                 for j in range(n_pad // 128))


def _dest_layout(n: int, regions):
    """Compacted walk-scratch layout for the symmetric-panel regions.

    The (N, C, n, n_pad) walk scratches wasted the never-written upper
    regions AND the lane padding (at n=160 only ~60% of a 160x256 plane
    is live).  Stacking the regions vertically gives a dense
    (rows_total, width) plane: region ``j`` (plane rows [r0, n) x cols
    [c0, c1)) lands at compact rows [off_j, off_j + n - r0) x cols
    [0, c1 - c0).  Multi-region panels are all 128 lanes wide — exactly
    one tile — and every row count inherits n % 8 == 0
    (``megacov_supported``), keeping compact offsets aligned to the
    (8, 128) f32 sublane tile.  Returns
    ``(rows_total, width, [(dest_row_slice, dest_col_slice), ...])``.
    """
    dests, off, width = [], 0, 0
    for (r0, c0, c1) in regions:
        rows_j, width_j = n - r0, c1 - c0
        dests.append((slice(off, off + rows_j), slice(0, width_j)))
        off += rows_j
        width = max(width, width_j)
    return off, width, dests


def _region_planes(xc_ref, xr_ref, regions):
    """Per-region walk-scratch slices and distance planes.

    Returns ``[(drs, dcs, xc_s, xr_s, r, r2, log_r), ...]`` where
    ``drs``/``dcs`` index the COMPACTED (C, rows_total, width) walk
    scratch (``_dest_layout``); the x planes are the region's true
    coordinates.  Scratch values outside the regions are never written
    nor read; callers needing full-plane coordinates (K output stores,
    dK loads, the fused kernel's A assembly) map region j's plane block
    (rows [r0, n) x cols [c0, c1)) to dest block j themselves.

    The slices are taken on the operand REFS, not on loaded values:
    windowed ref loads give canonical (offset-0) vector layouts, whereas
    value slicing hands downstream broadcasts a lane-offset layout Mosaic
    rejects (`Invalid input layout` on ``vector.broadcast`` of a
    ``{*,128}``-offset (C, 1, 128) slice — observed on the v5e at n=160).
    """
    n = xc_ref.shape[1]
    _, _, dests = _dest_layout(n, regions)
    regs = []
    for (r0, c0, c1), (drs, dcs) in zip(regions, dests):
        xc_s = xc_ref[:, r0:n, :]                 # (C, n - r0, 1)
        xr_s = xr_ref[:, :, c0:c1]                # (C, 1, c1 - c0)
        d = xc_s - xr_s
        r = jnp.abs(d)
        regs.append((drs, dcs, xc_s, xr_s,
                     r, d * d, jnp.log(jnp.maximum(r, 1e-30))))
    return regs


def _node_fwd_body(i, flags_ref, info_ref, regs, vals, N,
                   ablate=frozenset()):
    """Evaluate heap slot ``i`` for all C chunk lanes into ``vals[i]``.

    ``info_ref[i, j]`` are (C, 1, 1) planes; each region in ``regs``
    carries its xc (C, rows, 1), xr (C, 1, cols) and r/r2/log_r planes.
    ``ablate`` (timing-only; results numerically invalid) drops bodies by
    tag — fleaf/fge/fper/flin/fint/fcp — for kernel phase attribution
    (``tools/leaf_ablation.py``).
    """
    from jax.experimental import pallas as pl

    li = jnp.minimum(2 * i + 1, N - 1)
    ri = jnp.minimum(2 * i + 2, N - 1)

    def f(j):
        return flags_ref[i, j] != 0

    def m(j):
        return info_ref[i, j] > 0.5

    def p(j):
        return info_ref[i, (_M_P0, _M_P1, _M_P2)[j]]

    if "fleaf" not in ablate:
        # CONST/SE write their pre-exp arg; GE/PER lanes overwrite below
        # before the shared exp, so this body only fires when a lane
        # actually holds a CONST or SE node (zero-mass under the default
        # leaf prior — the body then costs one scalar test).  Lanes whose
        # slot is empty keep stale scratch, which is never consumed:
        # parents select children per-lane only where the tree is real,
        # and dp/K outputs discard non-selected lanes by type mask.
        @pl.when(f(_F_CONSTSE))
        def _():
            p0, p1 = p(0), p(1)
            for (rs, cs, xc, xr, r, r2, log_r) in regs:
                arg = jnp.where(m(_M_CONST), p0 + jnp.zeros_like(r),
                                jnp.zeros_like(r))
                arg = jnp.where(m(_M_SE),
                                p1 - 0.5 * r2 * jnp.exp(-2.0 * p0), arg)
                vals[i, :, rs, cs] = arg

    if "fge" not in ablate:
        @pl.when(f(_F_GE))
        def _():
            p0, p1, p2 = p(0), p(1), p(2)
            gamma = 2.0 * jax.nn.sigmoid(p1)
            for (rs, cs, xc, xr, r, r2, log_r) in regs:
                pow_t = jnp.exp(gamma * jnp.maximum(log_r - p0, _LOG_EPS))
                vals[i, :, rs, cs] = jnp.where(
                    m(_M_GE), jnp.where(r > 0, p2 - pow_t, p2),
                    vals[i, :, rs, cs])

    if "fper" not in ablate:
        @pl.when(f(_F_PER))
        def _():
            p0, p1, p2 = p(0), p(1), p(2)
            for (rs, cs, xc, xr, r, r2, log_r) in regs:
                s = _sinpi(r * jnp.exp(-p1))
                vals[i, :, rs, cs] = jnp.where(
                    m(_M_PER), p2 - 2.0 * s * s * jnp.exp(-2.0 * p0),
                    vals[i, :, rs, cs])

    if "fleaf" not in ablate:
        @pl.when(f(_F_LEAFEXP))
        def _():
            for (rs, cs, *_rest) in regs:
                vals[i, :, rs, cs] = jnp.exp(vals[i, :, rs, cs])

    if "flin" not in ablate:
        @pl.when(f(_F_LIN))
        def _():
            p0, p1 = p(0), p(1)
            for (rs, cs, xc, xr, r, r2, log_r) in regs:
                k_lin = jnp.exp(p1) * ((xc - p0) * (xr - p0))
                vals[i, :, rs, cs] = jnp.where(m(_M_LIN), k_lin,
                                               vals[i, :, rs, cs])

    if "fint" not in ablate:
        @pl.when(f(_F_INTERNAL))
        def _():
            for (rs, cs, *_rest) in regs:
                left = vals[li, :, rs, cs]
                right = vals[ri, :, rs, cs]
                v = jnp.where(m(_M_PLUS), left + right, vals[i, :, rs, cs])
                vals[i, :, rs, cs] = jnp.where(m(_M_TIMES), left * right, v)

    if "fcp" not in ablate:
        @pl.when(f(_F_CP))
        def _():
            p0, p1 = p(0), p(1)
            inv_s = jnp.exp(-p1)
            for (rs, cs, xc, xr, r, r2, log_r) in regs:
                left = vals[li, :, rs, cs]
                right = vals[ri, :, rs, cs]
                s1c = jax.nn.sigmoid((xc - p0) * inv_s)   # (C, rows, 1)
                s1r = jax.nn.sigmoid((xr - p0) * inv_s)   # (C, 1, cols)
                k_cp = (s1c * s1r * left
                        + (1.0 - s1c) * (1.0 - s1r) * right)
                vals[i, :, rs, cs] = jnp.where(m(_M_CP), k_cp,
                                               vals[i, :, rs, cs])


def _cov_fwd_kernel(flags_ref, info_ref, xc_ref, xr_ref, out_ref, vals, *,
                    N, regions):
    regs = _region_planes(xc_ref, xr_ref, regions)

    def body(it, carry):
        _node_fwd_body(N - 1 - it, flags_ref, info_ref, regs, vals, N)
        return carry

    jax.lax.fori_loop(0, N, body, 0)
    n = xc_ref.shape[1]
    _, _, dests = _dest_layout(n, regions)
    for (r0, c0, c1), (drs, dcs) in zip(regions, dests):
        out_ref[:, r0:n, c0:c1] = vals[0, :, drs, dcs]


def _node_bwd_body(i, flags_ref, info_ref, regs, vals, dvals, dp, N,
                   ablate):
    """Top-down cotangent sweep for heap slot ``i``.

    Shared by the cov-only backward kernel and the fused LML
    value+grad kernel (``ops/pallas_megalml.py``): reads ``vals``
    (forward walk) and ``dvals[i]``, writes child cotangents into
    ``dvals`` and parameter grads into ``dp[3i:3i+3]``.
    """
    from jax.experimental import pallas as pl

    li = jnp.minimum(2 * i + 1, N - 1)
    ri = jnp.minimum(2 * i + 2, N - 1)
    z11 = jnp.zeros_like(info_ref[i, 0])     # (C, 1, 1)
    dp[3 * i] = z11
    dp[3 * i + 1] = z11
    dp[3 * i + 2] = z11

    def f(j):
        return flags_ref[i, j] != 0

    def m(j):
        return info_ref[i, j] > 0.5

    def p(j):
        return info_ref[i, (_M_P0, _M_P1, _M_P2)[j]]

    if "bnonempty" not in ablate:
        # amplitude grads exist only for the exp-family leaves, so the
        # shared damp reduction gates on LEAFEXP (round 4 gated on
        # NONEMPTY, paying two plane mults + reductions per INTERNAL slot
        # for grads that are identically zero there); the SE lengthscale
        # term gets its own flag — zero-mass under the default leaf prior
        @pl.when(f(_F_LEAFEXP))
        def _():
            # shared reduction: dk/d(amplitude-slot) = k for every exp leaf
            damp = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                k = vals[i, :, rs, cs]
                damp = damp + _rsum11(dv * k)
            dp[3 * i] = jnp.where(m(_M_CONST), damp, z11)
            dp[3 * i + 1] = jnp.where(m(_M_SE), damp, z11)
            dp[3 * i + 2] = jnp.where(m(_M_GE) | m(_M_PER), damp, z11)

        @pl.when(f(_F_SE))
        def _():
            p0 = p(0)
            dse = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                k = vals[i, :, rs, cs]
                dse = dse + _rsum11(dv * k * r2)
            dp[3 * i] = dp[3 * i] + jnp.where(
                m(_M_SE), dse * jnp.exp(-2.0 * p0), z11)

    if "bge" not in ablate:
        @pl.when(f(_F_GE))
        def _():
            p0 = p(0)
            sig = jax.nn.sigmoid(p(1))
            gamma = 2.0 * sig
            s0 = z11
            s1 = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                k = vals[i, :, rs, cs]
                w = jnp.maximum(log_r - p0, _LOG_EPS)     # clamped log u
                notcl = (log_r - p0 > _LOG_EPS).astype(r.dtype)
                pow_t = jnp.exp(gamma * w)
                rpos = (r > 0).astype(r.dtype)
                s0 = s0 + _rsum11(dv * k * pow_t * rpos * notcl)
                s1 = s1 + _rsum11(dv * (-k) * pow_t * w * rpos)
            g0 = jnp.where(m(_M_GE), s0 * gamma, z11)
            g1 = jnp.where(m(_M_GE), s1 * gamma * (1.0 - sig), z11)
            dp[3 * i] = dp[3 * i] + g0
            dp[3 * i + 1] = dp[3 * i + 1] + g1

    if "bper" not in ablate:
        @pl.when(f(_F_PER))
        def _():
            e2 = jnp.exp(-2.0 * p(0))
            einv = jnp.exp(-p(1))
            s0 = z11
            s1 = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                k = vals[i, :, rs, cs]
                u = r * einv
                s = _sinpi(u)
                s0 = s0 + _rsum11(dv * k * 4.0 * s * s)
                s1 = s1 + _rsum11(dv * k * 4.0 * s * _cospi(u) * (_PI * u))
            g0 = jnp.where(m(_M_PER), s0 * e2, z11)
            g1 = jnp.where(m(_M_PER), s1 * e2, z11)
            dp[3 * i] = dp[3 * i] + g0
            dp[3 * i + 1] = dp[3 * i + 1] + g1

    if "blin" not in ablate:
        @pl.when(f(_F_LIN))
        def _():
            p0, p1 = p(0), p(1)
            s0 = z11
            s1 = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                k = vals[i, :, rs, cs]
                s0 = s0 + _rsum11(dv * ((xc_s - p0) + (xr_s - p0)))
                s1 = s1 + _rsum11(dv * k)
            g0 = jnp.where(m(_M_LIN), s0 * (-jnp.exp(p1)), z11)
            g1 = jnp.where(m(_M_LIN), s1, z11)
            dp[3 * i] = dp[3 * i] + g0
            dp[3 * i + 1] = dp[3 * i + 1] + g1

    if "bint" not in ablate:
        @pl.when(f(_F_INTERNAL))
        def _():
            is_plus = m(_M_PLUS).astype(jnp.float32)
            is_times = m(_M_TIMES).astype(jnp.float32)
            for (rs, cs, *_rest) in regs:
                dv = dvals[i, :, rs, cs]
                left = vals[li, :, rs, cs]
                right = vals[ri, :, rs, cs]
                dvals[li, :, rs, cs] = is_plus * dv + is_times * dv * right
                dvals[ri, :, rs, cs] = is_plus * dv + is_times * dv * left

    if "bcp" not in ablate:
        @pl.when(f(_F_CP))
        def _():
            p0 = p(0)
            inv_s = jnp.exp(-p(1))
            is_cp = m(_M_CP).astype(jnp.float32)
            g0a = z11
            g1a = z11
            for (rs, cs, xc_s, xr_s, r, r2, log_r) in regs:
                dv = dvals[i, :, rs, cs]
                left = vals[li, :, rs, cs]
                right = vals[ri, :, rs, cs]
                zc = (xc_s - p0) * inv_s              # (C, rows, 1)
                zr = (xr_s - p0) * inv_s              # (C, 1, cols)
                s1c = jax.nn.sigmoid(zc)
                s1r = jax.nn.sigmoid(zr)
                dvals[li, :, rs, cs] = dvals[li, :, rs, cs] + (
                    is_cp * dv * (s1c * s1r))
                dvals[ri, :, rs, cs] = dvals[ri, :, rs, cs] + (
                    is_cp * dv * ((1.0 - s1c) * (1.0 - s1r)))
                # location / log-scale grads via row and column sigmoids
                M1 = dv * (s1r * left - (1.0 - s1r) * right)
                M2 = dv * (s1c * left - (1.0 - s1c) * right)
                a1 = jnp.sum(M1, axis=2, keepdims=True)  # (C, rows, 1)
                a2 = jnp.sum(M2, axis=1, keepdims=True)  # (C, 1, cols)
                spc = s1c * (1.0 - s1c)
                spr = s1r * (1.0 - s1r)
                g0a = g0a + (
                    jnp.sum(a1 * spc * (-inv_s), axis=1, keepdims=True)
                    + jnp.sum(a2 * spr * (-inv_s), axis=2, keepdims=True))
                g1a = g1a + (
                    jnp.sum(a1 * spc * (-zc), axis=1, keepdims=True)
                    + jnp.sum(a2 * spr * (-zr), axis=2, keepdims=True))
            dp[3 * i] = dp[3 * i] + jnp.where(m(_M_CP), g0a, z11)
            dp[3 * i + 1] = dp[3 * i + 1] + jnp.where(m(_M_CP), g1a, z11)


def _cov_bwd_kernel(flags_ref, info_ref, xc_ref, xr_ref, dk_ref,
                    dparams_ref, *scratch, N, regions, tiled=False):
    import os

    from jax.experimental import pallas as pl

    if tiled:
        # dparams_ref is revisited across the (tr, tc) tile grid: per-node
        # grads land in the dp scratch, the epilogue accumulates them
        vals, dvals, dp = scratch
    else:
        vals, dvals = scratch
        dp = dparams_ref

    ablate = set(os.environ.get("MEGA_ABLATE", "").split(","))

    regs = _region_planes(xc_ref, xr_ref, regions)

    def fwd_body(it, carry):
        _node_fwd_body(N - 1 - it, flags_ref, info_ref, regs, vals, N)
        return carry

    jax.lax.fori_loop(0, N, fwd_body, 0)

    n = xc_ref.shape[1]
    _, _, dests = _dest_layout(n, regions)
    for (r0, c0, c1), (drs, dcs) in zip(regions, dests):
        dvals[0, :, drs, dcs] = dk_ref[:, r0:n, c0:c1]

    def bwd_body(i, carry):
        _node_bwd_body(i, flags_ref, info_ref, regs, vals, dvals, dp,
                       N, ablate)
        return carry

    jax.lax.fori_loop(0, N, bwd_body, 0)

    if tiled:
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        def epi(k, carry):
            @pl.when(first)
            def _():
                dparams_ref[k] = dp[k]

            @pl.when(jnp.logical_not(first))
            def _():
                dparams_ref[k] = dparams_ref[k] + dp[k]

            return carry

        jax.lax.fori_loop(0, 3 * N, epi, 0)


def _chunk_flags(types_g):
    """(G, C, N) chunked types -> (G, N, NF) int32 activity flags."""
    t = types_g
    leafexp = ((t == CONST) | (t == SE) | (t == GE) | (t == PERIODIC))
    flags = jnp.stack(
        [
            jnp.any(t != 0, axis=1),
            jnp.any(leafexp, axis=1),
            jnp.any(t == GE, axis=1),
            jnp.any(t == PERIODIC, axis=1),
            jnp.any(t == LINEAR, axis=1),
            jnp.any((t == PLUS) | (t == TIMES) | (t == CP), axis=1),
            jnp.any(t == CP, axis=1),
            # fine gating (round 5): the reference's default leaf prior
            # gives zero mass to Constant and SE (config.node_dist_leaf),
            # so the SE lengthscale-grad term and the CONST/SE forward
            # arg body get their own flags instead of riding the broad
            # NONEMPTY/LEAFEXP gates
            jnp.any(t == SE, axis=1),
            jnp.any((t == CONST) | (t == SE), axis=1),
        ],
        axis=-1,
    )
    return flags.astype(jnp.int32)


def _nodeinfo(types, params, G, C, N):
    """(Pp, N) types + (Pp, N, 3) params -> (G*N, NI, C, 1, 1) f32 planes."""
    t = types.reshape(G, C, N)
    pr = params.reshape(G, C, N, 3)
    rows = [
        (t == CONST), (t == SE), (t == GE), (t == PERIODIC), (t == LINEAR),
        (t == PLUS), (t == TIMES), (t == CP),
    ]
    info = jnp.stack(
        [r.astype(jnp.float32) for r in rows]
        + [pr[..., 0], pr[..., 1], pr[..., 2]],
        axis=-1,
    )                                          # (G, C, N, NI)
    info = info.transpose(0, 2, 3, 1)          # (G, N, NI, C)
    return info.reshape(G * N, _NI, C, 1, 1)


def _pack(types, params, x, C):
    """Pad P to a C multiple; build flags, nodeinfo, and both x layouts.

    The lane (last) axis is zero-padded to a 128 multiple: Mosaic pads lanes
    internally anyway, but handing it misaligned 1.5-tile shapes (n=192)
    blew Mosaic compile time up ~4x — clean tiles compile like n=128.
    """
    P, N = types.shape
    n = x.shape[1]
    if _tiled(n):
        # both plane axes are tiled into (_TILE, _TILE) blocks, so rows pad
        # to the tile multiple too (padded x is 0; rows/cols sliced off)
        n_pad = -(-n // _TILE) * _TILE
    else:
        n_pad = int(math.ceil(n / 128)) * 128
    G = -(-P // C)
    Pp = G * C
    if Pp != P:
        pad = Pp - P
        types = jnp.concatenate(
            [types, jnp.zeros((pad, N), types.dtype)], axis=0)
        params = jnp.concatenate(
            [params, jnp.zeros((pad, N, 3), params.dtype)], axis=0)
        x = jnp.concatenate([x, jnp.zeros((pad, n), x.dtype)], axis=0)
    flags = _chunk_flags(types.reshape(G, C, N))
    info = _nodeinfo(types, params, G, C, N)
    xpad = jnp.pad(x, ((0, 0), (0, n_pad - n))) if n_pad != n else x
    xc = (xpad if _tiled(n) else x)[:, :, None]  # (Pp, n|n_pad, 1)
    xr = xpad[:, None, :]                        # (Pp, 1, n_pad)
    return flags, info, xc, xr, G, Pp, n_pad


def _specs(C, N, n, interpret):
    """Block specs; leading grid dims are ``None``-squeezed so kernel refs
    index nodes on their major axis (the only axis Mosaic dynamic-indexes)."""
    from jax.experimental import pallas as pl

    if interpret:
        smem = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        smem = {"memory_space": pltpu.SMEM}
    flags_spec = pl.BlockSpec((None, N, _NF), lambda g: (g, 0, 0), **smem)
    info_spec = pl.BlockSpec((N, _NI, C, 1, 1), lambda g: (g, 0, 0, 0, 0))
    n_pad = int(math.ceil(n / 128)) * 128
    xc_spec = pl.BlockSpec((C, n, 1), lambda g: (g, 0, 0))
    xr_spec = pl.BlockSpec((C, 1, n_pad), lambda g: (g, 0, 0))
    k_spec = pl.BlockSpec((C, n, n_pad), lambda g: (g, 0, 0))
    return flags_spec, info_spec, xc_spec, xr_spec, k_spec


def _specs_tiled(C, N, interpret):
    """Block specs for the (grid, tile_row, tile_col) tiled plane."""
    from jax.experimental import pallas as pl

    if interpret:
        smem = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        smem = {"memory_space": pltpu.SMEM}
    flags_spec = pl.BlockSpec((None, N, _NF), lambda g, i, j: (g, 0, 0),
                              **smem)
    info_spec = pl.BlockSpec((N, _NI, C, 1, 1),
                             lambda g, i, j: (g, 0, 0, 0, 0))
    xc_spec = pl.BlockSpec((C, _TILE, 1), lambda g, i, j: (g, i, 0))
    xr_spec = pl.BlockSpec((C, 1, _TILE), lambda g, i, j: (g, 0, j))
    k_spec = pl.BlockSpec((C, _TILE, _TILE), lambda g, i, j: (g, i, j))
    return flags_spec, info_spec, xc_spec, xr_spec, k_spec


def _scratch(shapes, interpret):
    del interpret  # VMEM hints are honored by compile and interpret alike
    from jax.experimental.pallas import tpu as pltpu

    return [pltpu.VMEM(s, jnp.float32) for s in shapes]


def _compiler_kwargs(interpret):
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)}


# --------------------------------------------------------------------------
# Structure-sorted chunking.  The kernel's activity gating is per chunk
# (ANY over the C lanes), so a chunk mixing different tree shapes pays for
# the union of their node slots.  After SMC resampling the population is
# dominated by duplicated structures; grouping identical type-rows into the
# same chunks makes most chunks homogeneous and lets the gate skip most of
# the 31-slot walk.  Measured (v5e, P=200 cap=160 depth 5, 25 structures
# duplicated 8x — the post-resample regime): fwd 2.33 -> 1.06 ms; even 200
# fully distinct structures get 2.01 -> 1.55 ms from shape clustering.
# The permutation is applied inside the fwd/bwd calls and inverted on the
# outputs, so per-particle results are bit-identical to the unsorted call.
# --------------------------------------------------------------------------
_SORT_CHUNKS = True


def set_sort_chunks(enable: bool) -> None:
    """Disable/enable structure-sorted chunking (A/B and debugging knob)."""
    global _SORT_CHUNKS
    _SORT_CHUNKS = bool(enable)


@functools.lru_cache(maxsize=8)
def _hash_vec(n_nodes: int) -> np.ndarray:
    # host constant (NOT a jax array: caching a traced-context array here
    # leaks a tracer into later traces; numpy lifts as a constant per trace)
    rng = np.random.default_rng(12345)
    return rng.uniform(1.0, 2.0, size=(n_nodes,)).astype(np.float32)


def _struct_perm(types):
    """Permutation grouping identical structure rows.

    A fixed random projection of the type codes: identical rows get
    identical keys (exact — small-int dot), so duplicates become adjacent;
    hash collisions between distinct rows only cost gating efficiency."""
    key = types.astype(jnp.float32) @ _hash_vec(types.shape[1])
    return jnp.argsort(key)


def _fwd_call(types, params, x, interpret):
    if _SORT_CHUNKS and types.shape[0] > 1:
        perm = _struct_perm(types)
        inv = jnp.argsort(perm)
        out = _fwd_call_impl(types[perm], params[perm], x[perm], interpret)
        return out[inv]
    return _fwd_call_impl(types, params, x, interpret)


def _assemble_symmetric(out, regions, n):
    """Rebuild the full symmetric K from lower column panels.

    Pure slices + transposes — the never-written upper region of ``out``
    cannot leak into the result.  Panel ``j``'s upper block (rows < 128j)
    is the transpose of the already-computed block at (rows 128j:cm,
    cols 0:128j), which lives in earlier regions.
    """
    panels = []
    for (r0, c0, c1) in regions:
        cm = min(c1, n)
        if cm <= c0:
            break  # pure lane-padding panel, nothing real to emit
        low = out[:, r0:n, c0:cm]
        if r0 == 0:
            panels.append(low)
        else:
            up = jnp.swapaxes(out[:, c0:cm, :r0], 1, 2)
            panels.append(jnp.concatenate([up, low], axis=1))
    return jnp.concatenate(panels, axis=2)


def _fwd_call_impl(types, params, x, interpret):
    from jax.experimental import pallas as pl

    P, N = types.shape
    n = x.shape[1]
    C = _chunk_for(n, N, 1)
    flags, info, xc, xr, G, Pp, n_pad = _pack(types, params, x, C)
    if _tiled(n):
        T = n_pad // _TILE
        fs, infs, xcs, xrs, ks = _specs_tiled(C, N, interpret)
        out = pl.pallas_call(
            functools.partial(_cov_fwd_kernel, N=N,
                              regions=((0, 0, _TILE),)),
            grid=(G, T, T),
            in_specs=[fs, infs, xcs, xrs],
            out_specs=ks,
            out_shape=jax.ShapeDtypeStruct((Pp, n_pad, n_pad), jnp.float32),
            scratch_shapes=_scratch([(N, C, _TILE, _TILE)], interpret),
            interpret=interpret,
            **_compiler_kwargs(interpret),
        )(flags, info, xc, xr)
        return out[:P, :n, :n]
    regions = _make_regions(n, n_pad)
    rows_c, width_c, _ = _dest_layout(n, regions)
    fs, infs, xcs, xrs, ks = _specs(C, N, n, interpret)
    out = pl.pallas_call(
        functools.partial(_cov_fwd_kernel, N=N, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs],
        out_specs=ks,
        out_shape=jax.ShapeDtypeStruct((Pp, n, n_pad), jnp.float32),
        scratch_shapes=_scratch([(N, C, rows_c, width_c)], interpret),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(flags, info, xc, xr)
    if len(regions) == 1:
        return out[:P, :, :n]
    return _assemble_symmetric(out, regions, n)[:P]


def _bwd_call(types, params, x, dk, interpret):
    if _SORT_CHUNKS and types.shape[0] > 1:
        perm = _struct_perm(types)
        inv = jnp.argsort(perm)
        dparams = _bwd_call_impl(
            types[perm], params[perm], x[perm], dk[perm], interpret)
        return dparams[inv]
    return _bwd_call_impl(types, params, x, dk, interpret)


def _bwd_call_impl(types, params, x, dk, interpret):
    from jax.experimental import pallas as pl

    P, N = types.shape
    n = x.shape[1]
    C = _chunk_for(n, N, 2)
    flags, info, xc, xr, G, Pp, n_pad = _pack(types, params, x, C)
    if _tiled(n):
        T = n_pad // _TILE
        dk = jnp.pad(dk, ((0, Pp - P), (0, n_pad - n), (0, n_pad - n)))
        fs, infs, xcs, xrs, ks = _specs_tiled(C, N, interpret)
        dp_spec = pl.BlockSpec((None, N * 3, C, 1, 1),
                               lambda g, i, j: (g, 0, 0, 0, 0))
        dparams_l = pl.pallas_call(
            functools.partial(_cov_bwd_kernel, N=N,
                              regions=((0, 0, _TILE),), tiled=True),
            grid=(G, T, T),
            in_specs=[fs, infs, xcs, xrs, ks],
            out_specs=dp_spec,
            out_shape=jax.ShapeDtypeStruct((G, N * 3, C, 1, 1), jnp.float32),
            scratch_shapes=_scratch(
                [(N, C, _TILE, _TILE), (N, C, _TILE, _TILE),
                 (N * 3, C, 1, 1)], interpret),
            interpret=interpret,
            **_compiler_kwargs(interpret),
        )(flags, info, xc, xr, dk)
        dparams = dparams_l.reshape(G, N, 3, C).transpose(0, 3, 1, 2)
        return dparams.reshape(Pp, N, 3)[:P]
    regions = _make_regions(n, n_pad)
    rows_c, width_c, _ = _dest_layout(n, regions)
    if len(regions) > 1:
        # fold the cotangent onto the computed (lower-panel) regions:
        # sum_ij W_ij dK_ij/dp == sum_ij W''_ij dK_ij/dp with W'' =
        # tril(W + W^T, -1) + diag(W), because dK/dp is symmetric.
        # Entries of W'' in never-computed areas are zero by construction.
        dk = (jnp.tril(dk + jnp.swapaxes(dk, 1, 2), k=-1)
              + jnp.eye(n, dtype=dk.dtype) * dk)
    dk = jnp.pad(dk, ((0, Pp - P), (0, 0), (0, n_pad - n)))
    fs, infs, xcs, xrs, ks = _specs(C, N, n, interpret)
    dp_spec = pl.BlockSpec((None, N * 3, C, 1, 1),
                           lambda g: (g, 0, 0, 0, 0))
    dparams_l = pl.pallas_call(
        functools.partial(_cov_bwd_kernel, N=N, regions=regions),
        grid=(G,),
        in_specs=[fs, infs, xcs, xrs, ks],
        out_specs=dp_spec,
        out_shape=jax.ShapeDtypeStruct((G, N * 3, C, 1, 1), jnp.float32),
        scratch_shapes=_scratch(
            [(N, C, rows_c, width_c), (N, C, rows_c, width_c)], interpret),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(flags, info, xc, xr, dk)
    dparams = dparams_l.reshape(G, N, 3, C).transpose(0, 3, 1, 2)
    return dparams.reshape(Pp, N, 3)[:P]


@jax.custom_vjp
def cov_batched_fused(types, params, x):
    """Batched covariance K(x_p, x_p) for P heterogeneous trees: (P, n, n).

    types i32[P, N] heap encoding; params f32[P, N, 3]; x f32[P, n] (rows may
    differ per particle).  Gradients flow to ``params`` only (x is data).
    Semantics identical to ``vmap(kernels.eval_cov_impl)``.
    """
    return _fwd_call(types, params, x, _INTERPRET)


def _vjp_fwd(types, params, x):
    return _fwd_call(types, params, x, _INTERPRET), (types, params, x)


def _vjp_bwd(res, dk):
    types, params, x = res
    dparams = _bwd_call(types, params, x, dk, _INTERPRET)
    zero_types = np.zeros(types.shape, dtype=jax.dtypes.float0)
    return (zero_types, dparams, jnp.zeros_like(x))


cov_batched_fused.defvjp(_vjp_fwd, _vjp_bwd)
