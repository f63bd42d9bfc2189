"""Device-side covariance assembly from encoded kernel expression trees.

A *level-vectorized* interpreter evaluates a set of heterogeneous trees under
one `vmap` (SURVEY.md §7 "hard parts"): node types are traced values and the
heap layout is static, so XLA compiles one program for every structure the
MCMC can visit.  Instead of walking 31 heap slots one by one (whose per-node
select chains made XLA autodiff compile time explode), the interpreter
processes the heap *one level at a time*: all leaf-kernel values of a level
are computed as a single batched tensor op over the level's node axis, then
combined with the level below by mask-selects (Plus/Times/ChangePoint).  A
depth-5 heap is 5 vectorized steps — a compact graph that differentiates and
vmaps cheaply, and whose big elementwise blocks XLA fuses onto the VPU.

Kernel semantics (unconstrained params; x is the time axis normalized to the
training window per the engine contract documented in SURVEY.md §2.3):

* Constant:        k = exp(p0)
* Linear:          k = exp(p1) · (x1 - c)(x2 - c),        c = p0
* SquaredExp:      k = exp(p1) · exp(-r² / (2ℓ²)),        ℓ = exp(p0)
* GammaExp:        k = exp(p2) · exp(-(r/ℓ)^γ),           ℓ = exp(p0), γ = 2σ(p1)
* Periodic:        k = exp(p2) · exp(-2 sin²(π r / T)/ℓ²), ℓ = exp(p0), T = exp(p1)
* Plus / Times:    k = k_left ± k_right (elementwise sum / product)
* ChangePoint:     k = s(x1)s(x2)·k_left + (1-s(x1))(1-s(x2))·k_right,
                   s(x) = sigmoid((x - loc)/scale), loc = p0, scale = exp(p1)

GammaExponential with γ=2 recovers SquaredExponential (the reference documents
SE as superseded by GammaExp in the default prior,
``docs/vignettes/setting-priors.jl:59-62``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.structures import CONST, CP, GE, LINEAR, PERIODIC, PLUS, SE, TIMES

__all__ = ["eval_cov", "eval_cov_impl", "eval_cov_batch"]


_LOG_EPS = -27.631021  # log(1e-12), the r_scaled clamp in log space


def _leaf_values(t, p, x1, x2, r, r2, log_r):
    """Leaf-kernel values for one heap level: t (k,), p (k,3) -> (k, n, m).

    Select-the-argument form: every exp-family leaf is ``exp(arg)`` with the
    type select applied to the *argument* plane, so one final ``exp`` covers
    Constant/SquaredExp/GammaExp/Periodic (``select(exp(a)) == exp(select(a))``
    exactly — same per-element function).  Together with fusing amplitude
    exps into the argument (``e^a · e^b = e^{a+b}``) and reusing the shared
    ``log r`` plane for the GammaExp power (clamp applied in log space), the
    level costs 3 transcendental planes (GE inner exp, Periodic sin, final
    exp) instead of 5, and the AD residual set shrinks from five candidate
    value planes to the argument/output planes — measured 1.5x on the
    batched depth-5 cov grad.
    """
    tcol = t[:, None, None]
    p0 = p[:, 0][:, None, None]
    p1 = p[:, 1][:, None, None]
    p2 = p[:, 2][:, None, None]

    # stage-1 transcendental planes (only GE/Periodic need one)
    gamma = 2.0 * jax.nn.sigmoid(p1)
    pow_term = jnp.exp(gamma * jnp.maximum(log_r[None] - p0, _LOG_EPS))
    s = jnp.sin(jnp.pi * r[None] * jnp.exp(-p1))

    # per-type exp argument, selected BEFORE the single final exp
    arg = jnp.zeros_like(pow_term)
    arg = jnp.where(tcol == CONST, p0 + jnp.zeros_like(arg), arg)
    arg = jnp.where(tcol == SE,
                    p1 - 0.5 * r2[None] * jnp.exp(-2.0 * p0), arg)
    arg = jnp.where(tcol == GE,
                    jnp.where(r[None] > 0, p2 - pow_term, p2), arg)
    arg = jnp.where(tcol == PERIODIC,
                    p2 - 2.0 * s * s * jnp.exp(-2.0 * p0), arg)
    k_exp = jnp.exp(arg)

    # Linear is not exp-family: handled with a scalar exp outside the select
    cx1 = x1[None, :] - p[:, 0][:, None]  # (k, n)
    cx2 = x2[None, :] - p[:, 0][:, None]  # (k, m)
    k_lin = jnp.exp(p1) * (cx1[:, :, None] * cx2[:, None, :])

    is_exp_leaf = (
        (tcol == CONST) | (tcol == SE) | (tcol == GE) | (tcol == PERIODIC)
    )
    out = jnp.where(is_exp_leaf, k_exp, jnp.zeros_like(k_exp))
    return jnp.where(tcol == LINEAR, k_lin, out)


def eval_cov_impl(node_types, params, x1, x2):
    """Evaluate one tree's covariance K(x1, x2) -> (n, m).

    node_types: int32[max_nodes] heap encoding (children of ``i`` at
    ``2i+1``/``2i+2``); params: f32[max_nodes, 3] unconstrained; x1: (n,),
    x2: (m,).  Heap size is the only static shape, so one compilation covers
    every structure the MCMC visits.
    """
    max_nodes = node_types.shape[0]
    levels = int(math.log2(max_nodes + 1))
    d = x1[:, None] - x2[None, :]
    r = jnp.abs(d)
    r2 = d * d
    # shared across every level & node: the GammaExp power's log-r plane
    log_r = jnp.log(jnp.maximum(r, 1e-30))

    below = None  # (2**lev, n, m) values of the level just processed
    for lev in range(levels - 1, -1, -1):
        lo, hi = 2**lev - 1, 2 ** (lev + 1) - 1
        t = node_types[lo:hi]
        p = params[lo:hi]
        cur = _leaf_values(t, p, x1, x2, r, r2, log_r)
        if below is not None:
            left = below[0::2]
            right = below[1::2]
            tcol = t[:, None, None]
            cur = jnp.where(tcol == PLUS, left + right, cur)
            cur = jnp.where(tcol == TIMES, left * right, cur)
            inv_scale = jnp.exp(-p[:, 1][:, None])
            s1 = jax.nn.sigmoid((x1[None, :] - p[:, 0][:, None]) * inv_scale)
            s2 = jax.nn.sigmoid((x2[None, :] - p[:, 0][:, None]) * inv_scale)
            k_cp = (
                s1[:, :, None] * s2[:, None, :] * left
                + (1.0 - s1)[:, :, None] * (1.0 - s2)[:, None, :] * right
            )
            cur = jnp.where(tcol == CP, k_cp, cur)
        below = cur
    return below[0]


# Batched over particles: node_types (P, N), params (P, N, 3), shared x1/x2.
eval_cov_batch = jax.jit(jax.vmap(eval_cov_impl, in_axes=(0, 0, None, None)))

# Jitted single-tree entry point for direct callers; code already under
# jit/vmap should use ``eval_cov_impl`` to avoid a nested jit boundary.
eval_cov = jax.jit(eval_cov_impl)

# ---------------------------------------------------------------------------
# Backend dispatch: on TPU the fused Pallas kernels (ops/pallas_cov.py) with
# a hand-derived VJP replace this interpreter on the hot paths — they avoid
# the per-level HBM intermediates XLA materializes for the backward pass.
# Resolved at trace time; "auto" = pallas iff running on TPU.
# ---------------------------------------------------------------------------

# Default is the jnp interpreter: XLA's fusion across the particle axis
# currently beats the per-particle Pallas programs (sequential on the single
# TensorCore) — measured 14 ms vs 155 ms per batched grad at P=50, n=192.
# The fused kernels stay available for experimentation ("pallas").
_COV_BACKEND = "jnp"


def set_cov_backend(name: str) -> None:
    """Select the covariance backend: "auto", "pallas", or "jnp".

    Call before the first fit/predict — jitted callers resolve the backend
    when they trace, so flipping it later only affects new compilations.
    """
    global _COV_BACKEND
    assert name in ("auto", "pallas", "jnp"), name
    _COV_BACKEND = name


def _use_pallas() -> bool:
    if _COV_BACKEND == "pallas":
        return True
    if _COV_BACKEND == "jnp":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def cov_fn(node_types, params, x1, x2):
    """Single-tree covariance via the active backend (trace-time choice)."""
    if _use_pallas():
        from .pallas_cov import MAX_FUSED_N, eval_cov_fused

        # the fused whole-matrix kernel holds K in VMEM; beyond its budget
        # fall back to the interpreter (shapes are static at trace time)
        if max(x1.shape[0], x2.shape[0]) <= MAX_FUSED_N:
            return eval_cov_fused(node_types, params, x1, x2)
    return eval_cov_impl(node_types, params, x1, x2)
