"""Device-side covariance assembly from encoded kernel expression trees.

One select-based interpreter evaluates a *set of heterogeneous trees* under a
single `vmap` (SURVEY.md §7 "hard parts"): node types are traced values, the
heap layout is static, so XLA compiles one program for every structure the
MCMC can visit.  All node-type branches are computed and mask-selected per
heap slot — the behavior a `lax.switch` would lower to under `vmap` anyway
(lanes hold different structures), but as one flat elementwise graph that
compiles fast and vectorizes across particle lanes without divergence.  The
per-branch work is O(n·m) elementwise, cheap next to the O(n³) Cholesky
downstream.

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

import jax
import jax.numpy as jnp

from ..models.structures import CONST, CP, GE, LINEAR, PERIODIC, PLUS, SE, TIMES

__all__ = ["eval_cov", "eval_cov_impl", "eval_cov_batch"]


def _node_value(t, p, left, right, x1, x2, d, r, r2):
    """One heap slot's covariance block, selected by (traced) node type.

    Every branch is evaluated and combined with equality-mask `where`s rather
    than `lax.switch`: under `vmap` a switch lowers to selects anyway (lanes
    hold different structures), so this is runtime-equivalent on the hot path
    while compiling as one flat elementwise graph instead of a tower of
    conditionals — an order of magnitude faster to compile at 31 heap slots.
    """
    dt = d.dtype
    tiny = jnp.asarray(1e-12, dtype=dt)

    k_const = jnp.exp(p[0]) * jnp.ones_like(d)
    k_linear = jnp.exp(p[1]) * ((x1 - p[0])[:, None] * (x2 - p[0])[None, :])
    k_se = jnp.exp(p[1]) * jnp.exp(-0.5 * r2 * jnp.exp(-2.0 * p[0]))
    # GammaExp: guard r=0 so the fractional power has finite diagonal grads
    gamma = 2.0 * jax.nn.sigmoid(p[1])
    r_scaled = jnp.maximum(r * jnp.exp(-p[0]), tiny)
    k_ge = jnp.exp(p[2]) * jnp.where(
        r > 0, jnp.exp(-jnp.power(r_scaled, gamma)), 1.0
    )
    s = jnp.sin(jnp.pi * r * jnp.exp(-p[1]))
    k_per = jnp.exp(p[2]) * jnp.exp(-2.0 * s * s * jnp.exp(-2.0 * p[0]))
    k_plus = left + right
    k_times = left * right
    inv_scale = jnp.exp(-p[1])
    s1 = jax.nn.sigmoid((x1 - p[0]) * inv_scale)
    s2 = jax.nn.sigmoid((x2 - p[0]) * inv_scale)
    k_cp = (
        s1[:, None] * s2[None, :] * left
        + (1.0 - s1)[:, None] * (1.0 - s2)[None, :] * right
    )

    out = jnp.zeros_like(d)
    for code, val in (
        (CONST, k_const), (LINEAR, k_linear), (SE, k_se), (GE, k_ge),
        (PERIODIC, k_per), (PLUS, k_plus), (TIMES, k_times), (CP, k_cp),
    ):
        out = jnp.where(t == code, val, out)
    return out


def eval_cov_impl(node_types, params, x1, x2):
    """Evaluate one tree's covariance K(x1, x2) -> (n, m).

    node_types: int32[max_nodes] heap encoding; params: f32[max_nodes, 3]
    unconstrained; x1: (n,), x2: (m,).  Pure function of traced values —
    heap size is the only static shape, so one compilation covers every
    structure the MCMC visits.
    """
    max_nodes = node_types.shape[0]
    d = x1[:, None] - x2[None, :]
    r = jnp.abs(d)
    r2 = d * d
    zeros = jnp.zeros(d.shape, dtype=d.dtype)

    # bottom-up over the static heap: children computed before parents.
    # Leaf-only slots (the bottom heap level) skip the combinator math.
    vals: list = [None] * max_nodes
    for i in range(max_nodes - 1, -1, -1):
        li, ri = 2 * i + 1, 2 * i + 2
        left = vals[li] if li < max_nodes else zeros
        right = vals[ri] if ri < max_nodes else zeros
        vals[i] = _node_value(
            node_types[i], params[i], left, right, x1, x2, d, r, r2
        )
    return vals[0]


# Batched over particles: node_types (P, N), params (P, N, 3), shared x1/x2.
eval_cov_batch = jax.jit(jax.vmap(eval_cov_impl, in_axes=(0, 0, None, None)))

# Jitted single-tree entry point for direct callers; code already under
# jit/vmap should use ``eval_cov_impl`` to avoid a nested jit boundary.
eval_cov = jax.jit(eval_cov_impl)
