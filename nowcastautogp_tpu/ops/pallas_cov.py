"""Pallas TPU kernels: fused covariance assembly from kernel expression trees.

The jnp interpreter (``ops/kernels.py``) materializes per-level
``(level_width, n, m)`` intermediates in HBM — measured as ~75% of the
engine's per-step time (its autodiff backward is worse still).  These kernels
evaluate the whole tree *entirely in VMEM*: one program per particle reads
the padded x buffers plus the particle's tiny ``(N, 3)`` parameter table
(SMEM), walks the heap with a ``fori_loop`` over node slots whose per-node
values live in a VMEM scratch ring, and writes K once.  HBM traffic collapses
to reads of x (+ dK in the backward) and one write of K (dparams in the
backward) — the speed-of-light minimum for this op.  The node walk is a
loop, not an unroll, so Mosaic compile time stays flat in heap size.

Design note: each program owns the full (padded) matrix rather than a tile.
That keeps the kernels trivially correct under ``vmap`` (the batching rule
prepends a grid axis; programs stay independent, no cross-step accumulator),
at the cost of a VMEM ceiling of ``2 * N * n_pad^2 * 4`` bytes — ~16 MB at
n=256, ~64 MB at n=512 (v5e VMEM is 128 MB).  Above :data:`MAX_FUSED_N` the
callers fall back to the jnp interpreter; a tiled variant is the natural
extension if longer series ever matter.

Entry points:

* :func:`eval_cov_fused` — single-tree forward with a hand-derived custom
  VJP (gradients w.r.t. params only; x is data).  This is the HMC hot path;
  it vmaps over particles via the Pallas batching rule.
* :func:`eval_cov_pallas` — explicitly batched forward for callers that
  already hold a particle axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.structures import CONST, CP, GE, LINEAR, PERIODIC, PLUS, SE, TIMES

__all__ = [
    "eval_cov_pallas", "eval_cov_fused", "pallas_available",
    "set_interpret_mode", "MAX_FUSED_N",
]

_LANE = 128
# beyond this padded size the fused kernels exceed their VMEM budget;
# callers fall back to the jnp interpreter
MAX_FUSED_N = 512
_VMEM_LIMIT = 110 * 1024 * 1024


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _leaf_value(t, p0, p1, p2, x1, x2, r, r2, left, right, has_children):
    """One node's covariance block, selected by (traced) scalar node type."""
    ones = jnp.ones_like(r)
    acc = jnp.zeros_like(r)
    acc = jnp.where(t == CONST, jnp.exp(p0) * ones, acc)
    acc = jnp.where(
        t == LINEAR,
        jnp.exp(p1) * ((x1 - p0)[:, None] * (x2 - p0)[None, :]), acc)
    acc = jnp.where(
        t == SE, jnp.exp(p1) * jnp.exp(-0.5 * r2 * jnp.exp(-2.0 * p0)), acc)
    gamma = 2.0 * jax.nn.sigmoid(p1)
    u = jnp.maximum(r * jnp.exp(-p0), 1e-12)
    k_ge = jnp.exp(p2) * jnp.where(r > 0, jnp.exp(-jnp.power(u, gamma)), 1.0)
    acc = jnp.where(t == GE, k_ge, acc)
    s = jnp.sin(jnp.pi * r * jnp.exp(-p1))
    acc = jnp.where(
        t == PERIODIC,
        jnp.exp(p2) * jnp.exp(-2.0 * s * s * jnp.exp(-2.0 * p0)), acc)
    acc = jnp.where(jnp.logical_and(t == PLUS, has_children), left + right, acc)
    acc = jnp.where(jnp.logical_and(t == TIMES, has_children), left * right, acc)
    inv_scale = jnp.exp(-p1)
    s1 = jax.nn.sigmoid((x1 - p0) * inv_scale)
    s2 = jax.nn.sigmoid((x2 - p0) * inv_scale)
    k_cp = (s1[:, None] * s2[None, :] * left
            + (1.0 - s1)[:, None] * (1.0 - s2)[None, :] * right)
    acc = jnp.where(jnp.logical_and(t == CP, has_children), k_cp, acc)
    return acc


def _forward_into_scratch(types_ref, params_ref, x1, x2, r, r2, vals, max_nodes):
    """Bottom-up node walk filling the VMEM scratch ``vals`` (N, n, m)."""

    def body(it, _):
        i = max_nodes - 1 - it
        t = types_ref[i, 0]
        p0 = params_ref[i, 0]
        p1 = params_ref[i, 1]
        p2 = params_ref[i, 2]
        li = jnp.minimum(2 * i + 1, max_nodes - 1)
        ri = jnp.minimum(2 * i + 2, max_nodes - 1)
        has_children = (2 * i + 1) < max_nodes
        left = vals[li]
        right = vals[ri]
        vals[i] = _leaf_value(
            t, p0, p1, p2, x1, x2, r, r2, left, right, has_children
        )
        return 0

    jax.lax.fori_loop(0, max_nodes, body, 0)


def _cov_fwd_kernel(types_ref, params_ref, x1_ref, x2_ref, out_ref, vals, *,
                    max_nodes):
    x1 = x1_ref[:, 0]
    x2 = x2_ref[:, 0]
    d = x1[:, None] - x2[None, :]
    r = jnp.abs(d)
    r2 = d * d
    _forward_into_scratch(types_ref, params_ref, x1, x2, r, r2, vals, max_nodes)
    out_ref[:, :] = vals[0]


def _cov_bwd_kernel(types_ref, params_ref, x1_ref, x2_ref, dk_ref,
                    dparams_ref, vals, dvals, *, max_nodes):
    """Backward: recompute forward values in VMEM, backprop top-down through
    the heap, write per-(node, slot) parameter gradients (SMEM) once."""
    x1 = x1_ref[:, 0]
    x2 = x2_ref[:, 0]
    d = x1[:, None] - x2[None, :]
    r = jnp.abs(d)
    r2 = d * d
    _forward_into_scratch(types_ref, params_ref, x1, x2, r, r2, vals, max_nodes)

    # cotangent scratch: root gets dK, everything else zero
    def zero_body(i, _):
        dvals[i] = jnp.zeros_like(r)
        return 0

    jax.lax.fori_loop(1, max_nodes, zero_body, 0)
    dvals[0] = dk_ref[:, :]

    def body(i, _):
        t = types_ref[i, 0]
        p0 = params_ref[i, 0]
        p1 = params_ref[i, 1]
        p2 = params_ref[i, 2]
        dv = dvals[i]
        k = vals[i]
        li = jnp.minimum(2 * i + 1, max_nodes - 1)
        ri = jnp.minimum(2 * i + 2, max_nodes - 1)
        has_children = (2 * i + 1) < max_nodes
        hc = has_children.astype(r.dtype)
        left = vals[li] * hc
        right = vals[ri] * hc

        is_const = (t == CONST).astype(r.dtype)
        is_lin = (t == LINEAR).astype(r.dtype)
        is_se = (t == SE).astype(r.dtype)
        is_ge = (t == GE).astype(r.dtype)
        is_per = (t == PERIODIC).astype(r.dtype)

        e_m2p0 = jnp.exp(-2.0 * p0)
        damp = jnp.sum(dv * k)
        cx1 = x1 - p0
        cx2 = x2 - p0
        dlin_c = -jnp.exp(p1) * jnp.sum(dv * (cx1[:, None] + cx2[None, :]))
        dse_p0 = jnp.sum(dv * k * r2 * e_m2p0)
        sig = jax.nn.sigmoid(p1)
        gamma = 2.0 * sig
        u = jnp.maximum(r * jnp.exp(-p0), 1e-12)
        u_g = jnp.power(u, gamma)
        rpos = (r > 0).astype(r.dtype)
        dge_p0 = jnp.sum(dv * k * gamma * u_g * rpos)
        dge_p1 = jnp.sum(dv * (-k) * u_g * jnp.log(u) * gamma * (1.0 - sig) * rpos)
        e_mp1 = jnp.exp(-p1)
        arg = jnp.pi * r * e_mp1
        s = jnp.sin(arg)
        dper_p0 = jnp.sum(dv * k * 4.0 * s * s * e_m2p0)
        dper_p1 = jnp.sum(dv * k * 4.0 * s * jnp.cos(arg) * arg * e_m2p0)

        g0 = (is_const * damp + is_lin * dlin_c + is_se * dse_p0
              + is_ge * dge_p0 + is_per * dper_p0)
        g1 = is_lin * damp + is_se * damp + is_ge * dge_p1 + is_per * dper_p1
        g2 = is_ge * damp + is_per * damp

        # combinator: children cotangents + CP params
        is_plus = jnp.logical_and(t == PLUS, has_children).astype(r.dtype)
        is_times = jnp.logical_and(t == TIMES, has_children).astype(r.dtype)
        is_cp = jnp.logical_and(t == CP, has_children).astype(r.dtype)
        inv_scale = jnp.exp(-p1)
        z1 = (x1 - p0) * inv_scale
        z2 = (x2 - p0) * inv_scale
        s1 = jax.nn.sigmoid(z1)
        s2 = jax.nn.sigmoid(z2)
        w1 = s1[:, None] * s2[None, :]
        w2 = (1.0 - s1)[:, None] * (1.0 - s2)[None, :]
        dl = is_plus * dv + is_times * dv * right + is_cp * dv * w1
        dr = is_plus * dv + is_times * dv * left + is_cp * dv * w2
        # guarded accumulate (leaves write a zero delta to the clamped slot)
        dvals[li] = dvals[li] + dl * hc
        dvals[ri] = dvals[ri] + dr * hc

        # CP params: keep every reduction full-2D -> scalar (Mosaic rejects
        # 1-D multi_reductions)
        M1 = dv * (s2[None, :] * left - (1.0 - s2)[None, :] * right)
        M2 = dv * (s1[:, None] * left - (1.0 - s1)[:, None] * right)
        sp1 = s1 * (1.0 - s1)
        sp2 = s2 * (1.0 - s2)
        dcp_loc = jnp.sum(M1 * (sp1 * (-inv_scale))[:, None]) + jnp.sum(
            M2 * (sp2 * (-inv_scale))[None, :])
        dcp_p1 = jnp.sum(M1 * (sp1 * (-z1))[:, None]) + jnp.sum(
            M2 * (sp2 * (-z2))[None, :])
        g0 = g0 + is_cp * dcp_loc
        g1 = g1 + is_cp * dcp_p1

        dparams_ref[i, 0] = g0
        dparams_ref[i, 1] = g1
        dparams_ref[i, 2] = g2
        return 0

    jax.lax.fori_loop(0, max_nodes, body, 0)


def _pad_x(x):
    n = x.shape[0]
    n_pad = int(math.ceil(n / _LANE)) * _LANE
    return jnp.zeros((n_pad, 1), x.dtype).at[:n, 0].set(x), n_pad


def _smem_spec(shape, interpret):
    from jax.experimental import pallas as pl

    if interpret:
        return pl.BlockSpec(shape, lambda *a: tuple(0 for _ in shape))
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(
        shape, lambda *a: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )


def _vmem(shape):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, jnp.float32)


def _compiler_params(interpret):
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)}


def _fused_fwd_call(types, params, x1, x2, interpret):
    from jax.experimental import pallas as pl

    N = types.shape[0]
    n, m = x1.shape[0], x2.shape[0]
    x1p, n_pad = _pad_x(x1)
    x2p, m_pad = _pad_x(x2)
    out = pl.pallas_call(
        functools.partial(_cov_fwd_kernel, max_nodes=N),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        in_specs=[
            _smem_spec((N, 1), interpret),
            _smem_spec((N, 3), interpret),
            pl.BlockSpec((n_pad, 1), lambda *a: (0, 0)),
            pl.BlockSpec((m_pad, 1), lambda *a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, m_pad), lambda *a: (0, 0)),
        scratch_shapes=[_vmem((N, n_pad, m_pad))],
        interpret=interpret,
        **_compiler_params(interpret),
    )(types[:, None], params, x1p, x2p)
    return out[:n, :m]


def _fused_bwd_call(types, params, x1, x2, dk, interpret):
    from jax.experimental import pallas as pl

    N = types.shape[0]
    n, m = x1.shape[0], x2.shape[0]
    x1p, n_pad = _pad_x(x1)
    x2p, m_pad = _pad_x(x2)
    dkp = jnp.zeros((n_pad, m_pad), jnp.float32).at[:n, :m].set(dk)
    dparams = pl.pallas_call(
        functools.partial(_cov_bwd_kernel, max_nodes=N),
        out_shape=jax.ShapeDtypeStruct((N, 3), jnp.float32),
        in_specs=[
            _smem_spec((N, 1), interpret),
            _smem_spec((N, 3), interpret),
            pl.BlockSpec((n_pad, 1), lambda *a: (0, 0)),
            pl.BlockSpec((m_pad, 1), lambda *a: (0, 0)),
            pl.BlockSpec((n_pad, m_pad), lambda *a: (0, 0)),
        ],
        out_specs=_smem_spec((N, 3), interpret),
        scratch_shapes=[
            _vmem((N, n_pad, m_pad)),
            _vmem((N, n_pad, m_pad)),
        ],
        interpret=interpret,
        **_compiler_params(interpret),
    )(types[:, None], params, x1p, x2p, dkp)
    return dparams


_INTERPRET_DEFAULT = False


def set_interpret_mode(enable: bool) -> None:
    """Run the fused kernels through the Pallas interpreter (CPU testing)."""
    global _INTERPRET_DEFAULT
    _INTERPRET_DEFAULT = bool(enable)


@jax.custom_vjp
def eval_cov_fused(types, params, x1, x2):
    """Single-tree covariance K(x1, x2) via fused Pallas kernels.

    Drop-in replacement for ``eval_cov_impl`` on TPU (n, m <= MAX_FUSED_N):
    same semantics, hand-derived VJP (gradients w.r.t. ``params`` only — x is
    data).  vmaps over particles via the Pallas batching rule; each batched
    program is fully independent (whole-matrix design, no grid accumulators).
    """
    return _fused_fwd_call(types, params, x1, x2, _INTERPRET_DEFAULT)


def _fused_vjp_fwd(types, params, x1, x2):
    out = _fused_fwd_call(types, params, x1, x2, _INTERPRET_DEFAULT)
    return out, (types, params, x1, x2)


def _fused_vjp_bwd(res, dk):
    types, params, x1, x2 = res
    dparams = _fused_bwd_call(types, params, x1, x2, dk, _INTERPRET_DEFAULT)
    zero_types = np.zeros(types.shape, dtype=jax.dtypes.float0)
    return (zero_types, dparams, jnp.zeros_like(x1), jnp.zeros_like(x2))


eval_cov_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def eval_cov_pallas(node_types, params, x1, x2, interpret: bool = False):
    """Explicitly batched covariance via the fused forward kernel.

    node_types: i32[P, N]; params: f32[P, N, 3]; x1: (n,) or (P, n);
    x2: (m,) or (P, m).  Returns (P, n, m).
    """
    P = node_types.shape[0]
    if x1.ndim == 1:
        x1 = jnp.broadcast_to(x1, (P, x1.shape[0]))
    if x2.ndim == 1:
        x2 = jnp.broadcast_to(x2, (P, x2.shape[0]))
    return jax.vmap(
        lambda t, p, a, b: eval_cov_fused(t, p, a, b)
        if not interpret
        else _fused_fwd_call(t, p, a, b, True)
    )(node_types, params, x1, x2)
