"""Multi-chip scaling: device meshes and sharded SMC training steps.

The reference's only parallelism is shared-memory threads over particles and
nowcast scenarios (``/root/reference/src/forecasting.jl:131-166``); SURVEY.md
§2.5 maps this to the TPU story implemented here: a 1-D device mesh over a
``series`` axis (multi-jurisdiction panels and/or scenario batches), with
every per-row array sharded on its leading axis.  Per-series GP fitting needs
*zero* cross-series communication, so XLA's SPMD partitioner runs the whole
rejuvenation step (reweight LML -> structure-move accept -> HMC sweep) as
embarrassingly-parallel per-shard compute — collectives appear only if a
caller reduces diagnostics across the mesh.  ICI is therefore never a
bottleneck; scaling is linear in devices until a shard's particle rows no
longer fill the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.lml import DEFAULT_JITTER, gp_lml_batched, gp_lml_impl
from ..inference.hmc import _hmc_batched, _hmc_single
from ..inference.structure_mcmc import _structure_move_body

__all__ = [
    "make_mesh", "shard_rows", "panel_smc_step",
    "lml_rows_sharded", "structure_move_sharded", "run_hmc_sharded",
    "rejuvenation_sweep_sharded", "forecast_hmc_scan_sharded",
]


def make_mesh(n_devices: int | None = None, axis_name: str = "series") -> Mesh:
    """1-D ``jax.sharding.Mesh`` over the first ``n_devices`` visible devices.

    The ``series`` axis is the framework's scaling dimension: jurisdictions /
    independent series shard across it with zero cross-series collectives
    (``fit_panel``'s ``mesh=`` argument).
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else int(n_devices)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_rows(tree, mesh: Mesh, axis_name: str = "series"):
    """Place every array with its leading (row) axis sharded over the mesh."""
    row_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def put(a):
        a = jnp.asarray(a)
        if a.ndim >= 1 and a.shape[0] % mesh.devices.size == 0:
            return jax.device_put(a, row_sh)
        return jax.device_put(a, repl)

    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------------
# shard_map wrappers: multi-chip WITHOUT forfeiting the fused Pallas kernels.
#
# A ``pallas_call`` cannot be partitioned by GSPMD, so a pjit program over a
# >1-device mesh must pin the ~5-6x-slower pure-XLA LML (round-3 shipped
# state).  ``jax.shard_map`` instead runs ONE SINGLE-DEVICE PROGRAM PER
# SHARD of the row axis — inside the body the full backend dispatch
# (``ops/lml.py``) is legal, so each chip keeps the fused megacov/megalml
# kernels at its local P = R / n_devices rows.  Per-series GP work needs no
# cross-series communication, so the bodies contain zero collectives; the
# only mesh-wide coupling is the replicated PRNG key, which every body
# folds with its ``axis_index`` so shards draw independent randomness.
# ---------------------------------------------------------------------------


def _row_specs(n, axis_name):
    return tuple([P(axis_name)] * n)


@partial(jax.jit, static_argnames=("mesh", "axis_name"))
def lml_rows_sharded(types, params, log_noise, x, y, mask, *,
                     mesh, axis_name="series"):
    """Row-sharded batched masked LML with per-shard backend dispatch.

    Replaces round 3's pure-XLA pjit LML pin for >1-device
    meshes: each shard evaluates its local rows through the full fused
    dispatch.  Bit-equal to the unsharded ``gp_lml_batched``
    on the same backend — the computation is purely per-row.
    """
    spec = P(axis_name)

    def body(t, p, ln, xb, yb, mb):
        return gp_lml_batched(t, p, ln, xb, yb, mb, DEFAULT_JITTER)

    # check_vma=False: the body is collective-free per-row compute, and
    # pallas_call outputs carry no `vma` annotation for the checker
    return jax.shard_map(
        body, mesh=mesh, in_specs=_row_specs(6, axis_name),
        out_specs=spec, check_vma=False,
    )(types, params, log_noise, x, y, mask)


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "n_hmc", "n_leapfrog"))
def structure_move_sharded(
    types_old, types_prop, params_old, params_prop,
    pri_old, pri_prop, log_hastings, log_noise, lml_old,
    x, y, mask, key, eps_scale, *,
    mesh, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    axis_name="series",
):
    """``structure_move_device`` over a mesh, one fused program per shard.

    Same step semantics (proposal LML -> MH accept -> select -> n_hmc HMC
    trajectories, ``inference/structure_mcmc.py``) with the per-shard
    program free to use the fused Pallas kernels.  The replicated ``key``
    is folded with the shard index, so the accept/momentum randomness is
    independent across shards (the RNG stream therefore differs from the
    single-device path at the same seed; equivalence is per-shard exact —
    see ``tests/test_parallel.py``).  Returns per-ROW outputs including
    the per-row HMC acceptance rate.
    """
    spec = P(axis_name)

    def body(to, tp, po, pp, prio, prip, lh, ln, lml0, xb, yb, mb, es, k):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        return _structure_move_body(
            to, tp, po, pp, prio, prip, lh, ln, lml0, xb, yb, mb, k, es,
            n_hmc=n_hmc, n_leapfrog=n_leapfrog, step_size=step_size,
            step_jitter=step_jitter, jitter=jitter, noise_mu=noise_mu,
            noise_sigma=noise_sigma, infer_noise=infer_noise,
        )

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=_row_specs(13, axis_name) + (P(),),
        out_specs=tuple([spec] * 7), check_vma=False,
    )(types_old, types_prop, params_old, params_prop, pri_old, pri_prop,
      log_hastings, log_noise, lml_old, x, y, mask, eps_scale, key)


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "n_steps", "n_leapfrog"))
def run_hmc_sharded(
    types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, key, eps_scale, *,
    mesh, n_steps, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    axis_name="series",
):
    """Row-sharded batched HMC (the panel's HMC-only rejuvenation path).

    One ``_hmc_batched`` program per shard — the fused value+grad LML
    kernel powers every leapfrog step chip-locally.  Key folding as in
    :func:`structure_move_sharded`.  Returns (params, log_noise, lml,
    rate_rows, eps_scale), all row-shaped.
    """
    spec = P(axis_name)

    def body(t, p, ln, mu, sg, act, xb, yb, mb, es, k):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        p2, ln2, lml, rate_rows, es2, _ = _hmc_batched(
            t, p, ln, mu, sg, act, xb, yb, mb, k, es,
            n_steps, n_leapfrog, step_size, step_jitter,
            jitter, noise_mu, noise_sigma, infer_noise,
        )
        return p2, ln2, lml, rate_rows, es2

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=_row_specs(10, axis_name) + (P(),),
        out_specs=tuple([spec] * 5), check_vma=False,
    )(types, params, log_noise, prior_mu, prior_sigma, prior_active,
      x, y, mask, eps_scale, key)


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "n_mcmc", "n_hmc", "n_leapfrog"))
def rejuvenation_sweep_sharded(
    types, params, log_noise, lml, x, y, mask, key, eps_scale, cfg, anc, *,
    mesh, n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    axis_name="series",
):
    """``inference.device_smc.rejuvenation_sweep`` over a mesh.

    The nowcast-conditioned forecaster's structure+HMC refresh
    (``nowcast.py``) on the flattened scenario x particle rows: one
    single-device fused program per shard, device-side involutive
    proposals included.  ``cfg``/``anc`` (the structure-prior tables) are
    replicated; the key folds with the shard index as in the other
    wrappers.  Returns (types, params, log_noise, lml, accept_rate_rows,
    eps_scale) — the accept diagnostic is broadcast to row shape so it can
    shard (callers mean it).
    """
    from ..inference.device_smc import _sweep_batched

    spec = P(axis_name)

    def body(t, p, ln, l0, xb, yb, mb, es, cfg_b, anc_b, k):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        t2, p2, ln2, l2, rate, es2 = _sweep_batched(
            t, p, ln, l0, xb, yb, mb, k, es, cfg_b, anc_b,
            n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter, jitter,
            noise_mu, noise_sigma, infer_noise,
        )
        return t2, p2, ln2, l2, jnp.full(l2.shape, rate), es2

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=_row_specs(8, axis_name) + (P(), P(), P()),
        out_specs=tuple([spec] * 6), check_vma=False,
    )(types, params, log_noise, lml, x, y, mask, eps_scale, cfg, anc, key)


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "n_scenarios", "n_draws", "n_hmc", "n_leapfrog"))
def forecast_hmc_scan_sharded(
    types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, xs, log_w, key, eps_scale, *,
    mesh, n_scenarios, n_draws, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    axis_name="series",
):
    """``ops.forecast_scan.nowcast_forecast_hmc_scan`` over a mesh.

    The per-draw-HMC forecast scan with scenarios sharded: each shard runs
    the full scan for its local ``n_scenarios / n_devices`` scenarios
    (scenario blocks are contiguous in the row axis, so the (m, S*D)
    output's column axis shards to the same concatenation order the
    unsharded call produces).  ``xs`` is the shared forecast grid
    (replicated); ``log_w`` is the (S, P) per-scenario weights, sharded on
    the scenario axis.
    """
    from ..ops.forecast_scan import nowcast_forecast_hmc_scan

    n_dev = mesh.devices.size
    assert n_scenarios % n_dev == 0
    s_loc = n_scenarios // n_dev
    spec = P(axis_name)

    def body(t, p, ln, mu, sg, act, xb, yb, mb, lw, es, xs_b, k):
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        return nowcast_forecast_hmc_scan(
            t, p, ln, mu, sg, act, xb, yb, mb, xs_b, lw, k, es,
            n_scenarios=s_loc, n_draws=n_draws, n_hmc=n_hmc,
            n_leapfrog=n_leapfrog, step_size=step_size,
            step_jitter=step_jitter, jitter=jitter, noise_mu=noise_mu,
            noise_sigma=noise_sigma, infer_noise=infer_noise,
        )

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=_row_specs(11, axis_name) + (P(), P()),
        out_specs=(P(None, axis_name), spec, spec, spec), check_vma=False,
    )(types, params, log_noise, prior_mu, prior_sigma, prior_active,
      x, y, mask, log_w, eps_scale, xs, key)


@partial(jax.jit, static_argnames=("n_hmc", "n_leapfrog"))
def panel_smc_step(
    types_old, types_prop, params, params_prop,
    pri_old, pri_prop, log_hastings, log_noise, log_weight, lml_cached,
    eps_scale, x, y, mask_new, key, *,
    n_hmc, n_leapfrog, step_size=0.02, step_jitter=0.5,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
):
    """One full SMC training step over a flattened (series x particle) axis.

    Fuses the three phases of the engine's per-step work (SURVEY.md §3.1 hot
    loop) into one compiled program: (1) reweight — masked LML on the grown
    conditioning set updates the log importance weights; (2) one involutive
    structure move — MH accept of host-proposed subtree regenerations;
    (3) ``n_hmc`` HMC trajectories on the surviving trees.  With row-sharded
    inputs the XLA SPMD partitioner executes each shard independently on its
    device — no collectives on the hot path.
    """
    R = params.shape[0]
    k_acc, k_hmc = jax.random.split(key)

    lml_v = jax.vmap(gp_lml_impl, in_axes=(0, 0, 0, 0, 0, 0, None))

    # (1) reweight to the new mask.  Sentinel guard: a particle numerically
    # broken on either side of the reweight must lose weight, not inherit
    # ~e^{1e10} of it (same contract as models/gp_model.py:174-176 and the
    # other four weight-update sites).
    lml_new = lml_v(types_old, params, log_noise, x, y, mask_new, jitter)
    log_weight = log_weight + jnp.where(
        (lml_cached <= -1e9) | (lml_new <= -1e9), -1e10, lml_new - lml_cached)

    # (2) structure-move accept (subtree-from-prior proposals cancel to an
    # LML ratio plus the node-count Hastings term)
    lml_prop = lml_v(types_prop, params_prop, log_noise, x, y, mask_new, jitter)
    logit = lml_prop - lml_new + log_hastings
    accept = jnp.log(jax.random.uniform(k_acc, (R,))) < logit
    types = jnp.where(accept[:, None], types_prop, types_old)
    params = jnp.where(accept[:, None, None], params_prop, params)
    mu = jnp.where(accept[:, None, None], pri_prop[0], pri_old[0])
    sg = jnp.where(accept[:, None, None], pri_prop[1], pri_old[1])
    act = jnp.where(accept[:, None, None], pri_prop[2], pri_old[2])
    lml = jnp.where(accept, lml_prop, lml_new)

    # (3) HMC rejuvenation
    keys = jax.random.split(k_hmc, R)
    params, log_noise, lml, acc_rate, eps_scale = jax.vmap(
        _hmc_single, in_axes=(0,) * 11 + (None,) * 8
    )(
        types, params, log_noise, mu, sg, act, x, y, mask_new, keys,
        eps_scale, n_hmc, n_leapfrog, step_size, step_jitter,
        jitter, noise_mu, noise_sigma, infer_noise,
    )
    return (types, params, log_noise, log_weight, lml, accept, acc_rate,
            eps_scale)
