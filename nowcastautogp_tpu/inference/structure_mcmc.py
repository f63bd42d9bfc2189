"""Involutive-MCMC kernel-structure moves: host proposals + fused device accept.

Implements the engine's structure rejuvenation (``AutoGP.mcmc_structure!``,
reference call sites ``/root/reference/src/forecasting.jl:146`` and inside
``fit_smc!``, ``src/make_and_fit_model.jl:91``) with the host/device split
designed in SURVEY.md §7: structure proposals (random-scan over subtree
regeneration / leaf-type swap / birth-death) are irregular and run
host-side (numpy) for all particles of a batch at once; a single jitted device
call then evaluates every proposal's masked LML, applies the MH accept
(subtree-from-prior proposals make the acceptance logit
``LML' - LML + log|T| - log|T'|``), selects the surviving trees/params, and
immediately runs ``n_hmc`` HMC trajectories on the winners — one device
round-trip per structure move.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import GPConfig
from ..models.structures import (
    prior_arrays, propose_birth_death, propose_leaf_swap,
    propose_subtree_replace,
)
from ..ops.lml import DEFAULT_JITTER, gp_lml_batched
from .hmc import _hmc_batched

__all__ = ["propose_batch", "structure_move_device", "mcmc_structure_sweep"]


def propose_batch(rng: np.random.Generator, node_types: np.ndarray,
                  params: np.ndarray, config: GPConfig):
    """Subtree-regeneration proposals for every particle (host side).

    node_types: int32[P, N]; params: f32[P, N, 3].  Returns proposed trees,
    proposed params, per-particle log-Hastings corrections, and the proposal
    prior arrays for the HMC log-posterior.
    """
    P = node_types.shape[0]
    new_types = np.empty_like(node_types)
    new_params = np.empty_like(params)
    log_h = np.empty(P, dtype=np.float32)
    from ..models.structures_device import MOVE_PROBS

    for i in range(P):
        # random scan over the three involutive move types (subtree
        # regeneration / leaf-type swap / birth-death), matching the device
        # path's mixture weights
        r = rng.random()
        if r < MOVE_PROBS[0]:
            move = propose_subtree_replace
        elif r < MOVE_PROBS[0] + MOVE_PROBS[1]:
            move = propose_leaf_swap
        else:
            move = propose_birth_death
        t2, p2, lh = move(rng, node_types[i], params[i], config)
        new_types[i] = t2
        new_params[i] = p2
        log_h[i] = lh
    pri = prior_arrays(new_types, config)
    return new_types, new_params, log_h, pri


def _structure_move_body(
    types_old, types_prop, params_old, params_prop,
    pri_old, pri_prop, log_hastings, log_noise, lml_old,
    x, y, mask, key, eps_scale, *,
    n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    lml_backend=None,
):
    """Unjitted structure-move step body with purely ROW-shaped outputs.

    Shared by the single-device jit wrapper (``structure_move_device``)
    and the multi-chip ``jax.shard_map`` wrapper
    (``parallel.sharding.structure_move_sharded``) — every output carries
    the leading particle axis (the HMC acceptance comes back per row, not
    as a batch mean), so the same body is legal under a row-sharding
    ``out_specs`` where a cross-shard scalar would need a collective.
    """
    P = params_old.shape[0]
    k_acc, k_hmc = jax.random.split(key)

    lml_prop = gp_lml_batched(
        types_prop, params_prop, log_noise, x, y, mask, jitter,
        backend=lml_backend,
    )
    logit = lml_prop - lml_old + log_hastings
    accept = jnp.log(jax.random.uniform(k_acc, (P,))) < logit

    types = jnp.where(accept[:, None], types_prop, types_old)
    params = jnp.where(accept[:, None, None], params_prop, params_old)
    mu = jnp.where(accept[:, None, None], pri_prop[0], pri_old[0])
    sigma = jnp.where(accept[:, None, None], pri_prop[1], pri_old[1])
    active = jnp.where(accept[:, None, None], pri_prop[2], pri_old[2])
    lml = jnp.where(accept, lml_prop, lml_old)

    if n_hmc > 0:
        params, log_noise, lml, rate_rows, eps_scale, _ = _hmc_batched(
            types, params, log_noise, mu, sigma, active, x, y, mask, k_hmc,
            eps_scale, n_hmc, n_leapfrog, step_size, step_jitter,
            jitter, noise_mu, noise_sigma, infer_noise,
            lml_backend=lml_backend,
        )
    else:
        rate_rows = jnp.zeros(P, jnp.float32)
    return accept, types, params, log_noise, lml, rate_rows, eps_scale


@partial(jax.jit, static_argnames=("n_hmc", "n_leapfrog", "lml_backend"))
def structure_move_device(
    types_old, types_prop, params_old, params_prop,
    pri_old, pri_prop, log_hastings, log_noise, lml_old,
    x, y, mask, key, eps_scale, *,
    n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    lml_backend=None,
):
    """One fused device step: proposal LML -> MH accept -> select -> HMC.

    All per-particle arrays carry the leading particle axis; data buffers
    ``x/y/mask`` are per-particle too (broadcast upstream for single-model
    fits, genuinely distinct for flattened scenario batches).

    Returns (accept, types, params, log_noise, lml, hmc_accept_rate,
    eps_scale).
    """
    (accept, types, params, log_noise, lml, rate_rows,
     eps_scale) = _structure_move_body(
        types_old, types_prop, params_old, params_prop,
        pri_old, pri_prop, log_hastings, log_noise, lml_old,
        x, y, mask, key, eps_scale,
        n_hmc=n_hmc, n_leapfrog=n_leapfrog, step_size=step_size,
        step_jitter=step_jitter, jitter=jitter, noise_mu=noise_mu,
        noise_sigma=noise_sigma, infer_noise=infer_noise,
        lml_backend=lml_backend,
    )
    hmc_rate = jnp.mean(rate_rows) if n_hmc > 0 else jnp.float32(0.0)
    return accept, types, params, log_noise, lml, hmc_rate, eps_scale


def mcmc_structure_sweep(
    rng, key, host_types, params, log_noise, lml, x, y, mask,
    config: GPConfig, n_mcmc: int, n_hmc: int, hmc_cfg, jitter,
    noise_mu, noise_sigma, infer_noise, eps_scale=None, lml_backend=None,
    mesh=None,
):
    """Run ``n_mcmc`` structure moves (each followed by ``n_hmc`` HMC steps).

    ``host_types`` is the host-side numpy mirror of the trees (the host owns
    structure state so it can build the next proposal); device state arrays
    are returned along with the updated mirror and acceptance statistics.
    ``mesh``: a >1-device ``jax.sharding.Mesh`` routes each move through
    ``parallel.sharding.structure_move_sharded`` — one single-device
    program per row shard, each keeping the fused Pallas kernels
    (``lml_backend`` is then ignored; the per-shard dispatch decides).
    """
    pri_old = prior_arrays(host_types, config)
    if eps_scale is None:
        eps_scale = jnp.ones(host_types.shape[0], jnp.float32)
    use_sharded = mesh is not None and mesh.devices.size > 1
    if use_sharded:
        from ..parallel.sharding import structure_move_sharded
    accepts = []
    for _ in range(n_mcmc):
        types_prop, params_prop, log_h, pri_prop = propose_batch(
            rng, host_types, np.asarray(params), config
        )
        key, sub = jax.random.split(key)
        step_args = (
            jnp.asarray(host_types), jnp.asarray(types_prop),
            jnp.asarray(params), jnp.asarray(params_prop),
            tuple(map(jnp.asarray, pri_old)), tuple(map(jnp.asarray, pri_prop)),
            jnp.asarray(log_h), log_noise, lml, x, y, mask, sub, eps_scale,
        )
        step_kw = dict(
            n_hmc=n_hmc, n_leapfrog=hmc_cfg.n_leapfrog,
            step_size=hmc_cfg.step_size, step_jitter=hmc_cfg.step_size_jitter,
            jitter=jitter, noise_mu=noise_mu, noise_sigma=noise_sigma,
            infer_noise=infer_noise,
        )
        if use_sharded:
            (accept, types_d, params, log_noise, lml, _,
             eps_scale) = structure_move_sharded(
                *step_args, mesh=mesh, **step_kw)
        else:
            (accept, types_d, params, log_noise, lml, _,
             eps_scale) = structure_move_device(
                *step_args, lml_backend=lml_backend, **step_kw)
        acc_np = np.asarray(accept)
        host_types = np.where(acc_np[:, None], types_prop, host_types).astype(np.int32)
        pri_old = tuple(
            np.where(acc_np[:, None, None], pn, po)
            for pn, po in zip(pri_prop, pri_old)
        )
        accepts.append(acc_np.mean())
    return (host_types, params, log_noise, lml, key,
            float(np.mean(accepts)) if accepts else 0.0, eps_scale)
