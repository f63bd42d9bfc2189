"""Whole-fit-on-device SMC: one XLA program per fit.

The host-proposal path pays ~30 ms of tunnel latency per involutive move
(schedule_steps x n_mcmc round-trips per fit).  With device-side subtree
regeneration (``models/structures_device.py``) the *entire* engine loop —
data-annealed reweighting, ESS-gated systematic resampling, involutive
structure moves with MH accepts, and HMC rejuvenation — compiles into a
single ``lax.scan`` over schedule steps with an inner scan over moves.  One
device call per fit; the host only builds the schedule masks and reads back
the final state.

Semantics match ``inference/smc.py`` (the ``AutoGP.fit_smc!`` behavior the
reference passes through, ``/root/reference/src/make_and_fit_model.jl:91``):
``adaptive_rejuvenation`` gates resample-then-move on ESS < ess_frac x P; the
default mode rejuvenates every step and resamples on low ESS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.structures_device import (
    ConfigArrays, device_prior_arrays, device_propose_mixed,
)
from ..ops.lml import DEFAULT_JITTER, gp_lml_batched, gp_lml_impl
from .hmc import _hmc_batched, make_batched_potential

__all__ = ["rejuvenation_sweep", "smc_fit_device"]


def _sweep_batched(
    types, params, log_noise, lml, x, y, mask, key, eps_scale,
    cfg: ConfigArrays, anc,
    n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter, jitter,
    noise_mu, noise_sigma, infer_noise,
):
    """n_mcmc involutive moves (each + n_hmc HMC trajectories), all particles.

    Explicitly batched (vs the round-1 ``vmap(_sweep_single)``) so the LML
    accept tests and HMC trajectories route through the batched Pallas
    Cholesky core; proposals stay vmapped (cheap elementwise + RNG).

    When ``n_hmc > 0`` the proposal is evaluated with ``value_and_grad`` of
    the HMC potential instead of a forward-only LML: the structure-accept
    test still uses the LML (aux output), and the gradient doubles as the
    subsequent HMC's initial gradient for accepted particles while rejected
    particles reuse the gradient carried from the previous HMC's final state
    — eliminating every per-move forward-only LML evaluation (one batched
    ``pot_and_grad`` per sweep replaces ``n_mcmc`` of them).  Values are
    unchanged: each carried quantity is the same function evaluated at the
    same point as the recomputation it replaces.
    """
    P = params.shape[0]
    propose_v = jax.vmap(device_propose_mixed, in_axes=(0, 0, 0, None, None))
    priors_v = jax.vmap(device_prior_arrays, in_axes=(0, None))

    def pot_and_grad_at(types_, p_, ln_):
        mu, sg, act = priors_v(types_, cfg)
        potential = make_batched_potential(
            types_, mu, sg, act, x, y, mask, jitter,
            noise_mu, noise_sigma, infer_noise,
        )
        (g_p, g_n), (U, lml_) = jax.grad(
            potential, argnums=(0, 1), has_aux=True)(p_, ln_)
        return (U, lml_, g_p, g_n), (mu, sg, act)

    def move(carry, key_m):
        types, params, log_noise, lml, scale, U, g_p, g_n = carry
        k_prop, k_acc, k_hmc = jax.random.split(key_m, 3)
        prop_keys = jax.random.split(k_prop, P)
        t2, p2, log_h = propose_v(types, params, prop_keys, cfg, anc)
        if n_hmc > 0:
            (U2, lml2, g2_p, g2_n), _ = pot_and_grad_at(t2, p2, log_noise)
        else:
            lml2 = gp_lml_batched(t2, p2, log_noise, x, y, mask, jitter)
        accept = jnp.log(jax.random.uniform(k_acc, (P,))) < (
            lml2 - lml + log_h
        )
        types = jnp.where(accept[:, None], t2, types)
        params = jnp.where(accept[:, None, None], p2, params)
        lml = jnp.where(accept, lml2, lml)
        if n_hmc > 0:
            U = jnp.where(accept, U2, U)
            g_p = jnp.where(accept[:, None, None], g2_p, g_p)
            g_n = jnp.where(accept, g2_n, g_n)
            mu, sg, act = priors_v(types, cfg)
            params, log_noise, lml, _, scale, (U, g_p, g_n) = _hmc_batched(
                types, params, log_noise, mu, sg, act, x, y, mask, k_hmc,
                scale, n_hmc, n_leapfrog, step_size, step_jitter,
                jitter, noise_mu, noise_sigma, infer_noise,
                init=(U, lml, g_p, g_n),
            )
        return (types, params, log_noise, lml, scale, U, g_p, g_n), accept

    if n_hmc > 0:
        # one batched evaluation at the current state seeds the carried
        # potential/gradients for the whole sweep
        (U0, lml0, g_p0, g_n0), _ = pot_and_grad_at(types, params, log_noise)
        lml = lml0
    else:
        U0 = jnp.zeros(P, params.dtype)
        g_p0 = jnp.zeros_like(params)
        g_n0 = jnp.zeros(P, params.dtype)
    keys = jax.random.split(key, n_mcmc)
    (types, params, log_noise, lml, eps_scale, _, _, _), accepts = (
        jax.lax.scan(
            move,
            (types, params, log_noise, lml, eps_scale, U0, g_p0, g_n0), keys
        )
    )
    return (types, params, log_noise, lml,
            jnp.mean(accepts.astype(jnp.float32)), eps_scale)


@partial(
    jax.jit,
    static_argnames=("n_mcmc", "n_hmc", "n_leapfrog"),
)
def rejuvenation_sweep(
    types, params, log_noise, lml, x, y, mask, key, cfg, anc, *,
    n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    eps_scale=None,
):
    """Batched device rejuvenation: all arrays carry the particle axis,
    including per-row data buffers x/y/mask.

    Returns (types, params, log_noise, lml, accept_rate, eps_scale)."""
    P = params.shape[0]
    if eps_scale is None:
        eps_scale = jnp.ones(P, params.dtype)
    mask_b = jnp.broadcast_to(mask, x.shape) if mask.ndim == 1 else mask
    return _sweep_batched(
        types, params, log_noise, lml, x, y, mask_b, key, eps_scale, cfg, anc,
        n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter, jitter,
        noise_mu, noise_sigma, infer_noise,
    )


@partial(
    jax.jit,
    static_argnames=("n_mcmc", "n_hmc", "n_leapfrog", "adaptive", "biased"),
)
def smc_fit_device(
    types, params, log_noise, log_w, lml, eps_scale, x, y, masks, key, cfg,
    anc, *,
    n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter, adaptive,
    biased=False,
    ess_frac=0.5, jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0,
    infer_noise=1.0,
):
    """The full data-annealed SMC fit as one compiled program.

    types i32[P,N]; params f32[P,N,3]; log_noise/log_w/lml f32[P];
    x/y f32[P,cap] (per-particle rows — broadcast upstream for one series);
    masks f32[K,P,cap] — the K schedule steps' ingestion masks.

    Returns (types, params, log_noise, log_w, lml, eps_scale, diagnostics)
    where diagnostics = (ess_per_step, struct_accept_per_step,
    resampled_per_step).
    """
    P = params.shape[0]

    def step(carry, inp):
        types, params, log_noise, log_w, lml, eps_scale, key = carry
        mask_k = inp
        key, k_res, k_sweep = jax.random.split(key, 3)

        # (1) reweight to this step's conditioning set.  Broken particles
        # (LML at the -1e10 rejection sentinel on either side) must lose
        # weight: a particle broken at step k whose step-k+1 LML comes back
        # finite would otherwise see delta ~ +1e10 and capture the whole
        # ensemble (same guard as models/gp_model.py:174-176).
        lml_new = gp_lml_batched(types, params, log_noise, x, y, mask_k,
                                 jitter)
        delta = jnp.where(
            (lml <= -1e9) | (lml_new <= -1e9), -1e10, lml_new - lml
        )
        log_w = log_w + delta
        lml = lml_new

        # (2) ESS + systematic resampling (device)
        lw = log_w - jax.scipy.special.logsumexp(log_w)
        w = jnp.exp(lw)
        ess = 1.0 / jnp.sum(w * w)
        low = ess < ess_frac * P
        if biased:
            # multinomial (``biased=True``): i.i.d. categorical draws from
            # the normalized weights — device-side, so the one-program fit
            # is preserved for both resampling schemes
            idx_res = jax.random.categorical(k_res, lw, shape=(P,))
        else:
            u = jax.random.uniform(k_res)
            positions = (u + jnp.arange(P, dtype=w.dtype)) / P
            idx_res = jnp.clip(
                jnp.searchsorted(jnp.cumsum(w), positions), 0, P - 1
            )
        idx = jnp.where(low, idx_res, jnp.arange(P))
        types, params, log_noise, lml, eps_scale = (
            types[idx], params[idx], log_noise[idx], lml[idx], eps_scale[idx]
        )
        xs_, ys_ = x[idx], y[idx]
        log_w = jnp.where(low, jnp.zeros_like(log_w), log_w)

        # (3) rejuvenation (always, or only on low ESS when adaptive)
        def sweep(args):
            t_, p_, ln_, l_, sc_ = args
            t_, p_, ln_, l_, acc, sc_ = _sweep_batched(
                t_, p_, ln_, l_, xs_, ys_, mask_k, k_sweep, sc_, cfg, anc,
                n_mcmc, n_hmc, n_leapfrog, step_size, step_jitter, jitter,
                noise_mu, noise_sigma, infer_noise,
            )
            return (t_, p_, ln_, l_, sc_), jnp.mean(acc)

        def no_sweep(args):
            return args, jnp.float32(0.0)

        do = jnp.logical_or(low, not adaptive)
        (types, params, log_noise, lml, eps_scale), acc = jax.lax.cond(
            do, sweep, no_sweep, (types, params, log_noise, lml, eps_scale)
        )
        return (types, params, log_noise, log_w, lml, eps_scale, key), (
            ess, acc, low)

    init = (types, params, log_noise, log_w, lml, eps_scale, key)
    (types, params, log_noise, log_w, lml, eps_scale, _), diag = jax.lax.scan(
        step, init, masks
    )
    return types, params, log_noise, log_w, lml, eps_scale, diag
