"""Vmapped HMC over per-particle GP hyperparameters.

Fills the role of the engine's HMC parameter moves
(``AutoGP.mcmc_parameters!``, reference call sites
``/root/reference/src/forecasting.jl:65,148`` and the ``n_hmc`` inner moves of
``fit_smc!``, ``src/make_and_fit_model.jl:91``).  TPU-first design: one jitted
function runs ``n_hmc`` full HMC trajectories (``lax.scan``) for *all*
particles at once (``vmap``); each leapfrog step differentiates the masked
log-marginal-likelihood + Normal priors with respect to the unconstrained
hyperparameters — gradients flow through the covariance interpreter and the
batched Cholesky.  Inactive parameter slots (empty heap nodes / unused param
slots) get zero momentum and zero gradient contribution, so heterogeneous
structures share one SPMD program.

All inputs carry a leading particle axis, including the data buffers
(``x``/``y``/``mask``), so the same compiled program serves both single-model
fitting (broadcast data) and flattened scenario×particle nowcast batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.lml import DEFAULT_JITTER, gp_lml_impl

__all__ = ["log_posterior", "run_hmc"]


def log_posterior(
    node_types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, jitter, noise_mu, noise_sigma, infer_noise,
):
    """Unnormalized log posterior of one particle's hyperparameters."""
    lml = gp_lml_impl(node_types, params, log_noise, x, y, mask, jitter)
    z = (params - prior_mu) / prior_sigma
    lp = jnp.sum(prior_active * (-0.5 * z * z - jnp.log(prior_sigma)))
    zn = (log_noise - noise_mu) / noise_sigma
    lp = lp + infer_noise * (-0.5 * zn * zn)
    return lml + lp, lml


# Robbins-Monro adaptation of the per-particle step-size scale: nudge the
# scale after every trajectory toward this target acceptance rate.  The scale
# persists in the model state, so adaptation accumulates across the thousands
# of trajectories of a fit (the engine-level analog of AutoGP's adaptive HMC).
_TARGET_ACCEPT = 0.65
_ADAPT_RATE = 0.05
_SCALE_BOUNDS = (0.02, 50.0)


def _hmc_single(
    node_types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, key, eps_scale, n_steps, n_leapfrog, step_size, step_jitter,
    jitter, noise_mu, noise_sigma, infer_noise,
):
    """n_steps HMC trajectories for one particle; returns updated state
    (params, log_noise, lml, accept_rate, adapted eps_scale)."""

    def potential(p, ln):
        lp, lml = log_posterior(
            node_types, p, ln, prior_mu, prior_sigma, prior_active,
            x, y, mask, jitter, noise_mu, noise_sigma, infer_noise,
        )
        return -lp, lml

    pot_and_grad = jax.value_and_grad(potential, argnums=(0, 1), has_aux=True)

    # The potential's value AND gradient at the current point are carried
    # across trajectories (on accept they come from the trajectory's own last
    # leapfrog evaluation; on reject the carried ones stay valid), so each
    # trajectory costs exactly ``n_leapfrog`` gradient evaluations instead of
    # ``n_leapfrog + 2`` — the dominant fit cost at small n_leapfrog.

    def trajectory(carry, key_t):
        p, ln, U0, lml, g_p, g_n, scale = carry
        k_eps, k_mom_p, k_mom_n, k_acc = jax.random.split(key_t, 4)
        eps = step_size * scale * (
            1.0 + step_jitter * (2.0 * jax.random.uniform(k_eps) - 1.0)
        )
        mom_p = jax.random.normal(k_mom_p, p.shape, p.dtype) * prior_active
        mom_n = jax.random.normal(k_mom_n, (), ln.dtype) * infer_noise

        K0 = 0.5 * (jnp.sum(mom_p * mom_p) + mom_n * mom_n)

        def leapfrog(i, state):
            p_, ln_, mp, mn, gp_, gn_, U_, lml_ = state
            mp = mp - 0.5 * eps * gp_ * prior_active
            mn = mn - 0.5 * eps * gn_ * infer_noise
            p_ = p_ + eps * mp * prior_active
            ln_ = ln_ + eps * mn * infer_noise
            (U_, lml_), (gp_, gn_) = pot_and_grad(p_, ln_)
            mp = mp - 0.5 * eps * gp_ * prior_active
            mn = mn - 0.5 * eps * gn_ * infer_noise
            return (p_, ln_, mp, mn, gp_, gn_, U_, lml_)

        p1, ln1, mp1, mn1, gp1, gn1, U1, lml1 = jax.lax.fori_loop(
            0, n_leapfrog, leapfrog,
            (p, ln, mom_p, mom_n, g_p, g_n, U0, lml),
        )
        K1 = 0.5 * (jnp.sum(mp1 * mp1) + mn1 * mn1)
        dH = (U0 + K0) - (U1 + K1)
        ok = jnp.isfinite(dH) & (
            jnp.log(jax.random.uniform(k_acc)) < jnp.minimum(dH, 0.0)
        )
        p = jnp.where(ok, p1, p)
        ln = jnp.where(ok, ln1, ln)
        U0 = jnp.where(ok, U1, U0)
        lml = jnp.where(ok, lml1, lml)
        g_p = jnp.where(ok, gp1, g_p)
        g_n = jnp.where(ok, gn1, g_n)
        scale = jnp.clip(
            scale * jnp.exp(
                _ADAPT_RATE * (ok.astype(scale.dtype) - _TARGET_ACCEPT)
            ),
            _SCALE_BOUNDS[0], _SCALE_BOUNDS[1],
        )
        return (p, ln, U0, lml, g_p, g_n, scale), ok

    (U_init, lml_init), (g_p0, g_n0) = pot_and_grad(params, log_noise)
    keys = jax.random.split(key, n_steps)
    (p_f, ln_f, _, lml_f, _, _, scale_f), oks = jax.lax.scan(
        trajectory,
        (params, log_noise, U_init, lml_init, g_p0, g_n0, eps_scale), keys
    )
    return p_f, ln_f, lml_f, jnp.mean(oks.astype(jnp.float32)), scale_f


def make_batched_potential(
    node_types, prior_mu, prior_sigma, prior_active,
    x, y, mask, jitter, noise_mu, noise_sigma, infer_noise, lml_backend=None,
):
    """Batched HMC potential ``(params, log_noise) -> (sum U, (U, lml))``.

    Shared between ``_hmc_batched`` and the device sweep's structure-proposal
    evaluation (``inference/device_smc.py``), so a gradient computed at the
    proposal is exactly the initial gradient the subsequent HMC needs — the
    summed potential decouples into per-particle gradients.
    """
    from ..ops.lml import gp_lml_batched

    def potential(p, ln):
        lml = gp_lml_batched(node_types, p, ln, x, y, mask, jitter,
                             backend=lml_backend)
        z = (p - prior_mu) / prior_sigma
        lp = jnp.sum(
            prior_active * (-0.5 * z * z - jnp.log(prior_sigma)), axis=(1, 2)
        )
        zn = (ln - noise_mu) / noise_sigma
        lp = lp + infer_noise * (-0.5 * zn * zn)
        U = -(lml + lp)
        return U.sum(), (U, lml)

    return potential


def _hmc_batched(
    node_types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, key, eps_scale, n_steps, n_leapfrog, step_size, step_jitter,
    jitter, noise_mu, noise_sigma, infer_noise, lml_backend=None,
    init=None,
):
    """Explicitly-batched HMC: all particle arrays carry the leading P axis.

    Mathematically identical to ``vmap(_hmc_single)`` (per-particle LMLs,
    momenta, accepts, and step-size adaptation are independent — the summed
    potential decouples into per-particle gradients), but written batched so
    the LML core sees the full particle axis and can dispatch to the Pallas
    blocked-Cholesky kernel (``ops/pallas_chol.py``) instead of per-particle
    vmapped programs.

    ``init``, when given, is ``(U0, lml0, g_p0, g_n0)`` — the potential, LML,
    and gradients already evaluated at ``(params, log_noise)`` — and the
    initial ``pot_and_grad`` call is skipped (the device sweep carries these
    across moves).  Returns ``(params, log_noise, lml, accept_rate,
    eps_scale, (U, g_p, g_n))`` with the final state's cached potential and
    gradients, valid for the same carrying.
    """
    P = params.shape[0]

    potential = make_batched_potential(
        node_types, prior_mu, prior_sigma, prior_active,
        x, y, mask, jitter, noise_mu, noise_sigma, infer_noise, lml_backend,
    )
    pot_and_grad = jax.grad(potential, argnums=(0, 1), has_aux=True)

    # As in ``_hmc_single``: value + gradient at the current point are carried
    # across trajectories, so each trajectory costs exactly ``n_leapfrog``
    # gradient evaluations (not ``n_leapfrog + 2``) — at the bench's
    # n_hmc=3 x n_leapfrog=3 this removes a third of the fit's hot-op calls.

    def trajectory(carry, key_t):
        p, ln, U0, lml, g_p, g_n, scale = carry
        k_eps, k_mom_p, k_mom_n, k_acc = jax.random.split(key_t, 4)
        eps = step_size * scale * (
            1.0 + step_jitter * (2.0 * jax.random.uniform(k_eps, (P,)) - 1.0)
        )
        eps3 = eps[:, None, None]
        mom_p = jax.random.normal(k_mom_p, p.shape, p.dtype) * prior_active
        mom_n = jax.random.normal(k_mom_n, (P,), ln.dtype) * infer_noise

        K0 = 0.5 * (jnp.sum(mom_p * mom_p, axis=(1, 2)) + mom_n * mom_n)

        def leapfrog(i, state):
            p_, ln_, mp, mn, gp_, gn_, U_, lml_ = state
            mp = mp - 0.5 * eps3 * gp_ * prior_active
            mn = mn - 0.5 * eps * gn_ * infer_noise
            p_ = p_ + eps3 * mp * prior_active
            ln_ = ln_ + eps * mn * infer_noise
            (gp_, gn_), (U_, lml_) = pot_and_grad(p_, ln_)
            mp = mp - 0.5 * eps3 * gp_ * prior_active
            mn = mn - 0.5 * eps * gn_ * infer_noise
            return (p_, ln_, mp, mn, gp_, gn_, U_, lml_)

        p1, ln1, mp1, mn1, gp1, gn1, U1, lml1 = jax.lax.fori_loop(
            0, n_leapfrog, leapfrog,
            (p, ln, mom_p, mom_n, g_p, g_n, U0, lml),
        )
        K1 = 0.5 * (jnp.sum(mp1 * mp1, axis=(1, 2)) + mn1 * mn1)
        dH = (U0 + K0) - (U1 + K1)
        ok = jnp.isfinite(dH) & (
            jnp.log(jax.random.uniform(k_acc, (P,))) < jnp.minimum(dH, 0.0)
        )
        ok3 = ok[:, None, None]
        p = jnp.where(ok3, p1, p)
        ln = jnp.where(ok, ln1, ln)
        U0 = jnp.where(ok, U1, U0)
        lml = jnp.where(ok, lml1, lml)
        g_p = jnp.where(ok3, gp1, g_p)
        g_n = jnp.where(ok, gn1, g_n)
        scale = jnp.clip(
            scale * jnp.exp(
                _ADAPT_RATE * (ok.astype(scale.dtype) - _TARGET_ACCEPT)
            ),
            _SCALE_BOUNDS[0], _SCALE_BOUNDS[1],
        )
        return (p, ln, U0, lml, g_p, g_n, scale), ok

    if init is None:
        (g_p0, g_n0), (U_init, lml_init) = pot_and_grad(params, log_noise)
    else:
        U_init, lml_init, g_p0, g_n0 = init
    keys = jax.random.split(key, n_steps)
    (p_f, ln_f, U_f, lml_f, g_p_f, g_n_f, scale_f), oks = jax.lax.scan(
        trajectory,
        (params, log_noise, U_init, lml_init, g_p0, g_n0, eps_scale), keys
    )
    return (p_f, ln_f, lml_f,
            jnp.mean(oks.astype(jnp.float32), axis=0), scale_f,
            (U_f, g_p_f, g_n_f))


@partial(
    jax.jit,
    static_argnames=("n_steps", "n_leapfrog", "lml_backend"),
)
def run_hmc(
    node_types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, key, *, n_steps, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
    eps_scale=None, lml_backend=None,
):
    """Batched HMC: every argument (except scalars) has a leading particle axis.

    Returns (params, log_noise, lml, accept_rate, eps_scale) — lml is the
    cached masked log-marginal-likelihood of the final state (used by SMC
    reweighting) and eps_scale the adapted per-particle step-size scales.
    """
    P = params.shape[0]
    if eps_scale is None:
        eps_scale = jnp.ones(P, params.dtype)
    p, ln, lml, rate, scale, _ = _hmc_batched(
        node_types, params, log_noise, prior_mu, prior_sigma, prior_active,
        x, y, mask, key, eps_scale, n_steps, n_leapfrog, step_size,
        step_jitter, jitter, noise_mu, noise_sigma, infer_noise,
        lml_backend=lml_backend,
    )
    return p, ln, lml, rate, scale
