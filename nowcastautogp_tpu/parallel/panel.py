"""Multi-jurisdiction panel fitting: many series, one SPMD program.

BASELINE.json config 5 ("Multi-jurisdiction NHSN panel: vmapped per-state
fits + incremental add_data revision refits") — a capability the reference
lacks entirely (its vignettes loop over report dates serially,
``/root/reference/docs/vignettes/getting-started.jl:377-391``; SURVEY.md
§2.5).  Design: the particle ensembles of S series are flattened to one
``R = S x P`` row axis with *per-row* data buffers (each series keeps its own
time/target normalization), so every SMC phase — reweight, structure-move
accept, HMC — is a single batched device call across all jurisdictions.
Series are annealed on a shared proportion grid (each step conditions
``ceil(f_k * n_s)`` points of series ``s``), resampling is per-series (host
index math, one device gather), and with a `jax.sharding.Mesh` the row axis
shards across chips with zero cross-series collectives.

Backend note: a Pallas program cannot be partitioned across a mesh by
GSPMD, so when ``mesh`` spans more than one device every hot call
(reweight LML, structure-move accept, HMC) goes through the
``jax.shard_map`` wrappers in ``.sharding`` — one SINGLE-DEVICE program
per row shard, inside which the full fused-kernel dispatch is legal.
Multi-chip therefore scales the SAME fused megacov/megalml engine as
single-chip fits (round 3 pinned ``lml_backend="jnp"`` here, forfeiting
the ~5-6x fused speedup; see tests/test_parallel.py for the per-shard
equivalence suite).
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp

from ..inference.resample import ess as _ess
from ..inference.resample import gather_particles, resample_indices
from ..inference.schedule import linear_schedule
from ..inference.structure_mcmc import mcmc_structure_sweep
from ..models.config import GPConfig, HMCConfig
from ..models.gp_model import GPModel, _PAD, _pad_to, normalized_weights
from ..models.posterior import MvNormalMixture
from ..models.structures import prior_arrays, sample_particle
from ..ops.lml import (
    DEFAULT_JITTER, gp_lml_batch, gp_predict_batch_rows,
    sampling_cholesky,
)
from ..fitting import _stabilize_for_fit
from ..utils.apply import apply_elementwise
from ..utils.dates import dates_to_float
from .sharding import lml_rows_sharded, run_hmc_sharded, shard_rows

__all__ = ["fit_panel", "panel_predict_mvn", "forecast_panel"]

logger = logging.getLogger("nowcastautogp_tpu")


def fit_panel(
    datasets, *, n_particles: int = 1, smc_data_proportion: float = 0.1,
    n_mcmc, n_hmc, config: GPConfig | None = None,
    hmc_config: HMCConfig | None = None, flat_threshold: float = 1e-3,
    adaptive_rejuvenation: bool = False, ess_fraction: float = 0.5,
    seed: int | None = None, mesh=None, verbose: bool = False,
    engine: str = "device",
) -> list[GPModel]:
    """Fit one GP particle ensemble per series, batched across the panel.

    ``datasets``: sequence of ``TData`` (one per jurisdiction/series).
    Returns a list of fitted ``GPModel``s (same config object shared by
    reference, like the single-series path).  ``mesh``: optional
    ``jax.sharding.Mesh`` whose first axis shards the flattened
    series x particle rows across devices.

    ``engine="device"`` (default, round 5) runs each rejuvenation as ONE
    device-proposal sweep call per schedule step (``lax.scan`` over
    moves, the single-fit default of ``inference/device_smc.py``) with
    schedule segments capacity-bucketed exactly like ``_fit_device`` —
    the round-4 panel paid one host round-trip per move at full capacity
    for every step (566 s for the 6-date acceptance panel; ~330 s now).
    ``engine="host"`` keeps host-side proposals (one call per move).
    """
    import math

    n_mcmc = int(n_mcmc)
    n_hmc = int(n_hmc)
    datasets = list(datasets)
    S = len(datasets)
    assert S > 0, "datasets must not be empty"
    P = int(n_particles)
    S_real = S
    n_dev_pad = mesh.devices.size if mesh is not None else 1
    if n_dev_pad > 1 and (S * P) % n_dev_pad != 0:
        # pad the SERIES axis so the flattened rows divide the mesh: the
        # padded series duplicate real ones and ride otherwise-idle shards
        # (wall-clock-free), keeping the fused per-shard kernels for any R
        # instead of round 4's silent replicated pure-XLA fallback.
        s_mult = n_dev_pad // math.gcd(P, n_dev_pad)
        S = -(-S // s_mult) * s_mult
        logger.info(
            "fit_panel: padding %d series to %d so %d x %d rows divide the "
            "%d-device mesh (padded rows are trimmed from the result)",
            S_real, S, S, P, n_dev_pad)
        datasets = datasets + [datasets[i % S_real]
                               for i in range(S - S_real)]
    R = S * P
    config = config if config is not None else GPConfig()
    hmc_cfg = hmc_config or HMCConfig()

    seed_seq = np.random.SeedSequence(seed)
    rng = np.random.default_rng(seed_seq)
    key = jax.random.PRNGKey(int(seed_seq.generate_state(1)[0]))

    # ---- per-series normalization + shared-capacity padded buffers
    lens = [len(d.y) for d in datasets]
    cap = max(64, int(np.ceil(max(lens) / _PAD)) * _PAD)
    norms, x_rows_s, y_rows_s, orders, y_fits = [], [], [], [], []
    for d in datasets:
        t_raw = dates_to_float(d.ds)
        y_fit = np.asarray(
            _stabilize_for_fit(d.y, flat_threshold=flat_threshold, rng=rng),
            dtype=np.float64,
        )
        t0 = float(t_raw.min())
        t_scale = float(t_raw.max() - t_raw.min()) or 1.0
        y_mean = float(y_fit.mean())
        y_std = float(y_fit.std()) or 1.0
        order = rng.permutation(len(y_fit))
        norms.append((t0, t_scale, y_mean, y_std))
        orders.append(order)
        y_fits.append(y_fit)
        x_rows_s.append(_pad_to(((t_raw - t0) / t_scale)[order], cap))
        y_rows_s.append(_pad_to(((y_fit - y_mean) / y_std)[order], cap))

    x_rows = np.repeat(np.stack(x_rows_s), P, axis=0)  # (R, cap)
    y_rows = np.repeat(np.stack(y_rows_s), P, axis=0)
    lens_row = np.repeat(np.asarray(lens), P)  # (R,)

    # ---- particle initialization (independent per row)
    ts, ps, lns = [], [], []
    for _ in range(R):
        t, p, ln = sample_particle(rng, config)
        ts.append(t)
        ps.append(p)
        lns.append(ln)
    host_types = np.stack(ts).astype(np.int32)
    params = jnp.asarray(np.stack(ps), jnp.float32)
    log_noise = jnp.asarray(np.asarray(lns, np.float32))
    lml = jnp.zeros(R, jnp.float32)
    eps_scale = jnp.ones(R, jnp.float32)
    log_w = np.zeros(R, dtype=np.float64)

    x_b = jnp.asarray(x_rows, jnp.float32)
    y_b = jnp.asarray(y_rows, jnp.float32)
    if mesh is not None:
        x_b, y_b, params, log_noise, lml = shard_rows(
            (x_b, y_b, params, log_noise, lml), mesh
        )

    wc = config.prior["wildcard"]
    noise_mu, noise_sigma = float(wc["mu"]) - 2.0, float(wc["sigma"])
    infer = 0.0 if config.noise is not None else 1.0

    # multi-device mesh ⇒ route every hot call through the shard_map
    # wrappers (per-shard fused kernels); single-device keeps plain jit.
    # The series padding above guarantees R divides the mesh, so the fused
    # per-shard path covers every panel (the round-4 replicated pure-XLA
    # fallback for non-divisible R is gone).
    n_dev = mesh.devices.size if mesh is not None else 1
    sweep_mesh = mesh if n_dev > 1 else None
    lml_backend = None

    # ---- shared proportion grid: anneal every series together.
    # Schedule segments are capacity-bucketed like the single-fit device
    # path (``inference/smc.py``): step k conditions at most n_k points of
    # the LONGEST series (shorter series condition ceil(f_k * n_s) <= n_k),
    # so the whole step runs on the smallest sufficient _PAD-multiple
    # buffer — masked LML is invariant to the trailing padding, so weights
    # and LML carry across segments unchanged.
    from ..inference.smc import _MAX_CALL_MS, _unit_ms, schedule_segments

    n_max = max(lens)
    eff_prop = max(smc_data_proportion, 1.0 / n_max)
    use_device = engine == "device" and n_mcmc > 0
    if use_device:
        from ..inference.device_smc import rejuvenation_sweep
        from ..models.structures_device import ancestor_table, config_arrays
        from .sharding import rejuvenation_sweep_sharded

        cfg_arrays = config_arrays(config)
        anc = jnp.asarray(ancestor_table(config.max_nodes))
        # split each step's n_mcmc moves into calls under the work budget
        # (same accounting as inference/smc.py's fused path)
        units_per_move = 3 + n_hmc * hmc_cfg.n_leapfrog * 2
        chunk_moves = max(1, int(
            _MAX_CALL_MS / max(units_per_move * _unit_ms(R), 1e-9)))

    types_d = jnp.asarray(host_types)
    for cap_k, steps in schedule_segments(
            linear_schedule(n_max, eff_prop), cap):
        x_seg = x_b[:, :cap_k]
        y_seg = y_b[:, :cap_k]
        iota = np.arange(cap_k)
        for n_k in steps:
            f = n_k / n_max
            n_new = np.minimum(
                np.ceil(f * lens_row).astype(np.int64), lens_row)
            mask_b = jnp.asarray(
                (iota[None, :] < n_new[:, None]).astype(np.float32))
            if sweep_mesh is not None:
                lml_new = lml_rows_sharded(
                    types_d, params, log_noise, x_seg, y_seg,
                    mask_b, mesh=sweep_mesh,
                )
            else:
                lml_new = gp_lml_batch(
                    types_d, params, log_noise, x_seg, y_seg,
                    mask_b, DEFAULT_JITTER, backend=lml_backend,
                )
            lml_new_np = np.asarray(lml_new, np.float64)
            lml_old_np = np.asarray(lml, np.float64)
            # sentinel guard: a particle broken on either side of the
            # reweight must lose weight, not gain ~1e10 of it
            # (models/gp_model.py:174-176)
            log_w += np.where(
                (lml_old_np <= -1e9) | (lml_new_np <= -1e9), -1e10,
                lml_new_np - lml_old_np)
            lml = lml_new

            # per-series ESS resampling
            low = []
            flat_idx = np.arange(R, dtype=np.int32)
            for s in range(S):
                sl = slice(s * P, (s + 1) * P)
                if P > 1 and _ess(log_w[sl]) < ess_fraction * P:
                    flat_idx[sl] = resample_indices(rng, log_w[sl]) + s * P
                    log_w[sl] = 0.0
                    low.append(s)
            if low:
                params, log_noise, lml, eps_scale = gather_particles(
                    (params, log_noise, lml, eps_scale),
                    jnp.asarray(flat_idx)
                )
                host_types = host_types[flat_idx]
                types_d = jnp.asarray(host_types)
            do_rejuvenate = bool(low) or not adaptive_rejuvenation
            if do_rejuvenate and use_device:
                left = n_mcmc
                while left > 0:
                    m = min(chunk_moves, left)
                    key, sub = jax.random.split(key)
                    sweep_kw = dict(
                        n_mcmc=m, n_hmc=n_hmc,
                        n_leapfrog=hmc_cfg.n_leapfrog,
                        step_size=hmc_cfg.step_size,
                        step_jitter=hmc_cfg.step_size_jitter,
                        jitter=DEFAULT_JITTER, noise_mu=noise_mu,
                        noise_sigma=noise_sigma, infer_noise=infer,
                    )
                    if sweep_mesh is not None:
                        (types_d, params, log_noise, lml, _,
                         eps_scale) = rejuvenation_sweep_sharded(
                            types_d, params, log_noise, lml, x_seg, y_seg,
                            mask_b, sub, eps_scale, cfg_arrays, anc,
                            mesh=sweep_mesh, **sweep_kw)
                    else:
                        (types_d, params, log_noise, lml, _,
                         eps_scale) = rejuvenation_sweep(
                            types_d, params, log_noise, lml, x_seg, y_seg,
                            mask_b, sub, cfg_arrays, anc,
                            eps_scale=eps_scale, **sweep_kw)
                    left -= m
                host_types = np.asarray(types_d)
            elif do_rejuvenate and n_mcmc > 0:
                (host_types, params, log_noise, lml, key, _,
                 eps_scale) = mcmc_structure_sweep(
                    rng, key, host_types, params, log_noise, lml, x_seg,
                    y_seg, mask_b, config, n_mcmc, n_hmc, hmc_cfg,
                    DEFAULT_JITTER, noise_mu, noise_sigma, infer,
                    eps_scale=eps_scale, mesh=sweep_mesh,
                    lml_backend=lml_backend,
                )
                types_d = jnp.asarray(host_types)
            elif do_rejuvenate and n_hmc > 0:
                mu, sg, act = (jnp.asarray(a) for a in
                               prior_arrays(host_types, config))
                key, sub = jax.random.split(key)
                if sweep_mesh is not None:
                    params, log_noise, lml, _, eps_scale = run_hmc_sharded(
                        types_d, params, log_noise, mu, sg, act,
                        x_seg, y_seg, mask_b, sub, eps_scale,
                        mesh=sweep_mesh,
                        n_steps=n_hmc, n_leapfrog=hmc_cfg.n_leapfrog,
                        step_size=hmc_cfg.step_size,
                        step_jitter=hmc_cfg.step_size_jitter,
                        jitter=DEFAULT_JITTER, noise_mu=noise_mu,
                        noise_sigma=noise_sigma, infer_noise=infer,
                    )
                else:
                    from ..inference.hmc import run_hmc

                    params, log_noise, lml, _, eps_scale = run_hmc(
                        types_d, params, log_noise, mu, sg, act,
                        x_seg, y_seg, mask_b, sub,
                        n_steps=n_hmc, n_leapfrog=hmc_cfg.n_leapfrog,
                        step_size=hmc_cfg.step_size,
                        step_jitter=hmc_cfg.step_size_jitter,
                        jitter=DEFAULT_JITTER, noise_mu=noise_mu,
                        noise_sigma=noise_sigma, infer_noise=infer,
                        eps_scale=eps_scale, lml_backend=lml_backend,
                    )

    # ---- split rows back into per-series GPModels
    params_np = np.asarray(params)
    log_noise_np = np.asarray(log_noise)
    lml_np = np.asarray(lml)
    scale_np = np.asarray(eps_scale)
    models = []
    for s, d in enumerate(datasets[:S_real]):
        sl = slice(s * P, (s + 1) * P)
        t0, t_scale, y_mean, y_std = norms[s]
        sub_seed = seed_seq.generate_state(2 + s)[-1]
        model = GPModel({
            "version": 1,
            "ds": d.ds,
            "y": y_fits[s],  # the (possibly jitter-stabilized) fitted targets
            "order": orders[s].astype(np.int64),
            "n_ingested": lens[s],
            "t0": t0, "t_scale": t_scale, "y_mean": y_mean, "y_std": y_std,
            "node_types": host_types[sl],
            "params": params_np[sl],
            "log_noise": log_noise_np[sl],
            "lml": lml_np[sl],
            "log_weight": log_w[sl].copy(),
            "hmc_eps_scale": scale_np[sl],
            "config": config,
            "rng_state": np.random.default_rng(int(sub_seed)).bit_generator.state,
            "key": np.asarray(jax.random.key_data(jax.random.PRNGKey(int(sub_seed)))),
        })
        models.append(model)
    return models


def _panel_predict_rows(models, forecast_dates, *, include_noise, mesh):
    """One batched predictive build over the panel's S x P flattened rows.

    Returns (mu, F) as float64 numpy on the ORIGINAL y scale of each series:
    ``mu`` (S, P, nq) predictive means and ``F`` (S, P, nq, nq) PSD sampling
    factors (``sampling_cholesky``), plus the per-series normalized weights
    (S, P).
    """
    import math

    models = list(models)
    S = len(models)
    assert S > 0, "models must not be empty"
    P = models[0].num_particles
    assert all(m.num_particles == P for m in models), (
        "panel forecast requires a shared particle count")
    S_real = S
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev > 1 and (S * P) % n_dev != 0:
        # same series padding as fit_panel: keep the row axis divisible so
        # the predictive build shards instead of replicating
        s_mult = n_dev // math.gcd(P, n_dev)
        S = -(-S_real // s_mult) * s_mult
        models = models + [models[i % S_real] for i in range(S - S_real)]
    dates = list(forecast_dates)
    nq = len(dates)
    cap = max(int(m._cap) for m in models)

    x_rows = np.zeros((S, cap), dtype=np.float32)
    y_rows = np.zeros((S, cap), dtype=np.float32)
    m_rows = np.zeros((S, cap), dtype=np.float32)
    xs_rows = np.zeros((S, nq), dtype=np.float32)
    types_l, params_l, noise_l, w_rows = [], [], [], []
    for s, model in enumerate(models):
        c = int(model._cap)
        x_rows[s, :c] = np.asarray(model._x_d)
        y_rows[s, :c] = np.asarray(model._y_d)
        m_rows[s, :c] = np.asarray(model._mask())
        xs_rows[s] = model._normalize_dates(dates).astype(np.float32)
        types_l.append(model._host_types)
        params_l.append(np.asarray(model._params_d))
        noise_l.append(np.asarray(model._log_noise_d))
        w_rows.append(normalized_weights(model))

    rep = lambda a: jnp.asarray(np.repeat(a, P, axis=0))  # (S, cap)->(R, cap)
    types = jnp.asarray(np.concatenate(types_l).astype(np.int32))
    params = jnp.asarray(np.concatenate(params_l, axis=0))
    log_noise = jnp.asarray(np.concatenate(noise_l))
    x_b, y_b, m_b, xs_b = (rep(x_rows), rep(y_rows), rep(m_rows),
                           rep(xs_rows))
    if mesh is not None:
        types, params, log_noise, x_b, y_b, m_b, xs_b = shard_rows(
            (types, params, log_noise, x_b, y_b, m_b, xs_b), mesh)
    mu, cov = gp_predict_batch_rows(
        types, params, log_noise, x_b, y_b, m_b, xs_b,
        DEFAULT_JITTER, include_noise)
    F = sampling_cholesky(cov)

    mu = np.asarray(mu, np.float64).reshape(S, P, nq)[:S_real]
    F = np.asarray(F, np.float64).reshape(S, P, nq, nq)[:S_real]
    y_mean = np.asarray([m._y_mean for m in models[:S_real]])[:, None, None]
    y_std = np.asarray([m._y_std for m in models[:S_real]])[:, None, None]
    mu = y_mean + y_std * mu
    F = y_std[..., None] * F
    return mu, F, np.stack(w_rows[:S_real])


def panel_predict_mvn(models, forecast_dates, *, include_noise: bool = True,
                      mesh=None) -> list[MvNormalMixture]:
    """``predict_mvn`` for a whole panel in one batched device program.

    Equivalent per series to ``predict_mvn(models[s], forecast_dates)``
    (``AutoGP.predict_mvn`` semantics, ``src/forecasting.jl:46``) but
    assembled as a single S x P row-flattened predictive build; with
    ``mesh``, rows shard across chips.  Returns one mixture per series.
    """
    models = list(models)
    dates = list(forecast_dates)
    mu, F, w = _panel_predict_rows(
        models, dates, include_noise=include_noise, mesh=mesh)
    out = []
    for s in range(len(models)):
        cov = np.einsum("pij,pkj->pik", F[s], F[s])
        out.append(MvNormalMixture(w[s], mu[s], cov))
    return out


def forecast_panel(models, forecast_dates, forecast_draws: int, *,
                   inv_transformations=None, include_noise: bool = True,
                   mesh=None, seed: int | None = None) -> list[np.ndarray]:
    """Sample forecasts for every series of a fitted panel at once.

    The panel analog of :func:`..forecasting.forecast` (no per-draw HMC):
    one batched predictive build + PSD factorization for all S x P rows,
    then per-series mixture draws.  ``inv_transformations``: one callable
    shared by all series, or a sequence of per-series callables (the usual
    case — each jurisdiction has its own Box-Cox lambda / offset).  Returns
    a list of ``(n_dates, forecast_draws)`` arrays, so downstream scoring
    (`crps_matrix`, `wis_matrix`, `quantile_submission`) applies per series
    unchanged.
    """
    models = list(models)
    S = len(models)
    dates = list(forecast_dates)
    nq = len(dates)
    n_draws = int(forecast_draws)
    if inv_transformations is None:
        invs = [lambda y: y] * S
    elif callable(inv_transformations):
        invs = [inv_transformations] * S
    else:
        invs = list(inv_transformations)
        assert len(invs) == S, "need one inverse transformation per series"

    mu, F, w = _panel_predict_rows(
        models, dates, include_noise=include_noise, mesh=mesh)
    rng = np.random.default_rng(seed)
    out = []
    for s in range(S):
        comps = rng.choice(w.shape[1], size=n_draws, p=w[s])
        eps = rng.standard_normal((n_draws, nq))
        # (n_draws, nq): mu[comp] + F[comp] @ eps  per draw
        draws = mu[s][comps] + np.einsum("dij,dj->di", F[s][comps], eps)
        out.append(apply_elementwise(invs[s], draws.T))
    return out
