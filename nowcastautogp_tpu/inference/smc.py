"""Data-annealed SMC over kernel structures and hyperparameters.

The engine's training loop — the semantics of ``AutoGP.fit_smc!`` as the
reference exercises it (``/root/reference/src/make_and_fit_model.jl:91``;
option surface at ``:49-52``): anneal over data batches given by a schedule;
after each reweight step, optionally resample (ESS rule) and rejuvenate every
particle with ``n_mcmc`` involutive structure moves x ``n_hmc`` HMC
trajectories.  ``adaptive_rejuvenation=True`` is the classic resample-then-move
scheme that only rejuvenates when ESS drops below 50% of the ensemble
(behavior documented at ``docs/vignettes/setting-priors.jl:174-176``).
``shuffle=True`` randomizes the data-ingestion order once up front (the GP
likelihood is exchangeable given the time stamps, so this only changes the
annealing path, matching the engine's default batch shuffling noted at
``docs/vignettes/getting-started.jl:267``).

Host/device split: the Python loop here is pure control flow over O(P)
scalars; every numerical step (reweight LML, accept, HMC sweep, resample
gather) is a batched device call.
"""

from __future__ import annotations

import logging
import time

from ..models.config import HMCConfig
from ..models.gp_model import _PAD
from ..utils.profiling import phase

__all__ = ["fit_smc"]

logger = logging.getLogger("nowcastautogp_tpu")

# Wall-clock budget per device call: a single fused program must stay well
# under the TPU worker's execution watchdog (the round-2 crash was one
# ~300 s call).  Work is counted in masked-LML-evaluation units (a grad
# counts ~2) and converted to time with a P-aware calibration fit to two
# measured fused value+grad points at cap 160 (the fit's dominant cap):
# ~6.4 ms per grad at P=200 and ~2.0 ms at P=24 (PLAN.md round-3) —
# an affine latency + per-particle model, 0.13 ms x (5 + ceil(P/10))
# per unit (P=200 -> 3.25, P=24 -> 1.04 ms/unit).  A canonical
# 24-particle ensemble thus gets ~3x the unit budget of the P=200 bench
# ensemble for the same call time; this is what keeps the reference's
# canonical 50x50 workload on the fused capacity-bucketed path
# (``_fit_device`` splits any over-budget schedule segment into multiple
# calls).  The cap-160 per-unit estimate upper-bounds the bucketed
# smaller capacities, so the bound is conservative.
_MAX_CALL_MS = 60_000.0
_UNIT_MS_PER_GRID_STEP = 0.13


def _unit_ms(P: int) -> float:
    """Estimated device ms per LML-evaluation unit for a P-particle call."""
    import math

    return _UNIT_MS_PER_GRID_STEP * (5 + math.ceil(P / 10))


def fit_smc(
    model, *, schedule, n_mcmc, n_hmc,
    hmc_config: HMCConfig | None = None,
    biased: bool = False,
    shuffle: bool = True,
    verbose: bool = False,
    adaptive_rejuvenation: bool = False,
    ess_fraction: float = 0.5,
    engine: str = "device",
):
    """Fit the particle ensemble by data-annealed SMC (mutates ``model``).

    ``n_mcmc``/``n_hmc`` are required keyword arguments — omitting them raises
    ``TypeError``, mirroring the reference's pass-through contract where
    ``fit_smc!`` errors without them (``test/test_gpconfig.jl:37-43``).
    ``biased=True`` selects multinomial resampling instead of the default
    systematic scheme (supported by both engines; on the device engine it is
    a ``jax.random.categorical`` draw inside the one-program fit).

    ``engine="device"`` (default) compiles the whole annealing loop —
    reweight, resample, structure moves, HMC — into one XLA program
    (``inference/device_smc.py``); ``engine="host"`` drives each phase from
    Python with host-side structure proposals.
    """
    from .resample import ess  # local import to avoid cycles

    n_mcmc = int(n_mcmc)
    n_hmc = int(n_hmc)
    hmc_cfg = hmc_config or HMCConfig()
    P = model.num_particles
    method = "multinomial" if biased else "systematic"

    n = len(model.y)
    if shuffle and n > 1:
        model._order = model.rng.permutation(n).astype(model._order.dtype)
        model._push_data()

    schedule = [s for s in schedule if s > model.n_ingested]
    # work per structure move in LML-grad equivalents:
    # 1 accept fwd + (1 initial + n_hmc x n_leapfrog) grads at ~2 units each
    # (inference/hmc.py carries value+grad across trajectories)
    units_per_move = 3 + n_hmc * hmc_cfg.n_leapfrog * 2
    per_step_units = max(n_mcmc, 1) * units_per_move
    # the fused path handles any budget whose single STEP fits one call;
    # ``_fit_device`` splits multi-step segments that would exceed the
    # per-call budget into multiple calls of the same compiled program
    fused_ok = per_step_units * _unit_ms(P) <= _MAX_CALL_MS
    if engine == "device" and schedule and fused_ok:
        return _fit_device(
            model, schedule, n_mcmc, n_hmc, hmc_cfg,
            adaptive_rejuvenation, ess_fraction, verbose, biased=biased,
        )
    chunk_m = max(
        1, int(_MAX_CALL_MS / (units_per_move * _unit_ms(P))))
    t_start = time.time()
    for step_i, n_k in enumerate(schedule):
        with phase("smc/reweight"):
            model.reweight_to(int(n_k))
            e = ess(model.log_weight)
        low_ess = e < ess_fraction * P
        do_rejuvenate = low_ess if adaptive_rejuvenation else True
        if low_ess:
            with phase("smc/resample"):
                model.resample(method)
        acc = None
        if do_rejuvenate:
            with phase("smc/rejuvenate"):
                if n_mcmc > 0:
                    accs, sizes, left = [], [], n_mcmc
                    while left > 0:
                        m = min(chunk_m, left)
                        accs.append(model.rejuvenate(m, n_hmc, hmc_cfg,
                                                     engine=engine))
                        sizes.append(m)
                        left -= m
                    import numpy as _np

                    # weight by chunk size: the final chunk may hold fewer
                    # moves, so a plain mean would skew the diagnostic
                    acc = float(_np.average(accs, weights=sizes))
                elif n_hmc > 0:
                    acc = model.hmc_only(n_hmc, hmc_cfg)
        if verbose:
            logger.info(
                "SMC step %d/%d: n=%d ESS=%.1f/%d resampled=%s "
                "struct-accept=%s elapsed=%.1fs",
                step_i + 1, len(schedule), n_k, e, P, low_ess,
                f"{acc:.2f}" if acc is not None else "-", time.time() - t_start,
            )
    return model


def schedule_segments(schedule, cap_full):
    """Group consecutive schedule steps by the smallest sufficient
    ``_PAD``-multiple capacity (the capacity-bucketing rule of
    ``_fit_device``).

    Returns ``[(cap, [n_k, ...]), ...]``; exported so cost accounting
    (``utils/flops.py``, bench MFU) can reproduce the exact programs a fit
    runs without re-deriving the bucketing rule.
    """
    import numpy as np

    segments: list[tuple[int, list[int]]] = []
    for n_k in schedule:
        cap_k = min(cap_full, max(_PAD, int(np.ceil(n_k / _PAD)) * _PAD))
        if segments and segments[-1][0] == cap_k:
            segments[-1][1].append(int(n_k))
        else:
            segments.append((cap_k, [int(n_k)]))
    return segments


def _fit_device(model, schedule, n_mcmc, n_hmc, hmc_cfg,
                adaptive_rejuvenation, ess_fraction, verbose, biased=False):
    """Device-program fit via ``smc_fit_device`` (mutates ``model``).

    Capacity bucketing: the masked fixed-capacity design pays O(cap^2)
    covariance and O(cap^3) Cholesky cost regardless of how few points a
    step has ingested, so the schedule is split into segments that run on
    the smallest sufficient ``_PAD``-multiple buffer (one compiled program per
    (cap, n_steps) shape; early steps on a 150-week series cost ~1/9th of
    full-capacity steps).  Masked LML is invariant to the trailing padding,
    so weights/LML carry across segments unchanged.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..models.structures_device import ancestor_table, config_arrays
    from ..utils.profiling import phase
    from .device_smc import smc_fit_device

    P = model.num_particles
    cap_full = model._cap
    noise_mu, noise_sigma, infer = model.noise_prior

    # group consecutive schedule steps by the capacity they need, then
    # split any segment whose estimated call time exceeds the per-call
    # budget (large rejuvenation budgets at full capacity) — the scan
    # state carries across calls unchanged, so splitting is free
    units_per_move = 3 + n_hmc * hmc_cfg.n_leapfrog * 2
    per_step_ms = max(n_mcmc, 1) * units_per_move * _unit_ms(P)
    max_steps = max(1, int(_MAX_CALL_MS // max(per_step_ms, 1e-9)))
    segments = [
        (cap_seg, steps[i:i + max_steps])
        for cap_seg, steps in schedule_segments(schedule, cap_full)
        for i in range(0, len(steps), max_steps)
    ]

    t0 = time.time()
    step_base = 0
    x_full = model._x_d
    y_full = model._y_d
    for cap_seg, steps in segments:
        iota = np.arange(cap_seg)
        masks = np.stack(
            [(iota < n_k).astype(np.float32) for n_k in steps]
        )
        masks_b = np.broadcast_to(
            masks[:, None, :], (len(steps), P, cap_seg)
        )
        x = jnp.broadcast_to(x_full[:cap_seg], (P, cap_seg))
        y = jnp.broadcast_to(y_full[:cap_seg], (P, cap_seg))
        with phase("smc/device_fit"):
            (types, params, log_noise, log_w, lml, eps_scale,
             diag) = smc_fit_device(
                jnp.asarray(model._host_types), model._params_d,
                model._log_noise_d,
                jnp.asarray(model.log_weight.astype(np.float32)),
                model._lml_d, model._eps_scale_d, x, y,
                jnp.asarray(masks_b),
                model.next_key(), config_arrays(model.config),
                jnp.asarray(ancestor_table(model.config.max_nodes)),
                n_mcmc=n_mcmc, n_hmc=n_hmc, n_leapfrog=hmc_cfg.n_leapfrog,
                step_size=hmc_cfg.step_size,
                step_jitter=hmc_cfg.step_size_jitter,
                adaptive=bool(adaptive_rejuvenation),
                biased=bool(biased),
                ess_frac=float(ess_fraction),
                noise_mu=noise_mu, noise_sigma=noise_sigma,
                infer_noise=infer,
            )
            model._host_types = np.asarray(types)
            model._params_d = params
            model._log_noise_d = log_noise
            model._lml_d = lml
            model._eps_scale_d = eps_scale
            model.log_weight = np.asarray(log_w, dtype=np.float64)
            model.n_ingested = int(steps[-1])
        if verbose:
            ess_steps, acc_steps, resampled = (np.asarray(d) for d in diag)
            for i, n_k in enumerate(steps):
                logger.info(
                    "SMC step %d/%d: n=%d cap=%d ESS=%.1f/%d resampled=%s "
                    "struct-accept=%.2f elapsed(total)=%.1fs",
                    step_base + i + 1, len(schedule), n_k, cap_seg,
                    ess_steps[i], P, bool(resampled[i]), acc_steps[i],
                    time.time() - t0,
                )
        step_base += len(steps)
    return model
