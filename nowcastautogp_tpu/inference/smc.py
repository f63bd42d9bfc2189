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
from ..utils.profiling import phase

__all__ = ["fit_smc"]

logger = logging.getLogger("nowcastautogp_tpu")


def fit_smc(
    model, *, schedule, n_mcmc, n_hmc,
    hmc_config: HMCConfig | None = None,
    biased: bool = False,
    shuffle: bool = True,
    verbose: bool = False,
    adaptive_rejuvenation: bool = False,
    ess_fraction: float = 0.5,
):
    """Fit the particle ensemble by data-annealed SMC (mutates ``model``).

    ``n_mcmc``/``n_hmc`` are required keyword arguments — omitting them raises
    ``TypeError``, mirroring the reference's pass-through contract where
    ``fit_smc!`` errors without them (``test/test_gpconfig.jl:37-43``).
    ``biased=True`` selects multinomial resampling instead of the default
    systematic scheme.
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
                    acc = model.rejuvenate(n_mcmc, n_hmc, hmc_cfg)
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
