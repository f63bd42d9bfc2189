"""Setting GP priors: encode a known seasonal cycle into the prior.

Workflow-parity example matching the reference's priors vignette
(``/root/reference/docs/vignettes/setting-priors.jl``): for a series with a
known annual cycle, (1) re-centre the period prior on the annual period in
*normalized time* (the engine rescales the training window to [0, 1], so an
annual cycle in a ``window_length``-day window has log-period
``log(365 / window_length)``), and (2) restrict the leaf-kernel distribution
to Linear + Periodic only — then compare forecast CRPS of the four prior
combinations.

Run:  python examples/setting_priors.py [--full]
"""

from __future__ import annotations

import argparse
import copy
import datetime as dt
import json

import numpy as np

import os
import sys

# runnable as a script from any cwd: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.config import default_prior


def simulate_seasonal(n_weeks=156, seed=1234):
    rng = np.random.default_rng(seed)
    t = np.arange(n_weeks)
    log_truth = np.log(50.0) + 1.0 * np.sin(2 * np.pi * t / 52) + 0.02 * t
    obs = np.exp(log_truth + 0.15 * rng.standard_normal(n_weeks))
    dates = [dt.date(2022, 1, 1) + dt.timedelta(weeks=int(i)) for i in t]
    return dates, np.exp(log_truth), obs


def seasonal_config(window_days: float, tight: float = 0.3) -> ngp.GPConfig:
    """Period prior re-centred on an annual cycle for this window."""
    prior = copy.deepcopy(default_prior())
    prior["period"]["mu"] = float(np.log(365.0 / window_days))
    prior["period"]["sigma"] = tight
    return ngp.GPConfig(prior=prior)


def lin_period_only(base: ngp.GPConfig) -> ngp.GPConfig:
    """Leaf distribution restricted to Linear + Periodic (indices 1, 4)."""
    return base.replace(node_dist_leaf=[0.0, 0.5, 0.0, 0.0, 0.5])


def run(full: bool = False, smoke: bool = False):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    fit_kw = dict(
        n_particles=32 if full else (2 if smoke else 4),
        smc_data_proportion=0.005 if full else (0.34 if smoke else 0.25),
        n_mcmc=200 if full else (2 if smoke else 3),
        n_hmc=50 if full else (2 if smoke else 3),
        adaptive_rejuvenation=True,
    )
    n_draws = 2000 if full else (20 if smoke else 100)
    horizon = 52 if full else (4 if smoke else 8)
    dates, truth, obs = simulate_seasonal(n_weeks=44 if smoke else 156)
    report_weeks = [51, 77, 103] if full else ([36] if smoke else [77])

    results = {}
    for w in report_weeks:
        window_days = (dates[w - 1] - dates[0]).days
        configs = {
            "default": ngp.GPConfig(),
            "lin_period": lin_period_only(ngp.GPConfig()),
            "seasonal": seasonal_config(window_days),
            "seasonal_lin_period": lin_period_only(seasonal_config(window_days)),
        }
        fwd, inv = ngp.get_transformations("positive", obs[:w])
        data = ngp.create_transformed_data(dates[:w], obs[:w], transformation=fwd)
        f_dates = dates[w: w + horizon]
        f_truth = obs[w: w + horizon]
        fitted = {}
        for name, cfg in configs.items():
            model = ngp.make_and_fit_model(data, config=cfg, seed=7, **fit_kw)
            fitted[name] = model
            fc = ngp.forecast(model, f_dates, n_draws, inv_transformation=inv)
            crps = ngp.crps_matrix(np.log(np.maximum(fc, 1e-6)),
                                   np.log(f_truth)).mean()
            results.setdefault(name, []).append(float(crps))
            print(f"w={w} {name}: mean log-CRPS {crps:.4f}")

        # interpretability: additive component split of the best-informed
        # prior's top-weight particle (the posterior's trend/seasonal story)
        dec = ngp.decompose(fitted["seasonal_lin_period"], f_dates)
        top = max(dec, key=lambda d: d["weight"])
        print(f"w={w} top-weight structure: {top['structure']}")
        for comp in top["components"]:
            contrib = float(np.mean(np.abs(comp["mean"])))
            print(f"    component {comp['structure']}: "
                  f"mean |contribution| {contrib:.3f} (transformed scale)")

    summary = {k: float(np.mean(v)) for k, v in results.items()}
    print(json.dumps({"mean_log_crps": summary}, indent=2))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
