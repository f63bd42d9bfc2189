"""Percentage-scale data: scaled-logit transform workflow.

Workflow-parity example matching the reference's NSSP percentage vignette
(``/root/reference/docs/vignettes/use-percentages.jl``): fit on a 0-100 %%
bounded series (e.g. percent of ED visits) via the scaled-logit transform,
forecast with nowcast scenarios, and verify all back-transformed forecasts
respect the [0, 100] bounds.

Run:  python examples/use_percentages.py [--full]
"""

from __future__ import annotations

import argparse
import datetime as dt

import numpy as np

import os
import sys

# runnable as a script from any cwd: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp


def simulate_percentages(n_weeks=104, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n_weeks)
    logit_truth = -2.5 + 1.2 * np.sin(2 * np.pi * t / 52) + 0.1 * np.sin(t / 3)
    p = 100 / (1 + np.exp(-(logit_truth + 0.15 * rng.standard_normal(n_weeks))))
    dates = [dt.date(2022, 10, 3) + dt.timedelta(weeks=int(i)) for i in t]
    return dates, p


def run(full: bool = False, smoke: bool = False):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    fit_kw = dict(
        n_particles=24 if full else (2 if smoke else 4),
        smc_data_proportion=0.1 if full else (0.34 if smoke else 0.25),
        n_mcmc=100 if full else (2 if smoke else 3),
        n_hmc=20 if full else (2 if smoke else 3),
    )
    dates, pct = simulate_percentages(n_weeks=44 if smoke else 104)
    w = len(dates) - 4
    fwd, inv = ngp.get_transformations("percentage", pct[:w])
    data = ngp.create_transformed_data(dates[:w], pct[:w], transformation=fwd)
    model = ngp.make_and_fit_model(data, seed=3, **fit_kw)

    f_dates = dates[w:]
    fc = ngp.forecast(model, f_dates, 500 if full else 50, inv_transformation=inv)
    assert np.all(fc >= 0) and np.all(fc <= 100), "percentage bounds violated"

    # nowcast the most recent (under-reported) week
    rng = np.random.default_rng(11)
    scenarios = np.clip(
        pct[w - 1] * rng.lognormal(0.05, 0.02, size=(4 if smoke else 20, 1)),
        0.01, 99.9,
    )
    ncs = ngp.create_nowcast_data(list(scenarios), [dates[w - 1]],
                                  transformation=fwd)
    fc_nc = ngp.forecast_with_nowcasts(
        model, ncs, f_dates, 5, inv_transformation=inv, n_hmc=1,
        ess_threshold=0.5,
    )
    assert np.all(fc_nc >= 0) and np.all(fc_nc <= 100)
    # on-device aggregation of the full draw tensor (north-star item)
    qs = ngp.quantile_matrix_device(fc_nc, [0.25, 0.5, 0.75])
    print("nowcast forecast quantiles (25/50/75%):")
    print(np.round(qs, 2))
    print("truth:", np.round(pct[w:], 2))
    return qs


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
