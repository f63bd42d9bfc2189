"""Getting started: fit -> nowcast -> forecast -> CRPS-score pipeline.

Workflow-parity example matching the reference's canonical vignette
(``/root/reference/docs/vignettes/getting-started.jl``): vintaged weekly
surveillance counts where the latest week is still being revised upward; fit
a GP ensemble per report date on confirmed data, build nowcast scenarios by
scaling the provisional value with LogNormal reporting factors
(the vignette's 100-draw x LogNormal(0.1, 0.027) scheme, ``:498-508``),
forecast three variants (leave-out-last / nowcast / nowcast+HMC refresh), and
score them with log-scale CRPS ratios.

Run:  python examples/getting_started.py [--full]
(the default uses small particle/MCMC budgets so it finishes in minutes on
CPU; ``--full`` uses the vignette's canonical budgets:
n_particles=24, smc_data_proportion=0.1, n_mcmc=50, n_hmc=50, 2000 draws.)
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import time

import numpy as np

import os
import sys

# runnable as a script from any cwd: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp


def simulate_vintaged_data(n_weeks=120, seed=0):
    """Weekly counts with reporting delay: provisional values under-report."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_weeks)
    truth = 600 * np.exp(
        0.5 * np.sin(2 * np.pi * t / 52) + 0.2 * np.sin(2 * np.pi * t / 17)
        - 0.002 * t
    )
    final = np.maximum(truth * np.exp(0.1 * rng.standard_normal(n_weeks)), 1.0)
    # provisional value of the most recent week is ~90% reported
    reporting_frac = np.exp(-(0.1 + 0.027 * rng.standard_normal(n_weeks)))
    provisional = final * reporting_frac
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=int(i)) for i in t]
    return dates, final, provisional


def run(full: bool = False, seed: int = 1, smoke: bool = False):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    # smoke: tiny budgets at the test suite's shared compile shapes so the
    # pipeline is exercised end-to-end by pytest (tests/test_examples.py)
    fit_kw = dict(
        n_particles=24 if full else (2 if smoke else 4),
        smc_data_proportion=0.1 if full else (0.34 if smoke else 0.25),
        n_mcmc=50 if full else (2 if smoke else 3),
        n_hmc=50 if full else (2 if smoke else 3),
    )
    n_nowcast_draws = 100 if full else (4 if smoke else 10)
    total_draws = 2000 if full else (16 if smoke else 100)
    horizon = 4
    dates, final, provisional = simulate_vintaged_data(
        n_weeks=40 if smoke else 120, seed=seed)
    report_weeks = [90, 100, 110] if full else ([36] if smoke else [100])

    scores = {"naive": [], "leave_out_last": [], "nowcast": [], "nowcast_hmc": []}
    for w in report_weeks:
        confirmed = final[: w - 1]           # weeks fully reported by week w
        conf_dates = dates[: w - 1]
        prov_value = provisional[w - 1]      # latest week, still being revised
        f_dates = dates[w: w + horizon]
        f_truth = final[w: w + horizon]

        fwd, inv = ngp.get_transformations("boxcox", confirmed)
        data = ngp.create_transformed_data(conf_dates, confirmed, transformation=fwd)
        t0 = time.time()
        model = ngp.make_and_fit_model(data, seed=seed, **fit_kw)
        fit_s = time.time() - t0

        # cache fitted state the way the vignette does (Dict(model) analog)
        model_dict = model.to_dict()

        # -- leave-out-last: forecast ignoring the provisional week entirely
        m1 = ngp.GPModel(model_dict)
        fc_lol = ngp.forecast(m1, f_dates, total_draws, inv_transformation=inv)

        # -- nowcast: scenarios = provisional x LogNormal reporting factor
        rng = np.random.default_rng(seed + w)
        factors = rng.lognormal(0.1, 0.027, size=n_nowcast_draws)
        scenarios = np.asarray([[prov_value * f] for f in factors])  # (S, 1)
        ncs = ngp.create_nowcast_data(
            list(scenarios), [dates[w - 1]], transformation=fwd
        )
        draws_per = max(total_draws // n_nowcast_draws, 1)
        fc_nc = ngp.forecast_with_nowcasts(
            ngp.GPModel(model_dict), ncs, f_dates, draws_per,
            inv_transformation=inv, ess_threshold=0.5,
        )
        fc_nc_hmc = ngp.forecast_with_nowcasts(
            ngp.GPModel(model_dict), ncs, f_dates, draws_per,
            inv_transformation=inv, n_hmc=1, ess_threshold=0.5,
        )

        # -- naive: flat forecast at the last confirmed value
        fc_naive = np.full((horizon, total_draws), confirmed[-1])

        # log-scale CRPS, mean over the horizon (vignette scoring)
        for name, fc in (
            ("naive", fc_naive), ("leave_out_last", fc_lol),
            ("nowcast", fc_nc), ("nowcast_hmc", fc_nc_hmc),
        ):
            crps = ngp.crps_matrix(np.log(np.maximum(fc, 1e-6)),
                                   np.log(f_truth))
            scores[name].append(crps.mean())
        print(f"report week {w}: fit {fit_s:.1f}s; structures: "
              f"{model.structures()[:2]}")

    mean_scores = {k: float(np.mean(v)) for k, v in scores.items()}
    best = min(mean_scores, key=mean_scores.get)
    ratios = {k: round(v / mean_scores[best], 3) for k, v in mean_scores.items()}
    print(json.dumps({"mean_log_crps": mean_scores, "ratio_vs_best": ratios},
                     indent=2))
    return mean_scores


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
