"""Online weekly updates: condition a fitted ensemble on new data in place.

Production surveillance pattern: instead of refitting from scratch every
report date (the getting-started vignette's loop,
``/root/reference/docs/vignettes/getting-started.jl:266-276``), fit once and
then, each week, incrementally condition the SMC ensemble on the new
observation with the engine-level API the reference reaches through AutoGP —
``add_data!`` / ``maybe_resample!`` / ``mcmc_parameters!`` / ``mcmc_structure!``
(``src/forecasting.jl:135-148``).  ``add_data`` reweights the particle
ensemble by the incremental marginal likelihood of the new block; a cheap
HMC refresh (plus an occasional structure move) keeps hyperparameters and
kernel structures current at a small fraction of a full refit's cost.

The example scores 1-week-ahead forecasts from the online-updated model
against the same forecasts from a stale model that never sees the new weeks,
and reports per-week update wall-clock next to the initial fit's.

Run:  python examples/online_update.py [--full] [--smoke]
"""

from __future__ import annotations

import argparse
import datetime as dt
import time

import numpy as np

import os
import sys

# runnable as a script from any cwd: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.utils.apply import apply_elementwise


def simulate_counts(n_weeks: int, seed: int = 17):
    rng = np.random.default_rng(seed)
    t = np.arange(n_weeks)
    truth = 600 * np.exp(
        0.5 * np.sin(2 * np.pi * t / 52 + 0.8)
        + 0.2 * np.sin(2 * np.pi * t / 13)
        + 0.002 * t
    )
    obs = np.maximum(truth * np.exp(0.1 * rng.standard_normal(n_weeks)), 1.0)
    dates = [dt.date(2023, 1, 2) + dt.timedelta(weeks=int(i)) for i in t]
    return dates, obs


def run(full: bool = False, smoke: bool = False):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    n_particles = 24 if full else (2 if smoke else 4)
    fit_kw = dict(
        n_particles=n_particles,
        smc_data_proportion=0.1 if full else (0.34 if smoke else 0.25),
        n_mcmc=50 if full else (2 if smoke else 3),
        n_hmc=50 if full else (2 if smoke else 3),
    )
    n_update_weeks = 8 if full else (3 if smoke else 4)
    n_train = 104 if full else (28 if smoke else 60)
    refresh_hmc = 10 if full else 2
    struct_mcmc = (6, 10) if full else (1, 2)  # every-4th-week structure move
    n_draws = 2000 if full else 100

    dates, obs = simulate_counts(n_train + n_update_weeks)
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(dates[:n_train], obs[:n_train],
                                       transformation=fwd)
    t0 = time.time()
    online = ngp.make_and_fit_model(data, seed=2, **fit_kw)
    fit_s = time.time() - t0
    stale = ngp.GPModel(online.to_dict())  # frozen copy, never updated

    scores = {"online": [], "stale": []}
    update_times = []
    for k in range(n_update_weeks):
        week = n_train + k
        target_date, target_obs = dates[week], obs[week]
        for name, model in (("online", online), ("stale", stale)):
            fc = ngp.forecast(model, [target_date], n_draws,
                              inv_transformation=inv)
            scores[name].append(ngp.crps_ensemble(
                np.log(np.maximum(fc[0], 1e-9)), np.log(target_obs)))
        # the week's data lands: condition the online ensemble in place
        t0 = time.time()
        ngp.add_data(online, [target_date],
                     apply_elementwise(fwd, np.array([target_obs])))
        ngp.maybe_resample(online, n_particles / 2)
        if (k + 1) % 4 == 0:
            ngp.mcmc_structure(online, *struct_mcmc)
        else:
            ngp.mcmc_parameters(online, refresh_hmc)
        update_times.append(time.time() - t0)

    # the first update pays one-time compiles for the post-update shapes;
    # steady-state weekly cost is the warm mean
    warm = update_times[1:] or update_times
    out = {
        "mean_log_crps": {k: float(np.mean(v)) for k, v in scores.items()},
        "initial_fit_s": round(fit_s, 2),
        "warm_update_s": round(float(np.mean(warm)), 2),
        "n_update_weeks": n_update_weeks,
    }
    print("1-week-ahead mean log-CRPS over the update window:")
    for name, v in out["mean_log_crps"].items():
        print(f"  {name:7s} {v:.4f}")
    print(f"initial fit {out['initial_fit_s']}s; warm weekly update "
          f"{out['warm_update_s']}s "
          f"({out['initial_fit_s'] / max(out['warm_update_s'], 1e-9):.0f}x "
          f"cheaper than refitting)")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
