"""Daily-cadence fitting: GP structure discovery on ~2 years of daily data.

The reference's vignettes are weekly (n ~ 100-200), but surveillance
systems increasingly report daily (NSSP ED visits, wastewater).  Dense-GP
cost is O(n^3) per Cholesky and O(n^2) per covariance plane, so daily
series (n ~ 500-800) are where the large-n device path earns its keep:

* the fused covariance kernel tiles its plane into (256, 256) blocks past
  n_pad = 512 (``ops/pallas_megacov.py``, gradient output accumulated
  across the tile grid), and
* ``auto`` routes the n > 512 Cholesky through the blocked MXU kernel
  (``ops/chol_mxu.py``) whose panel updates stay batch matmuls while the
  XLA expander's column-loop latency scales with n
  (measured at (200, 640): LML vgrad 100 -> 88 ms; ``ops/lml.py``).

The pipeline itself is the standard one (fit -> forecast -> score), with a
day-of-week effect in the simulator that the Periodic leaf can discover:
daily epi data has weekday reporting structure on top of seasonal waves.

Run:  python examples/daily_cadence.py [--full] [--smoke]
  --smoke  tiny CPU-friendly budgets (CI)
  --full   n=560 days x 24 particles on the TPU (exercises the tiled path)
"""

from __future__ import annotations

import argparse
import datetime as dt
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp


def simulate_daily(n_days: int, seed: int = 5):
    """Daily counts: seasonal wave x weekday effect x noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_days)
    season = 0.6 * np.sin(2 * np.pi * t / 365.0 + 1.1)
    weekday = np.array([0.05, 0.12, 0.10, 0.06, 0.0, -0.25, -0.35])
    dow = weekday[t % 7]
    trend = 0.0012 * t
    truth = 140 * np.exp(season + dow + trend)
    obs = np.maximum(truth * np.exp(0.08 * rng.standard_normal(n_days)), 1.0)
    dates = [dt.date(2024, 1, 1) + dt.timedelta(days=int(i)) for i in t]
    return dates, obs


def run(full: bool = False, smoke: bool = False):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    if full:
        n_train, horizon = 560, 28
        fit_kw = dict(n_particles=24, smc_data_proportion=0.125,
                      n_mcmc=8, n_hmc=5)
    elif smoke:
        n_train, horizon = 40, 7
        fit_kw = dict(n_particles=2, smc_data_proportion=0.34,
                      n_mcmc=2, n_hmc=2)
    else:
        n_train, horizon = 120, 14
        fit_kw = dict(n_particles=4, smc_data_proportion=0.25,
                      n_mcmc=3, n_hmc=3)
    n_draws = 2000 if full else 200

    dates, obs = simulate_daily(n_train + horizon)
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(dates[:n_train], obs[:n_train],
                                       transformation=fwd)
    t0 = time.time()
    model = ngp.make_and_fit_model(data, seed=3, **fit_kw)
    fit_s = time.time() - t0

    f_dates = dates[n_train:]
    fc = ngp.forecast(model, f_dates, n_draws, inv_transformation=inv)
    truth = obs[n_train:]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    q = ngp.quantile_matrix_device(fc, [0.05, 0.5, 0.95])
    cover = float(np.mean((truth >= q[0]) & (truth <= q[2])))

    out = {
        "n_train_days": n_train,
        "horizon_days": horizon,
        "fit_s": round(fit_s, 2),
        "log_crps": round(crps, 4),
        "coverage90": round(cover, 3),
        "structures": sorted(set(model.structures()))[:6],
    }
    print(f"daily fit: n={n_train} days, {fit_kw['n_particles']} particles "
          f"-> {out['fit_s']}s")
    print(f"{horizon}-day-ahead log-CRPS {out['log_crps']}, "
          f"90% coverage {out['coverage90']}")
    print("discovered structures (sample):")
    for s in out["structures"]:
        print(f"  {s}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
