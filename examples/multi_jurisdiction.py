"""Multi-jurisdiction panel fitting: many states, one SPMD program.

Beyond-reference workflow (BASELINE.json config 5; SURVEY.md §2.5): the
reference fits each jurisdiction serially (its vignettes loop over report
dates one at a time, ``/root/reference/docs/vignettes/getting-started.jl:377-391``),
while this framework flattens the particle ensembles of S series into one
``S x P`` row axis and runs every SMC phase — reweight, structure-move
accept, HMC — as a single batched device call, optionally sharded across a
``jax.sharding.Mesh`` (zero cross-series collectives: pure data
parallelism over jurisdictions).

The example simulates a small panel of state-level weekly hospitalization
series with shared seasonality but state-specific amplitude/phase/scale,
fits all of them in one ``fit_panel`` call over whatever devices are
visible, then forecasts each state and scores log-scale CRPS on the
holdout.

Run:  python examples/multi_jurisdiction.py [--full]
      (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
       for the virtual multi-chip mesh used by the test suite)
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

import numpy as np

# runnable as a script from any cwd: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nowcastautogp_tpu as ngp


def simulate_panel(n_states=6, n_weeks=120, seed=7):
    """State series: shared annual wave, per-state amplitude/phase/level."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_weeks)
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=int(i)) for i in t]
    panel = []
    for s in range(n_states):
        level = rng.uniform(200, 3000)
        amp = rng.uniform(0.3, 0.8)
        phase = rng.uniform(0, 2 * np.pi)
        drift = rng.uniform(-0.004, 0.002)
        truth = level * np.exp(
            amp * np.sin(2 * np.pi * t / 52 + phase) + drift * t
        )
        obs = np.maximum(truth * np.exp(0.10 * rng.standard_normal(n_weeks)), 1.0)
        panel.append(obs)
    return dates, panel


def run(full: bool = False, smoke: bool = False, seed: int = 7):
    from nowcastautogp_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    n_states = 6 if not smoke else 3
    horizon = 4
    fit_kw = dict(
        n_particles=24 if full else (2 if smoke else 4),
        smc_data_proportion=0.1 if full else (0.34 if smoke else 0.25),
        n_mcmc=50 if full else (2 if smoke else 3),
        n_hmc=50 if full else (2 if smoke else 3),
    )
    dates, panel = simulate_panel(
        n_states=n_states, n_weeks=40 if smoke else 120, seed=seed)
    w = len(dates) - horizon

    # one transformation per state (each has its own scale)
    transforms = [ngp.get_transformations("positive", obs[:w]) for obs in panel]
    datasets = [
        ngp.create_transformed_data(dates[:w], obs[:w], transformation=fwd)
        for obs, (fwd, _) in zip(panel, transforms)
    ]

    # shard the flattened state x particle rows over every visible device
    n_dev = len(jax.devices())
    mesh = ngp.make_mesh(n_dev) if n_dev > 1 else None
    models = ngp.fit_panel(datasets, seed=seed, mesh=mesh, **fit_kw)

    # forecast the whole panel in ONE batched predictive build too
    # (forecast_panel: S x P rows, per-state time normalization + inverse
    # transformation), then score each state
    f_dates = dates[w:]
    n_draws = 2000 if full else 200
    fcs = ngp.forecast_panel(
        models, f_dates, n_draws, seed=seed, mesh=mesh,
        inv_transformations=[inv for _, inv in transforms])
    scores = {}
    for s, (fc, obs) in enumerate(zip(fcs, panel)):
        crps = ngp.crps_matrix(np.log(np.maximum(fc, 1e-6)),
                               np.log(obs[w:]))
        scores[f"state_{s}"] = float(crps.mean())

    print(json.dumps({
        "devices": n_dev,
        "states": n_states,
        "particles_per_state": fit_kw["n_particles"],
        "mean_log_crps": scores,
    }, indent=2))
    return scores


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    run(full=args.full, smoke=args.smoke)
