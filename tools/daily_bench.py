"""Daily-cadence end-to-end bench artifact (VERDICT r3 item 5).

The tiled megacov (n <= 2048) and the n > 512 MXU-Cholesky routing have
microbenches (``tools/microbench_mega_tiled.py``, ``ops/lml.py:294-303``)
and an example (``examples/daily_cadence.py``); this tool pins a COMMITTED
fit + forecast wall-clock and quality number at the daily operating point,
with the same gate discipline as ``bench.py``, so future rounds can regress
against it.

Workload: ~1.6 years of daily counts (n_train = 560 -> cap 576, firmly in
the tiled-covariance / MXU-Cholesky region), 28-day horizon, 2000 draws.
Two ensembles: the reference's canonical particle count (24) and the bench's
wide ensemble (200).  3 seeds; medians + pooled quality.

Writes ``tools/daily_bench_results.json``.  Run on the TPU:

    python tools/daily_bench.py [--seeds 2 3 4]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# quality gate, calibrated the same way bench.py's is: log-scale CRPS on
# the held-out 28-day horizon plus 90%-interval coverage bounds.  Daily
# noise is sigma ~ 0.08 on the log scale, so a calibrated 28-day CRPS sits
# well under 0.1; the gate bounds catch collapse, not seed noise.
GATE_MAX_LOG_CRPS = 0.12
GATE_COVERAGE90 = (0.70, 1.0)

CONFIGS = {
    "daily_24p": dict(n_particles=24, n_mcmc=8, n_hmc=5),
    "daily_200p": dict(n_particles=200, n_mcmc=8, n_hmc=5),
}


def simulate_daily(n_days: int, seed: int):
    """Daily counts: seasonal wave x weekday reporting effect x noise
    (the ``examples/daily_cadence.py`` family, seed-parameterized)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_days)
    season = 0.6 * np.sin(2 * np.pi * t / 365.0 + rng.uniform(0, 2 * np.pi))
    weekday = np.array([0.05, 0.12, 0.10, 0.06, 0.0, -0.25, -0.35])
    dow = weekday[t % 7] * rng.uniform(0.8, 1.2)
    trend = rng.uniform(0.0006, 0.0018) * t
    truth = 140 * np.exp(season + dow + trend)
    obs = np.maximum(truth * np.exp(0.08 * rng.standard_normal(n_days)), 1.0)
    dates = [dt.date(2024, 1, 1) + dt.timedelta(days=int(i)) for i in t]
    return dates, obs


def run_one(cfg_name: str, seed: int, n_train=560, horizon=28, draws=2000):
    import nowcastautogp_tpu as ngp

    cfg = CONFIGS[cfg_name]
    dates, obs = simulate_daily(n_train + horizon, seed)
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(
        dates[:n_train], obs[:n_train], transformation=fwd)
    t0 = time.time()
    model = ngp.make_and_fit_model(
        data, n_particles=cfg["n_particles"], smc_data_proportion=0.125,
        n_mcmc=cfg["n_mcmc"], n_hmc=cfg["n_hmc"], seed=seed,
        config=ngp.GPConfig(max_depth=5),
    )
    fit_s = time.time() - t0
    t0 = time.time()
    fc = ngp.forecast(model, dates[n_train:], draws, inv_transformation=inv)
    fc_s = time.time() - t0
    truth = obs[n_train:]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    q = ngp.quantile_matrix_device(fc, [0.05, 0.95])
    cover = float(np.mean((truth >= q[0]) & (truth <= q[1])))
    return {"seed": seed, "fit_s": round(fit_s, 2),
            "forecast_s": round(fc_s, 2), "log_crps": round(crps, 4),
            "coverage90": round(cover, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--configs", nargs="+", default=list(CONFIGS))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "daily_bench_results.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results: dict = {}
    if os.path.exists(args.out):  # merge rows from earlier runs
        with open(args.out) as f:
            results.update(json.load(f))
    results.update({
        "workload": "560-day fit + 28-day 2000-draw forecast",
        "gate_max_log_crps": GATE_MAX_LOG_CRPS,
        "gate_coverage90": list(GATE_COVERAGE90),
    })
    gate_ok = True
    for name in args.configs:
        run_one(name, seed=1)  # warm-up: compile at identical shapes
        rows = []
        for seed in args.seeds:
            r = run_one(name, seed)
            rows.append(r)
            print(f"{name} seed={seed}: fit {r['fit_s']}s "
                  f"fc {r['forecast_s']}s crps {r['log_crps']}", flush=True)
        med_fit = float(np.median([r["fit_s"] for r in rows]))
        mean_crps = float(np.mean([r["log_crps"] for r in rows]))
        mean_cov = float(np.mean([r["coverage90"] for r in rows]))
        ok = (mean_crps <= GATE_MAX_LOG_CRPS
              and GATE_COVERAGE90[0] <= mean_cov <= GATE_COVERAGE90[1])
        gate_ok = gate_ok and ok
        results[name] = {
            "rows": rows, "median_fit_s": round(med_fit, 2),
            "mean_log_crps": round(mean_crps, 4),
            "mean_coverage90": round(mean_cov, 3), "gate_ok": ok,
        }
        with open(args.out, "w") as f:  # checkpoint after each config
            json.dump(results, f, indent=1)
            f.write("\n")
    print(json.dumps(results))
    if not gate_ok:
        print("DAILY QUALITY GATE FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
