"""Multi-series panel bench artifact (VERDICT r4 item 8).

The multi-jurisdiction story (``parallel/panel.py``; README's
multi-series feature bullet) had per-shard equivalence tests and a mesh
dryrun but no GATED wall-clock number, even on one chip.  This tool pins
one: fit an S-jurisdiction panel (heterogeneous NHSN-like series, one
Box-Cox transformation each) as ONE flattened ``S x P``-row SMC program,
then forecast every series with one batched predictive build
(``forecast_panel``), and score each series against its held-out truth.

The comparison row fits the same S series SERIALLY through
``make_and_fit_model`` at identical budgets — the reference's only option
(``getting-started.jl:377-391`` maps serially) — so the artifact records
the panel speedup the TPU design buys on real hardware.

Workload: S = 20 series x 150 weekly points, 24 particles each (480
flattened rows), canonical-class budgets scaled to the bench operating
point, 8-week horizon, 500 draws per series.  Quality gate per series:
log-CRPS below a loose collapse bound and finite everywhere.

Writes ``tools/panel_bench_results.json``.  Run on the TPU:

    python tools/panel_bench.py [--series 20] [--serial]
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

# collapse bound, not a seed-noise bound: single-series bench CRPS runs
# ~0.08-0.10 on this family (bench.py gate 0.105); per-series panel fits
# at the same budgets should land in the same range, and 0.2 catches a
# broken series without tripping on family variation across 20 seeds
GATE_MAX_LOG_CRPS_PER_SERIES = 0.2
N_MCMC, N_HMC, N_LEAPFROG = 14, 5, 5


def make_panel(S: int, n: int, horizon: int):
    from nowcastautogp_tpu.eval.families import nhsn_like

    import nowcastautogp_tpu as ngp

    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i)
             for i in range(n + horizon)]
    datasets, invs, truths = [], [], []
    for s in range(S):
        obs = nhsn_like(n + horizon, 100 + s) * (0.5 + 0.1 * s)
        fwd, inv = ngp.get_transformations("boxcox", obs[:n])
        datasets.append(ngp.create_transformed_data(
            dates[:n], obs[:n], transformation=fwd))
        invs.append(inv)
        truths.append(obs[n:])
    return dates, datasets, invs, truths


def score(fcs, truths):
    import nowcastautogp_tpu as ngp

    crps, cover = [], []
    for fc, truth in zip(fcs, truths):
        crps.append(float(ngp.crps_matrix(
            np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean()))
        q = ngp.quantile_matrix_device(fc, [0.05, 0.95])
        cover.append(float(np.mean((truth >= q[0]) & (truth <= q[1]))))
    return crps, cover


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--series", type=int, default=20)
    ap.add_argument("--n-train", type=int, default=150)
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--draws", type=int, default=500)
    ap.add_argument("--serial", action="store_true",
                    help="also run the serial per-series comparison row")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "panel_bench_results.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import nowcastautogp_tpu as ngp

    S = args.series
    dates, datasets, invs, truths = make_panel(
        S, args.n_train, args.horizon)
    f_dates = dates[args.n_train:]
    kw = dict(n_particles=24, smc_data_proportion=0.1, n_mcmc=N_MCMC,
              n_hmc=N_HMC, config=ngp.GPConfig(max_depth=5),
              hmc_config=ngp.HMCConfig(n_leapfrog=N_LEAPFROG))

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results.update({
        "workload": (f"{S} series x {args.n_train}wk panel fit "
                     f"(24p, {N_MCMC}x{N_HMC} lf{N_LEAPFROG}) + "
                     f"{args.horizon}wk x {args.draws}-draw forecast"),
        "gate_max_log_crps_per_series": GATE_MAX_LOG_CRPS_PER_SERIES,
    })

    # warm-up at identical shapes, then the measured run
    ngp.fit_panel(datasets, seed=0, **kw)
    t0 = time.time()
    models = ngp.fit_panel(datasets, seed=1, **kw)
    fit_s = time.time() - t0
    t0 = time.time()
    fcs = ngp.forecast_panel(models, f_dates, args.draws,
                             inv_transformations=invs, seed=2)
    forecast_s = time.time() - t0
    crps, cover = score(fcs, truths)
    gate_ok = all(np.isfinite(c) and c <= GATE_MAX_LOG_CRPS_PER_SERIES
                  for c in crps)
    results["panel"] = {
        "fit_s": round(fit_s, 2), "forecast_s": round(forecast_s, 2),
        "log_crps_per_series": [round(c, 4) for c in crps],
        "log_crps_median": round(float(np.median(crps)), 4),
        "coverage90_mean": round(float(np.mean(cover)), 3),
        "gate_ok": bool(gate_ok),
    }
    print(json.dumps(results["panel"]), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")

    if args.serial:
        t0 = time.time()
        smodels = [ngp.make_and_fit_model(d, seed=1000 + i, **kw)
                   for i, d in enumerate(datasets)]
        sfit_s = time.time() - t0
        t0 = time.time()
        sfcs = [ngp.forecast(m, f_dates, args.draws, inv_transformation=inv)
                for m, inv in zip(smodels, invs)]
        sforecast_s = time.time() - t0
        scrps, scover = score(sfcs, truths)
        results["serial"] = {
            "fit_s": round(sfit_s, 2), "forecast_s": round(sforecast_s, 2),
            "log_crps_median": round(float(np.median(scrps)), 4),
            "coverage90_mean": round(float(np.mean(scover)), 3),
        }
        results["panel_speedup_fit"] = round(
            sfit_s / max(results["panel"]["fit_s"], 1e-9), 2)
        print(json.dumps({k: results[k] for k in
                          ("serial", "panel_speedup_fit")}), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    if not gate_ok:
        print("PANEL QUALITY GATE FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
