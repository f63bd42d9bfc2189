"""At-scale calibration study (VERDICT r2 weak #7).

The in-suite statistical tests run at CPU toy scale (P<=6 particles); the
bench gate scores 3 seeds x 8 horizon points.  This harness measures
empirical interval coverage at the bench's real operating point (P=200 on
TPU) across many independent series, at several nominal levels — the
standard forecast-calibration check the reference renders as vignette
figures (/root/reference/docs/vignettes/getting-started.jl:737-833) but
never commits numerically.

Protocol: per seed, fit 150 weekly points of the bench family, forecast 8
weeks (2000 draws), record whether the held-out truth falls inside the
central 50/80/90/95% intervals at each horizon.  Pooled coverage over
seeds x horizons should match the nominal levels within binomial noise.

Usage: python tools/calibration_study.py [--seeds 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = (0.5, 0.8, 0.9, 0.95)


def run_one(seed, n_train=150, horizon=8, draws=2000):
    import nowcastautogp_tpu as ngp
    from bench import _series

    dates, obs = _series(n_train + horizon, seed)
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(
        dates[:n_train], obs[:n_train], transformation=fwd)
    t0 = time.time()
    model = ngp.make_and_fit_model(
        data, n_particles=200, smc_data_proportion=0.1,
        n_mcmc=14, n_hmc=5, seed=seed,
        config=ngp.GPConfig(max_depth=5),
        hmc_config=ngp.HMCConfig(n_leapfrog=5),
    )
    fit_s = time.time() - t0
    fc = ngp.forecast(model, dates[n_train:], draws, inv_transformation=inv)
    truth = obs[n_train:]
    qs = []
    for lv in LEVELS:
        a = (1.0 - lv) / 2.0
        qs.extend([a, 1.0 - a])
    q = np.asarray(ngp.quantile_matrix_device(fc, qs))
    hits = {}
    for i, lv in enumerate(LEVELS):
        lo, hi = q[2 * i], q[2 * i + 1]
        hits[str(lv)] = [bool(b) for b in (truth >= lo) & (truth <= hi)]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    return {"seed": seed, "log_crps": round(crps, 4), "fit_s": round(fit_s, 1),
            "hits": hits}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--out", default="tools/calibration_study_results.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    done = {r["seed"] for r in results}
    for seed in range(100, 100 + args.seeds):
        if seed in done:
            continue
        r = run_one(seed)
        print(json.dumps({k: v for k, v in r.items() if k != "hits"}),
              flush=True)
        results.append(r)
        json.dump(results, open(args.out, "w"), indent=1)

    n = 0
    pooled = {str(lv): 0 for lv in LEVELS}
    for r in results:
        for lv in LEVELS:
            pooled[str(lv)] += sum(r["hits"][str(lv)])
        n += len(r["hits"][str(LEVELS[0])])
    print(f"pooled over {n} (seed, horizon) points:")
    for lv in LEVELS:
        p = pooled[str(lv)] / max(n, 1)
        se = (lv * (1 - lv) / max(n, 1)) ** 0.5
        print(f"  nominal {lv:.2f}: empirical {p:.3f} (binomial se {se:.3f})")


if __name__ == "__main__":
    main()
