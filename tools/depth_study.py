"""Depth-cap study (VERDICT r2 item 6): does depth 6 (63 slots) matter?

The heap encoding caps tree depth (``models/config.py``); the reference's
structure language composes freely.  This measures the statistical cost of
the cap on the bench series family: identical budgets at max_depth 5 vs 6,
forecast CRPS/coverage on an 8-week holdout, plus how much posterior mass
actually uses depth > 5 structure (max active heap level, weighted).

Usage: python tools/depth_study.py [--seeds 3]
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


def run_one(depth, seed, n_train=150, horizon=8, draws=2000):
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
        config=ngp.GPConfig(max_depth=depth),
        hmc_config=ngp.HMCConfig(n_leapfrog=5),
    )
    fit_s = time.time() - t0
    fc = ngp.forecast(model, dates[n_train:], draws, inv_transformation=inv)
    truth = obs[n_train:]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    q = ngp.quantile_matrix_device(fc, [0.05, 0.95])
    cover = float(np.mean((truth >= q[0]) & (truth <= q[1])))

    # posterior mass by max active heap level (level 1 = root only)
    types = model._host_types  # (P, N)
    lw = model.log_weight - np.max(model.log_weight)
    w = np.exp(lw)
    w = w / w.sum()
    levels = np.floor(np.log2(np.arange(1, types.shape[1] + 1))).astype(int)
    max_level = np.array(
        [int(levels[np.nonzero(t)[0]].max()) + 1 if np.any(t) else 1
         for t in types])
    mass_by_level = {int(d): round(float(w[max_level == d].sum()), 4)
                     for d in sorted(set(max_level))}
    mean_nodes = float(np.sum(w * np.sum(types > 0, axis=1)))
    return {"depth_cap": depth, "seed": seed, "log_crps": round(crps, 4),
            "coverage90": round(cover, 3), "fit_s": round(fit_s, 1),
            "posterior_mass_by_max_level": mass_by_level,
            "weighted_mean_active_nodes": round(mean_nodes, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="tools/depth_study_results.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    done = {(r["depth_cap"], r["seed"]) for r in results}
    for depth in (5, 6):
        for seed in range(30, 30 + args.seeds):
            if (depth, seed) in done:
                continue
            r = run_one(depth, seed)
            print(json.dumps(r), flush=True)
            results.append(r)
            json.dump(results, open(args.out, "w"), indent=1)

    for depth in (5, 6):
        rows = [r for r in results if r["depth_cap"] == depth]
        if rows:
            c = [r["log_crps"] for r in rows]
            t = [r["fit_s"] for r in rows]
            deep = [sum(v for k, v in r["posterior_mass_by_max_level"].items()
                        if int(k) >= 6) for r in rows]
            print(f"depth {depth}: n={len(rows)} crps "
                  f"{np.mean(c):.4f}+-{np.std(c):.4f} "
                  f"fit {np.median(t):.0f}s mass@level>=6 {np.mean(deep):.4f}")


if __name__ == "__main__":
    main()
