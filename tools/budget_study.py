"""Budget-equivalence study: canonical 24x50x50 vs bench 200x14x3 (VERDICT r3).

Round-2's claim — "the wide-ensemble / cheap-rejuvenation operating point the
TPU makes nearly free matches or beats the reference's canonical
narrow-ensemble / heavy-rejuvenation budgets" — rested on 2 seeds of one
generator.  This harness runs >=5 seeds x 2 series families, including one
NOT produced by the bench's simulator, and reports log-CRPS + 90% coverage
with dispersion.  (No real published vintage ships in this zero-egress
environment — the out-of-family series is a mechanistic SEIR epidemic-wave
generator, structurally unlike the bench's log-sinusoid family: sharp
asymmetric waves, multiplicative reporting noise, a non-stationary contact
rate.)

Protocol per (family, seed, config): fit 150 weekly points, forecast the
next 8 weeks with 2000 draws, score log-scale CRPS and 90% coverage against
the held-out truth.  NOTE on ``fit_s`` in the artifact: this study has no
per-config warm-up, so each config's FIRST row after an engine change
includes remote compilation (hundreds of seconds); warm rows are the
representative wall-clock, and the study's claims rest on CRPS/coverage
only (the canonical/daily studies own the wall-clock claims).  Canonical config mirrors the reference's documented
workload (getting-started.jl:266-268: n_particles=24, n_mcmc=50, n_hmc=50,
engine-default leapfrog).

Usage:
  python tools/budget_study.py [--seeds 5] [--out PLANSTUDY.json]
  python tools/budget_study.py --configs bench   # cheap half only
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


# family generators are library code now (nowcastautogp_tpu.eval.families);
# re-exported here so existing imports keep working
from nowcastautogp_tpu.eval.families import (  # noqa: E402
    FAMILIES, nhsn_like, outbreak_cp, seir_wave,
)

CONFIGS = {
    # the reference's documented canonical workload
    "canonical_24_50x50": dict(n_particles=24, n_mcmc=50, n_hmc=50,
                               hmc=None),
    # the bench's hardware-idiomatic operating point
    "bench_200_14x3": dict(n_particles=200, n_mcmc=14, n_hmc=3,
                           hmc=dict(n_leapfrog=3)),
    # candidate raised operating point (round 3: the fused kernel makes
    # 2.5x the rejuvenation affordable inside the 60 s envelope)
    "bench_200_35x3": dict(n_particles=200, n_mcmc=35, n_hmc=3,
                           hmc=dict(n_leapfrog=3)),
    # HMC-depth candidates: 35x3 shows more structure moves alone don't
    # close the canonical gap on the hard family — canonical's n_hmc=50
    # (x n_leapfrog=5) suggests parameter-refinement depth is what matters
    "bench_200_14x10": dict(n_particles=200, n_mcmc=14, n_hmc=10,
                            hmc=dict(n_leapfrog=3)),
    "bench_200_14x5_lf5": dict(n_particles=200, n_mcmc=14, n_hmc=5,
                               hmc=dict(n_leapfrog=5)),
}


def run_one(family, seed, cfg_name, n_train=150, horizon=8, draws=2000):
    import nowcastautogp_tpu as ngp

    cfg = CONFIGS[cfg_name]
    n = n_train + horizon
    obs = FAMILIES[family](n, seed)
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i) for i in range(n)]
    fwd, inv = ngp.get_transformations("boxcox", obs[:n_train])
    data = ngp.create_transformed_data(
        dates[:n_train], obs[:n_train], transformation=fwd)
    hmc = ngp.HMCConfig(**cfg["hmc"]) if cfg["hmc"] else None
    t0 = time.time()
    model = ngp.make_and_fit_model(
        data, n_particles=cfg["n_particles"], smc_data_proportion=0.1,
        n_mcmc=cfg["n_mcmc"], n_hmc=cfg["n_hmc"], seed=seed,
        config=ngp.GPConfig(max_depth=5), hmc_config=hmc,
    )
    fit_s = time.time() - t0
    f_dates = dates[n_train:]
    fc = ngp.forecast(model, f_dates, draws, inv_transformation=inv)
    truth = obs[n_train:]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    q = ngp.quantile_matrix_device(fc, [0.05, 0.95])
    cover = float(np.mean((truth >= q[0]) & (truth <= q[1])))
    return {"family": family, "seed": seed, "config": cfg_name,
            "log_crps": round(crps, 4), "coverage90": round(cover, 3),
            "fit_s": round(fit_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed-start", type=int, default=10)
    ap.add_argument("--families", nargs="+", default=list(FAMILIES),
                    choices=list(FAMILIES))
    ap.add_argument("--only-configs", nargs="+", default=None,
                    help="explicit config-name list (overrides --configs)")
    ap.add_argument("--configs", default="all",
                    choices=["all", "bench", "canonical"])
    ap.add_argument("--out", default="tools/budget_study_results.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfgs = list(CONFIGS)
    if args.configs == "bench":
        cfgs = ["bench_200_14x3"]
    elif args.configs == "canonical":
        cfgs = ["canonical_24_50x50"]
    if args.only_configs:
        cfgs = args.only_configs

    results = []
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    done = {(r["family"], r["seed"], r["config"]) for r in results}
    for family in args.families:
        for seed in range(args.seed_start, args.seed_start + args.seeds):
            for cfg in cfgs:
                key = (family, seed, cfg)
                if key in done:
                    continue
                r = run_one(family, seed, cfg)
                print(json.dumps(r), flush=True)
                results.append(r)
                json.dump(results, open(args.out, "w"), indent=1)

    # summary table
    for cfg in cfgs:
        for family in FAMILIES:
            rows = [r for r in results
                    if r["config"] == cfg and r["family"] == family]
            if rows:
                c = [r["log_crps"] for r in rows]
                cov = [r["coverage90"] for r in rows]
                t = [r["fit_s"] for r in rows]
                print(f"{cfg:22s} {family:10s} n={len(rows)} "
                      f"crps {np.mean(c):.4f}+-{np.std(c):.4f} "
                      f"cov90 {np.mean(cov):.2f} fit {np.median(t):.0f}s")


if __name__ == "__main__":
    main()
