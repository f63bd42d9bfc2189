"""Canonical-workload wall-clock study on the TPU (VERDICT r2 item 1).

Measures the reference's documented workloads inside the bench envelope,
on the exact bench series/holdout (``bench.run``):

* ``200p_35x5`` / ``200p_50x5`` — the bench's 200-particle ensemble at
  canonical-class STRUCTURE budgets (n_mcmc = 35 / 50, the range the
  round-2 verdict named; ``/root/reference/docs/vignettes/
  getting-started.jl:266-268`` documents n_mcmc=50).  n_hmc=5 with
  n_leapfrog=5 is the HMC-depth equivalence point of the budget study
  (``tools/budget_study_results.json``, n=8 seeds x 2 families).
* ``24p_50x50`` — the reference's canonical workload verbatim
  (n_particles=24, smc_data_proportion=0.1, n_mcmc=50, n_hmc=50), riding
  the fused capacity-bucketed device path (P-aware call budget,
  ``inference/smc.py``).
* ``24p_100x20`` — the NSSP percentage-vignette fit budget verbatim
  (``/root/reference/docs/vignettes/use-percentages.jl:121-123``:
  n_particles=24, n_mcmc=100, n_hmc=20).
* ``32p_200x50_adaptive`` — the setting-priors-vignette fit budget
  verbatim (``/root/reference/docs/vignettes/setting-priors.jl:179-186``:
  n_particles=32, smc_data_proportion=0.005 — clamped to 1/n_train, i.e.
  a per-observation schedule — n_mcmc=200, n_hmc=50,
  adaptive_rejuvenation=true).

The two vignette budgets run on the bench series (their own data files
are not committed to the reference tree), so the rows measure the FIT
COMPUTE of those documented workloads, not their datasets.

Writes ``tools/canonical_study_results.json``.  Run on the TPU:

    python tools/canonical_study.py [--seeds 2 3 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "200p_35x5_lf5": dict(n_particles=200, n_mcmc=35, n_hmc=5),
    "200p_50x5_lf5": dict(n_particles=200, n_mcmc=50, n_hmc=5),
    "24p_50x50_lf5": dict(n_particles=24, n_mcmc=50, n_hmc=50),
    "24p_100x20_lf5": dict(n_particles=24, n_mcmc=100, n_hmc=20),
    "32p_200x50_adaptive_lf5": dict(
        n_particles=32, n_mcmc=200, n_hmc=50,
        smc_data_proportion=0.005, adaptive_rejuvenation=True),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--configs", nargs="+", default=list(CONFIGS))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "canonical_study_results.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    results: dict = {}
    if os.path.exists(args.out):  # merge: keep rows from earlier runs
        with open(args.out) as f:
            results.update(json.load(f))
    # fresh metadata OVERLAYS the stale file's, so rows measured now are
    # recorded under the current bench operating point
    results.update({"target_s": 60.0, "n_leapfrog": bench.N_LEAPFROG})
    for name in args.configs:
        kw = CONFIGS[name]
        bench.run(seed=1, **kw)  # warm-up: compile at identical shapes
        rows = []
        for seed in args.seeds:
            fit_s, fc_s, _, q = bench.run(seed=seed, **kw)
            rows.append({"seed": seed, "fit_s": round(fit_s, 2),
                         "forecast_s": round(fc_s, 2), **q})
            print(f"{name} seed={seed}: fit {fit_s:.1f}s "
                  f"crps {q['log_crps']}", flush=True)
        results[name] = rows
        with open(args.out, "w") as f:  # checkpoint after each config
            json.dump(results, f, indent=1)
            f.write("\n")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
