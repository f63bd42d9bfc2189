"""Benchmark: north-star workload on one TPU chip.

Target (BASELINE.md / BASELINE.json north star): a 200-particle ensemble on
an NHSN-like weekly series — SMC structure-discovery fit plus a 100-scenario
x 20-draw nowcast-conditioned forecast (the reference's canonical 2000-draw
forecast workload, ``docs/vignettes/getting-started.jl:415,498,548``) — in
under 60 s of wall-clock on a single v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is target_seconds / measured_seconds (>1 beats the target).
Compile time is excluded via a warm-up fit on the same shapes (first-compile
on this tunnel is minutes but one-time; the persistent cache covers repeat
runs).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _series(n: int, seed: int = 0, family: str = "nhsn"):
    import datetime as dt

    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i) for i in range(n)]
    if family == "outbreak_cp":
        # the structure-shift family (hard reporting-system changepoint,
        # heavy-tailed noise) — second gated family so the quality gate
        # can't silently regress on changepoint data (VERDICT r4 item 3)
        from nowcastautogp_tpu.eval.families import outbreak_cp

        return dates, outbreak_cp(n, seed)
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    truth = 800 * np.exp(
        0.15 * np.sin(2 * np.pi * t / 52)
        + 0.6 * np.sin(2 * np.pi * t / 26 + 1.0)
        - 0.004 * t
    )
    obs = np.maximum(truth * np.exp(0.12 * rng.standard_normal(n)), 1.0)
    return dates, obs


def run(n_particles=200, n_train=150, n_mcmc=None, n_hmc=None,
        n_scenarios=100, draws_per=20, horizon=8, seed=1, verbose=False,
        smc_data_proportion=0.1, adaptive_rejuvenation=False,
        n_leapfrog=None, family="nhsn"):
    import datetime as dt

    import nowcastautogp_tpu as ngp

    n_mcmc = N_MCMC if n_mcmc is None else n_mcmc
    n_hmc = N_HMC if n_hmc is None else n_hmc
    n_leapfrog = N_LEAPFROG if n_leapfrog is None else n_leapfrog
    dates, obs = _series(n_train + 2 + horizon, seed, family)
    train_dates, train_obs = dates[:n_train], obs[:n_train]
    fwd, inv = ngp.get_transformations("boxcox", train_obs)
    data = ngp.create_transformed_data(train_dates, train_obs, transformation=fwd)

    # depth-5 heap (31 node slots) — the engine's full structure depth
    config = ngp.GPConfig(max_depth=5)
    t0 = time.time()
    model = ngp.make_and_fit_model(
        data, n_particles=n_particles,
        smc_data_proportion=smc_data_proportion,
        n_mcmc=n_mcmc, n_hmc=n_hmc, seed=seed, verbose=verbose,
        adaptive_rejuvenation=adaptive_rejuvenation,
        config=config, hmc_config=ngp.HMCConfig(n_leapfrog=n_leapfrog),
    )
    fit_s = time.time() - t0

    # nowcast scenarios: last two weeks still being revised
    rng = np.random.default_rng(seed + 1)
    nc_dates = dates[n_train:n_train + 2]
    nc_draws = obs[n_train:n_train + 2] * rng.lognormal(
        0.1, 0.027, size=(n_scenarios, 2)
    )
    ncs = ngp.create_nowcast_data(list(nc_draws), nc_dates, transformation=fwd)
    f_dates = [nc_dates[-1] + dt.timedelta(weeks=i + 1) for i in range(horizon)]

    t0 = time.time()
    fc = ngp.forecast_with_nowcasts(
        model, ncs, f_dates, draws_per, inv_transformation=inv,
        ess_threshold=0.5,
    )
    fc_s = time.time() - t0
    assert fc.shape == (horizon, n_scenarios * draws_per)
    assert np.all(np.isfinite(fc)) and np.all(fc >= 0)

    # quality gate: log-scale CRPS + 90% interval coverage on the held-out
    # truth, so perf tuning can't silently trade away calibration
    truth = obs[n_train + 2:n_train + 2 + horizon]
    crps = float(ngp.crps_matrix(
        np.log(np.maximum(fc, 1e-9)), np.log(truth)).mean())
    q = ngp.quantile_matrix_device(fc, [0.05, 0.95])
    cover90 = float(np.mean((truth >= q[0]) & (truth <= q[1])))
    return fit_s, fc_s, fc, {"log_crps": round(crps, 4),
                             "coverage90": round(cover90, 3)}


# Quality gate (VERDICT r2 weak #4 / item 9): committed failure thresholds.
# Perf work cannot silently trade away calibration — the bench exits nonzero
# if the pooled 3-seed, 8-horizon-point quality regresses past these bounds.
# Calibrated from the r2-era operating point (log_crps ~0.059 at horizon 4;
# horizon-8 pooling runs wider) plus seed-to-seed spread ~0.015.
GATE_MAX_LOG_CRPS = 0.105
GATE_COVERAGE90 = (0.70, 1.0)
SEEDS = (2, 3, 4)
# Second gated family (VERDICT r4 item 3): the outbreak_cp structure-shift
# generator, so perf tuning can't silently regress on changepoint data the
# nhsn gate never sees.  This family is heavy-tailed with occasional
# catastrophic seeds at ANY budget (budget study: canonical seed-11 0.44,
# bench seed-10 0.71), so the gate bounds the 3-seed MEDIAN at ~2x the
# family's cross-config median spread — a collapse bound, not seed noise.
GATE2_FAMILY = "outbreak_cp"
GATE2_MAX_MEDIAN_LOG_CRPS = 0.45
# Operating point: the cheapest configuration statistically indistinguishable
# from the reference's canonical 24-particle 50x50 workload on BOTH series
# families of the budget study (tools/budget_study_results.json, n=5 seeds
# each: nhsn 0.0967+-0.013 vs canonical 0.0903+-0.015; seir 0.3282+-0.179 vs
# 0.2939+-0.134) at ~1/13th of canonical's wall-clock.  n_leapfrog matches
# the engine's HMCConfig default.
N_MCMC, N_HMC, N_LEAPFROG = 14, 5, 5


def _probe_device(timeout_s: int = 300, retries: int = 2) -> None:
    """Fail fast (clear message, nonzero exit) if the device never claims.

    The tunneled TPU's chip claim can block indefinitely during a pool
    outage; ``jax.devices()`` in THIS process would hang the whole bench
    with no diagnostic.  Probe in a subprocess with a bounded wait instead —
    a healthy claim returns in seconds, and a slow first *compile* is
    unaffected (compilation happens after the probe).
    """
    import subprocess
    import sys

    for attempt in range(1, retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, capture_output=True, text=True,
            )
            if proc.returncode == 0:
                return
            tail = "\n".join(proc.stderr.strip().splitlines()[-4:])
            print(f"bench: device probe {attempt}/{retries} exited "
                  f"rc={proc.returncode}:\n{tail}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench: device probe {attempt}/{retries} timed out "
                  f"(claim did not complete in {timeout_s}s)",
                  file=sys.stderr, flush=True)
    print("bench: device unreachable — aborting instead of hanging",
          file=sys.stderr, flush=True)
    raise SystemExit(2)


def main():
    import sys

    import jax

    _probe_device()
    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # warm-up at IDENTICAL static shapes (P, cap, schedule length, n_mcmc,
    # n_hmc) so the measured runs are compile-free; the persistent cache makes
    # this cheap on repeat bench invocations.
    run(seed=1)

    per_seed = []
    for seed in SEEDS:
        fit_s, fc_s, fc, quality = run(seed=seed)
        per_seed.append((fit_s, fc_s, quality))
    fit_s = float(np.median([p[0] for p in per_seed]))
    fc_s = float(np.median([p[1] for p in per_seed]))
    crps_seeds = [p[2]["log_crps"] for p in per_seed]
    cover_seeds = [p[2]["coverage90"] for p in per_seed]
    quality = {
        "log_crps": round(float(np.mean(crps_seeds)), 4),
        "log_crps_per_seed": crps_seeds,
        "coverage90": round(float(np.mean(cover_seeds)), 3),
        "coverage90_per_seed": cover_seeds,
    }
    # second-family gate: same operating point on the changepoint family
    # (shapes identical to the nhsn runs, so no extra compilation)
    cp_crps = []
    for seed in SEEDS:
        _, _, _, q2 = run(seed=seed, family=GATE2_FAMILY)
        cp_crps.append(q2["log_crps"])
    cp_median = float(np.median(cp_crps))
    gate2_ok = cp_median <= GATE2_MAX_MEDIAN_LOG_CRPS
    quality.update({
        "cp_family_log_crps_per_seed": cp_crps,
        "cp_family_log_crps_median": round(cp_median, 4),
    })

    gate_ok = (quality["log_crps"] <= GATE_MAX_LOG_CRPS
               and GATE_COVERAGE90[0] <= quality["coverage90"]
               <= GATE_COVERAGE90[1]
               and gate2_ok)
    total = fit_s + fc_s
    target = 60.0

    # MFU accounting (VERDICT r2 missing #3): XLA's own cost model on the
    # exact capacity-bucketed fit programs, vs measured fit wall-clock.
    # Computed after the timed runs; compilation hits the persistent cache.
    mfu_detail = {}
    try:
        import nowcastautogp_tpu as ngp
        from nowcastautogp_tpu.inference.schedule import linear_schedule
        from nowcastautogp_tpu.utils.flops import fit_cost_analysis, mfu

        schedule = linear_schedule(150, 0.1)
        flops, _ = fit_cost_analysis(
            P=200, config=ngp.GPConfig(max_depth=5), schedule=schedule,
            cap_full=160, n_mcmc=N_MCMC, n_hmc=N_HMC, n_leapfrog=N_LEAPFROG)
        mfu_detail = mfu(flops, fit_s)
    except Exception as e:  # cost model unavailable on some backends
        mfu_detail = {"mfu_error": type(e).__name__}

    print(json.dumps({
        "metric": "nhsn_200p_fit_plus_100x20_nowcast_forecast_wallclock",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(target / total, 3),
        "detail": {"fit_s": round(fit_s, 2), "nowcast_forecast_s": round(fc_s, 2),
                    "target_s": target, "n_mcmc": N_MCMC, "n_hmc": N_HMC,
                    "n_leapfrog": N_LEAPFROG,
                    "max_depth": 5, "n_seeds": len(SEEDS),
                    "scored_horizon_points": 8 * len(SEEDS),
                    "quality_gate_ok": gate_ok,
                    "gate_max_log_crps": GATE_MAX_LOG_CRPS,
                    "gate_coverage90": list(GATE_COVERAGE90),
                    "gate2_family": GATE2_FAMILY,
                    "gate2_max_median_log_crps": GATE2_MAX_MEDIAN_LOG_CRPS,
                    "gate2_ok": gate2_ok,
                    **quality, **mfu_detail},
    }))
    if not gate_ok:
        print(f"QUALITY GATE FAILED: log_crps {quality['log_crps']} "
              f"(max {GATE_MAX_LOG_CRPS}), coverage90 "
              f"{quality['coverage90']} (bounds {GATE_COVERAGE90}), "
              f"{GATE2_FAMILY} median {quality['cp_family_log_crps_median']} "
              f"(max {GATE2_MAX_MEDIAN_LOG_CRPS})",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
