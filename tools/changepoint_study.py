"""Changepoint-discovery study (VERDICT r3 item 4).

The ChangePoint kernel, the CP moves of the involutive sampler, and the
``changepoints=False`` gating are unit-tested; this study demonstrates the
END-TO-END payoff: on regime-shift data (level + trend break, the CP
composition language of ``/root/reference/docs/vignettes/
setting-priors.jl:17-21``) the engine *discovers* CP structure —
weight-weighted posterior CP-node mass — and the CP-enabled fit forecasts
at least as well as a matched ``changepoints=False`` fit.

Protocol per seed: 110 weekly points with a mid-series break (level jump +
slope reversal), fit at the bench operating point with
``changepoints=True`` (default) and ``changepoints=False``, forecast the
8-week horizon with 2000 draws, record CP mass + log-scale CRPS for both.

Writes ``tools/changepoint_study_results.json``.  Run on the TPU:

    python tools/changepoint_study.py [--seeds 5]
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


def regime_shift(n, seed):
    """Weekly counts with a hard mid-series regime break: an upward level
    jump and a growth->decline slope reversal (outbreak peak + control
    measures), multiplicative noise."""
    rng = np.random.default_rng(seed + 60_000)
    t = np.arange(n)
    t_cp = n // 2 + int(rng.integers(-5, 6))
    level = np.where(t < t_cp, 4.0, 4.0 + rng.uniform(0.6, 1.1))
    slope = np.where(t < t_cp, rng.uniform(0.002, 0.008),
                     -rng.uniform(0.015, 0.03)) * (t - t_cp)
    y = level + slope + 0.08 * rng.standard_normal(n)
    return np.exp(y), t_cp


def sharp_break(n, seed):
    """Sharp-break family (VERDICT r4 item 6): the CPU payoff test's regime
    (tests/test_statistical.py TestChangepointRecovery._regime_shift — a
    2.0 log-level jump with growth->decline reversal, far sharper than
    :func:`regime_shift`'s 0.6-1.1 jump), with the break LATE in training
    (12 +- 4 weeks before the forecast origin) so the horizon must
    extrapolate the new regime — the setting where smooth kernels fail
    and CP structure can pay off at TPU scale."""
    rng = np.random.default_rng(seed + 61_000)
    t = np.arange(n)
    t_cp = n - 8 - 12 + int(rng.integers(-4, 5))
    level = np.where(t < t_cp, 4.0, 6.0)
    slope = np.where(t < t_cp, 0.004, -0.03) * (t - t_cp)
    y = level + slope + 0.05 * rng.standard_normal(n)
    return np.exp(y), t_cp


FAMILIES = {"regime_shift": regime_shift, "sharp_break": sharp_break}


def cp_mass(model) -> float:
    """Weight-weighted posterior fraction of particles with a CP node."""
    from nowcastautogp_tpu.models.structures import CP

    w = np.exp(model.log_weight - model.log_weight.max())
    w /= w.sum()
    has_cp = np.array(
        [np.any(tt == CP) for tt in model._host_types], dtype=float)
    return float((w * has_cp).sum())


def run_one(seed, n_train=110, horizon=8, draws=2000, n_particles=200,
            n_mcmc=14, n_hmc=5, family="regime_shift"):
    import nowcastautogp_tpu as ngp

    n = n_train + horizon
    obs, t_cp = FAMILIES[family](n, seed)
    dates = [dt.date(2022, 1, 3) + dt.timedelta(weeks=i) for i in range(n)]
    data = ngp.create_transformed_data(
        dates[:n_train], obs[:n_train], transformation=np.log)
    out = {"seed": seed, "t_cp": int(t_cp)}
    for label, cps in (("cp", True), ("nocp", False)):
        t0 = time.time()
        model = ngp.make_and_fit_model(
            data, n_particles=n_particles, smc_data_proportion=0.1,
            n_mcmc=n_mcmc, n_hmc=n_hmc, seed=100 + seed,
            config=ngp.GPConfig(max_depth=5, changepoints=cps),
        )
        fit_s = time.time() - t0
        # identity inverse: forecasts stay on the (log) modeling scale, so
        # score them directly against the log truth
        fc = ngp.forecast(model, dates[n_train:], draws,
                          inv_transformation=lambda y: y)
        crps = float(ngp.crps_matrix(fc, np.log(obs[n_train:])).mean())
        out[f"{label}_mass"] = round(cp_mass(model), 3)
        out[f"{label}_log_crps"] = round(crps, 4)
        out[f"{label}_fit_s"] = round(fit_s, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--family", default="regime_shift",
                    choices=list(FAMILIES))
    ap.add_argument("--horizon", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "changepoint_study_results.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ngp_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    rows_key = "rows" if args.family == "regime_shift" else (
        "rows_" + args.family)
    rows = existing.get(rows_key, [])
    done = {r["seed"] for r in rows}
    summary = dict(existing)
    for seed in range(args.seeds):
        if seed in done:
            continue
        r = run_one(seed, family=args.family, horizon=args.horizon)
        rows.append(r)
        print(json.dumps(r), flush=True)
        prefix = "" if args.family == "regime_shift" else args.family + "_"
        summary[rows_key] = rows
        summary.setdefault(
            "workload", "110wk regime shift, 200p 14x5 fit, 8wk horizon")
        summary.update({
            prefix + "mean_cp_mass": round(float(np.mean(
                [r["cp_mass"] for r in rows])), 3),
            prefix + "mean_nocp_mass": round(float(np.mean(
                [r["nocp_mass"] for r in rows])), 3),
            prefix + "mean_cp_log_crps": round(float(np.mean(
                [r["cp_log_crps"] for r in rows])), 4),
            prefix + "mean_nocp_log_crps": round(float(np.mean(
                [r["nocp_log_crps"] for r in rows])), 4),
        })
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
