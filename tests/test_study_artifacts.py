"""Regression pins on the committed TPU study artifacts.

Three study result files back the claims the bench operating point rests
on (PLAN.md round-3 log); these tests pin their structure and the
conclusions' load-bearing facts so the claims cannot silently rot:

* ``tools/budget_study_results.json`` — 5 seeds x 2 families x 5 configs;
  the shipped bench config (200p, 14x5, leapfrog 5) must remain within
  one pooled standard deviation of canonical 24p-50x50 on each family.
* ``tools/depth_study_results.json`` — depth-5 vs depth-6 CRPS parity.
* ``tools/calibration_study_results.json`` — 20-seed empirical coverage;
  nominal-90 intervals must not UNDER-cover by more than 2 binomial se.
"""

import json
import os

import numpy as np

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load(name):
    with open(os.path.join(_TOOLS, name)) as f:
        return json.load(f)


class TestBudgetStudyArtifact:
    def test_structure(self):
        rows = _load("budget_study_results.json")
        fams = {r["family"] for r in rows}
        cfgs = {r["config"] for r in rows}
        assert {"nhsn_like", "seir_wave", "outbreak_cp"} <= fams
        assert {"canonical_24_50x50", "bench_200_14x5_lf5"} <= cfgs
        for fam in ("nhsn_like", "seir_wave", "outbreak_cp"):
            n = len([r for r in rows
                     if r["family"] == fam
                     and r["config"] == "canonical_24_50x50"])
            assert n >= 5, fam

    def test_shipped_config_matches_canonical_within_dispersion(self):
        # three families: the bench generator, the mechanistic SEIR waves,
        # and the round-4 outbreak+changepoint family (VERDICT r3 item 9 —
        # authored independently of the bench simulator)
        rows = _load("budget_study_results.json")
        for fam in ("nhsn_like", "seir_wave", "outbreak_cp"):
            canon = [r["log_crps"] for r in rows
                     if r["family"] == fam
                     and r["config"] == "canonical_24_50x50"]
            shipped = [r["log_crps"] for r in rows
                       if r["family"] == fam
                       and r["config"] == "bench_200_14x5_lf5"]
            gap = float(np.mean(shipped)) - float(np.mean(canon))
            spread = max(float(np.std(canon)), float(np.std(shipped)))
            assert gap <= spread, (fam, gap, spread)


class TestDepthStudyArtifact:
    def test_depth_cap_parity(self):
        rows = _load("depth_study_results.json")
        d5 = [r["log_crps"] for r in rows if r["depth_cap"] == 5]
        d6 = [r["log_crps"] for r in rows if r["depth_cap"] == 6]
        assert len(d5) >= 3 and len(d6) >= 3
        # the cap's cost claim: depth 6 does not improve CRPS beyond the
        # pooled seed spread
        spread = max(float(np.std(d5)), float(np.std(d6)), 1e-3)
        assert abs(float(np.mean(d6)) - float(np.mean(d5))) <= spread


class TestCalibrationStudyArtifact:
    def test_coverage_not_undercovering(self):
        rows = _load("calibration_study_results.json")
        assert len(rows) >= 20
        hits = [h for r in rows for h in r["hits"]["0.9"]]
        n = len(hits)
        emp = sum(hits) / n
        se = (0.9 * 0.1 / n) ** 0.5
        assert emp >= 0.9 - 2 * se, (emp, se)


class TestCanonicalStudyArtifact:
    """Pins the measured claim that the reference's DOCUMENTED fit budgets
    run inside (or straddling) the 60 s envelope on one v5e
    (tools/canonical_study.py; VERDICT r2 item 1's primary arm)."""

    def test_structure(self):
        res = _load("canonical_study_results.json")
        for cfg in ("200p_50x5_lf5", "24p_50x50_lf5", "24p_100x20_lf5"):
            assert cfg in res, cfg
            for row in res[cfg]:
                assert {"seed", "fit_s", "log_crps"} <= set(row)

    def test_nmcmc50_at_bench_ensemble_inside_envelope(self):
        res = _load("canonical_study_results.json")
        fits = [r["fit_s"] for r in res["200p_50x5_lf5"]]
        assert max(fits) < res.get("target_s", 60.0), fits

    def test_percentage_vignette_budget_inside_envelope(self):
        # use-percentages.jl:121-123 — n_particles=24, n_mcmc=100, n_hmc=20
        res = _load("canonical_study_results.json")
        fits = [r["fit_s"] for r in res["24p_100x20_lf5"]]
        assert max(fits) < res.get("target_s", 60.0), fits


class TestChangepointStudyArtifact:
    """tools/changepoint_study_results.json (VERDICT r3 item 4): the engine
    DISCOVERS changepoint structure end-to-end on regime-shift data, and
    enabling changepoints costs no forecast accuracy there."""

    def test_discovery_mass_and_gating(self):
        d = _load("changepoint_study_results.json")
        assert len(d["rows"]) >= 5
        # weight-weighted posterior CP mass appears when enabled...
        assert d["mean_cp_mass"] > 0.1, d
        assert all(r["cp_mass"] >= 0.0 for r in d["rows"])
        # ...and is airtight-gated off when disabled
        assert d["mean_nocp_mass"] == 0.0, d

    def test_no_accuracy_cost(self):
        d = _load("changepoint_study_results.json")
        assert d["mean_cp_log_crps"] <= 1.1 * d["mean_nocp_log_crps"], d


class TestDailyBenchArtifact:
    """tools/daily_bench_results.json (VERDICT r3 item 5): committed
    end-to-end daily-cadence wall-clock + quality with bench-style gates —
    the tiled-covariance / MXU-Cholesky regime measured as a workload,
    not just microbenches."""

    def test_gates_and_structure(self):
        d = _load("daily_bench_results.json")
        for cfg in ("daily_24p", "daily_200p"):
            assert d[cfg]["gate_ok"], (cfg, d[cfg])
            assert len(d[cfg]["rows"]) >= 3
            assert d[cfg]["mean_log_crps"] <= d["gate_max_log_crps"]

    def test_daily_fits_are_fast(self):
        # the committed perf claims future rounds regress against: a
        # 560-day x 24-particle fit in single-digit seconds, 200 particles
        # inside the 60 s envelope
        d = _load("daily_bench_results.json")
        assert d["daily_24p"]["median_fit_s"] < 15.0
        assert d["daily_200p"]["median_fit_s"] < 60.0


class TestLatencyFloorArtifact:
    """tools/latency_floor_results.json (VERDICT r3 item 3's
    'state what binds' arm): every measured canonical fit lands between
    its duplicated-population floor and diverse-population chain cost —
    the fit IS its sequential gradient-evaluation chain."""

    def test_measured_inside_bracket(self):
        d = _load("latency_floor_results.json")
        for cfg in ("24p_50x50_lf5", "24p_100x20_lf5"):
            c = d["configs"][cfg]
            assert c["measured_inside_bracket"], (cfg, c)
            assert c["floor_s"] <= c["measured_median_s"] <= (
                c["diverse_chain_s"] * 1.1)

    def test_bench_config_at_its_chain_bound(self):
        # the flagship claim: nothing left between the engine and the
        # sequential chain's latency at the bench operating point
        c = _load("latency_floor_results.json")["configs"]["200p_14x5_lf5"]
        assert c["diverse_chain_s"] <= 15.0, c

    def test_adaptive_per_sweep_floor(self):
        c = _load("latency_floor_results.json")["configs"][
            "32p_200x50_adaptive_lf5"]
        assert c["all_steps_numbers_are_upper_bounds"]
        assert c["per_sweep_floor_s"] > 20.0  # one sweep alone ~0.5 min


class TestRooflineArtifact:
    """tools/roofline_results.json (VERDICT r3 weak #6): the cost-model-
    independent evidence that the fused kernel is compute-bound."""

    def test_compute_bound_not_bandwidth_bound(self):
        d = _load("roofline_results.json")
        assert d["measured"]["fused_vgrad_eval_s"] < 0.02
        # HBM floor orders of magnitude below the eval
        assert d["ratios"]["vs_hbm_floor"] > 100
        # within a small single-digit multiple of a per-element
        # transcendental pipeline through the same stack
        assert d["ratios"]["vs_transcendental_floor"] < 8
