"""Auxiliary subsystems: phase timers, disk checkpointing, diagnostics.

Covers SURVEY.md §5's TPU-build notes: per-phase timers around the SMC loop
and durable checkpoint/resume of full ensemble state.
"""

import datetime as dt

import numpy as np
import pytest

import nowcastautogp_tpu as ngp


def _dates(n, start=dt.date(2023, 1, 2)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(50)
    n = 30
    dates = _dates(n)
    obs = 60 * np.exp(0.01 * np.arange(n) + 0.1 * rng.standard_normal(n))
    data = ngp.create_transformed_data(dates, obs, transformation=np.log)
    ngp.reset_phases()
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=2
    )
    return model, dates


class TestPhaseTimers:
    def test_fit_records_phases(self, fitted):
        report = ngp.phase_report()
        # device engine: one fused phase; host engine: per-phase breakdown
        assert ("smc/device_fit" in report) or ("smc/reweight" in report)
        key = "smc/device_fit" if "smc/device_fit" in report else "smc/reweight"
        assert report[key]["seconds"] > 0
        assert report[key]["calls"] >= 1

    def test_reset(self, fitted):
        ngp.reset_phases()
        assert ngp.phase_report() == {}


class TestDiskCheckpoint:
    def test_save_load_round_trip(self, fitted, tmp_path):
        model, dates = fitted
        path = str(tmp_path / "model.npz")
        ngp.save_model(model, path)
        m2 = ngp.load_model(path)
        assert m2.num_particles == model.num_particles
        assert m2.n_ingested == model.n_ingested
        # full-state fidelity: every array/scalar in to_dict() survives the
        # disk round-trip (incl. hmc_eps_scale — the adapted HMC step sizes)
        d1, d2 = model.to_dict(), m2.to_dict()
        for k in ("y", "order", "n_ingested", "t0", "t_scale", "y_mean",
                  "y_std", "node_types", "params", "log_noise", "lml",
                  "log_weight", "hmc_eps_scale", "key"):
            np.testing.assert_allclose(
                np.asarray(d1[k], dtype=np.float64),
                np.asarray(d2[k], dtype=np.float64),
                rtol=1e-6, atol=0, err_msg=f"field {k!r} not preserved")
        assert d1["rng_state"] == d2["rng_state"]
        # config round-trips by value
        assert m2.config.node_dist_leaf == model.config.node_dist_leaf
        assert m2.config.prior == model.config.prior
        # resumed model predicts identically
        fdates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        p1 = ngp.predict_mvn(model, fdates)
        p2 = ngp.predict_mvn(m2, fdates)
        np.testing.assert_allclose(p1.means, p2.means, rtol=1e-5, atol=1e-5)

    def test_resumed_model_continues_inference(self, fitted, tmp_path):
        model, dates = fitted
        path = str(tmp_path / "model2.npz")
        ngp.save_model(model, path)
        m2 = ngp.load_model(path)
        new_dates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        ngp.add_data(m2, new_dates, [m2.y[-1], m2.y[-1]])
        ngp.mcmc_parameters(m2, 1)
        assert np.all(np.isfinite(np.asarray(m2._lml_d)))


class TestStructureDiagnostics:
    def test_structures_render(self, fitted):
        model, _ = fitted
        strs = model.structures()
        assert len(strs) == model.num_particles
        assert all(isinstance(s, str) and s for s in strs)


class TestFlopAccounting:
    def test_schedule_segments_bucketing(self):
        from nowcastautogp_tpu.inference.smc import schedule_segments

        # 150-week series at proportion 0.1 with the 32-granule bucketing:
        # caps bucket at 32/64/96/128/160
        from nowcastautogp_tpu.inference.schedule import linear_schedule

        sched = linear_schedule(150, 0.1)
        segs = schedule_segments(sched, 160)
        assert [c for c, _ in segs] == [32, 64, 96, 128, 160]
        assert sum(len(s) for _, s in segs) == len(sched)
        # every step fits its segment's capacity and exceeds the previous cap
        for cap, steps in segs:
            assert all(s <= cap for s in steps)
        assert segs[-1][1][-1] == 150

    def test_fit_cost_analysis_positive_and_scales(self):
        from nowcastautogp_tpu.utils.flops import fit_cost_analysis, mfu

        cfg = ngp.GPConfig(max_depth=3)
        f1, b1 = fit_cost_analysis(
            P=2, config=cfg, schedule=[32, 64], cap_full=64,
            n_mcmc=1, n_hmc=1, n_leapfrog=2)
        f2, _ = fit_cost_analysis(
            P=4, config=cfg, schedule=[32, 64], cap_full=64,
            n_mcmc=1, n_hmc=1, n_leapfrog=2)
        assert f1 > 0 and b1 > 0
        # doubling particles should grow FLOPs substantially (near 2x)
        assert f2 > 1.5 * f1
        out = mfu(f1, f1 / 1e12)  # 1 TFLOP/s exactly
        assert out["achieved_tflops_per_s"] == 1.0
        assert 0 <= out["mfu_vs_bf16_peak"] <= 1
