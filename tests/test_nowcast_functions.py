"""Nowcast scenario construction + nowcast-conditioned forecasting.

Mirrors ``/root/reference/test/test_nowcast_functions.jl``: vector/matrix
method equivalence, transformation application with originals preserved,
error conditions, output shape ``(n_dates, n_scenarios x draws)``, the
MCMC/HMC refinement option matrix, the resampling path, assertion
violations, base-model immutability, and the full matrix -> scenarios ->
forecast workflow.  Both the batched (shared scenario dates) and serial
(heterogeneous dates) device paths are exercised.
"""

import datetime as dt

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import nowcastautogp_tpu as ngp


def _dates(n, start=dt.date(2023, 1, 2)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


@pytest.fixture(scope="module")
def base():
    rng = np.random.default_rng(21)
    n = 38
    dates = _dates(n)
    obs = 80 * np.exp(0.01 * np.arange(n) + 0.1 * rng.standard_normal(n))
    fwd, inv = ngp.get_transformations("positive", obs)
    data = ngp.create_transformed_data(dates, obs, transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=9
    )
    nc_dates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
    f_dates = _dates(3, start=nc_dates[-1] + dt.timedelta(weeks=1))
    return model, fwd, inv, obs, nc_dates, f_dates


class TestCreateNowcastData:
    def test_vector_method(self):
        nowcasts = [[10.5, 11.2, 12.1], [9.8, 10.9, 11.5]]
        dates = _dates(3)
        out = ngp.create_nowcast_data(nowcasts, dates, transformation=np.log)
        assert len(out) == 2
        assert isinstance(out[0], ngp.TData)
        np.testing.assert_allclose(out[0].y, np.log(nowcasts[0]))
        np.testing.assert_allclose(out[0].values, nowcasts[0])

    def test_matrix_method_equivalent(self):
        dates = _dates(3)
        mat = np.array([[10.5, 9.8], [11.2, 10.9], [12.1, 11.5]])  # cols = scenarios
        out_m = ngp.create_nowcast_data(mat, dates, transformation=np.log)
        out_v = ngp.create_nowcast_data(
            [mat[:, 0], mat[:, 1]], dates, transformation=np.log
        )
        assert len(out_m) == len(out_v) == 2
        for a, b in zip(out_m, out_v):
            np.testing.assert_array_equal(a.y, b.y)
            np.testing.assert_array_equal(a.values, b.values)

    def test_default_identity_transformation(self):
        dates = _dates(2)
        out = ngp.create_nowcast_data([[1.0, 2.0]], dates)
        np.testing.assert_array_equal(out[0].y, out[0].values)

    def test_errors(self):
        dates = _dates(3)
        with pytest.raises(AssertionError):
            ngp.create_nowcast_data([], dates)
        with pytest.raises(AssertionError):
            ngp.create_nowcast_data([[1.0, 2.0]], dates)  # wrong length
        with pytest.raises(AssertionError):
            ngp.create_nowcast_data([[1.0, 2.0, 3.0], [1.0]], dates)


class TestForecastWithNowcasts:
    def _scenarios(self, base, n_scen=3):
        model, fwd, inv, obs, nc_dates, f_dates = base
        rng = np.random.default_rng(5)
        draws = obs[-2:] * rng.lognormal(0.0, 0.05, size=(n_scen, 2))
        return ngp.create_nowcast_data(list(draws), nc_dates, transformation=fwd)

    def test_output_shape(self, base):
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 3)
        fc = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 4, inv_transformation=inv
        )
        assert fc.shape == (3, 12)
        assert np.all(np.isfinite(fc))
        assert np.all(fc >= 0)

    @pytest.mark.parametrize(
        "opts",
        [
            dict(n_mcmc=0, n_hmc=0),
            dict(n_mcmc=0, n_hmc=2),
            dict(n_mcmc=2, n_hmc=2),
            dict(n_mcmc=0, n_hmc=0, forecast_n_hmc=1),
            dict(n_mcmc=0, n_hmc=2, ess_threshold=0.75),
        ],
    )
    def test_option_matrix(self, base, opts):
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 2)
        fc = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 3, inv_transformation=inv, **opts
        )
        assert fc.shape == (3, 6)
        assert np.all(np.isfinite(fc))

    def test_base_model_not_mutated(self, base):
        model, fwd, inv, obs, nc_dates, f_dates = base
        before = model.to_dict()
        ncs = self._scenarios(base, 2)
        ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 2, inv_transformation=inv, n_mcmc=1, n_hmc=1,
            ess_threshold=0.5,
        )
        after = model.to_dict()
        for k in ("node_types", "params", "log_noise", "log_weight", "y",
                  "order", "n_ingested"):
            np.testing.assert_array_equal(np.asarray(before[k]), np.asarray(after[k]))
        # the contract is STRICT (reference src/forecasting.jl:128-133):
        # scenario randomness is derived by hashing, not advancing, the
        # base state — RNG and JAX key must be bit-identical too
        assert before["rng_state"] == after["rng_state"]
        np.testing.assert_array_equal(before["key"], after["key"])

    def test_repeat_call_reproduces(self, base):
        """With a pure (non-advancing) randomness derivation, an identical
        repeated call reproduces identical draws."""
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 2)
        kw = dict(inv_transformation=inv, n_mcmc=0, n_hmc=1)
        fc1 = ngp.forecast_with_nowcasts(model, ncs, f_dates, 2, **kw)
        fc2 = ngp.forecast_with_nowcasts(model, ncs, f_dates, 2, **kw)
        np.testing.assert_array_equal(fc1, fc2)

    def test_draw_seed_gives_fresh_independent_draws(self, base):
        """``draw_seed`` (advisor r4): a caller accumulating Monte Carlo
        draws across repeated identical calls can request fresh streams —
        distinct seeds differ, equal seeds reproduce, and the base model
        stays bit-identical."""
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 2)
        before = model.to_dict()
        for kw in (dict(n_mcmc=0, n_hmc=0),           # shared-chol path
                   dict(n_mcmc=0, n_hmc=1)):          # batched path
            kw = dict(inv_transformation=inv, **kw)
            a1 = ngp.forecast_with_nowcasts(
                model, ncs, f_dates, 2, draw_seed=1, **kw)
            a1b = ngp.forecast_with_nowcasts(
                model, ncs, f_dates, 2, draw_seed=1, **kw)
            a2 = ngp.forecast_with_nowcasts(
                model, ncs, f_dates, 2, draw_seed=2, **kw)
            np.testing.assert_array_equal(a1, a1b)
            assert not np.array_equal(a1, a2)
        # serial path (heterogeneous dates)
        hetero = [
            ngp.create_transformed_data(
                nc_dates[:1 + i], obs[-1] * np.ones(1 + i) * 1.01,
                transformation=fwd)
            for i in range(2)
        ]
        s1 = ngp.forecast_with_nowcasts(
            model, hetero, f_dates, 2, inv_transformation=inv, draw_seed=1)
        s2 = ngp.forecast_with_nowcasts(
            model, hetero, f_dates, 2, inv_transformation=inv, draw_seed=2)
        assert not np.array_equal(s1, s2)
        after = model.to_dict()
        assert before["rng_state"] == after["rng_state"]

    def test_assertion_violations(self, base):
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 2)
        with pytest.raises(AssertionError):
            ngp.forecast_with_nowcasts(model, [], f_dates, 2)
        with pytest.raises(AssertionError):
            ngp.forecast_with_nowcasts(model, ncs, f_dates, 2, n_mcmc=2, n_hmc=0)
        with pytest.raises(AssertionError):
            ngp.forecast_with_nowcasts(model, ncs, f_dates, 2, ess_threshold=1.5)
        with pytest.raises(AssertionError):
            ngp.forecast_with_nowcasts(model, ncs, f_dates, 2, forecast_n_hmc=0)

    def test_serial_path_heterogeneous_dates(self, base):
        model, fwd, inv, obs, nc_dates, f_dates = base
        # scenarios with different date axes -> serial fallback
        nc1 = ngp.create_transformed_data(
            nc_dates, obs[-2:] * 1.01, transformation=fwd
        )
        nc2 = ngp.create_transformed_data(
            [nc_dates[0]], obs[-1:] * 0.98, transformation=fwd
        )
        fc = ngp.forecast_with_nowcasts(
            model, [nc1, nc2], f_dates, 2, inv_transformation=inv, n_hmc=1
        )
        assert fc.shape == (3, 4)
        assert np.all(np.isfinite(fc))

    def test_batched_matches_serial_distribution(self, base):
        # same scenario set through both paths: medians should land close
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 3)
        from nowcastautogp_tpu.nowcast import (
            _forecast_with_nowcasts_batched, _forecast_with_nowcasts_serial,
        )
        kw = dict(inv_transformation=inv, n_mcmc=0, n_hmc=0,
                  ess_threshold=0.0, forecast_n_hmc=None, verbose=False)
        fb = _forecast_with_nowcasts_batched(model, ncs, f_dates, 60, **kw)
        fs = _forecast_with_nowcasts_serial(model, ncs, f_dates, 60, **kw)
        assert fb.shape == fs.shape == (3, 180)
        mb, ms = np.median(fb), np.median(fs)
        assert abs(np.log(mb / ms)) < 0.35  # same distribution, loose check

    @pytest.mark.parametrize("opts", [
        dict(n_mcmc=0, n_hmc=1),
        dict(n_mcmc=1, n_hmc=1),
        dict(forecast_n_hmc=1),
    ])
    def test_mesh_scenario_axis_matches_unsharded(self, base, opts):
        """VERDICT r4 item 5: ``forecast_with_nowcasts(mesh=)`` shards the
        flattened scenario x particle rows; the sharded refresh paths must
        match the unsharded ones distributionally (RNG streams differ by
        the per-shard key fold, so the check is distribution-level)."""
        from nowcastautogp_tpu.parallel.sharding import make_mesh

        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 8)  # divides the 8-device mesh
        kw = dict(inv_transformation=inv, **opts)
        f0 = ngp.forecast_with_nowcasts(model, ncs, f_dates, 25, **kw)
        fm = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 25, mesh=make_mesh(8), **kw)
        assert fm.shape == f0.shape == (len(f_dates), 8 * 25)
        assert np.all(np.isfinite(fm))
        assert abs(np.log(np.median(fm) / np.median(f0))) < 0.35

    def test_mesh_scenario_axis_nondivisible_padded(self, base):
        """Scenario counts that don't divide the mesh are padded to the
        next multiple and trimmed — no silent slow path, right shape."""
        from nowcastautogp_tpu.parallel.sharding import make_mesh

        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 5)
        fm = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 4, inv_transformation=inv, n_hmc=1,
            mesh=make_mesh(8))
        assert fm.shape == (len(f_dates), 5 * 4)
        assert np.all(np.isfinite(fm))

    def test_shared_chol_matches_serial_distribution(self, base):
        # the no-refresh public path routes through the per-particle
        # shared-Cholesky program; it must sample the same mixture as the
        # reference-shaped serial path
        model, fwd, inv, obs, nc_dates, f_dates = base
        ncs = self._scenarios(base, 3)
        from nowcastautogp_tpu.nowcast import _forecast_with_nowcasts_serial

        fb = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 60, inv_transformation=inv,
            ess_threshold=0.5)
        fs = _forecast_with_nowcasts_serial(
            model, ncs, f_dates, 60, inv_transformation=inv, n_mcmc=0,
            n_hmc=0, ess_threshold=0.5, forecast_n_hmc=None, verbose=False)
        assert fb.shape == fs.shape == (3, 180)
        mb, ms = np.median(fb), np.median(fs)
        assert abs(np.log(mb / ms)) < 0.35, (mb, ms)

    def test_full_workflow_matrix_to_forecast(self, base):
        model, fwd, inv, obs, nc_dates, f_dates = base
        rng = np.random.default_rng(3)
        mat = obs[-2:, None] * rng.lognormal(0.0, 0.05, size=(2, 4))  # 4 scenarios
        ncs = ngp.create_nowcast_data(mat, nc_dates, transformation=fwd)
        fc = ngp.forecast_with_nowcasts(
            model, ncs, f_dates, 2, inv_transformation=inv, n_hmc=1,
            ess_threshold=0.5,
        )
        assert fc.shape == (3, 8)
        qs = ngp.crps_matrix(fc, np.median(fc, axis=1))
        assert np.all(np.isfinite(qs))
