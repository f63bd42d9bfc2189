"""Engine-level tests: schedules, resampling/ESS, add_data, serialization.

Covers the AutoGP-surface behaviors the reference exercises through its
engine dependency (SURVEY.md §2.3): ``linear_schedule`` batching,
ESS-gated resampling (``maybe_resample!`` semantics), incremental
``add_data`` reweighting, ``Dict(model)``/``GPModel(dict)`` round-trips, and
HMC improving fit on the standardized scale.
"""

import datetime as dt

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.inference.resample import ess, resample_indices
from nowcastautogp_tpu.inference.schedule import linear_schedule


def _dates(n, start=dt.date(2023, 1, 2)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


class TestSchedule:
    def test_linear_schedule(self):
        assert linear_schedule(10, 0.3) == [3, 6, 9, 10]
        assert linear_schedule(10, 0.5) == [5, 10]
        assert linear_schedule(10, 1.0) == [10]
        assert linear_schedule(5, 0.01) == [1, 2, 3, 4, 5]
        assert linear_schedule(0, 0.5) == []

    def test_always_ends_at_n(self):
        for n in (7, 13, 100):
            for p in (0.1, 0.33, 0.8):
                s = linear_schedule(n, p)
                assert s[-1] == n
                assert all(b > a for a, b in zip(s, s[1:]))


class TestResampling:
    def test_ess_uniform(self):
        assert ess(np.zeros(8)) == pytest.approx(8.0)

    def test_ess_degenerate(self):
        lw = np.full(8, -np.inf)
        lw[0] = 0.0
        lw[np.isneginf(lw)] = -1e9
        assert ess(lw) == pytest.approx(1.0)

    @pytest.mark.parametrize("method", ["systematic", "multinomial", "residual"])
    def test_resample_distribution(self, method):
        rng = np.random.default_rng(0)
        lw = np.log(np.array([0.5, 0.25, 0.125, 0.125]) )
        counts = np.zeros(4)
        for _ in range(300):
            idx = resample_indices(rng, lw, method)
            assert idx.shape == (4,)
            counts += np.bincount(idx, minlength=4)
        freq = counts / counts.sum()
        np.testing.assert_allclose(freq, [0.5, 0.25, 0.125, 0.125], atol=0.05)


@pytest.fixture(scope="module")
def small_model():
    rng = np.random.default_rng(33)
    n = 30
    dates = _dates(n)
    obs = 40 * np.exp(0.02 * np.arange(n) + 0.1 * rng.standard_normal(n))
    data = ngp.create_transformed_data(dates, obs, transformation=np.log)
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=17
    )
    return model, dates, obs


class TestAddData:
    def test_add_data_conditions(self, small_model):
        model, dates, obs = small_model
        m2 = ngp.GPModel(model.to_dict())
        n0 = m2.n_ingested
        new_dates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        ngp.add_data(m2, new_dates, np.log(np.array([obs[-1], obs[-1]])))
        assert m2.n_ingested == n0 + 2
        assert len(m2.y) == len(obs) + 2
        assert np.all(np.isfinite(m2.log_weight))

    def test_add_data_shifts_posterior(self, small_model):
        # adding a large jump should pull predictions upward
        model, dates, obs = small_model
        test_dates = _dates(1, start=dates[-1] + dt.timedelta(weeks=3))
        base_pred = ngp.predict_mvn(ngp.GPModel(model.to_dict()), test_dates).mean()
        m2 = ngp.GPModel(model.to_dict())
        new_dates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        ngp.add_data(m2, new_dates, np.log(np.array([obs[-1] * 3, obs[-1] * 3])))
        up_pred = ngp.predict_mvn(m2, test_dates).mean()
        assert up_pred[0] > base_pred[0]

    def test_add_data_on_partially_ingested_model(self, small_model):
        # add_data before full ingestion must splice the new rows into the
        # ingestion order at n_ingested so the extended mask covers exactly
        # the new block, not old not-yet-ingested shuffled rows
        model, dates, obs = small_model
        m2 = ngp.GPModel(model.to_dict())
        # roll back to a partially-ingested state with a shuffled order
        m2.n_ingested = 10
        rng = np.random.default_rng(0)
        m2._order = rng.permutation(len(m2.y)).astype(np.int64)
        m2._push_data()
        ingested_before = list(m2._order[:10])
        n_old = len(m2.y)
        new_dates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        ngp.add_data(m2, new_dates, np.log(np.array([obs[-1], obs[-1]])))
        assert m2.n_ingested == 12
        # positions 10..11 of the ingestion order are exactly the new rows
        np.testing.assert_array_equal(m2._order[10:12], [n_old, n_old + 1])
        # previously-ingested prefix untouched; remaining rows preserved
        assert list(m2._order[:10]) == ingested_before
        assert sorted(m2._order) == list(range(n_old + 2))

    def test_maybe_resample(self, small_model):
        model, dates, obs = small_model
        m2 = ngp.GPModel(model.to_dict())
        m2.log_weight = np.array([0.0, -50.0])  # degenerate weights
        did = ngp.maybe_resample(m2, 1.5)
        assert did
        assert np.all(m2.log_weight == 0.0)
        # both particles now copies of the high-weight one
        assert np.array_equal(m2._host_types[0], m2._host_types[1])

    def test_maybe_resample_zero_threshold(self, small_model):
        model, _, _ = small_model
        m2 = ngp.GPModel(model.to_dict())
        assert not ngp.maybe_resample(m2, 0.0)


class TestSerialization:
    def test_round_trip(self, small_model):
        model, dates, obs = small_model
        d = model.to_dict()
        m2 = ngp.GPModel(d)
        assert m2.config is model.config  # config by reference through dict
        assert m2.num_particles == model.num_particles
        np.testing.assert_array_equal(m2._host_types, model._host_types)
        np.testing.assert_allclose(
            np.asarray(m2._params_d), np.asarray(model._params_d)
        )
        # identical predictions
        fdates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        p1 = ngp.predict_mvn(model, fdates)
        p2 = ngp.predict_mvn(m2, fdates)
        np.testing.assert_allclose(p1.means, p2.means, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(p1.covs, p2.covs, rtol=1e-4, atol=1e-5)

    def test_deepcopy_isolation(self, small_model):
        import copy

        model, dates, obs = small_model
        m2 = ngp.GPModel(copy.deepcopy(model.to_dict()))
        ngp.mcmc_parameters(m2, 1)  # mutates copy only
        assert not np.allclose(
            np.asarray(m2._params_d), np.asarray(model._params_d)
        )


class TestRejuvenation:
    def test_mcmc_structure_changes_some_trees(self, small_model):
        model, _, _ = small_model
        m2 = ngp.GPModel(model.to_dict())
        before = m2._host_types.copy()
        total_acc = 0.0
        for _ in range(3):
            total_acc += ngp.mcmc_structure(m2, 3, 1)
        # acceptance statistics are finite and within [0, 1]
        assert 0.0 <= total_acc / 3 <= 1.0

    def test_mcmc_parameters_moves_params(self, small_model):
        model, _, _ = small_model
        m2 = ngp.GPModel(model.to_dict())
        before = np.asarray(m2._params_d).copy()
        rate = ngp.mcmc_parameters(m2, 3)
        assert 0.0 <= rate <= 1.0
        assert not np.allclose(np.asarray(m2._params_d), before)
