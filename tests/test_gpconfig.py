"""GPConfig passthrough / customization contract.

Mirrors ``/root/reference/test/test_gpconfig.jl``: the config object is stored
by reference on the model (identity), custom structure distributions and
nested prior edits survive construction with siblings at defaults, and the
required ``n_mcmc``/``n_hmc`` pass-through raises when omitted.
"""

import copy
import datetime as dt

import numpy as np
import pytest

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.config import default_prior


def _data(n=12):
    dates = [dt.date(2024, 1, 1) + dt.timedelta(weeks=i) for i in range(n)]
    vals = np.exp(np.linspace(1, 2, n))
    return ngp.create_transformed_data(dates, vals, transformation=np.log)


class TestGPConfig:
    def test_config_stored_by_reference(self):
        cfg = ngp.GPConfig()
        model = ngp.make_and_fit_model(
            _data(), n_particles=1, config=cfg, n_mcmc=0, n_hmc=1, seed=0,
            smc_data_proportion=0.5,
        )
        assert model.config is cfg

    def test_custom_leaf_dist_and_changepoints(self):
        cfg = ngp.GPConfig(
            node_dist_leaf=[0.0, 0.5, 0.0, 0.0, 0.5], changepoints=False
        )
        assert cfg.node_dist_leaf == [0.0, 0.5, 0.0, 0.0, 0.5]
        assert cfg.changepoints is False
        model = ngp.make_and_fit_model(
            _data(), n_particles=2, config=cfg, n_mcmc=2, n_hmc=1, seed=1,
            smc_data_proportion=0.5,
        )
        assert model.config is cfg
        # only Linear (1) and Periodic (5) leaves can appear, no changepoints
        from nowcastautogp_tpu.models.structures import CP, GE, SE, CONST
        for t in model._host_types:
            assert not np.any(t == CP)
            assert not np.any(t == GE)
            assert not np.any(t == SE)
            assert not np.any(t == CONST)

    def test_nested_prior_edit_preserves_siblings(self):
        prior = copy.deepcopy(default_prior())
        prior["period"]["mu"] = float(np.log(1.0 / 3))
        cfg = ngp.GPConfig(prior=prior)
        assert cfg.prior["period"]["mu"] == pytest.approx(np.log(1.0 / 3))
        assert cfg.prior["gamma"] == ngp.GPConfig().prior["gamma"]
        assert cfg.prior["wildcard"] == ngp.GPConfig().prior["wildcard"]

    def test_replace_ergonomics(self):
        cfg = ngp.GPConfig()
        cfg2 = cfg.replace(changepoints=False)
        assert cfg2.changepoints is False
        assert cfg.changepoints is True
        assert cfg2.node_dist_leaf == cfg.node_dist_leaf

    def test_missing_n_mcmc_n_hmc_raises(self):
        with pytest.raises(TypeError):
            ngp.make_and_fit_model(_data(), n_particles=1)
        with pytest.raises(TypeError):
            ngp.make_and_fit_model(_data(), n_particles=1, n_mcmc=5)
        with pytest.raises(TypeError):
            ngp.make_and_fit_model(_data(), n_particles=1, n_hmc=5)

    def test_default_leaf_dist_matches_documented(self):
        # Constant and SquaredExponential have zero default mass
        d = ngp.GPConfig().node_dist_leaf
        assert d[0] == 0.0 and d[2] == 0.0
        assert d[1] == pytest.approx(1 / 3)

    def test_default_period_prior_normalized_time(self):
        # median period ~ 0.22 of the window
        mu = ngp.GPConfig().prior["period"]["mu"]
        assert np.exp(mu) == pytest.approx(0.22, abs=0.03)

    def test_validation(self):
        with pytest.raises(ValueError):
            ngp.GPConfig(node_dist_leaf=[1.0, 0.0])
        with pytest.raises(ValueError):
            ngp.GPConfig(prior={"gamma": {}})

    def test_fixed_noise(self):
        cfg = ngp.GPConfig(noise=0.01)
        model = ngp.make_and_fit_model(
            _data(), n_particles=1, config=cfg, n_mcmc=0, n_hmc=2, seed=0
        )
        # log-noise frozen at log(0.01)
        assert float(np.asarray(model._log_noise_d)[0]) == pytest.approx(
            np.log(0.01), abs=1e-5
        )
