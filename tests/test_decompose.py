"""Posterior kernel decomposition (models/decompose.py)."""

import datetime as dt

import numpy as np

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.decompose import (
    _component_roots, _extract_subtree, decompose,
)
from nowcastautogp_tpu.models.structures import (
    CONST, CP, EMPTY, LINEAR, PERIODIC, PLUS, SE, TIMES, structure_to_str,
)


def _heap(entries, n=31):
    t = np.zeros(n, dtype=np.int32)
    for i, v in entries.items():
        t[i] = v
    return t


class TestComponentRoots:
    def test_leaf_tree_is_one_component(self):
        assert _component_roots(_heap({0: LINEAR})) == [0]

    def test_plus_splits(self):
        t = _heap({0: PLUS, 1: LINEAR, 2: PERIODIC})
        assert _component_roots(t) == [1, 2]

    def test_nested_plus_flattens(self):
        # (Linear + (SE + Periodic)) -> three addends
        t = _heap({0: PLUS, 1: LINEAR, 2: PLUS, 5: SE, 6: PERIODIC})
        assert _component_roots(t) == [1, 5, 6]

    def test_times_stays_atomic(self):
        # (Linear x Periodic) + Const -> two addends, product intact
        t = _heap({0: PLUS, 1: TIMES, 2: CONST, 3: LINEAR, 4: PERIODIC})
        assert _component_roots(t) == [1, 2]

    def test_changepoint_stays_atomic(self):
        # CP(SE; Periodic) + Linear -> the changepoint is one component
        # (a CP is not additive: it gates its children by location)
        t = _heap({0: PLUS, 1: CP, 2: LINEAR, 3: SE, 4: PERIODIC})
        assert _component_roots(t) == [1, 2]

    def test_deepest_level_plus_does_not_overflow(self):
        # a (corrupt/hand-built) PLUS in the deepest heap level must not
        # index past the buffer; its out-of-range children are skipped
        t = _heap({0: PLUS, 1: SE, 2: PLUS, 5: LINEAR, 6: PLUS}, n=7)
        assert _component_roots(t) == [1, 5]

    def test_empty_child_of_plus_is_skipped(self):
        t = _heap({0: PLUS, 1: SE})  # slot 2 EMPTY
        assert _component_roots(t) == [1]


class TestExtractSubtree:
    def test_extracts_product_to_root(self):
        t = _heap({0: PLUS, 1: TIMES, 2: CONST, 3: LINEAR, 4: PERIODIC})
        p = np.arange(31 * 3, dtype=np.float32).reshape(31, 3)
        t2, p2 = _extract_subtree(t, p, 1)
        assert structure_to_str(t2) == structure_to_str(t, root=1)
        # params follow their nodes: root gets slot-1 params, children 3/4 -> 1/2
        np.testing.assert_array_equal(p2[0], p[1])
        np.testing.assert_array_equal(p2[1], p[3])
        np.testing.assert_array_equal(p2[2], p[4])
        assert t2[5] == EMPTY and t2[6] == EMPTY


class TestDecomposePosterior:
    def _model(self, seed=2):
        rng = np.random.default_rng(seed)
        n = 40
        dates = [dt.date(2023, 1, 2) + dt.timedelta(weeks=i)
                 for i in range(n)]
        tt = np.arange(n)
        obs = 40 + 0.5 * tt + 6 * np.sin(2 * np.pi * tt / 13) \
            + rng.standard_normal(n)
        data = ngp.create_transformed_data(dates, obs)
        model = ngp.make_and_fit_model(
            data, n_particles=3, smc_data_proportion=0.34, n_mcmc=2,
            n_hmc=2, seed=seed)
        fdates = [dates[-1] + dt.timedelta(weeks=i + 1) for i in range(4)]
        return model, fdates

    def test_components_sum_to_noise_free_mean(self):
        model, fdates = self._model()
        dec = decompose(model, fdates)
        mix = ngp.predict_mvn(model, fdates, include_noise=False)
        assert len(dec) == model.num_particles
        np.testing.assert_allclose(
            sum(d["weight"] for d in dec), 1.0, rtol=1e-6)
        for p, d in enumerate(dec):
            total = model._y_mean + sum(c["mean"] for c in d["components"])
            np.testing.assert_allclose(total, mix.means[p],
                                       rtol=1e-4, atol=1e-3)
            for c in d["components"]:
                assert np.all(np.isfinite(c["var"])) and np.all(c["var"] >= 0)
                assert isinstance(c["structure"], str) and c["structure"]

    def test_component_count_matches_structure(self):
        model, fdates = self._model()
        dec = decompose(model, fdates)
        for d, t in zip(dec, model._host_types):
            assert len(d["components"]) == len(_component_roots(np.asarray(t)))

    def test_broken_particle_flagged_not_nan(self):
        # blow one particle's amplitude far past f32 range: its covariance
        # Cholesky is NaN; decompose must flag it instead of emitting NaNs
        model, fdates = self._model()
        params = np.asarray(model._params_d).copy()
        params[0, :, :] = 200.0  # exp(200) overflows f32 -> non-finite A
        import jax.numpy as jnp
        model._params_d = jnp.asarray(params)
        dec = decompose(model, fdates)
        assert dec[0].get("broken") is True
        assert dec[0]["components"] == []
        for d in dec[1:]:
            assert "broken" not in d
            for c in d["components"]:
                assert np.all(np.isfinite(c["mean"]))
