"""Evaluation utilities: CRPS estimator, quantile aggregation.

The CRPS estimator must match the reference vignette's fair-ensemble form
(mean over the n(n-1)/2 DISTINCT ordered pairs,
``/root/reference/docs/vignettes/getting-started.jl:689-702``).
"""

import itertools

import numpy as np

from nowcastautogp_tpu.eval.crps import crps_ensemble, crps_matrix, quantile_matrix


def _crps_bruteforce(y, xs):
    """Direct transcription of the vignette estimator (distinct pairs)."""
    xs = np.asarray(xs, dtype=np.float64)
    term1 = np.abs(xs - y).mean()
    diffs = [abs(a - b) for a, b in itertools.combinations(xs, 2)]
    term2 = np.mean(diffs)
    return term1 - 0.5 * term2


class TestCRPS:
    def test_matches_distinct_pairs_bruteforce(self):
        rng = np.random.default_rng(7)
        for n in (2, 3, 5, 20):
            xs = rng.standard_normal(n) * 3 + 1
            y = rng.standard_normal() * 2
            np.testing.assert_allclose(
                crps_ensemble(xs, y), _crps_bruteforce(y, xs), rtol=1e-12
            )

    def test_perfect_point_forecast_is_zero(self):
        xs = np.full(50, 3.25)
        assert crps_ensemble(xs, 3.25) == 0.0

    def test_single_draw_is_absolute_error(self):
        assert crps_ensemble(np.array([5.0]), 3.0) == 2.0

    def test_sharper_ensemble_scores_better(self):
        rng = np.random.default_rng(11)
        sharp = rng.normal(0, 0.5, 400)
        wide = rng.normal(0, 3.0, 400)
        assert crps_ensemble(sharp, 0.0) < crps_ensemble(wide, 0.0)

    def test_matrix_rowwise(self):
        rng = np.random.default_rng(3)
        fc = rng.standard_normal((4, 30))
        obs = rng.standard_normal(4)
        rows = crps_matrix(fc, obs)
        assert rows.shape == (4,)
        for i in range(4):
            np.testing.assert_allclose(rows[i], crps_ensemble(fc[i], obs[i]))


class TestSamplingCholesky:
    def test_indefinite_cov_yields_finite_factor(self):
        import jax.numpy as jnp

        from nowcastautogp_tpu.ops.lml import sampling_cholesky

        rng = np.random.default_rng(3)
        A = rng.standard_normal((3, 4, 4)).astype(np.float32)
        cov = np.einsum("pij,pkj->pik", A, A)
        # particle 1: an f32-cancellation-style indefinite matrix (negative
        # first diagonal entry, like a broken large-amplitude particle)
        cov[1, 0, 0] = -0.05
        F = np.asarray(sampling_cholesky(jnp.asarray(cov)))
        assert np.all(np.isfinite(F))
        # A A^T reproduces the PSD projection of cov for healthy particles
        rec = np.einsum("pij,pkj->pik", F, F)
        np.testing.assert_allclose(rec[0], cov[0], atol=1e-4)
        np.testing.assert_allclose(rec[2], cov[2], atol=1e-4)
        # the broken particle's factor stays bounded (eigenvalue clamp, not
        # a variance blowup)
        assert np.abs(rec[1]).max() < np.abs(cov[1]).max() * 1.5


class TestQuantiles:
    def test_quantile_matrix_shape_and_values(self):
        rng = np.random.default_rng(5)
        fc = rng.standard_normal((6, 500))
        q = quantile_matrix(fc, [0.25, 0.5, 0.75])
        assert q.shape == (3, 6)
        np.testing.assert_allclose(q[1], np.median(fc, axis=1))
        assert np.all(q[0] <= q[1]) and np.all(q[1] <= q[2])

    def test_device_quantiles_match_host(self):
        from nowcastautogp_tpu.eval.crps import quantile_matrix_device

        rng = np.random.default_rng(9)
        fc = rng.standard_normal((4, 2000)) * 5 + 2
        q_host = quantile_matrix(fc, [0.05, 0.5, 0.95])
        q_dev = quantile_matrix_device(fc, [0.05, 0.5, 0.95])
        np.testing.assert_allclose(q_dev, q_host, atol=1e-4)
