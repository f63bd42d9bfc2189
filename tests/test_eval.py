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


class TestWIS:
    """Weighted interval score (eval/wis.py) — Bracher et al. (2021) form."""

    def test_interval_score_hand_values(self):
        from nowcastautogp_tpu.eval.wis import interval_score

        # inside: just the width
        assert interval_score(1.0, 3.0, 0.2, 2.0) == 2.0
        # below: width + (2/alpha)(l - y)
        np.testing.assert_allclose(
            interval_score(1.0, 3.0, 0.2, 0.5), 2.0 + 10.0 * 0.5)
        # above: width + (2/alpha)(y - u)
        np.testing.assert_allclose(
            interval_score(1.0, 3.0, 0.5, 4.0), 2.0 + 4.0 * 1.0)

    def test_interval_score_rejects_bad_alpha(self):
        import pytest

        from nowcastautogp_tpu.eval.wis import interval_score

        with pytest.raises(ValueError):
            interval_score(0.0, 1.0, 0.0, 0.5)
        with pytest.raises(ValueError):
            interval_score(0.0, 1.0, 1.5, 0.5)

    def test_asymmetric_grid_rejected(self):
        import pytest

        from nowcastautogp_tpu.eval.wis import wis_ensemble

        with pytest.raises(ValueError, match="symmetric"):
            wis_ensemble(np.arange(100.0), 3.0, quantiles=[0.1, 0.5, 0.8])

    def test_wis_approximates_crps_on_flusight_grid(self):
        """WIS -> CRPS as the interval grid densifies (Bracher et al. 2021,
        eq. 4).  On the 23-point FluSight grid the discretization under-weights
        the tails, giving a consistent ~8% low bias for Gaussian ensembles —
        pin that the two agree within 12% and that WIS sits below CRPS."""
        from nowcastautogp_tpu.eval.wis import wis_ensemble

        rng = np.random.default_rng(42)
        for loc, y in ((0.0, 0.3), (2.0, -1.0), (-1.0, -1.2)):
            draws = rng.normal(loc, 1.0, 20000)
            w = wis_ensemble(draws, y)
            c = crps_ensemble(draws, y)
            assert 0.88 * c < w < c, (loc, y, w, c)

    def test_wis_converges_to_crps_with_dense_grid(self):
        """A 199-point symmetric grid closes the gap to <1.5%."""
        from nowcastautogp_tpu.eval.wis import wis_ensemble

        rng = np.random.default_rng(42)
        dense = np.round(np.arange(1, 200) * 0.005, 6)
        draws = rng.normal(0.0, 1.0, 20000)
        w = wis_ensemble(draws, 0.3, quantiles=dense)
        c = crps_ensemble(draws, 0.3)
        assert abs(w - c) < 0.015 * c, (w, c)

    def test_sharper_calibrated_ensemble_scores_better(self):
        from nowcastautogp_tpu.eval.wis import wis_ensemble

        rng = np.random.default_rng(11)
        sharp = rng.normal(0, 0.5, 4000)
        wide = rng.normal(0, 3.0, 4000)
        assert wis_ensemble(sharp, 0.0) < wis_ensemble(wide, 0.0)

    def test_matrix_rowwise(self):
        from nowcastautogp_tpu.eval.wis import wis_ensemble, wis_matrix

        rng = np.random.default_rng(3)
        fc = rng.standard_normal((4, 300))
        obs = rng.standard_normal(4)
        rows = wis_matrix(fc, obs)
        assert rows.shape == (4,)
        for i in range(4):
            np.testing.assert_allclose(rows[i], wis_ensemble(fc[i], obs[i]))

    def test_coverage_matrix(self):
        from nowcastautogp_tpu.eval.wis import coverage_matrix

        rng = np.random.default_rng(8)
        fc = rng.normal(0.0, 1.0, (400, 2000))
        obs = rng.normal(0.0, 1.0, 400)  # perfectly calibrated truth
        cov = coverage_matrix(fc, obs, levels=(0.5, 0.9))
        assert set(cov) == {0.5, 0.9}
        assert abs(cov[0.5] - 0.5) < 0.08
        assert abs(cov[0.9] - 0.9) < 0.05

    def test_package_exports(self):
        import nowcastautogp_tpu as ngp

        assert callable(ngp.wis_ensemble)
        assert callable(ngp.wis_matrix)
        assert len(ngp.FLUSIGHT_QUANTILES) == 23


class TestSubmission:
    """Hubverse quantile submission export (eval/submission.py)."""

    def _rows(self):
        import datetime as dt

        from nowcastautogp_tpu.eval.submission import quantile_submission

        rng = np.random.default_rng(4)
        fc = rng.lognormal(5.0, 0.4, (3, 500))
        dates = [dt.date(2024, 11, 9) + dt.timedelta(weeks=i)
                 for i in range(3)]
        return quantile_submission(fc, dates, location="06"), fc, dates

    def test_row_count_and_schema(self):
        rows, fc, dates = self._rows()
        assert len(rows) == 3 * 23
        assert set(rows[0]) == {
            "reference_date", "target", "horizon", "target_end_date",
            "location", "output_type", "output_type_id", "value"}
        assert all(r["output_type"] == "quantile" for r in rows)
        assert all(r["location"] == "06" for r in rows)

    def test_horizons_and_reference_date(self):
        rows, fc, dates = self._rows()
        # default reference date = one week before the first target date
        assert rows[0]["reference_date"] == "2024-11-02"
        horizons = sorted({r["horizon"] for r in rows})
        assert horizons == [1, 2, 3]

    def test_quantiles_monotone_and_match_numpy(self):
        from nowcastautogp_tpu.eval.wis import FLUSIGHT_QUANTILES

        rows, fc, dates = self._rows()
        per_date = {}
        for r in rows:
            per_date.setdefault(r["target_end_date"], []).append(r["value"])
        for i, d in enumerate(dates):
            vals = np.asarray(per_date[d.isoformat()])
            assert np.all(np.diff(vals) >= 0)
            np.testing.assert_allclose(
                vals, np.quantile(fc[i], np.sort(FLUSIGHT_QUANTILES)))

    def test_csv_round_trip(self, tmp_path):
        import csv as _csv

        from nowcastautogp_tpu.eval.submission import write_submission_csv

        rows, _, _ = self._rows()
        p = write_submission_csv(rows, str(tmp_path / "sub.csv"))
        with open(p) as f:
            back = list(_csv.DictReader(f))
        assert len(back) == len(rows)
        assert back[0]["output_type_id"] == rows[0]["output_type_id"]
        np.testing.assert_allclose(
            float(back[-1]["value"]), rows[-1]["value"])

    def test_empty_rows_rejected(self):
        import pytest

        from nowcastautogp_tpu.eval.submission import write_submission_csv

        with pytest.raises(ValueError):
            write_submission_csv([], "/tmp/never.csv")
