"""Unit tests for TData and the transformation factory.

Mirrors the reference's pure-unit suite
(``/root/reference/test/test_helper_functions.jl``): construction/validation/
type promotion, forward∘inverse round-trips for all three transforms (with and
without zeros), the Box-Cox degenerate-λ fallback (issue #51), and edge cases
asserting the inverse is always finite and non-negative.
"""

import datetime as dt

import numpy as np
import pytest

from nowcastautogp_tpu import TData, create_transformed_data, get_transformations


def _dates(n, start=dt.date(2024, 1, 1)):
    return [start + dt.timedelta(days=i) for i in range(n)]


DATES = _dates(10)
VALUES = np.array([10.0, 15.0, 12.0, 18.0, 22.0, 25.0, 20.0, 16.0, 14.0, 11.0])
VALUES_WITH_ZERO = np.array([0.0, 15.0, 12.0, 0.0, 22.0, 25.0, 0.0, 16.0, 14.0, 11.0])
PROPORTIONS = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95])
TEST_VALUES = np.array([0.5, 1.0, 2.0, 5.0, 10.0, 20.0, 50.0])
POSITIVE_VALUES = np.array([0.1, 1.0, 5.0, 10.0, 100.0])
PERCENTAGE_VALUES = np.array([10.0, 25.0, 50.0, 75.0, 90.0])


class TestTData:
    def test_basic_construction(self):
        result = TData(DATES, VALUES, transformation=lambda y: y)
        assert list(result.ds) == DATES
        np.testing.assert_array_equal(result.y, VALUES)
        np.testing.assert_array_equal(result.values, VALUES)
        assert result.y.dtype == result.values.dtype

    def test_log_transformation(self):
        result = TData(DATES, VALUES, transformation=np.log)
        np.testing.assert_allclose(result.y, np.log(VALUES))
        np.testing.assert_array_equal(result.values, VALUES)

    def test_logit_transformation(self):
        logit = lambda p: np.log(p) - np.log1p(-p)
        result = TData(DATES, PROPORTIONS, transformation=logit)
        np.testing.assert_allclose(result.y, logit(PROPORTIONS))
        np.testing.assert_array_equal(result.values, PROPORTIONS)

    def test_type_promotion(self):
        result = TData(_dates(5), [1, 2, 3, 4, 5], transformation=lambda x: x * 1.5)
        assert result.y.dtype == np.float64
        assert result.values.dtype == np.float64
        np.testing.assert_allclose(result.y, [1.5, 3.0, 4.5, 6.0, 7.5])
        np.testing.assert_array_equal(result.values, [1.0, 2.0, 3.0, 4.0, 5.0])

    def test_length_validation(self):
        with pytest.raises(AssertionError):
            TData(_dates(2), [1.0, 2.0, 3.0, 4.0], transformation=lambda y: y)

    def test_custom_transformation(self):
        custom = lambda x: (x - 15.0) / 5.0
        result = TData(DATES, VALUES, transformation=custom)
        np.testing.assert_allclose(result.y, custom(VALUES))

    def test_scalar_only_transformation(self):
        import math

        result = TData(DATES, VALUES, transformation=math.log)
        np.testing.assert_allclose(result.y, np.log(VALUES))


class TestCreateTransformedData:
    def test_basic(self):
        result = create_transformed_data(_dates(5), VALUES[:5])
        np.testing.assert_array_equal(result.y, VALUES[:5])
        np.testing.assert_array_equal(result.values, VALUES[:5])

    def test_with_transformation(self):
        result = create_transformed_data(_dates(5), VALUES[:5], transformation=np.sqrt)
        np.testing.assert_allclose(result.y, np.sqrt(VALUES[:5]))

    def test_accepts_generators(self):
        result = create_transformed_data(
            (d for d in _dates(5)), (v for v in VALUES[:5])
        )
        assert len(result) == 5


class TestTransformations:
    @pytest.mark.parametrize("values", [TEST_VALUES, VALUES_WITH_ZERO])
    def test_percentage_round_trip(self, values):
        fwd, inv = get_transformations("percentage", values)
        for val in PERCENTAGE_VALUES:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-10)

    @pytest.mark.parametrize("values", [POSITIVE_VALUES, VALUES_WITH_ZERO])
    def test_positive_round_trip(self, values):
        fwd, inv = get_transformations("positive", values)
        for val in POSITIVE_VALUES:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-6)

    @pytest.mark.parametrize("values", [np.array([1.0, 2.0, 5.0, 10.0, 20.0]), VALUES_WITH_ZERO])
    def test_boxcox_round_trip(self, values):
        fwd, inv = get_transformations("boxcox", values)
        for val in [1.0, 2.0, 5.0, 10.0, 20.0]:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-6)

    def test_boxcox_fallback_on_flat_data(self):
        flat_values = np.array(
            [75000.0, 75100.0, 74950.0, 75050.0, 75000.0,
             74980.0, 75020.0, 75010.0, 74990.0, 75005.0]
        )
        with pytest.warns(UserWarning, match="degenerate"):
            fwd, inv = get_transformations("boxcox", flat_values)
        # fallback => forward is log (offset 0 for positive values)
        assert fwd(flat_values[0]) == pytest.approx(np.log(flat_values[0]), rel=1e-9)
        for val in flat_values:
            assert inv(fwd(val)) == pytest.approx(val, rel=1e-9)
        # healthy well-spread data must NOT fall back
        healthy_fwd, _ = get_transformations("boxcox", VALUES)
        assert not np.isclose(healthy_fwd(VALUES[0]), np.log(VALUES[0]), rtol=1e-9)

    def test_boxcox_edge_cases(self):
        small_values = np.array([1e-8, 1e-6, 1e-4, 0.001, 0.01, 0.1, 1.0, 10.0])
        fwd, inv = get_transformations("boxcox", small_values)
        for val in small_values:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-6)
        for inp in [-100.0, -50.0, -20.0, -10.0, 100.0, 50.0, 20.0, 10.0]:
            result = inv(inp)
            assert result >= 0.0
            assert np.isfinite(result)

    def test_boxcox_negative_lambda(self):
        decreasing = np.array([100.0, 50.0, 25.0, 12.5, 6.25, 3.125])
        fwd, inv = get_transformations("boxcox", decreasing)
        for val in decreasing:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-4)
        for inp in [-5.0, -2.0, -1.0, -0.5, -0.1, 0.0, 0.1, 0.5, 1.0, 2.0, 5.0]:
            result = inv(inp)
            assert result >= 0.0
            assert np.isfinite(result)

    def test_boxcox_zero_lambda_case(self):
        log_like = np.array([1.0, 2.718, 7.389, 20.086, 54.598])
        fwd, inv = get_transformations("boxcox", log_like)
        for inp in [-10.0, -5.0, -1.0, 0.0, 1.0, 5.0, 10.0]:
            result = inv(inp)
            assert result >= 0.0
            assert np.isfinite(result)
        for val in log_like:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-5)

    def test_boxcox_numerical_stability(self):
        extreme = np.array([1e-10, 1e-5, 1e-2, 1.0, 1e2, 1e5, 1e8])
        fwd, inv = get_transformations("boxcox", extreme)
        for val in extreme:
            t = fwd(val)
            assert np.isfinite(t)
            r = inv(t)
            assert np.isfinite(r)
            assert r >= 0.0
            assert r == pytest.approx(val, rel=1e-3)

    def test_boxcox_integer_data(self):
        ints = [1, 2, 5, 8, 10, 15, 20, 25, 30]
        fwd, inv = get_transformations("boxcox", ints)
        for val in ints:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-5)

    def test_integer_data_with_zeros(self):
        ints = [0, 2, 5, 8, 10]
        fwd, inv = get_transformations("positive", ints)
        # offset = half min positive = 1.0
        assert fwd(0) == pytest.approx(np.log(1.0))
        for val in [2, 5, 8, 10]:
            assert inv(fwd(val)) == pytest.approx(val, abs=1e-6)

    def test_float32_values(self):
        vals = np.array([1.5, 2.5, 4.0, 8.0], dtype=np.float32)
        fwd, inv = get_transformations("positive", vals)
        for val in vals:
            assert inv(fwd(float(val))) == pytest.approx(float(val), abs=1e-5)

    def test_unknown_name_raises(self):
        with pytest.raises(AssertionError, match="Unknown transform_name"):
            get_transformations("nope", VALUES)

    def test_offset_assertions(self):
        with pytest.raises(AssertionError):
            get_transformations("positive", np.array([]))
        with pytest.raises(AssertionError):
            get_transformations("positive", np.array([-1.0, 2.0]))

    def test_matrix_application(self):
        # inverse transforms must apply elementwise to forecast matrices
        fwd, inv = get_transformations("positive", POSITIVE_VALUES)
        mat = np.log(np.array([[1.0, 2.0], [3.0, 4.0]]))
        np.testing.assert_allclose(inv(mat), np.array([[1.0, 2.0], [3.0, 4.0]]), atol=1e-8)
