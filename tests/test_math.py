"""Math-primitive tests, mirroring the reference's util_test.cpp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.models import std_normal
from walnuts_tpu.ops.math import (
    adapt_step_size,
    count_trailing_zeros,
    leapfrog_error,
    leapfrog_step,
    log_sum_exp,
    log_sum_exp_vec,
    logp_momentum,
    make_logp_grad,
    sanitize_logp_grad,
)

INF = float("inf")


class TestLogSumExp:
    """Edge cases from util_test.cpp log_sum_exp coverage."""

    def test_basic(self):
        a, b = 1.3, -0.7
        expected = np.log(np.exp(a) + np.exp(b))
        assert np.allclose(float(log_sum_exp(jnp.float64(a), jnp.float64(b))), expected)

    def test_symmetry(self):
        assert float(log_sum_exp(jnp.float64(2.0), jnp.float64(5.0))) == pytest.approx(
            float(log_sum_exp(jnp.float64(5.0), jnp.float64(2.0)))
        )

    def test_neg_inf_identity(self):
        assert float(log_sum_exp(jnp.float64(-INF), jnp.float64(3.0))) == pytest.approx(3.0)
        assert float(log_sum_exp(jnp.float64(3.0), jnp.float64(-INF))) == pytest.approx(3.0)

    def test_both_neg_inf(self):
        assert float(log_sum_exp(jnp.float64(-INF), jnp.float64(-INF))) == -INF

    def test_pos_inf(self):
        assert float(log_sum_exp(jnp.float64(INF), jnp.float64(1.0))) == INF

    def test_nan_propagates(self):
        assert np.isnan(float(log_sum_exp(jnp.float64(np.nan), jnp.float64(1.0))))

    def test_stability_at_large_magnitudes(self):
        # stability at +/- 1e18 (util_test.cpp log_sum_exp stability)
        big = 1e18
        assert float(log_sum_exp(jnp.float64(big), jnp.float64(big))) == pytest.approx(
            big + np.log(2.0)
        )
        assert float(log_sum_exp(jnp.float64(-big), jnp.float64(-big))) == pytest.approx(
            -big + np.log(2.0)
        )

    def test_vector_matches_scalar(self):
        x = jnp.asarray([0.3, -2.0, 1.7])
        direct = np.log(np.sum(np.exp(np.asarray(x))))
        assert float(log_sum_exp_vec(x)) == pytest.approx(direct)

    def test_vector_all_neg_inf(self):
        x = jnp.asarray([-INF, -INF])
        assert float(log_sum_exp_vec(x)) == -INF


class TestLogpMomentum:
    def test_matches_formula(self):
        rho = jnp.asarray([1.0, -2.0, 0.5])
        inv_mass = jnp.asarray([2.0, 0.5, 1.0])
        expected = -0.5 * np.sum(np.asarray(inv_mass) * np.asarray(rho) ** 2)
        assert float(logp_momentum(rho, inv_mass)) == pytest.approx(expected)


class TestSanitize:
    def test_nan_logp_becomes_neg_inf(self):
        lp, g = sanitize_logp_grad(jnp.float64(np.nan), jnp.asarray([1.0, np.nan]))
        assert float(lp) == -INF
        assert np.array_equal(np.asarray(g), [1.0, 0.0])

    def test_pos_inf_logp_rejected(self):
        lp, _ = sanitize_logp_grad(jnp.float64(INF), jnp.asarray([1.0]))
        assert float(lp) == -INF

    def test_legit_neg_inf_preserved(self):
        lp, _ = sanitize_logp_grad(jnp.float64(-INF), jnp.asarray([1.0]))
        assert float(lp) == -INF


class TestLeapfrogError:
    """The closed-form oracle from util_test.cpp:385-476.

    For a standard normal target at ``theta = 0`` with diagonal inverse
    mass, the one-step leapfrog energy error is exactly
    ``-step^4/8 * sum(inv_mass^3 * rho^2)``; for general states the
    reference provides hand-calculated anchors.
    """

    def _error(self, theta, rho, inv_mass, step):
        lg = make_logp_grad(lambda t: -0.5 * jnp.sum(jnp.square(t)))
        return float(
            leapfrog_error(
                lg, jnp.asarray(theta), jnp.asarray(rho), jnp.asarray(inv_mass), step
            )
        )

    @staticmethod
    def _solution(step, inv_m, rho):
        return -1.0 / 8.0 * step**4 * inv_m**3 * rho**2

    def test_zero_state_is_zero(self):
        assert self._error([0.0] * 3, [0.0] * 3, [1.0] * 3, 1.0) == 0.0

    def test_zero_theta_closed_form(self):
        got = self._error([0.0], [2.5], [0.3], 0.75)
        assert got == pytest.approx(self._solution(0.75, 0.3, 2.5), abs=1e-12)

    def test_zero_theta_two_dim_sums(self):
        got = self._error([0.0, 0.0], [1.0, 1.0], [1.0, 1.0], 1.0)
        assert got == pytest.approx(2 * self._solution(1.0, 1.0, 1.0), abs=1e-12)

    def test_zero_theta_nonunit_inv_mass(self):
        got = self._error([0.0], [1.0], [0.25], 1.0)
        assert got == pytest.approx(self._solution(1.0, 0.25, 1.0), abs=1e-12)

    def test_fourth_power_scaling(self):
        """Halving the step divides the error by 16 (util_test.cpp:433)."""
        assert self._error([0.0], [1.0], [1.0], 1.0) == pytest.approx(
            self._solution(1.0, 1.0, 1.0), abs=1e-12
        )
        assert self._error([0.0], [1.0], [1.0], 0.5) == pytest.approx(
            self._solution(1.0, 1.0, 1.0) / 16.0, abs=1e-12
        )

    def test_general_one_dim_by_hand(self):
        assert self._error([1.0], [1.0], [1.0], 1.0) == pytest.approx(
            -5.0 / 32.0, abs=1e-12
        )

    def test_zero_momentum_by_hand(self):
        assert self._error([1.0], [0.0], [1.0], 1.0) == pytest.approx(
            3.0 / 32.0, abs=1e-12
        )

    def test_tiny_step_is_nearly_zero(self):
        got = self._error([1.0, -2.0], [0.5, 1.0], [1.0, 1.0], 1e-4)
        assert got == pytest.approx(0.0, abs=1e-12)


class TestLeapfrogStep:
    def test_reversibility(self):
        """Integrating forward then backward with negated momentum returns
        to the start (exactness of the leapfrog integrator)."""
        lg = make_logp_grad(lambda t: -0.5 * jnp.sum(jnp.square(t)))
        theta = jnp.asarray([0.3, -0.8])
        rho = jnp.asarray([1.1, 0.4])
        inv_mass = jnp.asarray([1.5, 0.7])
        _, g0 = lg(theta)
        t1, r1, g1, _ = leapfrog_step(lg, inv_mass, 0.3, theta, rho, g0)
        t2, r2, _, _ = leapfrog_step(lg, inv_mass, 0.3, t1, -r1, g1)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(theta), atol=1e-12)
        np.testing.assert_allclose(np.asarray(-r2), np.asarray(rho), atol=1e-12)


class TestAdaptStepSize:
    def test_converges_from_extremes(self):
        """Mirrors config_test.cpp:483: the heuristic converges to a
        moderate step from both 1e-3 and 1e3 on a standard normal."""
        lg = make_logp_grad(lambda t: -0.5 * jnp.sum(jnp.square(t)))
        theta = jnp.zeros(4)
        mass = jnp.ones(4)
        key = jax.random.key(7)
        s_small = float(adapt_step_size(key, lg, theta, mass, jnp.float64(1e-3)))
        s_large = float(adapt_step_size(key, lg, theta, mass, jnp.float64(1e3)))
        assert 0.05 < s_small < 2.5
        assert 0.05 < s_large < 2.5
        # both phases end inside the same acceptance band
        assert s_small == pytest.approx(s_large, rel=1.0)

    def test_scales_with_mass(self):
        """Mirrors config_test.cpp:527: heavier mass permits a larger step."""
        lg = make_logp_grad(lambda t: -0.5 * jnp.sum(jnp.square(t)))
        theta = jnp.zeros(8)
        key = jax.random.key(3)
        s_unit = float(adapt_step_size(key, lg, theta, jnp.ones(8), jnp.float64(1.0)))
        s_heavy = float(
            adapt_step_size(key, lg, theta, 100.0 * jnp.ones(8), jnp.float64(1.0))
        )
        assert s_heavy > 2.0 * s_unit


class TestCountTrailingZeros:
    def test_values(self):
        xs = jnp.asarray([1, 2, 3, 4, 6, 8, 12, 1024], dtype=jnp.int32)
        got = np.asarray(jax.vmap(count_trailing_zeros)(xs))
        assert list(got) == [0, 1, 0, 2, 1, 3, 2, 10]
