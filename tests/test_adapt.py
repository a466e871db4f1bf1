"""Adaptation-state tests: Adam, discounted Welford, mass and micro-step
estimators. Oracles are direct NumPy reimplementations of the reference
formulas (adam.hpp:70-86, online_moments.hpp:184-230,
adaptive_walnuts.hpp:74-94, 139-157)."""

import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.core.adapt import (
    adam_init,
    adam_step_size,
    adam_update,
    mass_estimator_init,
    mass_estimator_inv_mass,
    mass_estimator_observe,
    min_micro_estimate,
    min_micro_init,
    min_micro_observe,
    nutpie_init_mass,
    online_moments_init,
    online_moments_observe,
    online_moments_variance,
)


class TestAdam:
    def test_matches_reference_recursion(self):
        params = dict(target_accept=0.8, lr=0.05, b1=0.8, b2=0.9, eps=1e-4, lr_decay=0.5)
        state = adam_init(0.7, dtype=jnp.float64, **params)
        accepts = [0.2, 0.95, 0.5, 0.99, 0.7]

        # independent NumPy oracle
        theta, m, v = np.log(0.7), 0.0, 0.0
        b1p, b2p = 1.0, 1.0
        for t, a in enumerate(accepts, start=1):
            b1p *= params["b1"]
            b2p *= params["b2"]
            g = params["target_accept"] - a
            m = params["b1"] * m + (1 - params["b1"]) * g
            v = params["b2"] * v + (1 - params["b2"]) * g * g
            m_hat = m / (1 - b1p)
            v_hat = v / (1 - b2p)
            lr_t = params["lr"] / t ** params["lr_decay"]
            theta -= lr_t * m_hat / (np.sqrt(v_hat) + params["eps"])
            state = adam_update(state, jnp.float64(a))
        assert float(adam_step_size(state)) == pytest.approx(np.exp(theta), rel=1e-12)

    def test_low_accept_shrinks_step(self):
        state = adam_init(1.0, dtype=jnp.float64)
        for _ in range(20):
            state = adam_update(state, jnp.float64(0.1))
        assert float(adam_step_size(state)) < 1.0

    def test_high_accept_grows_step(self):
        state = adam_init(1.0, dtype=jnp.float64)
        for _ in range(20):
            state = adam_update(state, jnp.float64(0.999))
        assert float(adam_step_size(state)) > 1.0


class TestOnlineMoments:
    def test_no_discount_matches_plain_variance(self):
        """With discount 1 the estimator reduces to the MLE variance around
        the weighted mean including the pseudo-observations."""
        ys = np.array([[1.0], [3.0], [2.0], [5.0], [4.0]])
        init_w = 1e-12  # negligible prior
        state = online_moments_init(init_w, jnp.zeros(1), jnp.ones(1))
        for y in ys:
            state = online_moments_observe(state, jnp.float64(1.0), jnp.asarray(y))
        got = float(online_moments_variance(state)[0])
        assert got == pytest.approx(ys.var(), rel=1e-6)

    def test_discount_weights(self):
        """Weights are discount^(N-n-1); check mean and variance against the
        direct weighted formula (online_moments.hpp:104-123)."""
        ys = np.array([2.0, -1.0, 4.0, 0.5])
        df = 0.7
        state = online_moments_init(1e-12, jnp.zeros(1), jnp.ones(1))
        for y in ys:
            state = online_moments_observe(state, jnp.float64(df), jnp.asarray([y]))
        w = df ** np.arange(len(ys) - 1, -1, -1)
        mean = np.sum(w * ys) / np.sum(w)
        var = np.sum(w * (ys - mean) ** 2) / np.sum(w)
        assert float(state.mean[0]) == pytest.approx(mean, rel=1e-10)
        assert float(online_moments_variance(state)[0]) == pytest.approx(var, rel=1e-10)

    def test_empty_variance_is_ones(self):
        state = online_moments_init(1e-300, jnp.zeros(2), jnp.zeros(2))
        state = state._replace(weight=jnp.float64(0.0))
        np.testing.assert_array_equal(np.asarray(online_moments_variance(state)), [1.0, 1.0])

    def test_initial_weight_acts_as_pseudo_count(self):
        init_w = 4.0
        state = online_moments_init(init_w, jnp.zeros(1), jnp.ones(1))
        state = online_moments_observe(state, jnp.float64(1.0), jnp.asarray([2.0]))
        # weight 4 at mean 0 var 1 plus one observation of 2
        w_new = init_w + 1.0
        mean = 2.0 / w_new
        ssd = init_w * 1.0 + (2.0 - 0.0) * (2.0 - mean)
        assert float(state.mean[0]) == pytest.approx(mean)
        assert float(online_moments_variance(state)[0]) == pytest.approx(ssd / w_new)


class TestMassEstimator:
    def test_initial_estimate_is_inverse_of_init_mass(self):
        init_mass = jnp.asarray([4.0, 0.25])
        state = mass_estimator_init(init_mass, 4.0)
        np.testing.assert_allclose(
            np.asarray(mass_estimator_inv_mass(state)), [0.25, 4.0], rtol=1e-12
        )

    def test_geometric_mean_structure(self):
        """inv_mass = sqrt(var(draws) / var(scores)). Feed draws with known
        spread and zero-spread scores pinned by the prior."""
        state = mass_estimator_init(jnp.ones(1), 1.0)
        rng = np.random.default_rng(0)
        draws = rng.standard_normal(2000) * 3.0
        for i, d in enumerate(draws):
            state = mass_estimator_observe(
                state, jnp.asarray([d]), jnp.asarray([-d / 9.0]), jnp.int32(i)
            )
        inv_mass = float(mass_estimator_inv_mass(state)[0])
        # var(draws) ~ 9, var(scores) ~ 1/9 -> inv_mass ~ sqrt(81) = 9
        assert inv_mass == pytest.approx(9.0, rel=0.15)

    def test_discount_schedule(self):
        """Discount at iteration t is 1 - 1/(count0 + t)
        (adaptive_walnuts.hpp:76-77): check one step by hand."""
        count0 = 4.0
        state = mass_estimator_init(jnp.ones(1), count0)
        theta = jnp.asarray([1.5])
        state2 = mass_estimator_observe(state, theta, theta, jnp.int32(0))
        df = 1.0 - 1.0 / (count0 + 0.0)
        w_new = df * count0 + 1.0
        assert float(state2.draws.weight) == pytest.approx(w_new)


class TestMinMicro:
    def test_initialization_regularizer(self):
        """Starts with one pseudo-observation of 2 macro steps
        (adaptive_walnuts.hpp:130-132)."""
        state = min_micro_init(15.0, 1)
        # mean = 2, 2/15 rounds to 0 -> floored at 1
        assert int(min_micro_estimate(state)) == 1

    def test_mean_over_target_rounding(self):
        state = min_micro_init(2.0, 1)
        state = min_micro_observe(state, jnp.int32(8))   # total 10, count 2
        # mean 5, 5/2 = 2.5 -> lround = 3 (half away from zero)
        assert int(min_micro_estimate(state)) == 3

    def test_floor_respected(self):
        state = min_micro_init(100.0, 4)
        state = min_micro_observe(state, jnp.int32(2))
        assert int(min_micro_estimate(state)) == 4


class TestNutpieInitMass:
    def test_formula(self):
        """mass = (1 - s) |grad| + s (config.hpp:369; hand calc mirrors
        config_test.cpp:383)."""
        grad = jnp.asarray([-2.0, 0.5, 0.0])
        s = 0.1
        got = np.asarray(nutpie_init_mass(grad, jnp.float64(s)))
        np.testing.assert_allclose(got, [0.9 * 2.0 + 0.1, 0.9 * 0.5 + 0.1, 0.1])
