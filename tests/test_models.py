"""Model-zoo integration tests: each benchmark target samples correctly
through the full adaptive pipeline (the reference validates targets only
via its examples; these are cheap statistical sanity checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import Summarizer, walnuts
from walnuts_tpu.models import (
    ar1_normal,
    condition_gaussian,
    eight_schools,
    funnel,
    stochastic_volatility,
)


def run(logp, dim, *, chains=8, warmup=200, sampling=300, seed=0, **kw):
    out = walnuts(
        logp, num_params=dim, num_chains=chains, seed=seed,
        min_warmup_iter=warmup, max_warmup_iter=warmup,
        min_sampling_iter=sampling, max_sampling_iter=sampling,
        block_size=sampling, **kw,
    )
    return np.stack([np.asarray(c) for c in out])


class TestFunnel:
    def test_explores_the_neck(self):
        """The funnel's log-scale v ~ N(0, 3^2): within-orbit step
        adaptation must reach the neck; a plain-NUTS failure mode is
        std(v) collapsing well below 3."""
        logp, dim = funnel(10)
        draws = run(logp, dim, chains=8, warmup=300, sampling=500, seed=1)
        v = draws[:, :, 0].ravel()
        assert 2.0 < v.std() < 4.0
        assert abs(v.mean()) < 1.0


class TestConditionGaussian:
    def test_kappa_1e4(self):
        logp, dim = condition_gaussian(8, kappa=1e4)
        draws = run(logp, dim, chains=8, warmup=300, sampling=300, seed=2)
        flat = draws.reshape(-1, dim)
        true_var = np.exp(np.linspace(0.0, np.log(1e4), dim))
        ratio = flat.var(0) / true_var
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


class TestAr1:
    def test_stationary_variance(self):
        logp, dim = ar1_normal(12, rho=0.9)
        draws = run(logp, dim, chains=8, warmup=200, sampling=300, seed=3)
        flat = draws.reshape(-1, dim)
        # stationary AR(1): all marginals are standard normal
        assert np.all(np.abs(flat.var(0) - 1.0) < 0.35)


class TestEightSchools:
    def test_posterior_shape(self):
        logp, dim = eight_schools()
        draws = run(logp, dim, chains=8, warmup=300, sampling=400, seed=4)
        flat = draws.reshape(-1, dim)
        mu = flat[:, 0]
        tau = np.exp(flat[:, 1])
        # population effect is positive, modest (classic result ~ 8)
        assert 2.0 < mu.mean() < 14.0
        assert tau.mean() > 0.5
        s = Summarizer([draws[c] for c in range(draws.shape[0])])
        assert np.all(s.r_hat() < 1.2)


class TestStochasticVolatility:
    def test_runs_and_is_finite(self):
        """The 1k+ dim benchmark posterior (BASELINE.json configs[4]):
        short run, finiteness + basic scale recovery. Starts near the
        origin — the mode of the non-centered prior — as a 203-dim radius-2
        random init needs far more warmup than a unit test affords."""
        logp, dim = stochastic_volatility(num_times=200)
        draws = run(logp, dim, chains=4, warmup=150, sampling=100, seed=5,
                    init_radius=0.2)
        assert np.isfinite(draws).all()
        phi = np.tanh(draws[:, :, 1])
        assert phi.mean() > 0.0  # persistence is positive in the data
        # chains actually move
        assert np.std(draws[:, :, 1], axis=1).min() > 0.0

    def test_ar1_filter_matches_sequential_scan(self):
        """The scalar-coefficient log-pass filter (targets._ar1_filter)
        and its custom_vjp adjoint must match a sequential lax.scan of
        u_t = phi u_{t-1} + z_t (value and both gradients) at f64 —
        including non-power-of-two lengths where the shifted passes
        over-reach the array edge."""
        from walnuts_tpu.models.targets import _ar1_filter

        rng = np.random.default_rng(7)

        def seq(z, phi):
            def step(u, zt):
                u = phi * u + zt
                return u, u

            _, us = jax.lax.scan(step, jnp.zeros((), z.dtype), z)
            return us

        for T in (1, 2, 3, 7, 64, 1000):
            z = jnp.asarray(rng.standard_normal(T))
            w = jnp.asarray(rng.standard_normal(T))
            phi = jnp.asarray(0.97)
            np.testing.assert_allclose(
                _ar1_filter(z, phi), seq(z, phi), rtol=1e-12, atol=1e-12)
            g_new = jax.grad(
                lambda z, p: jnp.sum(w * _ar1_filter(z, p)), argnums=(0, 1)
            )(z, phi)
            g_ref = jax.grad(
                lambda z, p: jnp.sum(w * seq(z, p)), argnums=(0, 1)
            )(z, phi)
            np.testing.assert_allclose(g_new[0], g_ref[0], rtol=1e-10)
            np.testing.assert_allclose(g_new[1], g_ref[1], rtol=1e-10)

    def test_f32_logp_grad_finite_at_deep_negative_h(self):
        """Overflow-stability regression (targets.py log-stabilized
        likelihood): one latent h_t dipping to -92 makes the naive
        r_t^2 * exp(-h_t) form overflow f32 (exp(92) = inf -> logp
        -inf, grad NaN — the bug that permanently stuck 197/1024
        flagship lanes), while the stable exp(log r_t^2 - h_t) form
        stays finite because the TERM value (~e^84 here) is
        representable. Constructed at the smallest-|r| time step so
        the term exponent stays below the f32 ceiling."""
        from walnuts_tpu.models.targets import stochastic_volatility_data

        logp, dim = stochastic_volatility(num_times=64)
        log_r2 = np.log(np.square(stochastic_volatility_data(64)))
        t_star = int(np.argmin(log_r2))
        assert log_r2[t_star] + 92.0 < 88.0  # term itself is f32-finite
        # phi_raw = 0, log_sigma = 0, mu = 0 -> h = z (identity filter);
        # dip exactly one h_t
        theta = jnp.zeros(dim, jnp.float32).at[3 + t_star].set(-92.0)
        lp, grad = jax.value_and_grad(logp)(theta)
        assert np.isfinite(float(lp)), lp
        assert np.isfinite(np.asarray(grad)).all()
        # the naive intermediate at t_star would have been inf in f32
        with np.errstate(over="ignore"):
            assert np.isinf(np.exp(np.float32(92.0)))
