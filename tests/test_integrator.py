"""Fused Pallas integrator tests (interpret mode on CPU): the kernel path
must be behaviorally identical to the plain inner-loop path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.core.adapt import adam_init
from walnuts_tpu.core.transition import make_transition
from walnuts_tpu.models import funnel, ill_conditioned_normal, std_normal
from walnuts_tpu.models.kernels import (
    funnel_vg,
    ill_conditioned_normal_vg,
    logistic_regression_vg,
    std_normal_vg,
)
from walnuts_tpu.ops.integrator import make_pallas_integrator
from walnuts_tpu.ops.math import make_logp_grad


class TestManualKernels:
    """Hand-written batched value-and-gradients match autodiff."""

    @pytest.mark.parametrize(
        "vg_factory,target_factory",
        [
            (lambda: std_normal_vg(5), lambda: std_normal(5)),
            (lambda: funnel_vg(10), lambda: funnel(10)),
            (lambda: ill_conditioned_normal_vg(6), lambda: ill_conditioned_normal(6)),
        ],
    )
    def test_matches_autodiff(self, vg_factory, target_factory):
        vg, dim, _ = vg_factory()
        logp, _ = target_factory()
        ref = make_logp_grad(logp)
        theta = 0.4 * jax.random.normal(jax.random.key(0), (7, dim), jnp.float32)
        lp_m, g_m = vg(theta)
        lp_r, g_r = jax.vmap(ref)(theta)
        np.testing.assert_allclose(np.asarray(lp_m), np.asarray(lp_r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_r), atol=1e-4)

    def test_logreg_matches_autodiff(self):
        from walnuts_tpu.models import logistic_regression

        vg, dim, _ = logistic_regression_vg()
        logp, _ = logistic_regression()
        ref = make_logp_grad(logp)
        theta = 0.2 * jax.random.normal(jax.random.key(1), (4, dim), jnp.float32)
        lp_m, g_m = vg(theta)
        lp_r, g_r = jax.vmap(ref)(theta)
        np.testing.assert_allclose(np.asarray(lp_m), np.asarray(lp_r), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_r), atol=1e-3)


class TestIntegrator:
    def _integrator(self, vg, block_b=8):
        return make_pallas_integrator(vg, block_b=block_b, interpret=True)

    def test_matches_sequential_leapfrog(self):
        from walnuts_tpu.ops.math import leapfrog_step

        vg, dim, _ = std_normal_vg(4)
        logp, _ = std_normal(4)
        lg = make_logp_grad(logp)
        integ = self._integrator(vg)
        key = jax.random.key(2)
        theta = jax.random.normal(key, (dim,), jnp.float32)
        rho = jax.random.normal(jax.random.fold_in(key, 1), (dim,), jnp.float32)
        _, grad = lg(theta)
        cur = jnp.stack([theta, rho, grad])
        inv_mass = jnp.ones(dim, jnp.float32)
        out, lp = integ(cur, inv_mass, jnp.float32(0.3), jnp.int32(5))
        # sequential reference
        t, r, g = theta, rho, grad
        for _ in range(5):
            t, r, g, lpr = leapfrog_step(lg, inv_mass, jnp.float32(0.3), t, r, g)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(r), atol=1e-5)
        assert float(lp) == pytest.approx(float(lpr), abs=1e-5)

    def test_zero_steps_pass_through(self):
        vg, dim, _ = std_normal_vg(3)
        integ = self._integrator(vg)
        cur = jnp.ones((3, dim), jnp.float32)
        out, lp = integ(cur, jnp.ones(dim, jnp.float32), jnp.float32(0.5), jnp.int32(0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(cur))
        assert float(lp) == -np.inf

    def test_batched_heterogeneous_step_counts(self):
        vg, dim, _ = std_normal_vg(3)
        integ = self._integrator(vg)
        B = 5
        cur = jax.random.normal(jax.random.key(3), (B, 3, dim), jnp.float32)
        inv_mass = jnp.ones((B, dim), jnp.float32)
        dt = jnp.full((B,), 0.2, jnp.float32)
        n = jnp.asarray([0, 1, 3, 7, 2], jnp.int32)
        out, lp = jax.vmap(integ)(cur, inv_mass, dt, n)
        # lane 0 unchanged; others match per-lane sequential calls
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(cur[0]))
        for b in range(1, B):
            o, l = integ(cur[b], inv_mass[b], dt[b], n[b])
            np.testing.assert_allclose(np.asarray(out[b]), np.asarray(o), atol=1e-6)

    def test_transition_equivalence(self):
        """The full transition with the fused integrator reproduces the
        plain path: same depths, same gradient counts, same draws to f32
        tolerance (identical RNG stream)."""
        vg, dim, _ = funnel_vg(8)
        logp, _ = funnel(8)
        lg = make_logp_grad(logp)
        integ = self._integrator(vg)
        tr_plain = make_transition(lg, 4, 4, adapt_step_size=False)
        tr_fused = make_transition(lg, 4, 4, adapt_step_size=False, integrator=integ)
        adam = adam_init(0.4, dtype=jnp.float32)
        keys = jax.random.split(jax.random.key(5), 12)
        thetas = 0.2 * jax.random.normal(jax.random.key(6), (12, dim), jnp.float32)
        args = (jnp.float32(0.4), jnp.ones(dim, jnp.float32), jnp.int32(2),
                jnp.float32(0.5), adam)
        r1 = jax.vmap(lambda k, t: tr_plain(k, t, *args))(keys, thetas)
        r2 = jax.vmap(lambda k, t: tr_fused(k, t, *args))(keys, thetas)
        np.testing.assert_array_equal(np.asarray(r1.depth), np.asarray(r2.depth))
        np.testing.assert_array_equal(np.asarray(r1.n_grads), np.asarray(r2.n_grads))
        np.testing.assert_allclose(np.asarray(r1.theta), np.asarray(r2.theta), atol=1e-5)

    def test_end_to_end_sampling_with_integrator(self):
        """Full walnuts pipeline through runtime with the integrator."""
        import jax

        from walnuts_tpu.config import SamplingConfig, WarmupConfig
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )
        from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

        vg, dim, _ = std_normal_vg(3)
        logp, _ = std_normal(3)
        lg = make_logp_grad(logp)
        integ = self._integrator(vg)
        wcfg = WarmupConfig(min_iter=20, max_iter=20, block_size=20)
        scfg = SamplingConfig(min_iter=60, max_iter=60, block_size=60,
                              max_trajectory_doublings=4, max_step_halvings=4)
        keys = jax.random.split(jax.random.key(7), 8)
        theta0 = jax.random.normal(jax.random.key(8), (8, dim), jnp.float32)
        mass = jnp.ones((8, dim), jnp.float32)
        step = jnp.full((8,), 0.5, jnp.float32)
        ws = jax.vmap(lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg))(
            keys, theta0, mass, step)
        ws, _, _, info = run_warmup(lg, ws, wcfg, scfg, integrator=integ)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        ss, draws, _, info = run_sampling(lg, ss, params, scfg, info=info,
                                          integrator=integ)
        flat = draws.reshape(-1, dim)
        assert np.isfinite(flat).all()
        assert abs(flat.mean()) < 0.2
        assert abs(flat.var() - 1.0) < 0.3
