"""Whole-transition Pallas kernel tests (interpret mode): the fused
transition must target the same distribution as the XLA transition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.models.kernels import ill_conditioned_normal_vg, std_normal_vg
from walnuts_tpu.ops.fused_transition import (
    make_fused_sample_block,
    make_fused_transition,
)


def run_fused(vgf, dim, step_val, min_micro, iters=300, chains=64, seed=3,
              max_depth=6, max_halvings=6):
    vg, _, consts = vgf(dim)
    ft = make_fused_transition(
        vg, dim, max_depth=max_depth, max_step_halvings=max_halvings,
        block_b=32, interpret=True, consts=consts,
    )
    key = jax.random.key(seed)
    theta = jax.random.normal(jax.random.fold_in(key, 1), (chains, dim),
                              jnp.float32)
    step = jnp.full((chains,), step_val, jnp.float32)
    inv_mass = jnp.ones((chains, dim), jnp.float32)
    mm = jnp.full((chains,), min_micro, jnp.int32)

    def one_iter(carry, i):
        key, theta = carry
        key, k1 = jax.random.split(key)
        rho = jax.random.normal(k1, (chains, dim), jnp.float32)
        lp0, g0 = vg(theta)
        th, g, lp, depth, ng = ft(i, theta, rho, lp0, g0, step, inv_mass,
                                  mm, 0.5)
        return (key, th), (th, depth, ng)

    run = jax.jit(lambda c: jax.lax.scan(one_iter, c, jnp.arange(iters)))
    (_, _), (draws, depths, ngs) = run((key, theta))
    return np.asarray(draws), np.asarray(depths), np.asarray(ngs)


class TestFusedTransition:
    def test_std_normal_moments(self):
        draws, depths, ngs = run_fused(std_normal_vg, 4, 0.5, 1)
        d = draws[60:].reshape(-1, 4)
        assert np.abs(d.mean(0)).max() < 0.08
        assert np.abs(d.var(0) - 1.0).max() < 0.12
        assert 1 <= depths.min() and depths.max() <= 7

    def test_halving_and_reversibility_path(self):
        """Step 2.5 forces halvings + reversibility re-integration."""
        draws, _, ngs = run_fused(std_normal_vg, 3, 2.5, 1)
        d = draws[60:].reshape(-1, 3)
        assert np.abs(d.var(0) - 1.0).max() < 0.15
        assert ngs.mean() > 3.0  # halvings burn extra gradients

    def test_min_micro_steps(self):
        draws, _, _ = run_fused(std_normal_vg, 3, 0.25, 4)
        d = draws[60:].reshape(-1, 3)
        assert np.abs(d.var(0) - 1.0).max() < 0.15

    def test_ill_conditioned_with_consts(self):
        """Model constants ride in as kernel inputs."""
        draws, _, _ = run_fused(ill_conditioned_normal_vg, 4, 0.8, 1, iters=400)
        d = draws[100:].reshape(-1, 4)
        true_var = np.arange(1.0, 5.0) ** 2
        assert np.all(np.abs(d.var(0) / true_var - 1.0) < 0.25)

    def test_sample_block_moments_and_counts(self):
        """The multi-draw sampling-block kernel targets the same
        distribution; momenta are pre-drawn and streamed in."""
        vg, dim, consts = std_normal_vg(4)
        N, chains = 120, 64
        fsb = make_fused_sample_block(
            vg, dim, max_depth=5, max_step_halvings=5, num_draws=N,
            block_b=32, interpret=True, consts=consts,
        )
        key = jax.random.key(11)
        theta = jax.random.normal(jax.random.fold_in(key, 1), (chains, dim),
                                  jnp.float32)
        lp0, g0 = vg(theta)
        step = jnp.full((chains,), 0.5, jnp.float32)
        inv_mass = jnp.ones((chains, dim), jnp.float32)
        mm = jnp.ones((chains,), jnp.int32)
        rho = jax.random.normal(jax.random.fold_in(key, 2),
                                (N, chains, dim), jnp.float32)
        draws, logps, th_f, g_f, lp_f, ng = fsb(
            9, theta, lp0, g0, rho, step, inv_mass, mm, 0.5)
        d = np.asarray(draws)[20:].reshape(-1, dim)
        assert np.abs(d.mean(0)).max() < 0.1
        assert np.abs(d.var(0) - 1.0).max() < 0.12
        # final state consistency: last draw == carried position, and the
        # carried log density matches the model
        np.testing.assert_array_equal(np.asarray(draws)[-1], np.asarray(th_f))
        lp_model, g_model = vg(th_f)
        np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_model),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_model),
                                   rtol=1e-5)
        # the cached-start accounting: per-draw grads exclude the free
        # initial evaluation, so the mean is strictly positive and
        # consistent with the single-transition kernel minus one
        assert float(np.asarray(ng).mean()) / N > 1.0

    def test_nonunit_mass_and_heterogeneous_steps(self):
        """Adapted-params regime: a non-unit inverse mass matrix and
        per-chain step sizes. Every other test runs inv_mass=1, which a
        mass-handling bug would sail through (the bench runs with adapted
        per-chain masses). Momenta must be drawn ~ N(0, M) = N(0, 1/inv_mass)."""
        dim, chains, iters = 6, 64, 300
        vg, _, consts = ill_conditioned_normal_vg(dim)
        true_var = np.arange(1.0, dim + 1.0) ** 2
        ft = make_fused_transition(
            vg, dim, max_depth=5, max_step_halvings=6, block_b=32,
            interpret=True, consts=consts)
        key = jax.random.key(21)
        theta = jax.random.normal(jax.random.fold_in(key, 1), (chains, dim),
                                  jnp.float32)
        # true inverse mass = posterior variance; per-chain jittered steps
        inv_mass = jnp.broadcast_to(
            jnp.asarray(true_var, jnp.float32), (chains, dim))
        step = jnp.exp(0.3 * jax.random.normal(
            jax.random.fold_in(key, 2), (chains,))).astype(jnp.float32)
        mm = jnp.ones((chains,), jnp.int32)

        def one_iter(carry, i):
            key, theta = carry
            key, k1 = jax.random.split(key)
            rho = jax.random.normal(k1, (chains, dim), jnp.float32) / jnp.sqrt(
                inv_mass)
            lp0, g0 = vg(theta, *consts)
            th, g, lp, depth, ng = ft(i, theta, rho, lp0, g0, step,
                                      inv_mass, mm, 0.5)
            return (key, th), (th, ng)

        run = jax.jit(lambda c: jax.lax.scan(one_iter, c, jnp.arange(iters)))
        (_, _), (draws, ngs) = run((key, theta))
        d = np.asarray(draws)[100:].reshape(-1, dim)
        np.testing.assert_allclose(d.var(0), true_var, rtol=0.25)
        # a unit-mass run at these steps would need far more halvings:
        # preconditioned well, grads/draw stay small
        assert np.asarray(ngs)[100:].mean() < 20.0

    def test_matches_xla_transition_statistics(self):
        """Same target, same tuning: the fused kernel's depth and
        gradient-count distributions must match the XLA transition's
        (different PRNG streams, so statistical comparison)."""
        from walnuts_tpu.core.adapt import adam_init
        from walnuts_tpu.core.transition import make_transition
        from walnuts_tpu.models import std_normal
        from walnuts_tpu.ops.math import make_logp_grad

        _, depths_f, ngs_f = run_fused(std_normal_vg, 4, 0.5, 1, iters=200,
                                       max_depth=5, max_halvings=5)
        logp, dim = std_normal(4)
        lg = make_logp_grad(logp)
        tr = make_transition(lg, 5, 5, adapt_step_size=False)
        adam = adam_init(0.5, dtype=jnp.float32)

        def body(carry, _):
            keys, thetas = carry
            res = jax.vmap(lambda k, t: tr(
                k, t, jnp.float32(0.5), jnp.ones(dim, jnp.float32),
                jnp.int32(1), jnp.float32(0.5), adam))(keys, thetas)
            return (res.key, res.theta), (res.depth, res.n_grads)

        keys = jax.random.split(jax.random.key(3), 64)
        theta0 = jax.random.normal(jax.random.key(4), (64, dim), jnp.float32)
        run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=200))
        (_, _), (depths_x, ngs_x) = run((keys, theta0))
        # mean tree depth and gradient counts agree within a few percent
        assert abs(depths_f.mean() - np.asarray(depths_x).mean()) < 0.25
        assert abs(ngs_f.mean() / np.asarray(ngs_x).mean() - 1.0) < 0.1
