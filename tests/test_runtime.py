"""Runtime controller tests: the cross-chain convergence reductions match
the reference formulas (adapt.hpp:203-225, sampler.hpp:142-145), computed
against NumPy oracles on hand-built states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import mass_estimator_inv_mass
from walnuts_tpu.core.sampler import SampleState, init_warmup_state
from walnuts_tpu.models import std_normal
from walnuts_tpu.ops.math import make_logp_grad
from walnuts_tpu.parallel.runtime import (
    _sampling_rhat,
    _warmup_convergence_stats,
    run_warmup,
)


def make_warmup_states(n_chains, dim, seed=0):
    wcfg = WarmupConfig(min_iter=1, max_iter=2)
    scfg = SamplingConfig(min_iter=1, max_iter=2)
    keys = jax.random.split(jax.random.key(seed), n_chains)
    theta = jax.random.normal(jax.random.key(seed + 1), (n_chains, dim))
    # distinct masses/steps per chain so the reductions have structure
    mass = jnp.exp(jax.random.normal(jax.random.key(seed + 2), (n_chains, dim)))
    step = jnp.exp(0.1 * jax.random.normal(jax.random.key(seed + 3), (n_chains,)))
    return jax.vmap(lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg))(
        keys, theta, mass, step
    )


class TestWarmupConvergenceStats:
    def test_matches_reference_formula(self):
        """max L2 rel-diff of per-chain mass from the geometric mean, and
        max SIGNED rel-diff of step sizes (the reference fmaxes signed
        values, adapt.hpp:210-217)."""
        state = make_warmup_states(6, 4)
        mrm, mrs = _warmup_convergence_stats(state)

        inv_mass = np.asarray(jax.vmap(mass_estimator_inv_mass)(state.mass))
        mass = 1.0 / inv_mass
        geo = np.exp(np.mean(np.log(mass), axis=0))
        rel_mass = np.linalg.norm((mass - geo) / geo, axis=1).max()
        steps = np.exp(np.asarray(state.adam.log_step))
        geo_s = np.exp(np.mean(np.log(steps)))
        rel_step = ((steps - geo_s) / geo_s).max()

        assert float(mrm) == pytest.approx(rel_mass, rel=1e-6)
        assert float(mrs) == pytest.approx(rel_step, rel=1e-6)

    def test_identical_chains_converged(self):
        state = make_warmup_states(4, 3)
        # force identical adaptation state across chains
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:1], x.shape) if x.ndim >= 1 else x,
            state,
        )
        mrm, mrs = _warmup_convergence_stats(state)
        assert float(mrm) == pytest.approx(0.0, abs=1e-7)
        assert float(mrs) == pytest.approx(0.0, abs=1e-7)


class TestSamplingRhat:
    def test_matches_reference_formula(self):
        """r_hat = sqrt(1 + var(chain means, ddof=1)/mean(chain vars))."""
        rng = np.random.default_rng(0)
        means = rng.standard_normal(5)
        m2s = np.abs(rng.standard_normal(5)) * 9.0  # counts=10 -> var=m2/9
        from walnuts_tpu.core.transition import FailStats

        zeros5 = jnp.zeros(5, jnp.int32)
        state = SampleState(
            key=jax.random.split(jax.random.key(0), 5),
            theta=jnp.zeros((5, 2)),
            n_grads=jnp.zeros(5, jnp.int32),
            fails=FailStats(zeros5, zeros5, zeros5),
            lp_count=jnp.full((5,), 10.0),
            lp_mean=jnp.asarray(means),
            lp_m2=jnp.asarray(m2s),
        )
        got = float(_sampling_rhat(state))
        expected = np.sqrt(1.0 + means.var(ddof=1) / (m2s / 9.0).mean())
        assert got == pytest.approx(expected, rel=1e-6)


class TestWarmupEarlyStop:
    def test_converged_flag_set_when_tolerances_met(self):
        """Loose tolerances stop warmup at min_iter; tight ones run to
        max_iter (the controller decision logic, adapt.hpp:219-225)."""
        logp, dim = std_normal(2)
        lg = make_logp_grad(logp)
        scfg = SamplingConfig(min_iter=2, max_iter=2,
                              max_trajectory_doublings=3, max_step_halvings=3)

        def run(mass_tol, step_tol):
            wcfg = WarmupConfig(min_iter=4, max_iter=40, block_size=4,
                                mass_converge_tol=mass_tol,
                                step_size_converge_tol=step_tol)
            keys = jax.random.split(jax.random.key(5), 4)
            theta = jax.random.normal(jax.random.key(6), (4, dim))
            mass = jnp.ones((4, dim))
            step = jnp.full((4,), 0.5)
            ws = jax.vmap(
                lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
            )(keys, theta, mass, step)
            _, _, _, info = run_warmup(lg, ws, wcfg, scfg)
            return info

        loose = run(1e6, 1e6)
        assert loose.converged_warmup and loose.warmup_iters == 4
        tight = run(1e-9, 1e-9)
        assert not tight.converged_warmup and tight.warmup_iters == 40

    def test_converged_flag_batched_async(self):
        """The asynchronous batched warmup honours the same block-level
        early-stop contract, including an uneven remainder block
        (min_iter not a multiple of block_size)."""
        logp, dim = std_normal(2)
        lg = make_logp_grad(logp)
        scfg = SamplingConfig(min_iter=2, max_iter=2,
                              max_trajectory_doublings=3,
                              max_step_halvings=3)

        def run(mass_tol, step_tol):
            wcfg = WarmupConfig(min_iter=6, max_iter=40, block_size=4,
                                mass_converge_tol=mass_tol,
                                step_size_converge_tol=step_tol)
            keys = jax.random.split(jax.random.key(5), 4)
            theta = jax.random.normal(jax.random.key(6), (4, dim))
            mass = jnp.ones((4, dim))
            step = jnp.full((4,), 0.5)
            ws = jax.vmap(
                lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
            )(keys, theta, mass, step)
            _, _, _, info = run_warmup(lg, ws, wcfg, scfg, batched=True)
            return info

        loose = run(1e6, 1e6)
        assert loose.converged_warmup and loose.warmup_iters == 6
        tight = run(1e-9, 1e-9)
        assert not tight.converged_warmup and tight.warmup_iters == 40


class TestChainGroups:
    def test_grouped_sampling_matches_contracts_and_order(self):
        """chain_groups sorts chains internally but outputs must come back
        in the caller's order with identical per-chain results (the
        transition is per-chain deterministic given its key)."""
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )
        from walnuts_tpu.parallel.runtime import run_sampling

        logp, dim = std_normal(3)
        lg = make_logp_grad(logp)
        wcfg = WarmupConfig(min_iter=10, max_iter=10, block_size=10)
        scfg = SamplingConfig(min_iter=30, max_iter=30, block_size=15,
                              max_trajectory_doublings=4, max_step_halvings=4)
        keys = jax.random.split(jax.random.key(9), 8)
        theta0 = jax.random.normal(jax.random.key(10), (8, dim))
        mass = jnp.ones((8, dim))
        step = jnp.exp(0.3 * jax.random.normal(jax.random.key(11), (8,)))
        ws = jax.vmap(lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg))(
            keys, theta0, mass, step)
        ws, _, _, info = run_warmup(lg, ws, wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)

        # run_sampling donates its state buffers; copy for the second run
        ss1 = jax.tree.map(jnp.array, jax.vmap(init_sample_state)(ws))
        ss2 = jax.tree.map(jnp.array, ss1)
        _, draws1, _, info1 = run_sampling(lg, ss1, params, scfg)
        _, draws2, _, info2 = run_sampling(lg, ss2, params, scfg,
                                           chain_groups=4)
        np.testing.assert_allclose(draws1, draws2, atol=1e-6)
        np.testing.assert_array_equal(info1.n_grads, info2.n_grads)

    def test_bad_group_count_rejected(self):
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )
        from walnuts_tpu.parallel.runtime import run_sampling

        logp, dim = std_normal(2)
        lg = make_logp_grad(logp)
        wcfg = WarmupConfig(min_iter=1, max_iter=1)
        scfg = SamplingConfig(min_iter=2, max_iter=2)
        keys = jax.random.split(jax.random.key(1), 6)
        ws = jax.vmap(lambda k: init_warmup_state(
            k, jnp.zeros(dim), jnp.ones(dim), jnp.float32(0.5), wcfg, scfg))(keys)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        with pytest.raises(ValueError):
            run_sampling(lg, ss, params, scfg, chain_groups=4)


class TestFlattenedSampling:
    """Run-ahead flattened scheduling must reproduce the classic path's
    draws exactly — same per-lane transitions, different scheduling — and
    reject the chain_groups combination."""

    def _setup(self, scfg, n_chains=8, dim=3, step_spread=0.3):
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )

        logp, dim_ = std_normal(dim)
        lg = make_logp_grad(logp)
        wcfg = WarmupConfig(min_iter=10, max_iter=10, block_size=10)
        keys = jax.random.split(jax.random.key(21), n_chains)
        theta0 = jax.random.normal(jax.random.key(22), (n_chains, dim_))
        mass = jnp.ones((n_chains, dim_))
        step = jnp.exp(step_spread * jax.random.normal(jax.random.key(23),
                                                       (n_chains,)))
        ws = jax.vmap(lambda k, t, m, st: init_warmup_state(
            k, t, m, st, wcfg, scfg))(keys, theta0, mass, step)
        ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        return lg, params, ss

    def test_bitwise_matches_classic(self):
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg = SamplingConfig(min_iter=40, max_iter=40, block_size=15,
                              max_trajectory_doublings=5, max_step_halvings=4)
        lg, params, ss = self._setup(scfg)
        ss1 = jax.tree.map(jnp.array, ss)
        ss2 = jax.tree.map(jnp.array, ss)
        s1, d1, l1, i1 = run_sampling(lg, ss1, params, scfg)
        s2, d2, l2, i2 = run_sampling(lg, ss2, params, scfg, flatten=True)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(l1, l2)
        # the Welford stats that drive R-hat agree (batch-merged vs
        # per-draw accumulation)
        np.testing.assert_allclose(np.asarray(s1.lp_mean),
                                   np.asarray(s2.lp_mean), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(s1.lp_m2),
                                   np.asarray(s2.lp_m2), rtol=1e-10)
        # flattening SAVES the classic per-transition entry evaluation
        assert int(np.sum(i2.n_grads)) < int(np.sum(i1.n_grads))

    def test_early_stop_contract(self):
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg = SamplingConfig(min_iter=10, max_iter=60, block_size=5,
                              max_trajectory_doublings=4, max_step_halvings=4,
                              rhat_converge_tol=1.2)
        lg, params, ss = self._setup(scfg)
        _, draws, _, info = run_sampling(lg, jax.tree.map(jnp.array, ss),
                                         params, scfg, flatten=True)
        assert 10 <= info.sampling_iters <= 60
        assert np.asarray(draws).shape[0] == info.sampling_iters

    def test_flatten_with_chain_groups_rejected(self):
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg = SamplingConfig(min_iter=2, max_iter=2)
        lg, params, ss = self._setup(scfg, n_chains=4)
        with pytest.raises(ValueError):
            run_sampling(lg, ss, params, scfg, flatten=True, chain_groups=2)


class TestDeviceDraws:
    def test_device_draws_match_host_path(self):
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )
        from walnuts_tpu.parallel.runtime import run_sampling

        logp, dim = std_normal(2)
        lg = make_logp_grad(logp)
        wcfg = WarmupConfig(min_iter=5, max_iter=5)
        scfg = SamplingConfig(min_iter=10, max_iter=10, block_size=5,
                              max_trajectory_doublings=3, max_step_halvings=3)
        keys = jax.random.split(jax.random.key(2), 4)
        ws = jax.vmap(lambda k: init_warmup_state(
            k, jnp.zeros(dim), jnp.ones(dim), jnp.float32(0.5), wcfg, scfg))(keys)
        ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss1 = jax.tree.map(jnp.array, jax.vmap(init_sample_state)(ws))
        ss2 = jax.tree.map(jnp.array, ss1)
        _, d1, l1, _ = run_sampling(lg, ss1, params, scfg)
        _, d2, l2, _ = run_sampling(lg, ss2, params, scfg, device_draws=True)
        assert isinstance(d1, np.ndarray)
        assert isinstance(d2, jax.Array)
        np.testing.assert_array_equal(d1, np.asarray(d2))
        np.testing.assert_array_equal(l1, np.asarray(l2))


def test_thin_device_draws_with_odd_blocks():
    """A min_iter clamp can produce a block whose length is not a thin
    multiple; the device cube must stay gap-free (regression: the
    iteration-derived write offset left a zero row when it == max_iter)."""
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import freeze_params, init_sample_state
    from walnuts_tpu.models import std_normal
    from walnuts_tpu.ops.math import make_logp_grad
    from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

    logp, dim = std_normal(2)
    lg = make_logp_grad(logp)
    wcfg = WarmupConfig(min_iter=4, max_iter=4, block_size=4)
    n_chains = 4

    def pipe(thin):
        # inputs rebuilt per run: run_warmup donates its state buffers
        base = jax.random.key(7)
        keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(
            jnp.arange(n_chains))
        th0 = jax.random.normal(jax.random.fold_in(base, 1), (n_chains, dim))
        grads = jax.vmap(lambda t: lg(t)[1])(th0)
        mass = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5)))(grads)
        s0 = jnp.full((n_chains,), 0.5, th0.dtype)
        # min_iter=3 with block_size=4 clamps the first block to 3
        # iterations (not a thin=2 multiple); rhat tol ~1 disables early
        # stopping so the full 3+3 block sequence runs
        scfg = SamplingConfig(min_iter=3, max_iter=6, block_size=4,
                              rhat_converge_tol=1.0 + 1e-12)
        ws = jax.vmap(
            lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
        )(keys, th0, mass, s0)
        ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        _, d, _, _ = run_sampling(lg, ss, params, scfg,
                                  device_draws=True, thin=thin)
        return np.asarray(d)

    full = pipe(1)
    thinned = pipe(2)
    assert full.shape[0] == 6
    # blocks of 3 and 3: within-block 2nd draws are global rows 1 and 4
    assert thinned.shape[0] == 2
    np.testing.assert_array_equal(full[[1, 4]], thinned)
    assert np.all(thinned != 0)  # no zero-row gap
