"""Distributional and structural tests of the WALNUTS transition.

Adds the tests the reference lacks (SURVEY.md section 4.4): the transition
itself is validated against analytic target moments within Monte Carlo
error, through both the plain path and the step-halving/reversibility
paths, plus determinism and gradient-count accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.core.adapt import adam_init
from walnuts_tpu.core.transition import make_transition
from walnuts_tpu.models import ill_conditioned_normal, std_normal
from walnuts_tpu.ops.math import make_logp_grad
from walnuts_tpu.summary import effective_sample_size


def run_chains(logp, dim, step, inv_mass, n_chains, n_iter, seed,
               max_depth=6, max_halvings=6, min_micro=1, max_error=0.5,
               bf16_ends=False):
    lg = make_logp_grad(logp)
    tr = make_transition(lg, max_depth=max_depth, max_step_halvings=max_halvings,
                         adapt_step_size=False, bf16_ends=bf16_ends)
    adam = adam_init(step, dtype=jnp.float64)
    inv_mass = jnp.asarray(inv_mass, dtype=jnp.float64)

    def one(key, theta):
        return tr(key, theta, jnp.float64(step), inv_mass,
                  jnp.int32(min_micro), jnp.float64(max_error), adam)

    def body(carry, _):
        keys, thetas = carry
        res = jax.vmap(one)(keys, thetas)
        return (res.key, res.theta), (res.theta, res.depth, res.n_grads)

    keys = jax.random.split(jax.random.key(seed), n_chains)
    theta0 = jax.random.normal(jax.random.key(seed + 1), (n_chains, dim),
                               dtype=jnp.float64)
    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n_iter))
    (_, _), (draws, depths, n_grads) = run((keys, theta0))
    return np.asarray(draws), np.asarray(depths), np.asarray(n_grads)


def moments_within_mcse(draws, true_mean, true_var, z=4.5):
    """Check per-dim mean/variance against truth within z * MCSE.

    The mean MCSE uses the ESS of the draws; the variance MCSE uses the
    ESS of the squared draws (NUTS-family samplers are antithetic: x mixes
    much faster than x^2, so using the ESS of x would understate the
    variance error)."""
    chains = [draws[:, c, :] for c in range(draws.shape[1])]
    ess = effective_sample_size(chains)
    ess_sq = effective_sample_size([c**2 for c in chains])
    flat = draws.reshape(-1, draws.shape[-1])
    sd = flat.std(axis=0, ddof=1)
    mcse_mean = sd / np.sqrt(ess)
    assert np.all(np.abs(flat.mean(0) - true_mean) < z * mcse_mean + 1e-9), (
        flat.mean(0), true_mean, mcse_mean)
    # variance MCSE ~ var * sqrt(2/ess(x^2)) for Gaussians
    mcse_var = true_var * np.sqrt(2.0 / ess_sq)
    assert np.all(np.abs(flat.var(0) - true_var) < z * mcse_var), (
        flat.var(0), true_var, mcse_var)


class TestStdNormalMoments:
    def test_plain_path(self):
        logp, dim = std_normal(4)
        draws, depths, n_grads = run_chains(logp, dim, 0.5, np.ones(4), 32, 400, 0)
        moments_within_mcse(draws[100:], np.zeros(4), np.ones(4))

    def test_halving_path(self):
        """Step 2.5 exceeds the leapfrog stability limit (2.0) for the unit
        normal: every macro step must halve at least once and run the
        reversibility re-integration. The invariant distribution must
        be preserved regardless."""
        logp, dim = std_normal(3)
        draws, depths, n_grads = run_chains(logp, dim, 2.5, np.ones(3), 32, 400, 1)
        moments_within_mcse(draws[100:], np.zeros(3), np.ones(3))
        # halvings force extra gradient evals per transition on average
        assert n_grads.mean() > 3.0

    def test_min_micro_steps(self):
        """min_micro_steps = 4 multiplies the micro-step count per macro
        step; distribution is unchanged."""
        logp, dim = std_normal(3)
        draws, _, n_grads = run_chains(
            logp, dim, 0.25, np.ones(3), 32, 300, 2, min_micro=4
        )
        moments_within_mcse(draws[100:], np.zeros(3), np.ones(3))


class TestBf16Ends:
    """bf16 stack-endpoint storage: the U-turn rule changes (both operands
    rounded to bfloat16) but stays symmetric, so the invariant distribution
    is untouched; draws themselves keep full precision."""

    def test_moments_preserved(self):
        logp, dim = ill_conditioned_normal(4)
        draws, _, _ = run_chains(logp, dim, 0.8, np.ones(4), 32, 500, 13,
                                 bf16_ends=True)
        true_var = np.arange(1.0, 5.0) ** 2
        moments_within_mcse(draws[150:], np.zeros(4), true_var)

    def test_deterministic_and_full_precision_draws(self):
        logp, dim = std_normal(4)
        a, _, _ = run_chains(logp, dim, 0.5, np.ones(4), 8, 50, 21,
                             bf16_ends=True)
        b, _, _ = run_chains(logp, dim, 0.5, np.ones(4), 8, 50, 21,
                             bf16_ends=True)
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.float64
        # draws are NOT bf16-quantized (the selection rows stay f32/f64)
        import ml_dtypes  # jax dependency, always present
        bfq = a.astype(ml_dtypes.bfloat16).astype(np.float64)
        assert not np.array_equal(a, bfq)


class TestSelectionDistribution:
    """Exact law of the within-orbit selection (the load-bearing
    Barker-inside / Metropolis-outside asymmetry, walnuts.hpp:368-387 +
    547): on a FLAT potential every leaf has equal weight, no U-turn or
    halving ever fires, and the orbit runs to max_depth exhaustion -- the
    top-level Metropolis then always accepts each new subtree (equal
    weights), so the selected state must be UNIFORM over the final
    doubling's leaves. Averaged over the fair direction coins this gives
    an exactly enumerable pmf over the integer leapfrog offset k; a
    selection-rule bias (e.g. favouring the newest leaf) would shift it."""

    def test_flat_potential_offset_pmf(self):
        max_depth = 3
        n = 4096
        lg = make_logp_grad(lambda t: jnp.zeros(()))
        tr = make_transition(lg, max_depth=max_depth, max_step_halvings=1,
                             adapt_step_size=False)
        adam = adam_init(0.5, dtype=jnp.float64)
        step = jnp.float64(0.25)
        inv_mass = jnp.ones(1, dtype=jnp.float64)

        def one(key):
            theta0 = jnp.zeros(1, dtype=jnp.float64)
            res = tr(key, theta0, step, inv_mass, jnp.int32(1),
                     jnp.float64(0.5), adam)
            return res.theta[0], res.depth

        keys = jax.random.split(jax.random.key(99), n)
        sel, depth = jax.jit(jax.vmap(one))(keys)
        assert np.all(np.asarray(depth) == max_depth + 1)  # always exhausts
        # theta moves by exactly dt*rho per micro step (zero gradient), so
        # theta_sel = k * step * rho; recompute rho from the key exactly as
        # the transition draws it to recover the integer offset k.
        def rho_of(key):
            _, k_mom, _ = jax.random.split(key, 3)
            z = jax.random.normal(k_mom, (1,), dtype=jnp.float64)
            return z[0]
        rho = np.asarray(jax.jit(jax.vmap(rho_of))(keys))
        k = np.asarray(sel) / (np.float64(step) * rho)
        k_int = np.rint(k).astype(int)
        np.testing.assert_allclose(k, k_int, atol=1e-8)

        # exact pmf by enumeration over the 8 equiprobable direction
        # triples: doubling d adds 2^(d-1) contiguous positions on side
        # dir_d of the current orbit [lo, hi]; selection is uniform over
        # the last doubling's additions.
        from collections import defaultdict
        pmf = defaultdict(float)
        for bits in range(8):
            lo = hi = 0
            added = None
            for d in range(1, max_depth + 1):
                m = 2 ** (d - 1)
                if (bits >> (d - 1)) & 1:   # forward
                    added = list(range(hi + 1, hi + 1 + m)); hi += m
                else:
                    added = list(range(lo - m, lo)); lo -= m
            for pos in added:
                pmf[pos] += (1.0 / 8) * (1.0 / len(added))
        ks = sorted(pmf)
        expected = np.array([pmf[x] for x in ks]) * n
        observed = np.array([(k_int == x).sum() for x in ks], dtype=float)
        assert observed.sum() == n, (sorted(set(k_int)), ks)
        chi2 = float(np.sum((observed - expected) ** 2 / expected))
        # df = len(ks) - 1; crit at p ~ 1e-4 for df <= 15 is < 45
        assert chi2 < 45.0, (chi2, dict(zip(ks, observed)), dict(zip(ks, expected)))


class TestIllConditionedMoments:
    def test_unit_mass(self):
        """sigma_d = d scales with unit mass: WALNUTS must still target the
        correct variances [1, 4, 9, 16] (examples/examples.cpp:20-31)."""
        logp, dim = ill_conditioned_normal(4)
        draws, _, _ = run_chains(logp, dim, 0.8, np.ones(4), 32, 500, 3)
        true_var = np.arange(1.0, 5.0) ** 2
        moments_within_mcse(draws[150:], np.zeros(4), true_var)

    def test_matched_mass(self):
        """With inv_mass = sigma^2 the problem is perfectly preconditioned."""
        dim = 6
        logp, _ = ill_conditioned_normal(dim)
        inv_mass = np.arange(1.0, dim + 1.0) ** 2
        draws, depths, _ = run_chains(logp, dim, 0.9, inv_mass, 32, 400, 4)
        moments_within_mcse(draws[100:], np.zeros(dim), inv_mass)


class TestStructure:
    def _result(self, seed, step=0.5):
        logp, dim = std_normal(3)
        lg = make_logp_grad(logp)
        tr = jax.jit(make_transition(lg, 5, 5, adapt_step_size=False))
        adam = adam_init(step, dtype=jnp.float64)
        return tr(jax.random.key(seed), jnp.full((dim,), 0.3, dtype=jnp.float64),
                  jnp.float64(step), jnp.ones(dim, dtype=jnp.float64),
                  jnp.int32(1), jnp.float64(0.5), adam)

    def test_deterministic_given_key(self):
        r1 = self._result(42)
        r2 = self._result(42)
        np.testing.assert_array_equal(np.asarray(r1.theta), np.asarray(r2.theta))
        assert int(r1.depth) == int(r2.depth)
        assert int(r1.n_grads) == int(r2.n_grads)

    def test_different_keys_differ(self):
        r1 = self._result(42)
        r2 = self._result(43)
        assert not np.array_equal(np.asarray(r1.theta), np.asarray(r2.theta))

    def test_depth_bounds(self):
        for seed in range(8):
            r = self._result(seed)
            assert 1 <= int(r.depth) <= 6  # max_depth + 1 when exhausted

    def test_grad_count_matches_leaf_structure(self):
        """With min_micro=1 and a stable step (no halvings, no
        reversibility work), gradient evals = 1 (initial) + number of
        leaves; a U-turn at depth d implies between 2^(d-1) and 2^d - 1
        leaves; depth = max_depth+1 means the full orbit of 2^max_depth - 1
        leaves completed."""
        for seed in range(8):
            r = self._result(seed, step=0.25)  # small step: no halvings
            depth, n = int(r.depth), int(r.n_grads)
            if depth == 6:
                assert n == 1 + (2**5 - 1)
            else:
                assert 1 + 2 ** (depth - 1) <= n <= 1 + 2**depth - 1

    def test_bad_init_returns_start(self):
        """A -inf starting log density fails every macro step; the selected
        state stays at the initial position (reference: all proposals
        rejected)."""
        def logp(theta):
            return jnp.where(jnp.any(jnp.abs(theta) > 100.0),
                             -0.5 * jnp.sum(jnp.square(theta)), -jnp.inf)
        lg = make_logp_grad(logp)
        tr = jax.jit(make_transition(lg, 4, 3, adapt_step_size=False))
        adam = adam_init(0.5, dtype=jnp.float64)
        theta0 = jnp.zeros(2, dtype=jnp.float64)  # inside the -inf region
        r = tr(jax.random.key(0), theta0, jnp.float64(0.5),
               jnp.ones(2, dtype=jnp.float64), jnp.int32(1),
               jnp.float64(0.5), adam)
        np.testing.assert_array_equal(np.asarray(r.theta), np.asarray(theta0))

    def test_adam_observes_during_adaptive_transition(self):
        logp, dim = std_normal(3)
        lg = make_logp_grad(logp)
        tr = jax.jit(make_transition(lg, 5, 5, adapt_step_size=True))
        adam = adam_init(0.5, dtype=jnp.float64)
        r = tr(jax.random.key(1), jnp.zeros(dim, dtype=jnp.float64),
               jnp.float64(0.5), jnp.ones(dim, dtype=jnp.float64),
               jnp.int32(1), jnp.float64(0.5), adam)
        # one Adam observation per macro step (= per leaf); grads = initial
        # eval + leaves (the selected state's gradient is cursor-cached,
        # never re-evaluated)
        assert float(r.adam.t) >= 1.0
        assert float(r.adam.t) == int(r.n_grads) - 1  # min_micro=1, no halvings
