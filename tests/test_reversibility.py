"""Constructed-case unit tests of the reversibility decision.

The WALNUTS leaf rule (``macro_step`` + ``reversible``,
/root/reference/include/walnutpie/walnuts.hpp:307-345 and :254-279): a
leaf accepted at ``n = min_micro * 2^h`` micro steps (the first halving
level whose |dH| meets the tolerance) must be REJECTED iff some coarser
level ``n/2, n/4, ..., min_micro`` — re-integrated from the flipped
endpoint (``within_tolerance``, walnuts.hpp:218-235) — would itself meet
the tolerance (detailed balance would otherwise be violated: the reverse
trajectory would have stopped halving earlier). The ``n == min_micro``
leaf is trivially reversible and must skip re-integration entirely.

These tests drive the transition body's attempt machine one leaf at a
time and compare the accept/fail decision (and the gradient count) to an
independent NumPy re-implementation of the halving ladder + reversibility
sweep, across many momenta on an asymmetric target so both outcomes
occur. The suite's distribution-level tests could miss a biased
reversibility rule that only shifts tail mass; this is the direct check
SURVEY.md hard-part #2 calls for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.core.adapt import adam_init
from walnuts_tpu.core.transition import make_transition_parts
from walnuts_tpu.ops.math import make_logp_grad


def jx_logp_funnel2(x):
    """2-D Neal funnel (asymmetric: reverse-path coarse errors differ
    from forward ones, so both reversibility outcomes occur)."""
    v, th = x[0], x[1]
    return -0.5 * (v / 3.0) ** 2 - 0.5 * th * th * jnp.exp(-v) - 0.5 * v


# The oracle re-implements the halving/reversibility CONTROL FLOW
# independently, but must use bit-identical f64 ARITHMETIC (the same
# autodiff gradient and logp evaluations) — near-threshold |dH|
# comparisons flip under a hand-written derivative's different rounding.
_LG = make_logp_grad(jx_logp_funnel2)
_lg64 = jax.jit(_LG)


def np_logp(theta):
    return float(_lg64(jnp.asarray(theta, jnp.float64))[0])


def np_grad(theta):
    return np.asarray(_lg64(jnp.asarray(theta, jnp.float64))[1])


def np_joint(theta, rho):
    return np_logp(theta) - 0.5 * float(np.dot(rho, rho))


def np_leapfrog(theta, rho, dt, n):
    """n leapfrog steps; mirrors ops.math.leapfrog_step exactly (same
    operation order, f64, same gradient values)."""
    grad = np_grad(theta)
    for _ in range(n):
        half = 0.5 * dt
        rho = rho + half * grad
        theta = theta + dt * rho
        grad = np_grad(theta)
        rho = rho + half * grad
    return theta, rho


def oracle_leaf(theta0, rho0, dt0, min_micro, max_halvings, max_error):
    """Independent decision for ONE leaf from (theta0, rho0): returns
    (outcome, grads) where outcome is 'accept' or 'fail' and grads counts
    integration gradient evaluations (the re-integration cost included),
    mirroring macro_step + reversible (walnuts.hpp:307-345, 254-279)."""
    joint0 = np_joint(theta0, rho0)
    grads = 0
    for h in range(max_halvings):
        n = min_micro * (2**h)
        dt = dt0 / (2**h)
        th, rh = np_leapfrog(theta0, rho0, dt, n)
        grads += n
        err = abs(joint0 - np_joint(th, rh))
        if not (err <= max_error):  # NaN -> halve
            continue
        if n == min_micro:
            return "accept", grads  # trivially reversible: NO re-integration
        # reversibility sweep from the flipped endpoint
        jf = np_joint(th, rh)
        level, ldt = n // 2, dt * 2.0
        fth, frh = th, -rh
        while level >= min_micro:
            th2, rh2 = np_leapfrog(fth, frh, ldt, level)
            grads += level
            if abs(np_joint(th2, rh2) - jf) <= max_error:
                return "fail", grads  # a coarser level would have passed
            level //= 2
            ldt *= 2.0
        return "accept", grads
    return "fail", grads  # halvings exhausted


def drive_one_leaf(key, theta0, step, min_micro, max_halvings, max_error):
    """Run the transition body until the FIRST leaf resolves; returns
    (outcome, rho0, dt0, grads_used_for_leaf)."""
    lg = make_logp_grad(jx_logp_funnel2)
    init_state, body = make_transition_parts(
        lg, max_depth=1, max_step_halvings=max_halvings,
        adapt_step_size=False,
    )
    theta0 = jnp.asarray(theta0)
    logp0, grad0 = lg(theta0)
    mm = jnp.int32(min_micro)
    me = jnp.asarray(max_error, jnp.float64)
    st = jnp.asarray(step, jnp.float64)
    im = jnp.ones_like(theta0)
    s = init_state(key, theta0, logp0, grad0, st, im, mm,
                   adam_init(st), jnp.int32(0))
    rho0 = np.asarray(s.cur[1])
    dt0 = float(s.dt)

    step_fn = jax.jit(lambda s: body(s, st, im, mm, me))
    for _ in range(200):
        if bool(s.done) or np.isfinite(float(s.run_logw)):
            break
        s = step_fn(s)
    accepted = np.isfinite(float(s.run_logw))
    failed = bool(s.done) and not accepted
    assert accepted != failed, "leaf did not resolve"
    return ("accept" if accepted else "fail"), rho0, dt0, int(s.n_grads)


CONFIGS = [
    # (step, min_micro, max_halvings, max_error, theta0)
    (1.6, 1, 4, 0.5, [0.5, 1.0]),    # deep-ish halving, rev sweeps engage
    (2.5, 1, 6, 0.3, [-1.5, 0.4]),   # neck: heavy halving
    (2.0, 2, 4, 0.35, [-1.5, 0.5]),  # min_micro=2: n==2*min_micro boundary
    (1.2, 1, 2, 0.25, [2.0, 2.0]),   # tight halving budget -> fails occur
]


class TestReversibilityDecision:
    @pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
    def test_leaf_decision_matches_oracle(self, cfg_idx):
        step, mm, mh, me, theta0 = CONFIGS[cfg_idx]
        outcomes = set()
        for seed in range(40):
            key = jax.random.key(1000 * cfg_idx + seed)
            got, rho0, dt0, _ = drive_one_leaf(
                key, np.asarray(theta0, np.float64), step, mm, mh, me
            )
            want, _ = oracle_leaf(
                np.asarray(theta0, np.float64), rho0, dt0, mm, mh, me
            )
            assert got == want, (
                f"cfg {cfg_idx} seed {seed}: transition says {got}, "
                f"oracle says {want} (rho0={rho0}, dt0={dt0})"
            )
            outcomes.add(got)
        # the construction must exercise BOTH branches somewhere,
        # otherwise the test is vacuous
        assert outcomes == {"accept", "fail"}, (
            f"cfg {cfg_idx} only produced {outcomes}"
        )

    def test_min_micro_leaf_skips_reintegration(self):
        """An n == min_micro leaf is trivially reversible: the gradient
        count must be exactly min_micro (no reversibility work),
        walnuts.hpp:255-256."""
        found = False
        for seed in range(30):
            key = jax.random.key(seed)
            got, rho0, dt0, grads = drive_one_leaf(
                key, np.asarray([0.0, 0.1]), 0.05, 3, 4, 0.5
            )
            want, oracle_grads = oracle_leaf(
                np.asarray([0.0, 0.1]), rho0, dt0, 3, 4, 0.5
            )
            assert got == want
            if got == "accept" and oracle_grads == 3:
                # first attempt passed: exactly min_micro gradients
                assert grads == 3
                found = True
        assert found, "no trivially-reversible acceptance was exercised"

    def test_gradient_counts_match_oracle(self):
        """The per-leaf gradient count (forward attempts + reversibility
        re-integrations) matches the reference ladder exactly — the
        quantity the ESS/grad north-star metric counts."""
        step, mm, mh, me, theta0 = CONFIGS[0]
        checked = 0
        for seed in range(25):
            key = jax.random.key(7000 + seed)
            got, rho0, dt0, grads = drive_one_leaf(
                key, np.asarray(theta0, np.float64), step, mm, mh, me
            )
            want, oracle_grads = oracle_leaf(
                np.asarray(theta0, np.float64), rho0, dt0, mm, mh, me
            )
            assert got == want
            assert grads == oracle_grads, (
                f"seed {seed}: {grads} grads vs oracle {oracle_grads}"
            )
            checked += 1
        assert checked == 25

    def test_boundary_two_min_micro(self):
        """n == 2*min_micro: exactly ONE reversibility level (min_micro
        steps at doubled step) decides; constructed by forcing the first
        attempt to fail and the second to pass across many momenta."""
        both = set()
        for seed in range(60):
            key = jax.random.key(40000 + seed)
            got, rho0, dt0, _ = drive_one_leaf(
                key, np.asarray([1.0, -0.8]), 0.9, 2, 4, 0.4
            )
            want, _ = oracle_leaf(np.asarray([1.0, -0.8]), rho0, dt0, 2, 4, 0.4)
            assert got == want
            # classify: did this case land on the n == 2*min_micro level?
            joint0 = np_joint(np.asarray([1.0, -0.8]), rho0)
            th, rh = np_leapfrog(np.asarray([1.0, -0.8]), rho0, dt0, 2)
            first_fails = not (abs(joint0 - np_joint(th, rh)) <= 0.4)
            th2, rh2 = np_leapfrog(np.asarray([1.0, -0.8]), rho0, dt0 / 2, 4)
            second_passes = abs(joint0 - np_joint(th2, rh2)) <= 0.4
            if first_fails and second_passes:
                both.add(got)
        assert both, "boundary level never reached"
