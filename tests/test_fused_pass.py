"""Fused tier-2 pass kernel (ops/fused_pass.py): bitwise oracle.

The kernel restates ``_resolve_pending`` + draw banking operation for
operation, and derives all trajectory-entry randomness from the
ops/prng.py threefry restatements (bitwise vs jax.random,
tests/test_prng.py). On CPU (interpret mode, f64) the full sampling
block must therefore emit DRAWS BITWISE EQUAL to the XLA pass — which
is itself bitwise equal to the classic per-draw scheduler
(tests/test_batched.py) — making the fused kernel transitively
draw-exact with the classic sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.sampler import (
    freeze_params,
    init_sample_state,
    init_warmup_state,
)
from walnuts_tpu.models import funnel, logistic_regression
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import run_sampling, run_warmup


def _adapted(model, dim, C, dtype, warmup=20, halvings=5, doublings=None):
    if model == "funnel":
        logp, dim = funnel(dim)
    else:
        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)
    kw = {} if doublings is None else {"max_trajectory_doublings": doublings}
    wcfg = WarmupConfig(min_iter=warmup, max_iter=warmup, block_size=warmup)
    scfg = SamplingConfig(min_iter=30, max_iter=30, block_size=15,
                          max_step_halvings=halvings, **kw)
    base = jax.random.key(7)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(jax.random.fold_in(base, 99),
                                     (C, dim), dtype)
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    im0 = jax.vmap(
        lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    sk = jax.vmap(lambda c: jax.random.fold_in(base, c + C))(jnp.arange(C))
    step0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, logp_grad, t, m,
                                        jnp.asarray(1.0, dtype))
    ))(sk, theta0, im0)
    ws = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
    )(keys, theta0, im0, step0)
    ws, _, _, info = run_warmup(logp_grad, ws, wcfg, scfg, batched=True)
    return (logp_grad, jax.vmap(freeze_params)(ws),
            jax.vmap(init_sample_state)(ws), scfg, info)


def _assert_same(a, b, n_grads=True):
    s1, d1, l1, i1 = a
    s2, d2, l2, i2 = b
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(s1.key)),
        np.asarray(jax.random.key_data(s2.key)),
    )
    if n_grads:  # classic re-evaluates the cached trajectory-start
        # gradient once per draw — a documented accounting (not chain)
        # difference vs the batched family (core/batched.py docstring)
        np.testing.assert_array_equal(np.asarray(s1.n_grads),
                                      np.asarray(s2.n_grads))
    for f in ("n_halve_fail", "n_nonfinite", "n_depth_exhausted"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1.fails, f)),
            np.asarray(getattr(s2.fails, f)),
        )


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
@pytest.mark.parametrize("tile", [32, 64])
def test_bitwise_vs_xla_pass_funnel(dtype, tile):
    args = _adapted("funnel", 11, 64, dtype)
    logp_grad, params, ss, scfg, info = args
    base = run_sampling(logp_grad, ss, params, scfg, info=info,
                        batched=True)
    fused = run_sampling(logp_grad, ss, params, scfg, info=info,
                         batched=True, pallas_pass=True, pass_tile=tile)
    _assert_same(base, fused)


def test_bitwise_vs_xla_pass_logreg():
    args = _adapted("logreg", 25, 32, jnp.float64)
    logp_grad, params, ss, scfg, info = args
    base = run_sampling(logp_grad, ss, params, scfg, info=info,
                        batched=True)
    fused = run_sampling(logp_grad, ss, params, scfg, info=info,
                         batched=True, pallas_pass=True, pass_tile=32)
    _assert_same(base, fused)


def test_bitwise_vs_classic(monkeypatch):
    """Transitivity check run directly: fused pass == classic
    per-draw scheduler (the foundational oracle of the batched
    family)."""
    args = _adapted("funnel", 11, 32, jnp.float64)
    logp_grad, params, ss, scfg, info = args
    # the classic block donates its input state — run it on a copy
    ss_c = jax.tree.map(lambda x: x.copy(), ss)
    classic = run_sampling(logp_grad, ss_c, params, scfg, info=info,
                           batched=False)
    fused = run_sampling(logp_grad, ss, params, scfg, info=info,
                         batched=True, pallas_pass=True, pass_tile=32)
    _assert_same(classic, fused, n_grads=False)


def test_depth_exhaustion_and_small_depth():
    """max_trajectory_doublings=3 exercises the cascade/push sweeps at
    their slot boundary and the depth-exhaustion counter path."""
    args = _adapted("funnel", 11, 32, jnp.float64, doublings=3)
    logp_grad, params, ss, scfg, info = args
    base = run_sampling(logp_grad, ss, params, scfg, info=info,
                        batched=True)
    fused = run_sampling(logp_grad, ss, params, scfg, info=info,
                         batched=True, pallas_pass=True, pass_tile=32)
    _assert_same(base, fused)
    assert int(np.sum(np.asarray(base[0].fails.n_depth_exhausted))) > 0


def test_runahead_and_k_invariance():
    """Scheduling knobs must not change the chain under the fused pass
    either."""
    args = _adapted("funnel", 11, 32, jnp.float64)
    logp_grad, params, ss, scfg, info = args
    ref = None
    for B, K in ((2, 3), (4, 6), (8, 1)):
        out = run_sampling(logp_grad, ss, params, scfg, info=info,
                           batched=True, pallas_pass=True, pass_tile=32,
                           runahead=B, tier2_every=K)
        if ref is None:
            ref = out
        else:
            _assert_same(ref, out)


def test_incompatible_options_raise():
    from walnuts_tpu.core.batched import make_batched_sample_block

    def fake_lg(t):
        return -0.5 * jnp.sum(t**2), -t

    for kw in ({"fresh_cur": True}, {"bf16_ends": True},
               {"defer_splits": False}, {"pallas_replay": True}):
        with pytest.raises(ValueError):
            make_batched_sample_block(fake_lg, 10, 5, pallas_pass=True,
                                      **kw)
