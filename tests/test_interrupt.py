"""KeyboardInterrupt contract (reference interrupts.hpp:34-102).

The reference installs a SIGINT handler and finishes the current
iteration before returning whatever was drawn so far. The TPU runtime's
analog catches KeyboardInterrupt BETWEEN blocks (runtime.py run_warmup /
run_sampling): the state reached so far is kept, ``info.interrupted``
is set, partial draws are returned, and — with a checkpointer — the run
resumes bitwise. These tests raise from the ``progress`` callback
(which runs inside the guarded loop, after a block lands), the same
place a user's Ctrl-C lands between blocks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walnuts_tpu import walnuts
from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.sampler import (
    freeze_params,
    init_sample_state,
    init_warmup_state,
)
from walnuts_tpu.models import std_normal
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

LOGP, DIM = std_normal(3)


@pytest.fixture(scope="module")
def setup():
    logp_grad = make_logp_grad(LOGP)
    C, dtype = 4, jnp.float64
    wcfg = WarmupConfig(min_iter=12, max_iter=12, block_size=4)
    scfg = SamplingConfig(min_iter=12, max_iter=12, block_size=4,
                          max_step_halvings=5)
    base = jax.random.key(3)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(jax.random.fold_in(base, 99),
                                     (C, DIM), dtype)
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    im0 = jax.vmap(
        lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    sk = jax.vmap(lambda c: jax.random.fold_in(base, c + C))(jnp.arange(C))
    step0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, logp_grad, t, m,
                                        jnp.asarray(1.0, dtype))
    ))(sk, theta0, im0)
    ws0 = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
    )(keys, theta0, im0, step0)

    def fresh():  # the block programs donate their input state
        return jax.tree.map(lambda x: x.copy(), ws0)

    return logp_grad, fresh, wcfg, scfg


def _interrupting(after_iter):
    calls = {"n": 0}

    def progress(phase, iteration):
        calls["n"] += 1
        if iteration >= after_iter:
            raise KeyboardInterrupt

    return progress


class TestRuntimeInterrupt:
    def test_sampling_interrupt_returns_partial_draws(self, setup):
        logp_grad, fresh, wcfg, scfg = setup
        ws, _, _, info0 = run_warmup(logp_grad, fresh(), wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        full = run_sampling(logp_grad, ss, params, scfg, info=info0,
                            batched=True)
        s2, draws, logps, info = run_sampling(
            logp_grad, ss, params, scfg, info=info0, batched=True,
            progress=_interrupting(4),
        )
        assert info.interrupted
        assert info.sampling_iters == 4
        assert draws.shape[0] == 4
        # the partial draws are exactly the uninterrupted run's prefix
        np.testing.assert_array_equal(draws, np.asarray(full[1])[:4])
        np.testing.assert_array_equal(logps, np.asarray(full[2])[:4])

    def test_sampling_interrupt_device_draws_prefix(self, setup):
        logp_grad, fresh, wcfg, scfg = setup
        ws, _, _, info0 = run_warmup(logp_grad, fresh(), wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        full = run_sampling(logp_grad, ss, params, scfg, info=info0,
                            batched=True)
        _, draws, _, info = run_sampling(
            logp_grad, ss, params, scfg, info=info0, batched=True,
            device_draws=True, progress=_interrupting(8),
        )
        assert info.interrupted and draws.shape[0] == 8
        np.testing.assert_array_equal(np.asarray(draws),
                                      np.asarray(full[1])[:8])

    def test_warmup_interrupt_keeps_adaptation(self, setup):
        logp_grad, fresh, wcfg, scfg = setup
        ws, _, _, info = run_warmup(logp_grad, fresh(), wcfg, scfg,
                                    progress=_interrupting(8),
                                    batched=True)
        assert info.interrupted
        assert info.warmup_iters == 8
        # the partially adapted state matches an 8-iteration warmup
        short = WarmupConfig(min_iter=8, max_iter=8, block_size=4)
        ws8, _, _, _ = run_warmup(logp_grad, fresh(), short, scfg,
                                  batched=True)
        np.testing.assert_array_equal(np.asarray(ws.theta),
                                      np.asarray(ws8.theta))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(ws.key)),
            np.asarray(jax.random.key_data(ws8.key)),
        )


class TestApiInterrupt:
    def _run(self, tmp=None, **kw):
        defaults = dict(
            num_params=DIM, num_chains=3, seed=77,
            min_warmup_iter=12, max_warmup_iter=12,
            min_sampling_iter=12, max_sampling_iter=12,
            block_size=4, return_info=True,
        )
        defaults.update(kw)
        if tmp is not None:
            defaults["checkpoint_dir"] = str(tmp)
        return walnuts(LOGP, **defaults)

    def test_warmup_interrupt_yields_zero_draws(self, monkeypatch):
        """api.py's warmup-interrupt path: the run stops, reporting the
        adaptation reached with zero sampling draws."""
        import builtins

        real_print = builtins.print

        def raising_print(*args, **kw):
            if args and "Warmup" in str(args[0]):
                raise KeyboardInterrupt
            return real_print(*args, **kw)

        monkeypatch.setattr(builtins, "print", raising_print)
        outputs, info = self._run(refresh=4)
        assert info.interrupted
        assert all(np.asarray(o).shape[0] == 0 for o in outputs)

    def test_sampling_interrupt_partial_then_checkpoint_resume(
        self, monkeypatch, tmp_path
    ):
        """Ctrl-C mid-sampling keeps the partial draws; re-running from
        the checkpoint completes the run bitwise."""
        plain, _ = self._run()

        import builtins

        real_print = builtins.print

        def raising_print(*args, **kw):
            if args and "Sampling" in str(args[0]) and "Iteration 8" in str(
                    args[0]):
                raise KeyboardInterrupt
            return real_print(*args, **kw)

        monkeypatch.setattr(builtins, "print", raising_print)
        partial, info = self._run(tmp_path / "ck", refresh=4)
        assert info.interrupted
        assert all(np.asarray(o).shape[0] == 8 for o in partial)
        for a, b in zip(partial, plain):
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(b)[:8])

        monkeypatch.setattr(builtins, "print", real_print)
        resumed, info2 = self._run(tmp_path / "ck", refresh=0)
        assert not info2.interrupted
        for a, b in zip(resumed, plain):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBlockBudget:
    """Automatic block-size capping (runtime._BlockBudget): the first
    two blocks are timed, and over-budget per-draw estimates shrink the
    subsequent block cap. Block length is scheduling-only (block-size
    invariance is guarded by the batched bitwise suite), so the unit
    tests drive the estimator directly."""

    def test_shrinks_on_over_budget_first_block(self):
        from walnuts_tpu.parallel.runtime import _BlockBudget

        b = _BlockBudget(0.001, 50)
        b.start()
        import time as _t

        _t.sleep(0.05)
        b.finish(jnp.zeros(()), 50)
        assert b.cap < 50 and b.cap >= 1

    def test_no_shrink_under_budget(self):
        from walnuts_tpu.parallel.runtime import _BlockBudget

        b = _BlockBudget(1000.0, 50)
        for _ in range(2):
            b.start()
            b.finish(jnp.zeros(()), 50)
        assert b.cap == 50

    def test_cold_compile_first_block_uses_min(self):
        from walnuts_tpu.parallel.runtime import _BlockBudget
        import time as _t

        b = _BlockBudget(0.08, 50)
        b.start()
        _t.sleep(0.1)  # "compile-inflated" first block: over budget
        b.finish(jnp.zeros(()), 50)
        first_cap = b.cap
        assert first_cap < 50  # reacted immediately (can't wait 90s twice)
        b2 = _BlockBudget(0.08, 50)
        b2.start()
        b2.finish(jnp.zeros(()), 50)  # fast block
        b2.start()
        _t.sleep(0.1)
        b2.finish(jnp.zeros(()), 50)  # slow second: min() keeps the fast
        assert b2.cap == 50

    def test_disabled_with_zero_budget(self):
        from walnuts_tpu.parallel.runtime import _BlockBudget

        b = _BlockBudget(0.0, 50)
        b.start()
        b.finish(jnp.zeros(()), 50)
        assert b.cap == 50 and b._t0 is None

    def test_per_draw_estimate_across_unequal_blocks(self):
        """The two timed blocks commonly have different lengths (the
        first is clipped to min_iter): the estimate must be the min of
        the PER-DRAW rates, not min(raw dt)/n-of-the-last-block — the
        old form underestimated per-draw cost by up to n2/n1 and let
        later blocks blow the watchdog budget (ADVICE r4)."""
        from walnuts_tpu.parallel.runtime import _BlockBudget
        import time as _t

        b = _BlockBudget(0.2, 50)
        b.start()
        _t.sleep(0.02)
        b.finish(jnp.zeros(()), 2)    # short min_iter-clipped block
        b.start()
        _t.sleep(0.1)
        b.finish(jnp.zeros(()), 20)   # full block: 5 ms/draw
        # per-draw >= 5 ms -> 50-draw blocks need >= 0.25 s > budget:
        # the cap must shrink (the buggy min(dt)/n gave 1 ms/draw, no
        # shrink)
        assert b.cap < 50

    def test_early_stop_checkpoints_invariant_to_capping(self, setup):
        """Budget capping must not move the early-stop check points:
        capped sub-blocks accumulate to the user-config block_size
        boundaries, so rhat_trace / warmup length / draws are identical
        on a fast and a (transiently) slow machine (ADVICE r4)."""
        logp_grad, fresh, wcfg, scfg = setup
        wcfg2 = WarmupConfig(min_iter=4, max_iter=12, block_size=4)
        scfg2 = SamplingConfig(min_iter=4, max_iter=12, block_size=4,
                               max_step_halvings=5,
                               rhat_converge_tol=1.0 + 1e-12)
        outs = []
        for budget in (0.0, 1e-9):
            ws, _, _, winfo = run_warmup(logp_grad, fresh(), wcfg2, scfg,
                                         block_budget=budget)
            params = jax.vmap(freeze_params)(ws)
            ss = jax.vmap(init_sample_state)(ws)
            st, draws, _, info = run_sampling(
                logp_grad, ss, params, scfg2, batched=True,
                block_budget=budget)
            outs.append((winfo.warmup_iters, draws, info))
        (wit_a, draws_a, info_a), (wit_b, draws_b, info_b) = outs
        assert wit_a == wit_b
        assert info_a.sampling_iters == info_b.sampling_iters
        # the trace has one entry per USER block boundary either way
        assert len(info_a.rhat_trace) == len(info_b.rhat_trace) == 3
        np.testing.assert_array_equal(info_a.rhat_trace,
                                      info_b.rhat_trace)
        np.testing.assert_array_equal(np.asarray(draws_a),
                                      np.asarray(draws_b))

    def test_end_to_end_caps_blocks(self, setup):
        """A tiny budget shrinks the realized block schedule (visible
        through the checkpoint-free draws still being exact — block
        length is scheduling-only)."""
        logp_grad, fresh, wcfg, scfg = setup
        ws, _, _, info0 = run_warmup(logp_grad, fresh(), wcfg, scfg)
        params = jax.vmap(freeze_params)(ws)
        ss = jax.vmap(init_sample_state)(ws)
        base = run_sampling(logp_grad, ss, params, scfg, info=info0,
                            batched=True, block_budget=0.0)
        capped = run_sampling(logp_grad, ss, params, scfg, info=info0,
                              batched=True, block_budget=1e-9)
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(capped[1]))
