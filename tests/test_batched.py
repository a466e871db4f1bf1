"""Batched-native sampling block: bitwise equivalence to the classic path.

The batched scheduler (``core/batched.py``) re-schedules the SAME Markov
chain — one key split per attempt, leaf uniforms from the leaf-completing
attempt's subkey, a 3-way split per trajectory start — so for every
run-ahead depth B and tier-2 amortisation K the emitted draws, log
densities, depths, and end-of-block PRNG keys must equal the classic
vmapped sampler's bitwise (CPU, f64). This is the strongest possible
correctness oracle: any scheduling bug that touches the chain (a stale
parked lane, a clobbered buffer slot, a mis-masked tier-2 write) breaks
exact equality somewhere in a funnel batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.batched import make_batched_sample_block
from walnuts_tpu.core.sampler import (
    freeze_params,
    init_sample_state,
    init_warmup_state,
    make_sample_step,
)
from walnuts_tpu.models import funnel
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import run_warmup

C = 16
DRAWS = 30


@pytest.fixture(scope="module")
def warmed():
    """A realistically adapted funnel state (warmup via the normal path)."""
    logp, dim = funnel(11)
    lg = make_logp_grad(logp)
    wcfg = WarmupConfig(min_iter=40, max_iter=40, block_size=20)
    scfg = SamplingConfig(
        min_iter=DRAWS, max_iter=DRAWS, block_size=DRAWS, max_step_halvings=8
    )
    base = jax.random.key(7)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(jax.random.fold_in(base, 99), (C, dim))
    grads = jax.vmap(lambda t: lg(t)[1])(theta0)
    im0 = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5)))(grads)
    step0 = jax.jit(
        jax.vmap(lambda k, t, m: adapt_step_size(k, lg, t, m, jnp.asarray(1.0)))
    )(keys, theta0, im0)
    ws = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
    )(keys, theta0, im0, step0)
    ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg)
    params = jax.vmap(freeze_params)(ws)
    ss = jax.vmap(init_sample_state)(ws)

    sstep = make_sample_step(lg, scfg)
    vstep = jax.vmap(sstep)

    def classic(ss):
        def body(s, _):
            s, res = vstep(s, params)
            return s, (res.theta, res.logp, res.depth)

        return jax.lax.scan(body, ss, None, length=DRAWS)

    ss_end, (th, lp, dep) = jax.jit(classic)(jax.tree.map(jnp.array, ss))
    return dict(
        lg=lg, scfg=scfg, params=params, ss=ss,
        classic=(np.asarray(th), np.asarray(lp), np.asarray(dep),
                 np.asarray(jax.random.key_data(ss_end.key)),
                 np.asarray(ss_end.n_grads - ss.n_grads)),
    )


def run_batched(warmed, B, K, num_draws=DRAWS, min_latched=1,
                defer_splits=True, pallas_replay=False, fresh_cur=False,
                bounded_sweeps=None):
    lg, scfg, params = warmed["lg"], warmed["scfg"], warmed["params"]
    ss = jax.tree.map(jnp.array, warmed["ss"])
    start_block, sample_block = make_batched_sample_block(
        lg,
        scfg.max_trajectory_doublings,
        scfg.max_step_halvings,
        runahead=B,
        tier2_every=K,
        min_latched=min_latched,
        defer_splits=defer_splits,
        pallas_replay=pallas_replay,
        fresh_cur=fresh_cur,
        bounded_sweeps=bounded_sweeps,
    )

    @jax.jit
    def blk(ss):
        st = start_block(
            ss.key, ss.theta, ss.n_grads, ss.fails,
            params.step_size, params.inv_mass, params.min_micro,
        )
        return sample_block(
            st, params.step_size, params.inv_mass, params.min_micro,
            jnp.asarray(scfg.max_hamiltonian_error), num_draws,
        )

    return blk(ss)


class TestBatchedBitwise:
    @pytest.mark.parametrize(
        "B,K,T",
        [(1, 0, 1), (8, 0, 1), (8, 4, 1), (16, 2, 1), (4, 12, 1),
         (64, 6, 1),
         # min_latched is scheduling-only too: strict every-K cadence
         # (T=0), and pass deferral until 5 lanes latched (T=5)
         (8, 4, 0), (8, 4, 5), (8, 6, C)],
    )
    def test_draws_bitwise_equal_classic(self, warmed, B, K, T):
        th, lp, dep, key_data, _ = warmed["classic"]
        res = run_batched(warmed, B, K, min_latched=T)
        np.testing.assert_array_equal(th, np.asarray(res.draws))
        np.testing.assert_array_equal(lp, np.asarray(res.logps))
        np.testing.assert_array_equal(dep, np.asarray(res.depths))
        # end-of-block keys identical -> the NEXT block (classic or
        # batched) continues the same stream
        np.testing.assert_array_equal(
            key_data, np.asarray(jax.random.key_data(res.key))
        )

    @pytest.mark.parametrize("bounded", [False, True])
    def test_bounded_sweeps_bitwise_equal_classic(self, warmed, bounded):
        """Both tier-2 sweep forms (static fused sweeps vs batch-max-
        bounded while loops — picked by row width at trace time,
        ``_use_bounded``) emit classic-bitwise draws. The explicit
        override exercises the form the low-dim test model's auto rule
        would not pick."""
        th, lp, dep, key_data, _ = warmed["classic"]
        res = run_batched(warmed, 8, 6, bounded_sweeps=bounded)
        np.testing.assert_array_equal(th, np.asarray(res.draws))
        np.testing.assert_array_equal(lp, np.asarray(res.logps))
        np.testing.assert_array_equal(dep, np.asarray(res.depths))
        np.testing.assert_array_equal(
            key_data, np.asarray(jax.random.key_data(res.key))
        )

    @pytest.mark.parametrize("B,K", [(8, 6), (4, 12)])
    def test_pallas_replay_bitwise_equal_classic(self, warmed, B, K):
        """The fused replay-chain kernel (ops/prng.py, interpret mode on
        CPU) is the same RNG stream: draws and end-of-block keys stay
        bitwise equal to the classic sampler."""
        th, lp, dep, key_data, _ = warmed["classic"]
        res = run_batched(warmed, B, K, pallas_replay=True)
        np.testing.assert_array_equal(th, np.asarray(res.draws))
        np.testing.assert_array_equal(lp, np.asarray(res.logps))
        np.testing.assert_array_equal(dep, np.asarray(res.depths))
        np.testing.assert_array_equal(
            key_data, np.asarray(jax.random.key_data(res.key))
        )

    @pytest.mark.parametrize("B,K", [(8, 6), (1, 0)])
    def test_fresh_cur_exact_logic_eager(self, warmed, B, K):
        """fresh_cur (tier-2 marks the cursor stale instead of writing
        cur := ms; the next trip integrates from ms) computes the exact
        same real-number chain — proven here bitwise in EAGER mode,
        where each op runs unfused. Under jit it is valid-but-not-
        bitwise: the select feeding the leapfrog changes XLA's fusion/
        FMA contraction (measured ~1e-17 per trip on CPU f64), the same
        correctness class as ``bf16_ends``. Short horizon: eager while
        loops are slow."""
        with jax.disable_jit():
            r0 = run_batched(warmed, B, K, num_draws=2)
            r1 = run_batched(warmed, B, K, num_draws=2, fresh_cur=True)
        np.testing.assert_array_equal(np.asarray(r0.draws),
                                      np.asarray(r1.draws))
        np.testing.assert_array_equal(np.asarray(r0.logps),
                                      np.asarray(r1.logps))
        np.testing.assert_array_equal(np.asarray(r0.depths),
                                      np.asarray(r1.depths))
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(r0.key)),
            np.asarray(jax.random.key_data(r1.key)),
        )

    @pytest.mark.parametrize("B,K", [(8, 6), (8, 0), (4, 12)])
    def test_eager_splits_bitwise_equal_classic(self, warmed, B, K):
        """defer_splits=False (the per-trip split) is the same stream."""
        th, lp, dep, key_data, _ = warmed["classic"]
        res = run_batched(warmed, B, K, defer_splits=False)
        np.testing.assert_array_equal(th, np.asarray(res.draws))
        np.testing.assert_array_equal(lp, np.asarray(res.logps))
        np.testing.assert_array_equal(dep, np.asarray(res.depths))
        # end-of-block keys identical -> the NEXT block (classic or
        # batched) continues the same stream
        np.testing.assert_array_equal(
            key_data, np.asarray(jax.random.key_data(res.key))
        )

    def test_gradient_accounting(self, warmed):
        """The batched path saves exactly one cached gradient per draw
        after the first (the classic path re-evaluates the start point,
        walnuts.hpp:531-532); everything else must match."""
        _, _, _, _, classic_grads = warmed["classic"]
        res = run_batched(warmed, 8, 6)
        # n_grads_delta is sample_block's own work; adding start_block's
        # one entry evaluation gives classic minus the (DRAWS - 1)
        # cached trajectory-start gradients
        batched = np.asarray(res.n_grads_delta) + 1
        np.testing.assert_array_equal(batched, classic_grads - (DRAWS - 1))

    def test_trip_counters_bound_padding(self, warmed):
        """Executed trips are at least the max-lane gradient count (the
        scheduling floor) and finite."""
        res = run_batched(warmed, 8, 6)
        trips = int(res.n_inner_trips)
        per_lane = np.asarray(res.n_grads_delta)
        assert trips >= per_lane.max() - 1
        assert int(res.n_outer_trips) > 0


class TestBatchedDeepOrbits:
    """Deep trajectory trees (max_trajectory_doublings=9, tiny step) so
    the merge cascade pops MULTIPLE stack levels per leaf and the stack
    push hits high slots — the regime the batch-max-bounded tier-2 loops
    (``_cascade_body``/``_push_body``) must schedule without touching the
    Markov chain."""

    def test_deep_tree_bitwise_equal_classic(self, warmed):
        lg, params = warmed["lg"], warmed["params"]
        # tiny step + unit micro force long orbits: depth reaches 7-9, so
        # leaf indices with 3-6 trailing zeros (multi-level cascades) occur
        deep = jax.tree.map(jnp.array, params)._replace(
            step_size=jnp.full_like(params.step_size, 0.05),
            min_micro=jnp.ones_like(params.min_micro),
        )
        scfg = SamplingConfig(
            min_iter=8, max_iter=8, block_size=8,
            max_trajectory_doublings=9, max_step_halvings=8,
        )
        ss = jax.tree.map(jnp.array, warmed["ss"])
        sstep = make_sample_step(lg, scfg)
        vstep = jax.vmap(sstep)

        def classic(s):
            def body(s, _):
                s, res = vstep(s, deep)
                return s, (res.theta, res.logp, res.depth)

            return jax.lax.scan(body, s, None, length=8)

        _, (th, lp, dep) = jax.jit(classic)(ss)
        assert int(jnp.max(dep)) >= 6, "fixture failed to reach deep trees"

        start_block, sample_block = make_batched_sample_block(
            lg, scfg.max_trajectory_doublings, scfg.max_step_halvings,
            runahead=4, tier2_every=6,
        )
        ss2 = jax.tree.map(jnp.array, warmed["ss"])

        @jax.jit
        def blk(s):
            st = start_block(
                s.key, s.theta, s.n_grads, s.fails,
                deep.step_size, deep.inv_mass, deep.min_micro,
            )
            return sample_block(
                st, deep.step_size, deep.inv_mass, deep.min_micro,
                jnp.asarray(scfg.max_hamiltonian_error), 8,
            )

        res = blk(ss2)
        np.testing.assert_array_equal(np.asarray(th), np.asarray(res.draws))
        np.testing.assert_array_equal(np.asarray(lp), np.asarray(res.logps))
        np.testing.assert_array_equal(np.asarray(dep), np.asarray(res.depths))


class TestBatchedRuntime:
    """run_sampling(batched=...) must reproduce the classic runtime's
    draws bitwise, including with dynamic cost-sorted groups and across
    multiple blocks (the block boundary re-enters like the classic
    path), and compose with thin/checkpointing."""

    @pytest.fixture(scope="class")
    def classic_run(self, warmed):
        from walnuts_tpu.config import SamplingConfig
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg = SamplingConfig(
            min_iter=24, max_iter=24, block_size=8, max_step_halvings=8
        )
        ss = jax.tree.map(jnp.array, warmed["ss"])
        state, draws, logps, info = run_sampling(
            warmed["lg"], ss, warmed["params"], scfg
        )
        return scfg, np.asarray(draws), np.asarray(logps)

    @pytest.mark.parametrize("groups", [1, 2, 4])
    def test_matches_classic_across_blocks(self, warmed, classic_run, groups):
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg, draws_c, logps_c = classic_run
        ss = jax.tree.map(jnp.array, warmed["ss"])
        state, draws, logps, info = run_sampling(
            warmed["lg"], ss, warmed["params"], scfg,
            batched=True, batched_groups=groups, runahead=4, tier2_every=3,
        )
        np.testing.assert_array_equal(draws_c, np.asarray(draws))
        np.testing.assert_array_equal(logps_c, np.asarray(logps))

    def test_thin_and_device_draws(self, warmed, classic_run):
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg, draws_c, _ = classic_run
        ss = jax.tree.map(jnp.array, warmed["ss"])
        _, draws, _, _ = run_sampling(
            warmed["lg"], ss, warmed["params"], scfg,
            batched=True, batched_groups=2, thin=2, device_draws=True,
        )
        np.testing.assert_array_equal(draws_c[1::2], np.asarray(draws))

    def test_incompatible_options(self, warmed):
        from walnuts_tpu.config import SamplingConfig
        from walnuts_tpu.parallel.runtime import run_sampling

        scfg = SamplingConfig(min_iter=8, max_iter=8, block_size=8)
        ss = jax.tree.map(jnp.array, warmed["ss"])
        with pytest.raises(ValueError):
            run_sampling(warmed["lg"], ss, warmed["params"], scfg,
                         batched=True, flatten=True)
        with pytest.raises(ValueError):
            run_sampling(warmed["lg"], ss, warmed["params"], scfg,
                         batched_groups=2)

    def test_batched_warmup_matches_classic(self):
        """run_warmup(batched=True) — the ASYNCHRONOUS per-lane warmup —
        reproduces the classic adaptive warmup exactly in schedule and to
        float-contraction tolerance in values, across multiple blocks:

        * end PRNG keys are BITWISE equal (integer arithmetic — proves
          the per-lane split schedule, and hence the Markov schedule, is
          identical);
        * draws / log densities / frozen params match to ~1e-9 (not
          bitwise: the classic program FMA-contracts the Welford mass
          observe where the batched pass kernel rounds per-op — measured
          ~1 ulp per observe, the batched side matching a NumPy per-op
          replay bit-for-bit; lax.optimization_barrier cannot force
          either contraction);
        * the cached trajectory-start gradient accounting is exact (one
          fresh evaluation per block instead of per draw)."""
        from walnuts_tpu.config import SamplingConfig, WarmupConfig
        from walnuts_tpu.core.adapt import nutpie_init_mass
        from walnuts_tpu.core.sampler import init_warmup_state
        from walnuts_tpu.models import funnel as funnel_model
        from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
        from walnuts_tpu.parallel.runtime import run_warmup

        logp, dim = funnel_model(7)
        lg = make_logp_grad(logp)
        C = 12
        wcfg = WarmupConfig(min_iter=36, max_iter=36, block_size=12)
        scfg = SamplingConfig(
            min_iter=10, max_iter=10, block_size=10, max_step_halvings=8
        )

        def mkws():
            base = jax.random.key(3)
            keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(
                jnp.arange(C)
            )
            theta0 = 2.0 * jax.random.normal(
                jax.random.fold_in(base, 99), (C, dim)
            )
            grads = jax.vmap(lambda t: lg(t)[1])(theta0)
            im0 = jax.vmap(
                lambda g: nutpie_init_mass(g, jnp.asarray(1e-5))
            )(grads)
            step0 = jax.jit(jax.vmap(
                lambda k, t, m: adapt_step_size(k, lg, t, m, jnp.asarray(1.0))
            ))(keys, theta0, im0)
            return jax.vmap(
                lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
            )(keys, theta0, im0, step0)

        ws_c, dc, lc, _ = run_warmup(lg, mkws(), wcfg, scfg, save_warmup=True)
        ws_b, db, lb, _ = run_warmup(
            lg, mkws(), wcfg, scfg, save_warmup=True, batched=True
        )
        np.testing.assert_allclose(dc, db, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(lc, lb, rtol=1e-9, atol=1e-9)
        pc = jax.vmap(freeze_params)(ws_c)
        pb = jax.vmap(freeze_params)(ws_b)
        np.testing.assert_allclose(
            np.asarray(pc.step_size), np.asarray(pb.step_size), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(pc.inv_mass), np.asarray(pb.inv_mass), rtol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(pc.min_micro), np.asarray(pb.min_micro)
        )
        np.testing.assert_array_equal(
            np.asarray(ws_c.iteration), np.asarray(ws_b.iteration)
        )
        np.testing.assert_array_equal(
            jax.random.key_data(ws_c.key), jax.random.key_data(ws_b.key)
        )
        # 3 blocks of 12 draws: 36 - 3 trajectory-start gradients cached
        np.testing.assert_array_equal(
            np.asarray(ws_b.n_grads), np.asarray(ws_c.n_grads) - 33
        )

        # Within the async family, run-ahead depth and cost-sorted
        # groups are scheduling-only: keys/ints are BITWISE across B /
        # groups, and the warmup floats agree to contraction tolerance.
        # (Through round 3 the floats were bitwise too — the stacked
        # acc_v/ms/cur buffers acted as materialisation barriers that
        # pinned XLA's FMA contraction of the adaptation chain across
        # programs. The round-4 plane-split removed those stacks for a
        # measured tier-2 traffic win, so per-program fusion may now
        # contract the Welford observe differently at different B —
        # ~5e-14 absolute on this test, the same correctness class as
        # the classic-vs-async caveat above. SAMPLING B/K-invariance
        # remains bitwise: no adaptation arithmetic in the pass.)
        for kw in (dict(runahead=1), dict(batched_groups=2),
                   dict(tier2_every=12)):
            ws_b1, db1, lb1, _ = run_warmup(
                lg, mkws(), wcfg, scfg, save_warmup=True, batched=True,
                **kw,
            )
            np.testing.assert_allclose(np.asarray(db), np.asarray(db1),
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(np.asarray(lb), np.asarray(lb1),
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_array_equal(
                jax.random.key_data(ws_b.key),
                jax.random.key_data(ws_b1.key),
            )
            np.testing.assert_array_equal(
                np.asarray(ws_b.iteration), np.asarray(ws_b1.iteration)
            )
            np.testing.assert_array_equal(
                np.asarray(ws_b.n_grads), np.asarray(ws_b1.n_grads)
            )
            for a, b in zip(jax.tree.leaves(ws_b.mass),
                            jax.tree.leaves(ws_b1.mass)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-9, atol=1e-12)

    def test_api_batched_end_to_end(self):
        """walnuts(batched=True, batched_groups=2) matches the classic
        scheduler through the full public API: allclose end-to-end (the
        async warmup's adaptation differs from classic by float
        contraction only — see test_batched_warmup_matches_classic) and
        BITWISE within the batched family across group counts."""
        from walnuts_tpu import walnuts
        from walnuts_tpu.models import funnel as funnel_model

        logp, dim = funnel_model(5)
        kw = dict(
            num_params=dim, num_chains=8, seed=31,
            min_warmup_iter=20, max_warmup_iter=20,
            min_sampling_iter=16, max_sampling_iter=16, block_size=8,
        )
        classic = walnuts(logp, batched=False, **kw)
        batched = walnuts(logp, batched=True, batched_groups=2, **kw)
        for a, b in zip(classic, batched):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-7
            )
        batched1 = walnuts(logp, batched=True, **kw)
        for a, b in zip(batched1, batched):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
