"""Batched-native WALNUTS sampling: explicit chain-batch scheduling.

The classic path (``core/transition.py``) vmaps a per-chain transition
whose while loop runs until the SLOWEST lane finishes its trajectory, and
whose outer body runs once per ATTEMPT (one step-halving level or one
reversibility level). Under SPMD that costs two kinds of padding, both
measured on funnel(101) x 4096 chains (docs/BENCHMARKS.md):

  * per-draw synchronisation: every draw waits for the per-draw max lane
    (13.4x the mean gradient count), while the max-lane TOTAL over a
    50-draw window is only 5.9x the mean;
  * per-attempt bookkeeping: the full-state masked update body runs
    ``max over lanes of attempt count`` times per draw.

This module rebuilds the sampling block with the chain axis scheduled
explicitly (the reference's thread-per-chain runtime, adapt.hpp:79-146 /
sampler.hpp:47-103, re-imagined for lockstep SPMD rather than
translated). Three scheduling decisions, each driven by a measured
cost/padding probe (docs/BENCHMARKS.md round 3):

  * the halving / reversibility state machine (``macro_step``,
    walnuts.hpp:307-345, and ``reversible``, walnuts.hpp:254-279) moves
    INTO the integration loop as masked per-lane scalar transitions. One
    trip = one batched gradient plus O(1) rows of masked state — the
    heavy orbit bookkeeping ("tier 2": merge cascade, reservoir,
    top-level combine — walnuts.hpp:368-387, 464-495, 520-563) runs only
    every ``tier2_every`` trips, with lanes LATCHING a completed leaf and
    idling at most K-1 trips (a strict leaf barrier was measured to pad
    the integration loop 28x vs the 6.7x window floor, because leaf
    lengths vary from 1 to ``2^max_step_halvings`` steps);
  * a lane that finishes a trajectory banks the draw in a B-deep
    run-ahead buffer and starts the next trajectory IMMEDIATELY; draws
    are emitted in order by a ``lax.scan`` reading buffer slot
    ``r mod B``. A lane only parks when it is B draws ahead of the
    emission cursor, relaxing the per-draw max-lane padding toward the
    B-draw-window max. The buffer is written with masked row updates —
    an XLA scatter at this shape costs ~430 us on v5e (measured,
    serialized) vs ~2 us per masked row, which is why the buffer is
    small and the ring is NOT draw-count deep;
  * per-trip RNG is one key split per attempt end; the three uniforms a
    leaf consumes (reservoir, top-level Metropolis, direction —
    walnuts.hpp:368-387, 547, 552) are NOT generated in the integration
    loop: the leaf-completing attempt's subkey is latched as raw key
    data and the uniforms are derived in tier 2, one batched threefry
    per K trips instead of one per trip (a threefry costs a full
    leapfrog at this shape: 31 us vs 33 us, measured).

Lane liveness, loop continuation, and convergence all reduce with
``jnp.any`` over the chain axis — under a mesh these lower to ICI
collectives exactly like the classic path's.

RNG parity: the per-lane key-consumption schedule is IDENTICAL to the
classic path (one split per attempt, the leaf-completing attempt's
subkey feeding the three leaf uniforms, a 3-way split + momentum normal
+ direction bernoulli per trajectory start), so on CPU the emitted draws
are BITWISE EQUAL to the classic sampler's for every (B, K) — the
scheduling changes, the Markov chain does not (tests/test_batched.py).
Two deliberate accounting differences: the fresh gradient evaluation the
reference pays at every trajectory start (walnuts.hpp:531-532) is cached
from the previous draw's selected state within a block (the draw VALUES
are unchanged — the gradient of the same point is deterministic — only
``n_grads`` drops by one per draw), and blocks do not run ahead into the
next block (the carried ``SampleState`` stays interchangeable with the
classic path, so checkpoint/resume and the R-hat controller work
unchanged).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from walnuts_tpu.core.adapt import (
    AdamState,
    adam_init,
    adam_step_size,
    adam_update,
    mass_estimator_inv_mass,
    mass_estimator_observe,
    min_micro_estimate,
    min_micro_observe,
)
from walnuts_tpu.core.transition import (
    _LOGP_BK,
    _LOGP_FW,
    _LOGP_SEL,
    _LOGW,
    _RHO_BK,
    _RHO_FW,
    _THETA_BK,
    _THETA_FW,
    _THETA_SEL,
    FailStats,
)
from walnuts_tpu.ops.math import (
    LogpGradFn,
    count_trailing_zeros,
    leapfrog_step,
    log_sum_exp,
    logp_momentum,
)

Array = jax.Array

_PH_FWD = 0
_PH_REV = 1


class LaneState(NamedTuple):
    """Per-lane (single chain) state with a leading chain axis on every
    leaf. Vector rows are ``(C, D)`` or stacked ``(C, k, D)``."""

    # --- persistent orbit state (touched once per LEAF, in tier 2).
    # Stacked (C, k, D)/(C, k) fields were split into per-plane arrays
    # in round 4: rebuilding a stacked field costs a jnp.stack whose
    # output cannot alias its operands, so XLA materialised + COPIED the
    # whole block every tier-2 pass and read planes back through async
    # slices (~106 us/pass of pure movement at funnel bench shape —
    # docs/BENCHMARKS.md "Fused-pass kernel post-mortem"). Per-plane
    # fields make every update one elementwise ``where`` that aliases
    # its carry slot in place. ---
    key: Array
    depth: Array           # int32, current doubling (1-based)
    out_depth: Array       # int32, reported depth at termination
    acc_th_bk: Array       # (C, D) orbit backward endpoint position
    acc_rho_bk: Array      # (C, D) orbit backward endpoint momentum
    acc_th_fw: Array       # (C, D) orbit forward endpoint position
    acc_rho_fw: Array      # (C, D) orbit forward endpoint momentum
    acc_th_sel: Array      # (C, D) orbit selected position
    acc_jt_bk: Array       # (C,) backward endpoint joint density
    acc_jt_fw: Array       # (C,) forward endpoint joint density
    acc_lp_sel: Array      # (C,) selected position log density
    acc_logw: Array        # (C,) orbit log weight
    acc_grad_bk: Array     # (C, D)
    acc_grad_sel: Array    # (C, D)
    acc_grad_fw: Array     # (C, D)
    forward: Array         # bool
    leaf_idx: Array        # int32
    n_leaves: Array        # int32
    stack_e: Array         # (C, max_depth-1, 2, D)
    run_sel: Array         # (C, D)
    run_sel_logp: Array
    run_sel_grad: Array    # (C, D)
    run_logw: Array
    ms_th: Array           # (C, D) leaf-start position
    ms_rho: Array          # (C, D) leaf-start momentum
    ms_grad: Array         # (C, D) leaf-start gradient
    ms_joint: Array
    # --- attempt machine (advanced inside the integration loop) ---
    halvings: Array        # int32
    dt: Array              # signed micro step size
    steps_done: Array      # int32
    steps_total: Array     # int32
    phase: Array           # int32
    cur_th: Array          # (C, D) cursor position
    cur_rho: Array         # (C, D) cursor momentum
    cur_grad: Array        # (C, D) cursor gradient
    lp_cur: Array          # position log density at the cursor
    fresh: Array           # bool: cursor invalid, integrate from ms
                           # (fresh_cur mode; always False otherwise)
    fwd_th: Array          # (C, D) saved forward endpoint position
    fwd_rho: Array         # (C, D) saved forward endpoint momentum
    fwd_grad: Array        # (C, D) saved forward endpoint gradient
    fwd_logp_pos: Array
    fwd_joint: Array
    # --- leaf outcome latches (set by the inner loop, read by tier 2) ---
    leaf_done: Array       # bool
    leaf_ok: Array         # bool (accept; False at leaf_done = leaf fail)
    ku: Array              # (C, ...) raw key data of the leaf-completing
                           # attempt's subkey (uniforms derived in tier 2)
    # --- deferred-split bookkeeping (defer_splits mode; zeros otherwise):
    # the inner loop COUNTS attempt ends instead of splitting, and tier 2
    # replays exactly that many sequential splits per lane ---
    n_ends: Array          # int32, attempt ends since the last tier-2 pass
    leaf_end_at: Array     # int32, 1-based end index of the leaf-completing
                           # attempt (0 = none); its subkey becomes ku
    # --- step-size adaptation (warmup only; a frozen dummy when
    # sampling — a handful of (C,) scalars, negligible carry cost) ---
    adam: AdamState
    # --- counters / block bookkeeping ---
    n_grads: Array         # int32
    fails: FailStats
    draws_done: Array      # int32, draws banked this block


class BatchedBlockResult(NamedTuple):
    draws: Array           # (R, C, D)
    logps: Array           # (R, C)
    depths: Array          # (R, C)
    key: Array             # (C,) end-of-block PRNG keys
    n_grads_delta: Array   # (C,) gradients used this block
    fails_delta: FailStats
    # exact executed-trip counters (the explicit batch loops make these
    # measurable, unlike vmapped whiles): one inner trip = one batched
    # gradient evaluation for the whole chain batch; one tier-2 pass =
    # one leaf-level bookkeeping sweep. padding = C * n_inner_trips /
    # sum(used grads) is the SPMD waste this scheduler minimises.
    n_inner_trips: Array   # int32 scalar
    n_outer_trips: Array   # int32 scalar


def make_batched_sample_block(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    runahead: int = 8,
    tier2_every: int = 6,
    adapt_step_size: bool = False,
    bf16_ends: bool = False,
    min_latched: int = 0,
    defer_splits: bool = True,
    pallas_replay: bool = False,
    fresh_cur: bool = False,
    adapt_full: bool = False,
    bounded_sweeps: Optional[bool] = None,
    pallas_pass: bool = False,
    pass_tile: Optional[int] = None,
):
    """Build ``(start_block, sample_block)`` for batched-native sampling.

    - ``start_block(key, theta, n_grads, fails, step, inv_mass,
      min_micro)``: chain-batched inputs ``(C,)``/``(C, D)``; evaluates
      one batched gradient (counted) and returns the initial batched
      ``LaneState``.
    - ``sample_block(state, step, inv_mass, min_micro, max_error,
      num_draws)``: advances every lane by exactly ``num_draws`` draws,
      returning a :class:`BatchedBlockResult`. ``num_draws`` is static.

    ``runahead`` is B, the run-ahead depth (buffer rows). ``tier2_every``
    is K, the tier-2 amortisation (see the module docstring); K=0
    restores a strict leaf barrier. The emitted draws are bitwise
    identical for every (B, K): scheduling never touches the per-lane
    Markov chain.

    ``min_latched`` defers a tier-2 pass that would fire at the K-trip
    mark with fewer than this many lanes latched (a pass with nothing to
    apply still pays the full ~200 us row sweep): integration continues
    until the latch count reaches the threshold or no runnable lane
    remains. Scheduling-only — draws stay bitwise identical for every
    value. Default 0 (the strict every-K cadence): measured on funnel
    x4096, empty passes are only ~2% and the per-trip latch-count
    reduction costs slightly more than they save (4.28 vs 4.23 s);
    the knob stays for models with sparser latch patterns.

    ``bf16_ends`` stores the merge-stack endpoints in bfloat16 and
    rounds BOTH operands of every U-turn decision to bfloat16 — the
    classic path's ``bf16_ends`` semantics exactly (transition.py module
    docstring has the validity argument: the stopping rule stays a
    symmetric deterministic function of the exact endpoint states), so
    draws remain bitwise comparable against classic ``bf16_ends=True``.
    Unlike the classic path (where the converts run per attempt and
    measured slower), here both the stack traffic and its converts are
    amortised into the tier-2 pass.

    ``pallas_replay`` runs the deferred-split replay chain as one Pallas
    launch (``ops/prng.py``) instead of a ``lax.while_loop`` of batched
    splits — bit-identical subkeys (the kernel restates jax's
    partitionable threefry arithmetic; tests/test_prng.py +
    the scheduler bitwise suite), one launch per tier-2 pass instead of
    up to K fused-elementwise rounds. Interpret-mode on non-TPU
    backends.

    ``fresh_cur`` moves the tier-2 cursor reset into the integration
    trip: instead of writing the 3-row ``cur`` block (``cur := ms`` for
    restarting/continuing lanes, a full (C, 3, D) read+write per pass),
    tier 2 sets a per-lane ``fresh`` bit and the next trip integrates
    from ``ms`` — which the trip already reads for its halving-restart
    select — via one fused select. The scheduling logic is EXACTLY the
    classic chain (bitwise in eager mode, tests/test_batched.py), but
    under jit the select feeding the leapfrog changes XLA's fusion/FMA
    contraction (~1e-17/trip on CPU f64), so jitted draws are valid-
    but-not-bitwise — the same correctness class as ``bf16_ends``.
    Trades ~6 (C, D) rows of pass traffic for one select in the trip
    body; A/B on hardware decides whether that is worth the weaker
    oracle. Off by default.

    ``adapt_full`` turns the block into ASYNCHRONOUS ADAPTIVE WARMUP:
    the per-lane warmup adaptation (mass estimator, min-micro estimator,
    Adam — ``AdaptiveWalnuts::operator()``, adaptive_walnuts.hpp:234-251)
    is applied inside the tier-2 pass the moment a lane's draw completes,
    and the lane restarts immediately with ITS OWN freshly adapted
    ``step``/``inv_mass``/``min_micro`` — no cross-lane draw barrier.
    The adaptation dependency is strictly per-lane (each chain adapts
    from its own draws, exactly as the reference's independent per-chain
    warmup threads do), so lanes running ahead cannot change any lane's
    Markov chain — the schedule is exact — while the padding drops from
    the per-draw max toward the B-draw-window max (the same relaxation
    the sampling scheduler gets from ``runahead``). Parity vs the
    classic warmup is ulp-exact-in-schedule but not bitwise-in-floats:
    the RNG keys and integer outputs match EXACTLY (same per-lane split
    schedule), while the adapted floats differ by ~1 ulp/observe because
    the classic program FMA-contracts the discounted-Welford update and
    this pass kernel rounds each product (verified against a NumPy
    per-op replay, which this path matches bit-for-bit; barriers cannot
    force the classic contraction — see online_moments_observe). In this
    mode ``sample_block`` grows a ``.adapt`` attribute:
    ``sample_block_adapt(state, aux, max_error, num_draws) ->
    (BatchedBlockResult, final LaneState, aux')`` where ``aux = (mass,
    mm_est, iteration, inv_mass, step, min_micro)`` carries each lane's
    estimator states and CURRENT-draw transition parameters.

    Two round-3 scheduling experiments — speculative leaf continuation
    (``speculate``) and chain multiplexing (``multiplex``) — were
    REMOVED in round 5 after losing every TPU A/B arm (docs/BENCHMARKS.md
    "Scheduler-option TPU A/B" keeps the post-mortems; the round-4
    ruling demoted their bitwise oracles to experimental-tier and the
    round-4 verdict sanctioned deletion). Their state rode the default
    carry (pending-leaf latches, the parked-chain slot) and taxed every
    scheduler change; git history has the full implementations.
    """
    if pallas_pass and (adapt_full or fresh_cur
                        or bf16_ends or adapt_step_size or pallas_replay
                        or not defer_splits):
        raise ValueError(
            "pallas_pass=True covers the default sampling configuration "
            "only (defer_splits, no adapt_full/"
            "fresh_cur/bf16_ends/adapt_step_size/pallas_replay) — other "
            "configurations use the XLA tier-2 pass"
        )
    n_slots = max(max_depth - 1, 1)
    B = max(int(runahead), 1)
    K = int(tier2_every)
    T = int(min_latched)

    def _use_bounded(D: int) -> bool:
        """Pick the tier-2 slot-sweep implementation at trace time.

        The cascade / stack-push / banking writes come in two
        bitwise-equal forms: STATIC (fully unrolled masked sweeps over
        all slot rows — fuses into one kernel) and BOUNDED
        (``lax.while_loop``s over the batch-max occupied slot — touches
        1-2 rows but serializes). Measured on v5e (2026-08-18, same
        session, 400 draws): funnel(101) x 4096 static 6.3 s vs bounded
        7.8 s (the loop overhead dominates narrow rows), SV(1003) x 1024
        static 51.4 s vs bounded 38.8 s (row traffic dominates wide
        rows). Auto rule: bounded iff the row width D >= 512;
        ``bounded_sweeps`` overrides.
        """
        if bounded_sweeps is not None:
            return bool(bounded_sweeps)
        return D >= 512

    vsplit = jax.vmap(lambda k: jax.random.split(k))
    vsplit3 = jax.vmap(lambda k: jax.random.split(k, 3))
    vleapfrog = jax.vmap(
        lambda im, dt, th, rho, gr: leapfrog_step(logp_grad, im, dt, th,
                                                  rho, gr),
        in_axes=(0, 0, 0, 0, 0),
    )
    vlogp_grad = jax.vmap(logp_grad)

    def _fresh_trajectory(key, theta, logp0, grad0, step, inv_mass):
        """Per-batch fresh-trajectory ingredients (``transition_w`` entry,
        walnuts.hpp:528-535, minus the gradient evaluation): one 3-way
        key split, momentum ~ N(0, M), direction bernoulli. Returns the
        pieces; the caller merges them into the lane state masked on the
        lanes actually restarting (so the RNG stream advances exactly as
        the classic per-draw entry does)."""
        dtype = theta.dtype
        ks = vsplit3(key)  # (C, 3) keys
        z = jax.vmap(
            lambda k, sh=theta.shape[1:]: jax.random.normal(k, sh, dtype)
        )(ks[:, 1])
        rho0 = z / jnp.sqrt(inv_mass)
        joint0 = logp0 + jax.vmap(logp_momentum)(rho0, inv_mass)
        forward0 = jax.vmap(jax.random.bernoulli)(ks[:, 2])
        dt0 = jnp.where(forward0, step, -step)
        return ks[:, 0], rho0, joint0, forward0, dt0

    def _lane_state(key, theta, logp0, grad0, step, inv_mass, min_micro,
                    adam, n_grads, fails):
        """Batched LaneState from a start point with KNOWN logp/grad."""
        dtype = theta.dtype
        e_dtype = jnp.bfloat16 if bf16_ends else dtype
        C, D = theta.shape
        knew, rho0, joint0, forward0, dt0 = _fresh_trajectory(
            key, theta, logp0, grad0, step, inv_mass
        )
        return LaneState(
            key=knew,
            depth=jnp.ones((C,), jnp.int32),
            out_depth=jnp.full((C,), max_depth + 1, jnp.int32),
            acc_th_bk=theta, acc_rho_bk=rho0,
            acc_th_fw=theta, acc_rho_fw=rho0,
            acc_th_sel=theta,
            acc_jt_bk=joint0, acc_jt_fw=joint0,
            acc_lp_sel=logp0, acc_logw=joint0,
            acc_grad_bk=grad0,
            acc_grad_sel=grad0,
            acc_grad_fw=grad0,
            forward=forward0,
            leaf_idx=jnp.zeros((C,), jnp.int32),
            n_leaves=jnp.ones((C,), jnp.int32),
            stack_e=jnp.zeros((C, n_slots, 2, D), e_dtype),
            run_sel=theta,
            run_sel_logp=logp0,
            run_sel_grad=grad0,
            # the log-density chain follows the MODEL's value dtype
            # (logp0), which may be wider than the row dtype (precision
            # islands: an f64 logp/joint/|dH| chain over f32 rows —
            # docs/BENCHMARKS.md round-5 SV precision work)
            run_logw=jnp.full((C,), -jnp.inf, logp0.dtype),
            ms_th=theta, ms_rho=rho0, ms_grad=grad0,
            ms_joint=joint0,
            halvings=jnp.zeros((C,), jnp.int32),
            dt=dt0,
            steps_done=jnp.zeros((C,), jnp.int32),
            steps_total=jnp.asarray(min_micro, jnp.int32),
            phase=jnp.zeros((C,), jnp.int32),
            cur_th=theta, cur_rho=rho0, cur_grad=grad0,
            lp_cur=logp0,
            fresh=jnp.zeros((C,), bool),
            # fwd_*/fwd_logp_pos/fwd_joint are never read before a
            # passing forward attempt writes them (same latent-garbage
            # contract as the classic path's span fields) — initialised
            # to the start point only to give them a shape
            fwd_th=theta, fwd_rho=rho0, fwd_grad=grad0,
            fwd_logp_pos=logp0,
            fwd_joint=joint0,
            leaf_done=jnp.zeros((C,), bool),
            leaf_ok=jnp.zeros((C,), bool),
            ku=jax.random.key_data(knew),
            n_ends=jnp.zeros((C,), jnp.int32),
            leaf_end_at=jnp.zeros((C,), jnp.int32),
            adam=adam,
            n_grads=n_grads,
            fails=fails,
            draws_done=jnp.zeros((C,), jnp.int32),
        )

    def start_block(key, theta, n_grads, fails, step, inv_mass, min_micro,
                    adam=None):
        dtype = theta.dtype
        if adam is None:  # sampling: frozen dummy (classic sample_step)
            adam = jax.vmap(lambda s: adam_init(s, dtype=dtype))(step)
        # the block-entry gradient is fresh (and counted), exactly
        # like the classic transition entry (walnuts.hpp:531-532)
        logp0, grad0 = vlogp_grad(theta)
        return _lane_state(key, theta, logp0, grad0, step, inv_mass,
                           min_micro, adam, n_grads + 1, fails)

    # warmup entry with the start point's logp/grad already known
    start_block_cached = _lane_state

    # ------------------------------------------------------------------
    # integration trip: one batched gradient + the attempt machine
    # (halvings / reversibility levels) as masked scalar transitions.
    # ------------------------------------------------------------------
    def inner_trip(s: LaneState, active, step, inv_mass, min_micro,
                   max_error):
        run = active & ~s.leaf_done

        if fresh_cur:
            # the tier-2 pass marked this lane's cursor stale instead of
            # writing cur := ms (fresh_cur mode): materialise the leaf
            # start here, fused into the leapfrog's input read
            fr = s.fresh[:, None]
            base = (jnp.where(fr, s.ms_th, s.cur_th),
                    jnp.where(fr, s.ms_rho, s.cur_rho),
                    jnp.where(fr, s.ms_grad, s.cur_grad))
        else:
            base = (s.cur_th, s.cur_rho, s.cur_grad)
        th, rho, gr, lp = vleapfrog(inv_mass, s.dt, *base)
        run1 = run[:, None]
        cur_th = jnp.where(run1, th, s.cur_th)
        cur_rho = jnp.where(run1, rho, s.cur_rho)
        cur_grad = jnp.where(run1, gr, s.cur_grad)
        lp_cur = jnp.where(run, lp, s.lp_cur)
        steps_done = s.steps_done + run.astype(jnp.int32)
        n_grads = s.n_grads + run.astype(jnp.int32)

        att_done = run & (steps_done >= s.steps_total)
        joint_n = lp_cur + jax.vmap(logp_momentum)(cur_rho, inv_mass)

        # one key split per attempt end (classic body, transition.py);
        # the subkey's RAW DATA is latched at leaf completion and turned
        # into the three leaf uniforms in tier 2 — a threefry costs a
        # whole leapfrog at this shape, so it must not run per trip.
        # defer_splits removes even the per-trip SPLIT threefry: the trip
        # only counts attempt ends, and tier 2 replays that many
        # sequential splits per lane (the replay length is the max ends
        # in the window, typically << K because attempts span >= min
        # micro-step trips) — the per-lane key stream is unchanged.
        if defer_splits:
            key = s.key
            n_ends = s.n_ends + att_done.astype(jnp.int32)
        else:
            ks = vsplit(s.key)
            key = jnp.where(att_done, ks[:, 0], s.key)
            ku_new = jax.random.key_data(ks[:, 1])

        in_fwd = s.phase == _PH_FWD
        # forward attempt completed (macro_step, walnuts.hpp:322-343)
        f_done = att_done & in_fwd
        f_err = jnp.abs(s.ms_joint - joint_n)
        f_ok = f_err <= max_error  # NaN -> False -> halve/fail

        if adapt_step_size:
            # Adam observes exp(-|dH|) of the COARSEST attempt of every
            # leaf (walnuts.hpp:335-338) — a masked per-lane scalar
            # update, exactly the classic body's rule. Rounded to the
            # Adam state's dtype (a no-op unless the logp chain is wider
            # than the rows — the classic program observes in row dtype)
            accept = jnp.exp(-f_err).astype(s.dt.dtype)
            accept = jnp.where(jnp.isnan(accept), jnp.zeros_like(accept),
                               accept)
            observe = f_done & (s.halvings == 0)
            adam_new = jax.vmap(adam_update)(s.adam, accept)
            adam = jax.tree.map(
                lambda new, old: jnp.where(observe, new, old),
                adam_new, s.adam,
            )
        else:
            adam = s.adam

        need_rev = s.steps_total >= 2 * min_micro
        start_rev = f_done & f_ok & need_rev
        leaf_ok_now = f_done & f_ok & ~need_rev
        more_h = (s.halvings + 1) < max_step_halvings
        restart = f_done & ~f_ok & more_h
        halve_exh = f_done & ~f_ok & ~more_h

        # reversibility level completed (reversible, walnuts.hpp:267-277)
        r_done = att_done & ~in_fwd
        r_err = jnp.abs(joint_n - s.fwd_joint)
        r_within = r_err <= max_error
        more_rev = s.steps_total >= 2 * min_micro
        next_rev = r_done & ~r_within & more_rev
        leaf_ok_now = leaf_ok_now | (r_done & ~r_within & ~more_rev)
        leaf_fail_now = halve_exh | (r_done & r_within)

        set_fwd = f_done & f_ok
        sf1 = set_fwd[:, None]
        fwd_th = jnp.where(sf1, cur_th, s.fwd_th)
        fwd_rho = jnp.where(sf1, cur_rho, s.fwd_rho)
        fwd_grad = jnp.where(sf1, cur_grad, s.fwd_grad)
        fwd_logp_pos = jnp.where(set_fwd, lp_cur, s.fwd_logp_pos)
        fwd_joint = jnp.where(set_fwd, joint_n, s.fwd_joint)

        latch = leaf_ok_now | leaf_fail_now
        if defer_splits:
            ku = s.ku
            leaf_end_at = jnp.where(latch, n_ends, s.leaf_end_at)
        else:
            n_ends, leaf_end_at = s.n_ends, s.leaf_end_at
            extra = s.ku.ndim - latch.ndim
            ku = jnp.where(latch.reshape(latch.shape + (1,) * extra),
                           ku_new, s.ku)
        leaf_done = s.leaf_done | latch
        leaf_ok = jnp.where(latch, leaf_ok_now, s.leaf_ok)

        fails = FailStats(
            n_halve_fail=s.fails.n_halve_fail + halve_exh.astype(jnp.int32),
            n_nonfinite=s.fails.n_nonfinite
            + (att_done & ~jnp.isfinite(lp_cur)).astype(jnp.int32),
            n_depth_exhausted=s.fails.n_depth_exhausted,
        )

        # next-attempt setup (reads pre-update steps_total/dt, matching
        # the classic body's where-cascade)
        to_rev = start_rev | next_rev
        halvings = jnp.where(restart, s.halvings + 1, s.halvings)
        steps_total = jnp.where(
            restart, s.steps_total * 2,
            jnp.where(to_rev, s.steps_total // 2, s.steps_total),
        )
        dt = jnp.where(restart, s.dt * 0.5,
                       jnp.where(to_rev, s.dt * 2.0, s.dt))
        steps_done = jnp.where(restart | to_rev, jnp.int32(0), steps_done)
        phase = jnp.where(to_rev, jnp.int32(_PH_REV), s.phase)
        # the reversed cursor is the forward endpoint with its momentum
        # negated (value-identical to the old [1, -1, 1] row scaling)
        tr1 = to_rev[:, None]
        rs1 = restart[:, None]
        cur_th = jnp.where(tr1, fwd_th, jnp.where(rs1, s.ms_th, cur_th))
        cur_rho = jnp.where(tr1, -fwd_rho,
                            jnp.where(rs1, s.ms_rho, cur_rho))
        cur_grad = jnp.where(tr1, fwd_grad,
                             jnp.where(rs1, s.ms_grad, cur_grad))

        return s._replace(
            key=key, cur_th=cur_th, cur_rho=cur_rho, cur_grad=cur_grad,
            lp_cur=lp_cur,
            fwd_th=fwd_th, fwd_rho=fwd_rho, fwd_grad=fwd_grad,
            fwd_logp_pos=fwd_logp_pos, fwd_joint=fwd_joint,
            halvings=halvings, dt=dt, steps_done=steps_done,
            steps_total=steps_total, phase=phase,
            leaf_done=leaf_done, leaf_ok=leaf_ok, ku=ku,
            n_ends=n_ends, leaf_end_at=leaf_end_at, adam=adam,
            n_grads=n_grads, fails=fails,
            fresh=s.fresh & ~run if fresh_cur else s.fresh,
        )

    # ------------------------------------------------------------------
    # tier 2: leaf-level orbit bookkeeping for every LATCHED lane — the
    # merge cascade + reservoir + top-level combine of the classic body
    # (walnuts.hpp:368-387, 464-495, 536-558) — plus draw banking and
    # fused trajectory restart. Every lane field is written in ONE
    # where-chain (restart / continue / unchanged), not a base update
    # plus an overlay: this pass runs every K trips and its row traffic
    # is the measured cost ceiling of the whole scheduler.
    # ------------------------------------------------------------------
    def _resolve_pending(s: LaneState, active, step, inv_mass, min_micro,
                         block_draws, aux=None):
        # geometry (U-turn tests, uniforms) runs in the ROW dtype; only
        # the log-weight/log-density writes use the (possibly wider)
        # logp-chain dtype
        dtype = s.run_sel.dtype
        jdtype = s.ms_joint.dtype
        pend = active & s.leaf_done
        ok1 = s.leaf_ok
        fwd_th, fwd_rho, fwd_grad = s.fwd_th, s.fwd_rho, s.fwd_grad
        fwd_joint, fwd_logp_pos = s.fwd_joint, s.fwd_logp_pos
        end1 = s.leaf_end_at
        leaf_ok = pend & ok1
        leaf_fail = pend & ~ok1

        leaf_th, leaf_rho = fwd_th, fwd_rho
        if bf16_ends:
            # round every U-turn operand (classic bf16_ends semantics)
            leaf_th = leaf_th.astype(jnp.bfloat16).astype(dtype)
            leaf_rho = leaf_rho.astype(jnp.bfloat16).astype(dtype)
        sgn = jnp.where(s.forward, jnp.asarray(1.0, dtype),
                        jnp.asarray(-1.0, dtype))

        def uturn_end(old_th, old_rho):
            if bf16_ends:
                old_th = old_th.astype(jnp.bfloat16).astype(dtype)
                old_rho = old_rho.astype(jnp.bfloat16).astype(dtype)
            delta = sgn[:, None] * inv_mass * (leaf_th - old_th)
            return (jnp.sum(leaf_rho * delta, axis=-1) < 0) | (
                jnp.sum(old_rho * delta, axis=-1) < 0
            )

        # merge cascade: sub-U-turn checks against the stacked older-side
        # endpoints (build_span, walnuts.hpp:490-494). Two bitwise-equal
        # forms picked by row width (_use_bounded): the BOUNDED
        # lax.while_loop over the batch-max merge count (a leaf's merge
        # count is the trailing-zero count of its 1-based index, so the
        # batch max is almost always 0-2 — saves the n_slots full row
        # sweeps on wide rows) vs the STATIC unroll (fuses into one
        # kernel — wins on narrow rows where the loop's serialization
        # overhead exceeds the skipped row traffic). Scheduling-only
        # either way: skipped iterations are all-lane no-ops (do=False).
        n_merges = count_trailing_zeros(s.leaf_idx + 1)
        if _use_bounded(s.run_sel.shape[-1]):
            max_m = jnp.minimum(
                jnp.max(jnp.where(leaf_ok, n_merges, 0)), jnp.int32(n_slots)
            )

            def _cascade_body(c):
                i, cur_end, ok = c
                do = leaf_ok & (i < n_merges) & ok
                slot = jax.lax.dynamic_index_in_dim(
                    s.stack_e, i, axis=1, keepdims=False
                ).astype(dtype)
                ut = uturn_end(slot[:, 0], slot[:, 1])
                cur_end = jnp.where(do[:, None, None], slot, cur_end)
                ok = ok & ~(do & ut)
                return i + 1, cur_end, ok

            _, cur_end, ok = jax.lax.while_loop(
                lambda c: c[0] < max_m, _cascade_body,
                (jnp.int32(0), jnp.stack([fwd_th, fwd_rho], axis=1),
                 jnp.ones_like(leaf_ok)),
            )
        else:
            cur_end = jnp.stack([fwd_th, fwd_rho], axis=1)
            ok = jnp.ones_like(leaf_ok)
            for i in range(n_slots):
                do = leaf_ok & (i < n_merges) & ok
                slot = s.stack_e[:, i].astype(dtype)
                ut = uturn_end(slot[:, 0], slot[:, 1])
                cur_end = jnp.where(do[:, None, None], slot, cur_end)
                ok = ok & ~(do & ut)
        sub_uturn = leaf_ok & ~ok
        leaf_ok = leaf_ok & ok

        # --- deferred-key-split replay (after the cascade: pure
        # geometry, no RNG) ---
        n_ends_eff = s.n_ends
        if defer_splits and pallas_replay:
            # one Pallas launch for the whole replay chain (ops/prng.py);
            # bit-identical to the while-loop below
            from walnuts_tpu.ops.prng import replay_split_chain

            impl0 = jax.random.key_impl(s.key)
            kd, ku_r = replay_split_chain(
                jax.random.key_data(s.key).astype(jnp.uint32),
                s.ku.astype(jnp.uint32), s.n_ends, s.leaf_end_at,
                interpret=jax.default_backend() != "tpu",
            )
            s = s._replace(
                key=jax.random.wrap_key_data(kd, impl=impl0),
                ku=ku_r.astype(s.ku.dtype),
                n_ends=jnp.zeros_like(s.n_ends),
                leaf_end_at=jnp.zeros_like(s.leaf_end_at),
            )
            ku_unif = s.ku
        elif defer_splits:
            # replay the window's deferred key splits: each lane consumed
            # n_ends splits (sequential — split j feeds split j+1), and
            # the leaf-completing attempt's subkey becomes ku. The loop
            # runs max-lane ends times: one batched threefry each,
            # instead of one EVERY trip in the integration loop.
            n_replay = jnp.max(n_ends_eff)

            def replay_body(c):
                j, key, ku = c
                ks = vsplit(key)
                adv = j < n_ends_eff
                key = _key_where(adv, ks[:, 0], key)
                hit = adv & (end1 == j + 1)
                extra = ku.ndim - hit.ndim
                ku = jnp.where(
                    hit.reshape(hit.shape + (1,) * extra),
                    jax.random.key_data(ks[:, 1]), ku,
                )
                return j + 1, key, ku

            _, key_r, ku_r = jax.lax.while_loop(
                lambda c: c[0] < n_replay, replay_body,
                (jnp.int32(0), s.key, s.ku),
            )
            ku_state = ku_r
            s = s._replace(
                key=key_r, ku=ku_state,
                n_ends=jnp.zeros_like(s.n_ends),
                leaf_end_at=jnp.zeros_like(s.leaf_end_at),
            )
            ku_unif = ku_r
        else:
            ku_unif = s.ku

        # the three leaf uniforms, derived from the resolving leaf's
        # subkey (one batched threefry per pass; identical values to the
        # classic body's per-attempt uniforms at the leaf-completing
        # attempt)
        impl = jax.random.key_impl(s.key)
        unifs = jax.vmap(
            lambda kd: jax.random.uniform(
                jax.random.wrap_key_data(kd, impl=impl), (3,), dtype=dtype
            )
        )(ku_unif)

        new_leaf_idx = s.leaf_idx + 1
        subtree_done = leaf_ok & (new_leaf_idx >= s.n_leaves)
        push = leaf_ok & ~subtree_done
        # stack push: lane i writes slot n_merges[i]. Same static/bounded
        # split as the cascade (see _use_bounded): bounded touches one
        # slot row per iteration up to the batch-max write slot; static
        # is one fused masked select over all n_slots rows.
        cur_end_e = cur_end.astype(s.stack_e.dtype)
        if _use_bounded(s.run_sel.shape[-1]):
            max_w = jnp.max(jnp.where(push, n_merges, -1))

            def _push_body(c):
                j, stack_e = c
                old = jax.lax.dynamic_index_in_dim(
                    stack_e, j, axis=1, keepdims=False
                )
                new = jnp.where(
                    (push & (n_merges == j))[:, None, None], cur_end_e, old
                )
                return j + 1, jax.lax.dynamic_update_index_in_dim(
                    stack_e, new, j, axis=1
                )

            _, stack_e = jax.lax.while_loop(
                lambda c: c[0] <= max_w, _push_body,
                (jnp.int32(0), s.stack_e)
            )
        else:
            write_mask = push[:, None] & (
                n_merges[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (1, n_slots), 1)
            )  # (C, n_slots)
            stack_e = jnp.where(
                write_mask[:, :, None, None], cur_end_e[:, None], s.stack_e
            )

        # reservoir (streaming Barker; see transition.py module docstring)
        run_logw_new = log_sum_exp(s.run_logw, fwd_joint)
        take_leaf = jnp.log(unifs[:, 0]) < fwd_joint - run_logw_new
        upd = leaf_ok & take_leaf

        # top-level Metropolis + combined U-turn on subtree completion
        fw1 = s.forward[:, None]
        acc_old_th = jnp.where(fw1, s.acc_th_bk, s.acc_th_fw)
        acc_old_rho = jnp.where(fw1, s.acc_rho_bk, s.acc_rho_fw)
        ut_top = uturn_end(acc_old_th, acc_old_rho)
        take_new = jnp.log(unifs[:, 1]) < run_logw_new - s.acc_logw
        upd_fw = subtree_done & s.forward
        upd_bk = subtree_done & ~s.forward
        take = subtree_done & take_new
        end_uturn = subtree_done & ut_top
        new_depth = s.depth + 1
        deeper = subtree_done & ~ut_top & (new_depth <= max_depth)
        exhausted = subtree_done & ~ut_top & (new_depth > max_depth)

        fail = leaf_fail | sub_uturn
        complete = fail | end_uturn | exhausted
        out_depth = jnp.where(
            fail | end_uturn, s.depth,
            jnp.where(exhausted, jnp.int32(max_depth + 1), s.out_depth),
        )

        # run-selection values AFTER this leaf (pre-restart)
        run_sel_v = jnp.where(upd[:, None], fwd_th, s.run_sel)
        run_sel_logp_v = jnp.where(upd, fwd_logp_pos, s.run_sel_logp)
        run_sel_grad_v = jnp.where(upd[:, None], fwd_grad, s.run_sel_grad)

        # emitted draw values (the selected state of the combined orbit)
        sel_theta = jnp.where(take[:, None], run_sel_v, s.acc_th_sel)
        sel_logp = jnp.where(take, run_sel_logp_v, s.acc_lp_sel)
        sel_grad = jnp.where(take[:, None], run_sel_grad_v, s.acc_grad_sel)

        new_draws_done = s.draws_done + complete.astype(jnp.int32)
        adam_eff, fails_eff, n_grads_eff = s.adam, s.fails, s.n_grads

        # Restart immediately on completion even when the lane is about
        # to park at the run-ahead cap (the ``active`` mask keeps the
        # fresh trajectory idle until the emission cursor catches up).
        # EXCEPT at the block end: the lane's key must equal the classic
        # end-of-draw key so the next block (which re-inits exactly like
        # the classic path) continues the same per-chain stream.
        tgt_theta, tgt_logp, tgt_grad = sel_theta, sel_logp, sel_grad
        key_r0 = s.key
        draws_t = new_draws_done
        n_grads_t = n_grads_eff
        restart = complete & (new_draws_done < block_draws)
        r1 = restart[:, None]

        if adapt_full:
            # Per-lane warmup adaptation applied AT the lane's own draw
            # boundary (AdaptiveWalnuts::operator(), adaptive_walnuts.hpp
            # :234-251): observe the completed draw's selected point /
            # gradient / reported depth, then derive the NEXT draw's
            # step / inv_mass / min_micro for the restarting lanes only.
            # Strictly per-lane math — lanes running ahead of each other
            # cannot perturb any lane's chain, so the SCHEDULE stays
            # exactly the per-draw-synchronous warmup's (keys/ints
            # bitwise; float contraction caveat in the factory docstring).
            mass, mm_est, iteration = aux
            mass_obs = jax.vmap(mass_estimator_observe)(
                mass, sel_theta, sel_grad, iteration
            )
            mass = jax.tree.map(
                lambda new, old: _where_lane(complete, new, old),
                mass_obs, mass,
            )
            mm_obs = jax.vmap(min_micro_observe)(
                mm_est, jnp.int32(1) << out_depth
            )
            mm_est = jax.tree.map(
                lambda new, old: _where_lane(complete, new, old),
                mm_obs, mm_est,
            )
            iteration = iteration + complete.astype(jnp.int32)
            step_next = jnp.where(restart, adam_step_size(adam_eff), step)
            inv_mass_next = jnp.where(
                restart[:, None],
                jax.vmap(mass_estimator_inv_mass)(mass), inv_mass,
            )
            min_micro_next = jnp.where(
                restart, jax.vmap(min_micro_estimate)(mm_est), min_micro
            )
            aux = (mass, mm_est, iteration,
                   inv_mass_next, step_next, min_micro_next)
        else:
            step_next, inv_mass_next, min_micro_next = (
                step, inv_mass, min_micro
            )

        knew, rho0, joint0, forward0, dt0 = _fresh_trajectory(
            key_r0, tgt_theta, tgt_logp, tgt_grad, step_next, inv_mass_next
        )

        cont_m = pend & ~complete

        # --- single-pass merged field writes ---
        new_dir = jnp.where(restart, forward0,
                            jnp.where(deeper, unifs[:, 2] < 0.5, s.forward))
        nd1 = new_dir[:, None]
        ufw1 = upd_fw[:, None]
        ubk1 = upd_bk[:, None]
        tk1 = take[:, None]
        acc_grad_fw = jnp.where(r1, tgt_grad,
                                jnp.where(ufw1, fwd_grad, s.acc_grad_fw))
        acc_grad_bk = jnp.where(r1, tgt_grad,
                                jnp.where(ubk1, fwd_grad, s.acc_grad_bk))
        acc_grad_sel = jnp.where(r1, tgt_grad,
                                 jnp.where(tk1, sel_grad, s.acc_grad_sel))
        acc_th_bk = jnp.where(r1, tgt_theta,
                              jnp.where(ubk1, fwd_th, s.acc_th_bk))
        acc_rho_bk = jnp.where(r1, rho0,
                               jnp.where(ubk1, fwd_rho, s.acc_rho_bk))
        acc_th_fw = jnp.where(r1, tgt_theta,
                              jnp.where(ufw1, fwd_th, s.acc_th_fw))
        acc_rho_fw = jnp.where(r1, rho0,
                               jnp.where(ufw1, fwd_rho, s.acc_rho_fw))
        acc_th_sel = jnp.where(r1, tgt_theta,
                               jnp.where(tk1, sel_theta, s.acc_th_sel))
        acc_jt_bk = jnp.where(restart, joint0,
                              jnp.where(upd_bk, fwd_joint, s.acc_jt_bk))
        acc_jt_fw = jnp.where(restart, joint0,
                              jnp.where(upd_fw, fwd_joint, s.acc_jt_fw))
        acc_lp_sel = jnp.where(restart, tgt_logp,
                               jnp.where(take, sel_logp, s.acc_lp_sel))
        acc_logw = jnp.where(restart, joint0,
                             jnp.where(subtree_done,
                                       log_sum_exp(s.acc_logw,
                                                   run_logw_new),
                                       s.acc_logw))

        # leaf-start for continuing lanes: orbit endpoint in the (new)
        # travel direction on a new doubling, this leaf's endpoint on a
        # push; the trajectory start for restarting lanes
        acc_end_th = jnp.where(nd1, acc_th_fw, acc_th_bk)
        acc_end_rho = jnp.where(nd1, acc_rho_fw, acc_rho_bk)
        acc_end_grad = jnp.where(nd1, acc_grad_fw, acc_grad_bk)
        acc_end_joint = jnp.where(new_dir, acc_jt_fw, acc_jt_bk)
        d1m = deeper[:, None]
        p1m = push[:, None]
        ms_th = jnp.where(r1, tgt_theta,
                          jnp.where(d1m, acc_end_th,
                                    jnp.where(p1m, fwd_th, s.ms_th)))
        ms_rho = jnp.where(r1, rho0,
                           jnp.where(d1m, acc_end_rho,
                                     jnp.where(p1m, fwd_rho, s.ms_rho)))
        ms_grad = jnp.where(r1, tgt_grad,
                            jnp.where(d1m, acc_end_grad,
                                      jnp.where(p1m, fwd_grad,
                                                s.ms_grad)))
        ms_joint = jnp.where(restart, joint0,
                             jnp.where(deeper, acc_end_joint,
                                       jnp.where(push, fwd_joint,
                                                 s.ms_joint)))
        rc = restart | cont_m
        rc1m = rc[:, None]
        clear = pend
        fresh_new = (s.fresh | rc) if fresh_cur else s.fresh
        fails_new = fails_eff._replace(
            n_depth_exhausted=fails_eff.n_depth_exhausted
            + exhausted.astype(jnp.int32)
        )

        return s._replace(
            key=_key_where(restart, knew, s.key),
            depth=jnp.where(restart, jnp.int32(1),
                            jnp.where(deeper, new_depth, s.depth)),
            out_depth=jnp.where(restart, jnp.int32(max_depth + 1),
                                out_depth),
            acc_th_bk=acc_th_bk, acc_rho_bk=acc_rho_bk,
            acc_th_fw=acc_th_fw, acc_rho_fw=acc_rho_fw,
            acc_th_sel=acc_th_sel,
            acc_jt_bk=acc_jt_bk, acc_jt_fw=acc_jt_fw,
            acc_lp_sel=acc_lp_sel, acc_logw=acc_logw,
            acc_grad_bk=acc_grad_bk, acc_grad_fw=acc_grad_fw,
            acc_grad_sel=acc_grad_sel,
            forward=new_dir,
            leaf_idx=jnp.where(restart | deeper, jnp.int32(0),
                               jnp.where(leaf_ok, new_leaf_idx,
                                         s.leaf_idx)),
            n_leaves=jnp.where(restart, jnp.int32(1),
                               jnp.where(deeper,
                                         jnp.int32(1) << (new_depth - 1),
                                         s.n_leaves)),
            stack_e=stack_e,
            run_sel=jnp.where(r1, tgt_theta, run_sel_v),
            run_sel_logp=jnp.where(restart, tgt_logp, run_sel_logp_v),
            run_sel_grad=jnp.where(r1, tgt_grad, run_sel_grad_v),
            run_logw=jnp.where(restart | deeper,
                               jnp.asarray(-jnp.inf, jdtype),
                               jnp.where(leaf_ok, run_logw_new,
                                         s.run_logw)),
            ms_th=ms_th, ms_rho=ms_rho, ms_grad=ms_grad,
            ms_joint=ms_joint,
            halvings=jnp.where(rc, jnp.int32(0), s.halvings),
            dt=jnp.where(restart, dt0,
                         jnp.where(cont_m, jnp.where(new_dir, step, -step),
                                   s.dt)),
            steps_done=jnp.where(rc, jnp.int32(0), s.steps_done),
            # restarting lanes pick up their (possibly just-adapted)
            # next-draw min_micro; continuing lanes keep the current
            # draw's value (identical arrays outside adapt_full)
            steps_total=jnp.where(restart, min_micro_next,
                                  jnp.where(cont_m, min_micro,
                                            s.steps_total)),
            phase=jnp.where(rc, jnp.int32(_PH_FWD), s.phase),
            # fresh_cur: mark the cursor stale (one (C,) bit) and let the
            # next trip integrate from ms, instead of the 3-row write
            cur_th=s.cur_th if fresh_cur else jnp.where(rc1m, ms_th,
                                                        s.cur_th),
            cur_rho=s.cur_rho if fresh_cur else jnp.where(rc1m, ms_rho,
                                                          s.cur_rho),
            cur_grad=s.cur_grad if fresh_cur else jnp.where(rc1m, ms_grad,
                                                            s.cur_grad),
            fresh=fresh_new,
            lp_cur=jnp.where(restart, tgt_logp, s.lp_cur),
            leaf_done=jnp.where(clear, False, s.leaf_done),
            leaf_ok=jnp.where(clear, False, s.leaf_ok),
            adam=adam_eff,
            n_grads=n_grads_t,
            fails=fails_new,
            draws_done=draws_t,
        ), complete, sel_theta, sel_logp, out_depth, sel_grad, (
            new_draws_done - 1), aux

    # one tier-2 pass resolves one pending leaf per latched lane
    leaf_apply = _resolve_pending

    # ------------------------------------------------------------------
    # fused tier-2 pass (ops/fused_pass.py): the whole resolution sweep
    # + draw banking as ONE Pallas kernel with VMEM-resident rows —
    # replaces the ~237-kernel XLA pass (round-4 profile) for the base
    # sampling configuration. Scalars pack into (k, C) lane-stacked
    # arrays at the boundary (a cheap concat); rows pass through with
    # their natural shapes.
    # ------------------------------------------------------------------
    def _pass_ct(C: int, D: int) -> int:
        if pass_tile is not None:
            return int(pass_tile)
        import os

        env = os.environ.get("WALNUTS_PASS_CT")
        if env:
            return int(env)
        # ~28 row blocks of (ct, D_padded) f32, double-buffered across
        # grid steps, inside a ~6 MB VMEM budget (of the ~16 MB core)
        dp = ((D + 127) // 128) * 128
        ct = max(1, (6 * 1024 * 1024) // (28 * dp * 4 * 2))
        ct = min(ct, C, 1024)
        ct = 1 << (ct.bit_length() - 1)  # floor to a power of two
        while C % ct:
            ct //= 2
        return max(ct, 1)

    def _apply_fused_pass(st: LaneState, bt, bl, bd, cap, step, inv_mass,
                          min_micro, block_draws: int):
        from walnuts_tpu.ops import fused_pass as _fp

        # the kernel restates the acc_v/acc_s slot layout — guard the
        # index contract once per trace
        assert (_fp._THETA_BK, _fp._RHO_BK, _fp._THETA_FW, _fp._RHO_FW,
                _fp._THETA_SEL) == (_THETA_BK, _RHO_BK, _THETA_FW,
                                    _RHO_FW, _THETA_SEL)
        assert (_fp._LOGP_BK, _fp._LOGP_FW, _fp._LOGP_SEL, _fp._LOGW) == (
            _LOGP_BK, _LOGP_FW, _LOGP_SEL, _LOGW)
        C, D = st.run_sel.shape
        dtype = st.ms_joint.dtype
        fpk = jnp.stack([st.run_sel_logp, st.run_logw, st.ms_joint,
                         st.dt, st.lp_cur,
                         st.acc_jt_bk, st.acc_jt_fw, st.acc_lp_sel,
                         st.acc_logw], 0)
        ipk = jnp.stack([
            st.depth, st.out_depth, st.leaf_idx, st.n_leaves,
            st.halvings, st.steps_done, st.steps_total, st.phase,
            st.n_ends, st.leaf_end_at, st.fails.n_depth_exhausted,
            st.draws_done,
        ], 0)
        bpk = jnp.stack([st.forward, st.leaf_done, st.leaf_ok], 0)
        kd = jax.random.key_data(st.key).astype(jnp.uint32)
        upk = jnp.concatenate([kd.T, st.ku.astype(jnp.uint32).T], 0)
        rof = jnp.stack([
            st.fwd_logp_pos, st.fwd_joint,
            jnp.broadcast_to(step, (C,)).astype(dtype),
        ], 0)
        mm = jnp.broadcast_to(min_micro, (C,)).astype(jnp.int32)[None]
        cap2 = jnp.reshape(cap, (1, 1)).astype(jnp.int32)
        # chain-minor views: moveaxis on the carried chain-minor
        # layouts ({0,2,1}-style) is a pure bitcast, so the kernel sees
        # the carry's physical bytes without boundary transposes (the
        # row-major first integration paid ~130 us/pass in layout
        # copies — measured, round-4 profile)
        cm = lambda x: jnp.moveaxis(x, 0, -1)
        stk3 = lambda *xs: jnp.stack([x.T for x in xs], 0)
        (fpk, ipk, bpk, upk, acc_v, agb, ags, agf, stack_e, run_sel,
         rsg, ms, cur, bt, bl, bd) = _fp.fused_pass_call(
            fpk, ipk, bpk, upk,
            stk3(st.acc_th_bk, st.acc_rho_bk, st.acc_th_fw,
                 st.acc_rho_fw, st.acc_th_sel),
            cm(st.acc_grad_bk),
            cm(st.acc_grad_sel), cm(st.acc_grad_fw), cm(st.stack_e),
            cm(st.run_sel), cm(st.run_sel_grad),
            stk3(st.ms_th, st.ms_rho, st.ms_grad),
            stk3(st.cur_th, st.cur_rho, st.cur_grad),
            bt, bl, bd,
            stk3(st.fwd_th, st.fwd_rho, st.fwd_grad),
            cm(inv_mass), rof, mm, cap2,
            max_depth=max_depth, n_slots=n_slots, B=B,
            R=int(block_draws), ct=_pass_ct(C, D),
            interpret=jax.default_backend() != "tpu",
        )
        mc = lambda x: jnp.moveaxis(x, -1, 0)
        impl = jax.random.key_impl(st.key)
        st = st._replace(
            run_sel_logp=fpk[0], run_logw=fpk[1], ms_joint=fpk[2],
            dt=fpk[3], lp_cur=fpk[4],
            acc_jt_bk=fpk[5], acc_jt_fw=fpk[6], acc_lp_sel=fpk[7],
            acc_logw=fpk[8],
            depth=ipk[0], out_depth=ipk[1], leaf_idx=ipk[2],
            n_leaves=ipk[3], halvings=ipk[4], steps_done=ipk[5],
            steps_total=ipk[6], phase=ipk[7], n_ends=ipk[8],
            leaf_end_at=ipk[9],
            fails=st.fails._replace(n_depth_exhausted=ipk[10]),
            draws_done=ipk[11],
            forward=bpk[0], leaf_done=bpk[1], leaf_ok=bpk[2],
            key=jax.random.wrap_key_data(upk[:2].T, impl=impl),
            ku=upk[2:4].T.astype(st.ku.dtype),
            acc_th_bk=acc_v[_THETA_BK].T, acc_rho_bk=acc_v[_RHO_BK].T,
            acc_th_fw=acc_v[_THETA_FW].T, acc_rho_fw=acc_v[_RHO_FW].T,
            acc_th_sel=acc_v[_THETA_SEL].T,
            acc_grad_bk=mc(agb), acc_grad_sel=mc(ags),
            acc_grad_fw=mc(agf), stack_e=mc(stack_e),
            run_sel=mc(run_sel), run_sel_grad=mc(rsg),
            ms_th=ms[0].T, ms_rho=ms[1].T, ms_grad=ms[2].T,
            cur_th=cur[0].T, cur_rho=cur[1].T, cur_grad=cur[2].T,
        )
        return st, bt, bl, bd

    def sample_block(state: LaneState, step, inv_mass, min_micro,
                     max_error, num_draws: int):
        R = int(num_draws)
        # rows (positions/steps) carry the row dtype; the log-density
        # buffers carry the (possibly wider) logp-chain dtype
        dtype = state.run_sel.dtype
        jdtype = state.ms_joint.dtype
        C, D = state.run_sel.shape
        min_micro = jnp.asarray(min_micro, jnp.int32)
        step = jnp.asarray(step, dtype=dtype)
        max_error = jnp.asarray(max_error, dtype=dtype)
        n_grads0 = state.n_grads
        fails0 = state.fails

        bufC = (C,)
        if pallas_pass:
            # the fused pass banks draws chain-minor: (B, D, C); the
            # emitted block transposes back once after the scan
            buf_theta = jnp.zeros((B, D, C), dtype)
        else:
            buf_theta = jnp.zeros((B,) + bufC + (D,), dtype)
        buf_logp = jnp.full((B,) + bufC, -jnp.inf, jdtype)
        buf_depth = jnp.zeros((B,) + bufC, jnp.int32)

        def scan_step(carry, r):
            state, buf_theta, buf_logp, buf_depth, trips = carry
            cap = jnp.minimum(jnp.int32(R), r + B)

            def outer_cond(c):
                return jnp.any(c[0].draws_done <= r)

            def outer_body(c):
                st, bt, bl, bd, trips = c
                active = st.draws_done < cap

                def inner_cond(c2):
                    s, n = c2
                    more = jnp.any(active & ~s.leaf_done)
                    if K > 0:
                        hold = n - trips[0] < K
                        if T > 0:
                            # defer the pass until >= T lanes latched
                            # (scheduling-only; see min_latched above)
                            hold = hold | (
                                jnp.sum(active & s.leaf_done) < T
                            )
                        more = more & hold
                    return more

                def inner_body(c2):
                    s, n = c2
                    return (
                        inner_trip(s, active, step, inv_mass, min_micro,
                                   max_error),
                        n + 1,
                    )

                st, n_inner = jax.lax.while_loop(
                    inner_cond, inner_body, (st, trips[0])
                )
                trips = (n_inner, trips[1] + 1)
                if pallas_pass:
                    st, bt, bl, bd = _apply_fused_pass(
                        st, bt, bl, bd, cap, step, inv_mass, min_micro, R
                    )
                    return st, bt, bl, bd, trips
                (st, complete, sel_theta, sel_logp, out_depth, _,
                 bank_idx, _) = leaf_apply(
                    st, active, step, inv_mass, min_micro, R
                )
                # bank completed draws (draw index = pre-increment
                # draws_done of the COMPLETING chain). Same static/
                # bounded split as the tier-2 sweeps (_use_bounded):
                # bounded loops over the slot range the completing lanes
                # occupy (1-2 adjacent rows; saves ~(B-2) row writes on
                # wide rows); static is one fused masked write over all
                # B buffer rows. Bitwise-identical either way.
                slot = bank_idx % B  # valid where complete
                if _use_bounded(sel_theta.shape[-1]):
                    lo = jnp.min(jnp.where(complete, slot, jnp.int32(B)))
                    hi = jnp.max(jnp.where(complete, slot, jnp.int32(-1)))

                    def bank_body(c):
                        j, bt, bl, bd = c
                        mj = complete & (slot == j)
                        mth, mlp = mj[:, None], mj
                        sth, slp, sdp = sel_theta, sel_logp, out_depth
                        row = jax.lax.dynamic_index_in_dim(
                            bt, j, axis=0, keepdims=False
                        )
                        row = jnp.where(mth, sth, row)
                        bt = jax.lax.dynamic_update_index_in_dim(
                            bt, row, j, axis=0
                        )
                        lrow = jax.lax.dynamic_index_in_dim(
                            bl, j, axis=0, keepdims=False
                        )
                        bl = jax.lax.dynamic_update_index_in_dim(
                            bl, jnp.where(mlp, slp, lrow), j, axis=0
                        )
                        drow = jax.lax.dynamic_index_in_dim(
                            bd, j, axis=0, keepdims=False
                        )
                        bd = jax.lax.dynamic_update_index_in_dim(
                            bd, jnp.where(mlp, sdp, drow), j, axis=0
                        )
                        return j + 1, bt, bl, bd

                    _, bt, bl, bd = jax.lax.while_loop(
                        lambda c: c[0] <= hi, bank_body, (lo, bt, bl, bd)
                    )
                else:
                    m = complete[None, :] & (
                        slot[None, :]
                        == jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
                    )  # (B, C)
                    bt = jnp.where(m[:, :, None], sel_theta[None], bt)
                    bl = jnp.where(m, sel_logp[None], bl)
                    bd = jnp.where(m, out_depth[None], bd)
                return st, bt, bl, bd, trips

            carry = jax.lax.while_loop(
                outer_cond, outer_body,
                (state, buf_theta, buf_logp, buf_depth, trips),
            )
            state, buf_theta, buf_logp, buf_depth, trips = carry
            sl = r % B
            draw = jax.lax.dynamic_index_in_dim(
                buf_theta, sl, axis=0, keepdims=False
            )
            lp = jax.lax.dynamic_index_in_dim(
                buf_logp, sl, axis=0, keepdims=False
            )
            dep = jax.lax.dynamic_index_in_dim(
                buf_depth, sl, axis=0, keepdims=False
            )
            return (
                (state, buf_theta, buf_logp, buf_depth, trips),
                (draw, lp, dep),
            )

        trips0 = (jnp.int32(0), jnp.int32(0))
        (state, _, _, _, trips), (draws, logps, depths) = jax.lax.scan(
            scan_step,
            (state, buf_theta, buf_logp, buf_depth, trips0),
            jnp.arange(R),
        )
        if pallas_pass:  # (R, D, C) chain-minor emissions -> (R, C, D)
            draws = jnp.moveaxis(draws, -1, 1)
        return BatchedBlockResult(
            draws=draws, logps=logps, depths=depths,
            key=state.key,
            # sample_block's OWN work: excludes the one block-entry
            # evaluation start_block performed (callers composing both,
            # like run_sampling, must add it)
            n_grads_delta=state.n_grads - n_grads0,
            fails_delta=jax.tree.map(
                lambda a, b: a - b, state.fails, fails0
            ),
            n_inner_trips=trips[0],
            n_outer_trips=trips[1],
        )

    def sample_block_adapt(state: LaneState, aux, max_error, num_draws: int):
        """Asynchronous adaptive-warmup block (``adapt_full=True``).

        ``aux = (mass, mm_est, iteration, inv_mass, step, min_micro)``
        carries each lane's estimator states and current-draw transition
        parameters; lanes adapt and restart individually inside
        ``leaf_apply`` (no cross-lane draw barrier — see the factory
        docstring). Mirrors ``sample_block``'s run-ahead scan; the
        banking loop is kept textually in sync with it rather than
        shared, so the measured-hot sampling path stays untouched.
        Returns ``(BatchedBlockResult, final LaneState, aux')``.
        """
        R = int(num_draws)
        dtype = state.run_sel.dtype
        jdtype = state.ms_joint.dtype
        C, D = state.run_sel.shape
        max_error = jnp.asarray(max_error, dtype=dtype)
        n_grads0 = state.n_grads
        fails0 = state.fails

        bufC = (C,)
        if pallas_pass:
            # the fused pass banks draws chain-minor: (B, D, C); the
            # emitted block transposes back once after the scan
            buf_theta = jnp.zeros((B, D, C), dtype)
        else:
            buf_theta = jnp.zeros((B,) + bufC + (D,), dtype)
        buf_logp = jnp.full((B,) + bufC, -jnp.inf, jdtype)
        buf_depth = jnp.zeros((B,) + bufC, jnp.int32)

        def scan_step(carry, r):
            state, aux, buf_theta, buf_logp, buf_depth, trips = carry
            cap = jnp.minimum(jnp.int32(R), r + B)

            def outer_cond(c):
                return jnp.any(c[0].draws_done <= r)

            def outer_body(c):
                st, aux, bt, bl, bd, trips = c
                mass, mm_est, iteration, inv_mass, step, min_micro = aux
                active = st.draws_done < cap

                def inner_cond(c2):
                    s, n = c2
                    more = jnp.any(active & ~s.leaf_done)
                    if K > 0:
                        more = more & (n - trips[0] < K)
                    return more

                def inner_body(c2):
                    s, n = c2
                    return (
                        inner_trip(s, active, step, inv_mass, min_micro,
                                   max_error),
                        n + 1,
                    )

                st, n_inner = jax.lax.while_loop(
                    inner_cond, inner_body, (st, trips[0])
                )
                trips = (n_inner, trips[1] + 1)
                (st, complete, sel_theta, sel_logp, out_depth, _,
                 bank_idx, aux) = leaf_apply(
                    st, active, step, inv_mass, min_micro, R,
                    aux=(mass, mm_est, iteration),
                )
                slot = bank_idx % B  # valid where complete
                if _use_bounded(sel_theta.shape[-1]):
                    lo = jnp.min(jnp.where(complete, slot, jnp.int32(B)))
                    hi = jnp.max(jnp.where(complete, slot, jnp.int32(-1)))

                    def bank_body(c):
                        j, bt, bl, bd = c
                        mj = complete & (slot == j)
                        mth, mlp = mj[:, None], mj
                        sth, slp, sdp = sel_theta, sel_logp, out_depth
                        row = jax.lax.dynamic_index_in_dim(
                            bt, j, axis=0, keepdims=False
                        )
                        row = jnp.where(mth, sth, row)
                        bt = jax.lax.dynamic_update_index_in_dim(
                            bt, row, j, axis=0
                        )
                        lrow = jax.lax.dynamic_index_in_dim(
                            bl, j, axis=0, keepdims=False
                        )
                        bl = jax.lax.dynamic_update_index_in_dim(
                            bl, jnp.where(mlp, slp, lrow), j, axis=0
                        )
                        drow = jax.lax.dynamic_index_in_dim(
                            bd, j, axis=0, keepdims=False
                        )
                        bd = jax.lax.dynamic_update_index_in_dim(
                            bd, jnp.where(mlp, sdp, drow), j, axis=0
                        )
                        return j + 1, bt, bl, bd

                    _, bt, bl, bd = jax.lax.while_loop(
                        lambda c: c[0] <= hi, bank_body, (lo, bt, bl, bd)
                    )
                else:
                    m = complete[None, :] & (
                        slot[None, :]
                        == jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
                    )  # (B, C)
                    bt = jnp.where(m[:, :, None], sel_theta[None], bt)
                    bl = jnp.where(m, sel_logp[None], bl)
                    bd = jnp.where(m, out_depth[None], bd)
                return st, aux, bt, bl, bd, trips

            carry = jax.lax.while_loop(
                outer_cond, outer_body,
                (state, aux, buf_theta, buf_logp, buf_depth, trips),
            )
            state, aux, buf_theta, buf_logp, buf_depth, trips = carry
            sl = r % B
            draw = jax.lax.dynamic_index_in_dim(
                buf_theta, sl, axis=0, keepdims=False
            )
            lp = jax.lax.dynamic_index_in_dim(
                buf_logp, sl, axis=0, keepdims=False
            )
            dep = jax.lax.dynamic_index_in_dim(
                buf_depth, sl, axis=0, keepdims=False
            )
            return (
                (state, aux, buf_theta, buf_logp, buf_depth, trips),
                (draw, lp, dep),
            )

        trips0 = (jnp.int32(0), jnp.int32(0))
        (state, aux, _, _, _, trips), (draws, logps, depths) = jax.lax.scan(
            scan_step,
            (state, aux, buf_theta, buf_logp, buf_depth, trips0),
            jnp.arange(R),
        )
        return BatchedBlockResult(
            draws=draws, logps=logps, depths=depths,
            key=state.key,
            n_grads_delta=state.n_grads - n_grads0,
            fails_delta=jax.tree.map(
                lambda a, b: a - b, state.fails, fails0,
            ),
            n_inner_trips=trips[0],
            n_outer_trips=trips[1],
        ), state, aux

    # exposed for diagnostics/benchmarks (tests, cost-model probes)
    # and for the warmup runner (cached start point)
    sample_block.inner_trip = inner_trip
    sample_block.leaf_apply = leaf_apply
    sample_block.start_block_cached = start_block_cached
    sample_block.adapt = sample_block_adapt if adapt_full else None
    return start_block, sample_block


def make_batched_warmup_block(logp_grad: LogpGradFn, sampling_cfg,
                              pallas_replay: bool = False,
                              runahead: int = 4,
                              tier2_every: int = 6,
                              bounded_sweeps: Optional[bool] = None):
    """Batched-native ADAPTIVE WARMUP block — asynchronous per lane.

    The warmup adaptation dependency ("every draw's transition reads
    parameters adapted from the previous draw",
    ``AdaptiveWalnuts::operator()``, adaptive_walnuts.hpp:234-251) is
    strictly PER-LANE: each chain adapts from its own draw stream, just
    like the reference's independent per-chain warmup threads
    (adapt.hpp:79-146). A cross-lane per-draw barrier is therefore pure
    scheduling — so this block reuses the sampling scheduler's run-ahead
    machinery (``adapt_full=True``): a lane that completes a draw has
    its mass / min-micro / Adam observations applied in that tier-2 pass
    and restarts immediately with its own adapted parameters, while
    slower lanes keep integrating. The schedule is EXACT vs the classic
    per-draw-synchronous warmup: end keys and every integer output match
    bitwise, and draws/adapted floats match to ~1e-13 over 36 draws
    (not bitwise — the classic program FMA-contracts the Welford
    observe where this one rounds per-op; see the ``adapt_full`` note in
    :func:`make_batched_sample_block` and tests/test_batched.py). The
    per-draw max-lane padding (13.4x measured on funnel x4096) relaxes
    toward the ``runahead``-draw window max — the same relaxation
    sampling gets.

    Also carried over from the sampling scheduler: leaf-latched
    integration with amortised tier-2 (``tier2_every``), the
    single-split per-attempt RNG, Adam observing the coarsest attempt
    inside the loop, and the cached selected-state gradient (the classic
    warmup re-evaluates every draw's start point; here only the first
    draw of each block pays it).

    Returns ``warmup_block(state: WarmupState, n) -> (state',
    (thetas, logps))`` operating on the chain-batched classic
    :class:`~walnuts_tpu.core.sampler.WarmupState` — a drop-in for
    ``run_warmup``'s block runner.
    """
    from walnuts_tpu.core.sampler import WarmupState

    start_block, sample_block = make_batched_sample_block(
        logp_grad,
        sampling_cfg.max_trajectory_doublings,
        sampling_cfg.max_step_halvings,
        runahead=runahead,
        tier2_every=tier2_every,
        adapt_step_size=True,
        pallas_replay=pallas_replay,
        adapt_full=True,
        bounded_sweeps=bounded_sweeps,
    )
    block_adapt = sample_block.adapt
    max_error = sampling_cfg.max_hamiltonian_error

    def warmup_block(ws: WarmupState, n: int):
        dtype = ws.theta.dtype
        # one fresh evaluation per BLOCK (counted); within the block the
        # selected state's logp/grad ride the lane state.
        logp0, grad0 = jax.vmap(logp_grad)(ws.theta)
        inv_mass = jax.vmap(mass_estimator_inv_mass)(ws.mass)
        step = adam_step_size(ws.adam)
        min_micro = jax.vmap(min_micro_estimate)(ws.min_micro)
        st = sample_block.start_block_cached(
            ws.key, ws.theta, logp0, grad0, step, inv_mass, min_micro,
            ws.adam, ws.n_grads + 1, ws.fails,
        )
        aux = (ws.mass, ws.min_micro, ws.iteration,
               inv_mass, step, min_micro)
        res, st, aux = block_adapt(
            st, aux, jnp.asarray(max_error, dtype), int(n)
        )
        mass, mm_est, iteration, *_ = aux
        adam, n_grads, fails = st.adam, st.n_grads, st.fails
        ws = WarmupState(
            key=res.key,
            theta=res.draws[-1],
            adam=adam,
            mass=mass,
            min_micro=mm_est,
            iteration=iteration,
            n_grads=n_grads,
            fails=fails,
        )
        return ws, (res.draws, res.logps)

    return warmup_block


def _where_lane(pred, new, old):
    """Per-lane select over arrays with trailing broadcast dims ((C,),
    (C, D), ...): reshape the (C,) predicate to match."""
    return jnp.where(
        pred.reshape(pred.shape + (1,) * (old.ndim - pred.ndim)), new, old
    )


def _key_where(pred, a, b):
    """Per-lane select over typed PRNG key arrays."""
    return jax.random.wrap_key_data(
        jnp.where(pred[:, None], jax.random.key_data(a),
                  jax.random.key_data(b)),
        impl=jax.random.key_impl(b),
    )


__all__ = [
    "BatchedBlockResult",
    "LaneState",
    "make_batched_sample_block",
]
