"""Batched-native WALNUTS sampling: explicit chain-batch scheduling.

The classic path (``core/transition.py``) vmaps a per-chain transition
whose while loop runs until the SLOWEST lane finishes its trajectory, and
whose outer body runs once per ATTEMPT (one step-halving level or one
reversibility level). Under SPMD that costs two kinds of padding, both
measured on funnel(101) x 4096 chains (docs/BENCHMARKS.md):

  * per-draw synchronisation: every draw waits for the per-draw max lane
    (232 gradient slots vs a 19.7 mean — 11.8x), while the max-lane TOTAL
    over a long run is only 3.9x the mean;
  * attempt misalignment: the expensive full-state bookkeeping body runs
    ``max over lanes of attempt count`` times, and the cheap inner
    integration loop pads to ``sum over attempts of the max attempt
    length`` — lanes with many short attempts and lanes with few long
    attempts pad each other multiplicatively.

This module rebuilds the sampling block with the chain axis scheduled
explicitly (the reference's thread-per-chain runtime, adapt.hpp:79-146 /
sampler.hpp:47-103, re-imagined for lockstep SPMD rather than translated):

  * the halving / reversibility state machine (``macro_step``,
    walnuts.hpp:307-345, and ``reversible``, walnuts.hpp:254-279) moves
    INTO the integration loop as masked per-lane scalar transitions, so
    the loop synchronises on whole LEAVES, not attempts: one trip = one
    batched gradient; the heavy orbit bookkeeping (merge cascade,
    reservoir, top-level combine — walnuts.hpp:368-387, 464-495, 520-563)
    runs once per leaf instead of once per attempt;
  * a lane that finishes a trajectory banks the draw in a B-deep
    run-ahead buffer and starts the next trajectory IMMEDIATELY; draws
    are emitted in order by a ``lax.scan`` reading buffer slot
    ``r mod B``. A lane only parks when it is B draws ahead of the
    emission cursor, so the per-draw max-lane padding relaxes toward the
    max over B-draw windows (measured ~6x at B=16 vs 11.8x per-draw).
    The buffer is written with B static-unrolled masked row updates — an
    XLA scatter at this shape costs ~430 us on v5e (measured, serialized)
    vs ~2 us per masked row, which is why the buffer is small and the
    ring is NOT draw-count deep;
  * lane liveness, loop continuation, and convergence all reduce with
    ``jnp.any`` over the chain axis — under a mesh these lower to ICI
    collectives exactly like the classic path's.

RNG parity: the per-lane key-consumption schedule is IDENTICAL to the
classic path (one split per attempt, a 3-uniform draw per body
application consumed at leaf completion, a 3-way split + momentum normal
+ direction bernoulli per trajectory start), so on CPU the emitted draws
are BITWISE EQUAL to the classic sampler's — the scheduling changes, the
Markov chain does not (guarded by tests/test_batched.py). Two deliberate
accounting differences: the fresh gradient evaluation the reference pays
at every trajectory start (walnuts.hpp:531-532) is cached from the
previous draw's selected state within a block (the draw VALUES are
unchanged — the gradient of the same point is deterministic — only
``n_grads`` drops by one per draw), and blocks do not run ahead into the
next block (the carried ``SampleState`` stays interchangeable with the
classic path, so checkpoint/resume and the R-hat controller work
unchanged).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

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
    span_from_point,
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
    """Per-lane (single chain) state; the batched state has a leading
    chain axis on every leaf (built with ``jax.vmap``)."""

    # --- persistent orbit state (touched once per LEAF) ---
    key: Array
    depth: Array           # int32, current doubling (1-based)
    out_depth: Array       # int32, reported depth at termination
    acc_v: Array           # (5, D) accumulated orbit vectors
    acc_s: Array           # (4,) accumulated orbit scalars
    acc_grad_bk: Array     # (D,)
    acc_grad_sel: Array    # (D,)
    acc_grad_fw: Array     # (D,)
    forward: Array         # bool
    leaf_idx: Array        # int32
    n_leaves: Array        # int32
    stack_e: Array         # (max_depth-1, 2, D)
    run_sel: Array         # (D,)
    run_sel_logp: Array
    run_sel_grad: Array    # (D,)
    run_logw: Array
    ms: Array              # (3, D) macro(leaf)-step start [theta, rho, grad]
    ms_joint: Array
    # --- attempt machine (advanced inside the integration loop) ---
    halvings: Array        # int32
    dt: Array              # signed micro step size
    steps_done: Array      # int32
    steps_total: Array     # int32
    phase: Array           # int32
    cur: Array             # (3, D) cursor [theta, rho, grad]
    lp_cur: Array          # position log density at the cursor
    fwd: Array             # (3, D) saved forward endpoint
    fwd_logp_pos: Array
    fwd_joint: Array
    # --- leaf outcome latches (set by the inner loop, read by tier 2) ---
    leaf_done: Array       # bool
    leaf_ok: Array         # bool (accept; False at leaf_done = leaf fail)
    unifs: Array           # (3,) uniforms of the leaf-completing attempt
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


def _start_trajectory(key, theta, logp0, grad0, step, inv_mass, min_micro,
                      n_slots: int, max_depth: int, n_grads, fails,
                      draws_done, stack_e):
    """Fresh per-lane trajectory state from a known starting point.

    Matches ``init_state`` (core/transition.py) in values AND in RNG
    consumption: one 3-way key split, one D-normal momentum, one
    direction bernoulli (walnuts.hpp:528-529 via transition_w). The merge
    stack is passed through unzeroed — its slots are always written
    before the leaf cascade reads them (``leaf_idx`` restarts at 0).
    """
    dtype = theta.dtype
    key, k_mom, k_dir = jax.random.split(key, 3)
    z = jax.random.normal(k_mom, theta.shape, dtype=dtype)
    rho = z / jnp.sqrt(inv_mass)
    joint0 = logp0 + logp_momentum(rho, inv_mass)
    acc_v, acc_s = span_from_point(theta, rho, logp0, joint0)
    forward0 = jax.random.bernoulli(k_dir)
    dt0 = jnp.where(forward0, step, -step)
    start = jnp.stack([theta, rho, grad0])
    return LaneState(
        key=key,
        depth=jnp.int32(1),
        out_depth=jnp.int32(max_depth + 1),
        acc_v=acc_v,
        acc_s=acc_s,
        acc_grad_bk=grad0,
        acc_grad_sel=grad0,
        acc_grad_fw=grad0,
        forward=forward0,
        leaf_idx=jnp.int32(0),
        n_leaves=jnp.int32(1),
        stack_e=stack_e,
        run_sel=theta,
        run_sel_logp=logp0,
        run_sel_grad=grad0,
        run_logw=jnp.asarray(-jnp.inf, dtype=dtype),
        ms=start,
        ms_joint=joint0,
        halvings=jnp.int32(0),
        dt=dt0,
        steps_done=jnp.int32(0),
        steps_total=jnp.asarray(min_micro, jnp.int32),
        phase=jnp.int32(_PH_FWD),
        cur=start,
        lp_cur=logp0,
        fwd=start,
        fwd_logp_pos=logp0,
        fwd_joint=joint0,
        leaf_done=jnp.asarray(False),
        leaf_ok=jnp.asarray(False),
        unifs=jnp.zeros((3,), dtype=dtype),
        n_grads=n_grads,
        fails=fails,
        draws_done=draws_done,
    )


def make_batched_sample_block(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    runahead: int = 16,
):
    """Build ``(start_block, sample_block)`` for batched-native sampling.

    - ``start_block(key, theta, n_grads, fails, step, inv_mass,
      min_micro)``: chain-batched inputs ``(C,)``/``(C, D)``; evaluates
      one batched gradient (counted) and returns the initial batched
      ``LaneState``.
    - ``sample_block(state, step, inv_mass, min_micro, max_error,
      num_draws)``: advances every lane by exactly ``num_draws`` draws,
      returning a :class:`BatchedBlockResult`. ``num_draws`` is static.

    ``runahead`` is B, the run-ahead depth (buffer rows); higher relaxes
    the per-draw synchronisation toward the lane-total floor at the cost
    of ``B * C * D`` floats of carried buffer.
    """
    n_slots = max(max_depth - 1, 1)
    B = max(int(runahead), 1)

    vsplit = jax.vmap(lambda k: jax.random.split(k))
    vsplit3 = jax.vmap(lambda k: jax.random.split(k, 3))
    vleapfrog = jax.vmap(
        lambda im, dt, c: leapfrog_step(logp_grad, im, dt, c[0], c[1], c[2]),
        in_axes=(0, 0, 0),
    )
    vlogp_grad = jax.vmap(logp_grad)

    def start_block(key, theta, n_grads, fails, step, inv_mass, min_micro):
        logp0, grad0 = vlogp_grad(theta)
        dtype = theta.dtype
        stack0 = jnp.zeros(
            (theta.shape[0], n_slots, 2, theta.shape[1]), dtype=dtype
        )
        return jax.vmap(
            lambda k, t, l0, g0, st, im, mm, ng, fl, se: _start_trajectory(
                k, t, l0, g0, st, im, mm, n_slots, max_depth,
                ng, fl, jnp.int32(0), se,
            )
        )(key, theta, logp0, grad0, step, inv_mass, min_micro,
          # the block-entry gradient is fresh (and counted), exactly like
          # the classic path's transition entry (walnuts.hpp:531-532)
          n_grads + 1, fails, stack0)

    # ------------------------------------------------------------------
    # inner loop: one batched gradient per trip; the attempt machine
    # (halvings, reversibility levels) advances as masked per-lane scalar
    # transitions. Exits when every ACTIVE lane has completed its leaf.
    # ------------------------------------------------------------------
    def inner_trip(s: LaneState, active, inv_mass, min_micro, max_error):
        dtype = s.ms_joint.dtype
        run = active & ~s.leaf_done

        th, rho, gr, lp = vleapfrog(inv_mass, s.dt, s.cur)
        cur_n = jnp.stack([th, rho, gr], axis=1)  # (C, 3, D)
        cur = jnp.where(run[:, None, None], cur_n, s.cur)
        lp_cur = jnp.where(run, lp, s.lp_cur)
        steps_done = s.steps_done + run.astype(jnp.int32)
        n_grads = s.n_grads + run.astype(jnp.int32)

        att_done = run & (steps_done >= s.steps_total)
        joint_n = lp_cur + jax.vmap(logp_momentum)(cur[:, 1], inv_mass)

        # one key split per attempt (classic body, transition.py)
        ks = vsplit(s.key)
        key = jnp.where(att_done, ks[:, 0], s.key)
        k_u = ks[:, 1]
        u3 = jax.vmap(
            lambda k: jax.random.uniform(k, (3,), dtype=dtype)
        )(k_u)

        in_fwd = s.phase == _PH_FWD
        # forward attempt completed (macro_step, walnuts.hpp:322-343)
        f_done = att_done & in_fwd
        f_err = jnp.abs(s.ms_joint - joint_n)
        f_ok = f_err <= max_error  # NaN -> False -> halve/fail
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
        fwd = jnp.where(set_fwd[:, None, None], cur, s.fwd)
        fwd_logp_pos = jnp.where(set_fwd, lp_cur, s.fwd_logp_pos)
        fwd_joint = jnp.where(set_fwd, joint_n, s.fwd_joint)

        leaf_end = leaf_ok_now | leaf_fail_now
        unifs = jnp.where(leaf_end[:, None], u3, s.unifs)
        leaf_done = s.leaf_done | leaf_end
        leaf_ok = jnp.where(leaf_end, leaf_ok_now, s.leaf_ok)

        fails = FailStats(
            n_halve_fail=s.fails.n_halve_fail + halve_exh.astype(jnp.int32),
            n_nonfinite=s.fails.n_nonfinite
            + (att_done & ~jnp.isfinite(lp_cur)).astype(jnp.int32),
            n_depth_exhausted=s.fails.n_depth_exhausted,
        )

        # next-attempt setup (reads pre-update steps_total/dt, like the
        # classic body's where-cascade)
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
        rev_cur = fwd * jnp.asarray([1.0, -1.0, 1.0], dtype)[None, :, None]
        cur = jnp.where(to_rev[:, None, None], rev_cur,
                        jnp.where(restart[:, None, None], s.ms, cur))

        return s._replace(
            key=key, cur=cur, lp_cur=lp_cur, fwd=fwd,
            fwd_logp_pos=fwd_logp_pos, fwd_joint=fwd_joint,
            halvings=halvings, dt=dt, steps_done=steps_done,
            steps_total=steps_total, phase=phase,
            leaf_done=leaf_done, leaf_ok=leaf_ok, unifs=unifs,
            n_grads=n_grads, fails=fails,
        )

    # ------------------------------------------------------------------
    # tier 2: per-lane orbit bookkeeping at a completed leaf — the merge
    # cascade + reservoir + top-level combine of the classic body
    # (transition.py; walnuts.hpp:368-387, 464-495, 536-558) — plus draw
    # completion and fused trajectory restart.
    # ------------------------------------------------------------------
    def leaf_apply(s: LaneState, active, step, inv_mass, min_micro,
                   block_draws):
        """One leaf-level update per ACTIVE lane. Returns the new state;
        completion (banked draw) is handled by the caller via the
        returned ``complete``/emission values."""
        dtype = s.ms_joint.dtype
        leaf_ok = active & s.leaf_done & s.leaf_ok
        leaf_fail = active & s.leaf_done & ~s.leaf_ok
        fwd, fwd_joint, fwd_logp_pos = s.fwd, s.fwd_joint, s.fwd_logp_pos
        unifs = s.unifs

        leaf_th, leaf_rho = fwd[:, 0], fwd[:, 1]
        sgn = jnp.where(s.forward, jnp.asarray(1.0, dtype),
                        jnp.asarray(-1.0, dtype))

        def uturn_end(old_th, old_rho):
            delta = sgn[:, None] * inv_mass * (leaf_th - old_th)
            return (jnp.sum(leaf_rho * delta, axis=-1) < 0) | (
                jnp.sum(old_rho * delta, axis=-1) < 0
            )

        n_merges = count_trailing_zeros(s.leaf_idx + 1)
        cur_end = fwd[:, :2]
        ok = jnp.ones_like(leaf_ok)
        for i in range(n_slots):
            do = leaf_ok & (i < n_merges) & ok
            slot = s.stack_e[:, i]
            ut = uturn_end(slot[:, 0], slot[:, 1])
            cur_end = jnp.where(do[:, None, None], slot, cur_end)
            ok = ok & ~(do & ut)
        sub_uturn = leaf_ok & ~ok
        leaf_ok = leaf_ok & ok

        new_leaf_idx = s.leaf_idx + 1
        subtree_done = leaf_ok & (new_leaf_idx >= s.n_leaves)
        push = leaf_ok & ~subtree_done
        write_mask = push[None, :] & (
            n_merges[None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (n_slots, 1), 0)
        )  # (n_slots, C)
        stack_e = jnp.where(
            jnp.moveaxis(write_mask, 1, 0)[:, :, None, None],
            cur_end[:, None], s.stack_e,
        )

        # reservoir (streaming Barker; see transition.py module docstring)
        run_logw_new = log_sum_exp(s.run_logw, fwd_joint)
        take_leaf = jnp.log(unifs[:, 0]) < fwd_joint - run_logw_new
        upd = leaf_ok & take_leaf
        run_sel = jnp.where(upd[:, None], fwd[:, 0], s.run_sel)
        run_sel_logp = jnp.where(upd, fwd_logp_pos, s.run_sel_logp)
        run_sel_grad = jnp.where(upd[:, None], fwd[:, 2], s.run_sel_grad)
        run_logw = jnp.where(leaf_ok, run_logw_new, s.run_logw)

        # subtree completed: top-level Metropolis + combined U-turn
        acc_old = jnp.where(
            s.forward[:, None, None],
            s.acc_v[:, _THETA_BK:_RHO_BK + 1],
            s.acc_v[:, _THETA_FW:_RHO_FW + 1],
        )
        ut_top = uturn_end(acc_old[:, 0], acc_old[:, 1])
        take_new = jnp.log(unifs[:, 1]) < run_logw_new - s.acc_s[:, _LOGW]
        upd_fw = subtree_done & s.forward
        upd_bk = subtree_done & ~s.forward
        take = subtree_done & take_new
        acc_v = jnp.stack([
            jnp.where(upd_bk[:, None], fwd[:, 0], s.acc_v[:, _THETA_BK]),
            jnp.where(upd_bk[:, None], fwd[:, 1], s.acc_v[:, _RHO_BK]),
            jnp.where(upd_fw[:, None], fwd[:, 0], s.acc_v[:, _THETA_FW]),
            jnp.where(upd_fw[:, None], fwd[:, 1], s.acc_v[:, _RHO_FW]),
            jnp.where(take[:, None], run_sel, s.acc_v[:, _THETA_SEL]),
        ], axis=1)
        acc_s = jnp.stack([
            jnp.where(upd_bk, fwd_joint, s.acc_s[:, _LOGP_BK]),
            jnp.where(upd_fw, fwd_joint, s.acc_s[:, _LOGP_FW]),
            jnp.where(take, run_sel_logp, s.acc_s[:, _LOGP_SEL]),
            jnp.where(subtree_done,
                      log_sum_exp(s.acc_s[:, _LOGW], run_logw_new),
                      s.acc_s[:, _LOGW]),
        ], axis=1)
        acc_grad_fw = jnp.where(upd_fw[:, None], fwd[:, 2], s.acc_grad_fw)
        acc_grad_bk = jnp.where(upd_bk[:, None], fwd[:, 2], s.acc_grad_bk)
        acc_grad_sel = jnp.where(take[:, None], run_sel_grad, s.acc_grad_sel)
        end_uturn = subtree_done & ut_top
        new_depth = s.depth + 1
        deeper = subtree_done & ~ut_top & (new_depth <= max_depth)
        exhausted = subtree_done & ~ut_top & (new_depth > max_depth)

        fail = leaf_fail | sub_uturn
        complete = fail | end_uturn | exhausted
        fails = s.fails._replace(
            n_depth_exhausted=s.fails.n_depth_exhausted
            + exhausted.astype(jnp.int32)
        )
        out_depth = jnp.where(
            fail | end_uturn, s.depth,
            jnp.where(exhausted, jnp.int32(max_depth + 1), s.out_depth),
        )

        # --- continuing lanes: start the next leaf ---
        new_dir = jnp.where(deeper, unifs[:, 2] < 0.5, s.forward)
        run_logw = jnp.where(deeper, jnp.asarray(-jnp.inf, dtype), run_logw)
        depth = jnp.where(deeper, new_depth, s.depth)
        n_leaves = jnp.where(deeper, jnp.int32(1) << (new_depth - 1),
                             s.n_leaves)
        leaf_idx = jnp.where(deeper, jnp.int32(0), new_leaf_idx)
        leaf_idx = jnp.where(leaf_ok | deeper, leaf_idx, s.leaf_idx)

        acc_end = jnp.stack([
            jnp.where(new_dir[:, None], acc_v[:, _THETA_FW],
                      acc_v[:, _THETA_BK]),
            jnp.where(new_dir[:, None], acc_v[:, _RHO_FW],
                      acc_v[:, _RHO_BK]),
            jnp.where(new_dir[:, None], acc_grad_fw, acc_grad_bk),
        ], axis=1)
        acc_end_joint = jnp.where(new_dir, acc_s[:, _LOGP_FW],
                                  acc_s[:, _LOGP_BK])
        ms = jnp.where(deeper[:, None, None], acc_end,
                       jnp.where(push[:, None, None], fwd, s.ms))
        ms_joint = jnp.where(deeper, acc_end_joint,
                             jnp.where(push, fwd_joint, s.ms_joint))
        dt_base = jnp.where(new_dir, step, -step)

        cont = active & s.leaf_done & ~complete
        mid = s._replace(
            depth=depth, out_depth=out_depth,
            acc_v=acc_v, acc_s=acc_s,
            acc_grad_bk=acc_grad_bk, acc_grad_fw=acc_grad_fw,
            acc_grad_sel=acc_grad_sel,
            forward=new_dir, leaf_idx=leaf_idx, n_leaves=n_leaves,
            stack_e=stack_e, run_sel=run_sel, run_sel_logp=run_sel_logp,
            run_sel_grad=run_sel_grad, run_logw=run_logw,
            ms=ms, ms_joint=ms_joint,
            halvings=jnp.where(cont, jnp.int32(0), s.halvings),
            dt=jnp.where(cont, dt_base, s.dt),
            steps_done=jnp.where(cont, jnp.int32(0), s.steps_done),
            steps_total=jnp.where(cont, min_micro, s.steps_total),
            phase=jnp.where(cont, jnp.int32(_PH_FWD), s.phase),
            cur=jnp.where(cont[:, None, None], ms, s.cur),
            leaf_done=jnp.where(active & s.leaf_done, False, s.leaf_done),
            leaf_ok=jnp.where(active & s.leaf_done, False, s.leaf_ok),
            fails=fails,
        )

        # --- completing lanes: bank the draw, restart a trajectory ---
        sel_theta = acc_v[:, _THETA_SEL]
        sel_logp = acc_s[:, _LOGP_SEL]
        new_draws_done = mid.draws_done + complete.astype(jnp.int32)
        # Restart immediately on completion even when the lane is about
        # to park at the run-ahead cap (the ``active`` mask keeps the
        # fresh trajectory idle until the emission cursor catches up) —
        # a parked lane must never carry terminated trajectory state.
        # EXCEPT at the block end: its key must equal the classic
        # end-of-draw key so the next block (which re-inits exactly like
        # the classic path) continues the same per-lane stream.
        restart = complete & (new_draws_done < block_draws)
        fresh = jax.vmap(
            lambda k, t, l0, g0, st, im, mm, ng, fl, dd, se:
            _start_trajectory(k, t, l0, g0, st, im, mm, n_slots,
                              max_depth, ng, fl, dd, se)
        )(mid.key, sel_theta, sel_logp, acc_grad_sel, step, inv_mass,
          min_micro, mid.n_grads, mid.fails, new_draws_done, mid.stack_e)

        def pick(f, m):
            mask = restart
            extra = f.ndim - mask.ndim
            if extra:
                mask = mask.reshape(mask.shape + (1,) * extra)
            return jnp.where(mask, f, m)

        out = jax.tree.map(pick, fresh, mid)
        out = out._replace(draws_done=new_draws_done)
        return out, complete, sel_theta, sel_logp, out_depth

    def sample_block(state: LaneState, step, inv_mass, min_micro,
                     max_error, num_draws: int):
        R = int(num_draws)
        dtype = state.ms_joint.dtype
        C, D = state.run_sel.shape
        min_micro = jnp.asarray(min_micro, jnp.int32)
        step = jnp.asarray(step, dtype=dtype)
        max_error = jnp.asarray(max_error, dtype=dtype)
        n_grads0 = state.n_grads
        fails0 = state.fails

        buf_theta = jnp.zeros((B, C, D), dtype)
        buf_logp = jnp.full((B, C), -jnp.inf, dtype)
        buf_depth = jnp.zeros((B, C), jnp.int32)

        def scan_step(carry, r):
            state, buf_theta, buf_logp, buf_depth = carry
            cap = jnp.minimum(jnp.int32(R), r + B)

            def outer_cond(c):
                st = c[0]
                return jnp.any(st.draws_done <= r)

            def outer_body(c):
                st, bt, bl, bd = c
                active = st.draws_done < cap

                def inner_cond(s):
                    return jnp.any(active & ~s.leaf_done)

                def inner_body(s):
                    return inner_trip(s, active, inv_mass, min_micro,
                                      max_error)

                st = jax.lax.while_loop(inner_cond, inner_body, st)
                st, complete, sel_theta, sel_logp, out_depth = leaf_apply(
                    st, active, step, inv_mass, min_micro, R
                )
                # bank completed draws: B static-unrolled masked row
                # writes (draw index = pre-increment draws_done)
                slot = (st.draws_done - 1) % B  # valid where complete
                for b in range(B):
                    m = complete & (slot == b)
                    bt = bt.at[b].set(
                        jnp.where(m[:, None], sel_theta, bt[b])
                    )
                    bl = bl.at[b].set(jnp.where(m, sel_logp, bl[b]))
                    bd = bd.at[b].set(jnp.where(m, out_depth, bd[b]))
                return st, bt, bl, bd

            carry = jax.lax.while_loop(
                outer_cond, outer_body,
                (state, buf_theta, buf_logp, buf_depth),
            )
            state, buf_theta, buf_logp, buf_depth = carry
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
            return (state, buf_theta, buf_logp, buf_depth), (draw, lp, dep)

        (state, _, _, _), (draws, logps, depths) = jax.lax.scan(
            scan_step, (state, buf_theta, buf_logp, buf_depth),
            jnp.arange(R),
        )
        return BatchedBlockResult(
            draws=draws, logps=logps, depths=depths,
            key=state.key,
            n_grads_delta=state.n_grads - n_grads0,
            fails_delta=jax.tree.map(
                lambda a, b: a - b, state.fails, fails0
            ),
        )

    return start_block, sample_block


__all__ = [
    "BatchedBlockResult",
    "LaneState",
    "make_batched_sample_block",
]
