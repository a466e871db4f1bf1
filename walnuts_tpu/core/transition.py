"""The WALNUTS transition, redesigned for TPU/XLA.

The reference implements the transition recursively with early returns and
data-dependent loops (``include/walnutpie/walnuts.hpp``): recursive
trajectory doubling (`build_span`, walnuts.hpp:464-495), a per-macro-step
step-halving loop (`macro_step`, walnuts.hpp:307-345), and a reversibility
check that re-integrates at every coarser level (`reversible`,
walnuts.hpp:254-279). None of that control flow maps onto XLA.

TPU-native design
-----------------
Everything is flattened into ONE ``lax.while_loop`` whose body performs
exactly one leapfrog micro step — one batched gradient evaluation, the only
real work in the sampler — plus O(D) masked bookkeeping:

  * a per-lane PHASE (forward integration vs reversibility re-integration)
    replaces the nested loops;
  * the recursive doubling becomes an iterative merge stack of spans: after
    leaf ``j``, exactly ``ctz(j+1)`` merges collapse completed subtrees,
    each with a sub-U-turn check and Barker selection (walnuts.hpp:490-494);
  * the top-level progressive update stays Metropolis (walnuts.hpp:547),
    preserving the reference's Barker-inside / Metropolis-outside asymmetry
    on which distributional correctness depends;
  * model failures surface as ``-inf`` log densities (never exceptions),
    so a failing proposal rejects naturally.

Because every loop iteration costs one gradient evaluation for every lane,
SIMD divergence across vmapped chains wastes at most
``max(total micro steps over lanes) - lane's own total`` evaluations — the
minimum possible padding for data-dependent trajectories under SPMD. The
result tracks both ``n_grads`` (evaluations this lane used) and the loop
iteration count so used-vs-executed efficiency is measurable.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from walnuts_tpu.core.adapt import AdamState, adam_update
from walnuts_tpu.ops.math import (
    LogpGradFn,
    count_trailing_zeros,
    leapfrog_step,
    log_sum_exp,
    logp_momentum,
)

Array = jax.Array

_PH_FWD = jnp.int32(0)
_PH_REV = jnp.int32(1)


class Span(NamedTuple):
    """Minimal trajectory-span record (walnuts.hpp:34-131).

    Backward/forward endpoint states (position, momentum, gradient, joint
    log density), the progressively selected state (position, gradient,
    position log density), and the logsumexp of joint densities over the
    span.
    """

    theta_bk: Array
    rho_bk: Array
    grad_bk: Array
    logp_bk: Array
    theta_fw: Array
    rho_fw: Array
    grad_fw: Array
    logp_fw: Array
    theta_sel: Array
    grad_sel: Array
    logp_sel: Array
    logw: Array


def span_from_point(theta, rho, grad, logp_pos, logp_joint) -> Span:
    return Span(
        theta_bk=theta, rho_bk=rho, grad_bk=grad, logp_bk=logp_joint,
        theta_fw=theta, rho_fw=rho, grad_fw=grad, logp_fw=logp_joint,
        theta_sel=theta, grad_sel=grad, logp_sel=logp_pos, logw=logp_joint,
    )


def _select_span(pred: Array, a: Span, b: Span) -> Span:
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def span_uturn(older: Span, newer: Span, forward: Array, inv_mass: Array) -> Array:
    """U-turn test between two adjacent spans (walnuts.hpp:192-201).

    ``older`` was built first; with ``forward`` travel it is the backward
    half, otherwise the forward half. The squared distance is Mahalanobis
    with the inverse mass as metric:
    ``delta = inv_mass .* (theta_end - theta_start)``; a U-turn occurs when
    either endpoint momentum opposes ``delta``.
    """
    bk = _select_span(forward, older, newer)
    fw = _select_span(forward, newer, older)
    delta = inv_mass * (fw.theta_fw - bk.theta_bk)
    return (jnp.sum(fw.rho_fw * delta) < 0) | (jnp.sum(bk.rho_bk * delta) < 0)


def span_combine(
    unif: Array, older: Span, newer: Span, forward: Array, barker: bool
) -> Span:
    """Merge two spans with progressive state selection (walnuts.hpp:368-387).

    Barker rule (inside subtrees): accept the newer selected state with
    probability ``exp(logw_new - logsumexp(logw_old, logw_new))``.
    Metropolis rule (top level): probability ``exp(logw_new - logw_old)``.
    A ``-inf``-weight newer span is never selected (log(u) < -inf or NaN is
    false).
    """
    logw_total = log_sum_exp(older.logw, newer.logw)
    log_denom = logw_total if barker else older.logw
    take_new = jnp.log(unif) < (newer.logw - log_denom)
    bk = _select_span(forward, older, newer)
    fw = _select_span(forward, newer, older)
    return Span(
        theta_bk=bk.theta_bk, rho_bk=bk.rho_bk, grad_bk=bk.grad_bk, logp_bk=bk.logp_bk,
        theta_fw=fw.theta_fw, rho_fw=fw.rho_fw, grad_fw=fw.grad_fw, logp_fw=fw.logp_fw,
        theta_sel=jnp.where(take_new, newer.theta_sel, older.theta_sel),
        grad_sel=jnp.where(take_new, newer.grad_sel, older.grad_sel),
        logp_sel=jnp.where(take_new, newer.logp_sel, older.logp_sel),
        logw=logw_total,
    )


class TransitionState(NamedTuple):
    """Per-chain while-loop carry. See module docstring for the phases."""

    key: Array
    done: Array            # bool
    depth: Array           # int32, current doubling (1-based)
    out_depth: Array       # int32, reported depth at termination
    acc: Span              # accumulated orbit
    # current subtree
    forward: Array         # bool, direction of travel
    leaf_idx: Array        # int32
    n_leaves: Array        # int32 (= 2^(depth-1))
    stack: Span            # merge stack, leading axis max_depth
    stack_size: Array      # int32
    # current macro step
    ms_theta: Array
    ms_rho: Array
    ms_grad: Array
    ms_joint: Array
    halvings: Array        # int32
    dt: Array              # signed current micro step size
    steps_done: Array      # int32
    steps_total: Array     # int32
    phase: Array           # int32
    # integration cursor
    cur_theta: Array
    cur_rho: Array
    cur_grad: Array
    # saved forward endpoint (leaf candidate / reversibility anchor)
    fwd_theta: Array
    fwd_rho: Array
    fwd_grad: Array
    fwd_logp_pos: Array
    fwd_joint: Array
    # adaptation + accounting
    adam: AdamState
    n_grads: Array         # int32, gradient evals used by this lane


class TransitionResult(NamedTuple):
    theta: Array
    grad: Array
    logp: Array            # position log density of the selected state
    depth: Array           # int32; max_depth + 1 when no U-turn occurred
    n_grads: Array         # int32
    adam: AdamState
    key: Array


def _empty_stack(span: Span, max_depth: int) -> Span:
    return jax.tree.map(
        lambda x: jnp.zeros((max_depth,) + x.shape, dtype=x.dtype), span
    )


def _stack_read(stack: Span, idx: Array) -> Span:
    return jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0, False), stack)


def _stack_write(stack: Span, span: Span, idx: Array) -> Span:
    return jax.tree.map(
        lambda buf, val: jax.lax.dynamic_update_index_in_dim(buf, val, idx, 0),
        stack,
        span,
    )


def make_transition(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    adapt_step_size: bool,
) -> Callable[..., TransitionResult]:
    """Build a single-chain WALNUTS transition (walnuts.hpp:520-563).

    Returns ``transition(key, theta, step, inv_mass, min_micro, max_error,
    adam) -> TransitionResult``. All arguments but the statics here may be
    traced and per-chain; vmap over the leading axis for multi-chain use.
    When ``adapt_step_size`` is True, the carried Adam state observes
    ``exp(-|dH|)`` of the coarsest attempt of every macro step
    (walnuts.hpp:335-338), exactly as warmup requires.
    """

    def transition(
        key: Array,
        theta: Array,
        step: Array,
        inv_mass: Array,
        min_micro: Array,
        max_error: Array,
        adam: AdamState,
    ) -> TransitionResult:
        dtype = theta.dtype
        min_micro = jnp.asarray(min_micro, dtype=jnp.int32)
        step = jnp.asarray(step, dtype=dtype)
        max_error = jnp.asarray(max_error, dtype=dtype)

        key, k_mom, k_dir = jax.random.split(key, 3)
        z = jax.random.normal(k_mom, theta.shape, dtype=dtype)
        rho = z / jnp.sqrt(inv_mass)  # chol(mass) = 1/sqrt(inv_mass)
        logp0, grad0 = logp_grad(theta)
        joint0 = logp0 + logp_momentum(rho, inv_mass)
        acc = span_from_point(theta, rho, grad0, logp0, joint0)

        forward0 = jax.random.bernoulli(k_dir)
        dt0 = jnp.where(forward0, step, -step)

        state = TransitionState(
            key=key,
            done=jnp.asarray(False),
            depth=jnp.int32(1),
            out_depth=jnp.int32(max_depth + 1),
            acc=acc,
            forward=forward0,
            leaf_idx=jnp.int32(0),
            n_leaves=jnp.int32(1),
            stack=_empty_stack(acc, max_depth),
            stack_size=jnp.int32(0),
            ms_theta=theta, ms_rho=rho, ms_grad=grad0, ms_joint=joint0,
            halvings=jnp.int32(0),
            dt=dt0,
            steps_done=jnp.int32(0),
            steps_total=min_micro,
            phase=_PH_FWD,
            cur_theta=theta, cur_rho=rho, cur_grad=grad0,
            fwd_theta=theta, fwd_rho=rho, fwd_grad=grad0,
            fwd_logp_pos=logp0, fwd_joint=joint0,
            adam=adam,
            n_grads=jnp.int32(1),
        )

        def cond(s: TransitionState) -> Array:
            return ~s.done

        def body(s: TransitionState) -> TransitionState:
            key, k_u = jax.random.split(s.key)
            # cascade Barker uniforms, one Metropolis uniform, one direction.
            unifs = jax.random.uniform(k_u, (max_depth + 2,), dtype=dtype)

            # ---- one leapfrog micro step (the only gradient evaluation) ----
            theta_n, rho_n, grad_n, lp_n = leapfrog_step(
                logp_grad, inv_mass, s.dt, s.cur_theta, s.cur_rho, s.cur_grad
            )
            steps_done = s.steps_done + 1
            joint_n = lp_n + logp_momentum(rho_n, inv_mass)
            att_done = steps_done >= s.steps_total
            in_fwd = s.phase == _PH_FWD

            # ---- forward attempt completed (macro_step, walnuts.hpp:322-343)
            f_done = att_done & in_fwd
            f_err = jnp.abs(s.ms_joint - joint_n)
            f_ok = f_err <= max_error  # NaN error -> False -> halve/fail

            if adapt_step_size:
                accept = jnp.exp(-f_err)
                accept = jnp.where(jnp.isnan(accept), jnp.zeros_like(accept), accept)
                observe = f_done & (s.halvings == 0)
                adam_new = adam_update(s.adam, accept)
                adam = jax.tree.map(
                    lambda new, old: jnp.where(observe, new, old), adam_new, s.adam
                )
            else:
                adam = s.adam

            need_rev = s.steps_total >= 2 * min_micro
            start_rev = f_done & f_ok & need_rev
            leaf_ok_fwd = f_done & f_ok & ~need_rev
            more_halvings = (s.halvings + 1) < max_step_halvings
            restart = f_done & ~f_ok & more_halvings
            leaf_fail = f_done & ~f_ok & ~more_halvings

            # ---- reversibility level completed (reversible, walnuts.hpp:267-277)
            r_done = att_done & ~in_fwd
            r_err = jnp.abs(joint_n - s.fwd_joint)
            r_within = r_err <= max_error  # a coarser level would pass -> irreversible
            leaf_fail = leaf_fail | (r_done & r_within)
            more_rev = s.steps_total >= 2 * min_micro
            next_rev = r_done & ~r_within & more_rev
            leaf_ok = leaf_ok_fwd | (r_done & ~r_within & ~more_rev)

            # saved forward endpoint: refreshed when a forward attempt passes.
            set_fwd = f_done & f_ok
            fwd_theta = jnp.where(set_fwd, theta_n, s.fwd_theta)
            fwd_rho = jnp.where(set_fwd, rho_n, s.fwd_rho)
            fwd_grad = jnp.where(set_fwd, grad_n, s.fwd_grad)
            fwd_logp_pos = jnp.where(set_fwd, lp_n, s.fwd_logp_pos)
            fwd_joint = jnp.where(set_fwd, joint_n, s.fwd_joint)

            # ---- leaf accepted: merge cascade (iterative build_span) ----
            leaf = span_from_point(fwd_theta, fwd_rho, fwd_grad, fwd_logp_pos, fwd_joint)
            n_merges = count_trailing_zeros(s.leaf_idx + 1)
            cur_span = leaf
            ok = jnp.asarray(True)
            for i in range(max_depth):
                do = leaf_ok & (i < n_merges) & ok
                top_idx = jnp.clip(s.stack_size - 1 - i, 0, max_depth - 1)
                top = _stack_read(s.stack, top_idx)
                ut = span_uturn(top, cur_span, s.forward, inv_mass)
                merged = span_combine(unifs[i], top, cur_span, s.forward, barker=True)
                cur_span = _select_span(do, merged, cur_span)
                ok = ok & ~(do & ut)
            sub_uturn = leaf_ok & ~ok
            leaf_ok = leaf_ok & ok

            new_leaf_idx = s.leaf_idx + 1
            subtree_done = leaf_ok & (new_leaf_idx >= s.n_leaves)
            push = leaf_ok & ~subtree_done
            ssize_after = jnp.where(leaf_ok, s.stack_size - n_merges, s.stack_size)
            write_idx = jnp.clip(ssize_after, 0, max_depth - 1)
            stack_pushed = _stack_write(s.stack, cur_span, write_idx)
            stack = _select_span(push, stack_pushed, s.stack)
            stack_size = jnp.where(push, ssize_after + 1, ssize_after)

            # ---- subtree completed: top-level Metropolis + combined U-turn
            # (transition_w, walnuts.hpp:536-558): the new subtree is always
            # combined, even when the combined span U-turns.
            ut_top = span_uturn(s.acc, cur_span, s.forward, inv_mass)
            acc_comb = span_combine(
                unifs[max_depth], s.acc, cur_span, s.forward, barker=False
            )
            acc = _select_span(subtree_done, acc_comb, s.acc)
            end_uturn = subtree_done & ut_top
            new_depth = s.depth + 1
            deeper = subtree_done & ~ut_top & (new_depth <= max_depth)
            exhausted = subtree_done & ~ut_top & (new_depth > max_depth)

            # ---- termination bookkeeping ----
            fail = leaf_fail | sub_uturn
            done = s.done | fail | end_uturn | exhausted
            out_depth = jnp.where(
                fail | end_uturn,
                s.depth,
                jnp.where(exhausted, jnp.int32(max_depth + 1), s.out_depth),
            )

            # ---- set up the next loop iteration ----
            new_dir = jnp.where(deeper, unifs[max_depth + 1] < 0.5, s.forward)
            depth = jnp.where(deeper, new_depth, s.depth)
            n_leaves = jnp.where(deeper, jnp.int32(1) << (new_depth - 1), s.n_leaves)
            leaf_idx = jnp.where(deeper, jnp.int32(0), new_leaf_idx)
            leaf_idx = jnp.where(leaf_ok | deeper, leaf_idx, s.leaf_idx)
            stack_size = jnp.where(deeper, jnp.int32(0), stack_size)

            # macro-step start for the next leaf: the frontier is the last
            # leaf endpoint within a subtree, or the orbit endpoint in the
            # travel direction when a new doubling begins.
            acc_end_theta = jnp.where(new_dir, acc.theta_fw, acc.theta_bk)
            acc_end_rho = jnp.where(new_dir, acc.rho_fw, acc.rho_bk)
            acc_end_grad = jnp.where(new_dir, acc.grad_fw, acc.grad_bk)
            acc_end_joint = jnp.where(new_dir, acc.logp_fw, acc.logp_bk)

            next_leaf = push  # continue current subtree from the new frontier
            ms_theta = jnp.where(deeper, acc_end_theta, jnp.where(next_leaf, fwd_theta, s.ms_theta))
            ms_rho = jnp.where(deeper, acc_end_rho, jnp.where(next_leaf, fwd_rho, s.ms_rho))
            ms_grad = jnp.where(deeper, acc_end_grad, jnp.where(next_leaf, fwd_grad, s.ms_grad))
            ms_joint = jnp.where(deeper, acc_end_joint, jnp.where(next_leaf, fwd_joint, s.ms_joint))

            start_macro = deeper | next_leaf
            dt_base = jnp.where(new_dir, step, -step)

            halvings = jnp.where(start_macro, jnp.int32(0),
                                 jnp.where(restart, s.halvings + 1, s.halvings))
            phase = jnp.where(start_macro | restart, _PH_FWD,
                              jnp.where(start_rev | next_rev, _PH_REV, s.phase))
            steps_total = jnp.where(
                start_macro, min_micro,
                jnp.where(restart, s.steps_total * 2,
                          jnp.where(start_rev | next_rev, s.steps_total // 2, s.steps_total)),
            )
            dt = jnp.where(
                start_macro, dt_base,
                jnp.where(restart, s.dt * 0.5,
                          jnp.where(start_rev | next_rev, s.dt * 2.0, s.dt)),
            )
            reset_cursor = start_macro | restart | start_rev | next_rev
            steps_done = jnp.where(reset_cursor, jnp.int32(0), steps_done)

            # cursor source: macro start for forward (re)starts, negated-
            # momentum forward endpoint for reversibility levels, otherwise
            # the fresh leapfrog output.
            from_rev = start_rev | next_rev
            cur_theta = jnp.where(from_rev, fwd_theta,
                                  jnp.where(start_macro | restart, ms_theta, theta_n))
            cur_rho = jnp.where(from_rev, -fwd_rho,
                                jnp.where(start_macro | restart, ms_rho, rho_n))
            cur_grad = jnp.where(from_rev, fwd_grad,
                                 jnp.where(start_macro | restart, ms_grad, grad_n))

            return TransitionState(
                key=key, done=done, depth=depth, out_depth=out_depth, acc=acc,
                forward=new_dir, leaf_idx=leaf_idx, n_leaves=n_leaves,
                stack=stack, stack_size=stack_size,
                ms_theta=ms_theta, ms_rho=ms_rho, ms_grad=ms_grad, ms_joint=ms_joint,
                halvings=halvings, dt=dt, steps_done=steps_done,
                steps_total=steps_total, phase=phase,
                cur_theta=cur_theta, cur_rho=cur_rho, cur_grad=cur_grad,
                fwd_theta=fwd_theta, fwd_rho=fwd_rho, fwd_grad=fwd_grad,
                fwd_logp_pos=fwd_logp_pos, fwd_joint=fwd_joint,
                adam=adam, n_grads=s.n_grads + 1,
            )

        final = jax.lax.while_loop(cond, body, state)
        return TransitionResult(
            theta=final.acc.theta_sel,
            grad=final.acc.grad_sel,
            logp=final.acc.logp_sel,
            depth=final.out_depth,
            n_grads=final.n_grads,
            adam=final.adam,
            key=final.key,
        )

    return transition


__all__ = [
    "Span",
    "TransitionResult",
    "TransitionState",
    "make_transition",
    "span_combine",
    "span_from_point",
    "span_uturn",
]
