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
  * the recursive doubling becomes an iterative merge stack: after leaf
    ``j``, exactly ``ctz(j+1)`` merges collapse completed subtrees, each
    with a sub-U-turn check (walnuts.hpp:490-494);
  * the reference's per-merge Barker selection (walnuts.hpp:368-387) is
    replaced by ONE streaming weight-proportional reservoir over the
    current subtree's leaves. This is exact, not an approximation: the
    Barker rule takes the newer span with probability
    ``w_new / (w_old + w_new)``, so by induction the selected state of any
    merge tree is a draw with ``P(leaf j) = w_j / sum_i w_i`` — fold-order
    invariant — and a per-leaf reservoir (accept leaf ``j`` with
    probability ``w_j / sum_{i<=j} w_i``) realises the same distribution
    with one uniform per leaf and NO per-level selected-state storage;
  * the top-level progressive update stays Metropolis (walnuts.hpp:547),
    preserving the reference's Barker-inside / Metropolis-outside asymmetry
    on which distributional correctness depends;
  * model failures surface as ``-inf`` log densities (never exceptions),
    so a failing proposal rejects naturally.

Memory layout: a span (the reference's ``SpanW``, walnuts.hpp:34-131) is
PACKED into one ``(5, D)`` vector block plus one ``(4,)`` scalar block
instead of twelve separate pytree leaves. Row layout:

  vectors: 0 theta_bk, 1 rho_bk, 2 theta_fw, 3 rho_fw, 4 theta_sel
  scalars: 0 logp_bk (joint), 1 logp_fw (joint), 2 logp_sel (position),
           3 logw (logsumexp of joints)

The reference additionally caches three gradients per span; here the
cursor and two explicit orbit-endpoint vectors carry the gradients
integration needs, and the selected state's gradient rides the reservoir
(one ``(D,)`` vector — it is always the cursor gradient at the moment the
leaf is accepted, so it is free).

Packing turns every masked span update into a couple of wide selects
instead of a dozen narrow ones. With reservoir selection the merge stack
shrinks to ONE array, ``(max_depth-1, 2, D)``: within a doubling every
span in the cascade shares this leaf as its newer-side endpoint, the
accumulated orbit keeps its own older-side endpoint, and a completed
subtree's selection/weight live in the reservoir — so the only thing a
stack slot must remember is the (theta, rho) OLDER-side endpoint of the
completed size-2^i sibling subtree, exactly what its future sub-U-turn
check reads. The stack is indexed by SUBTREE LEVEL: the i-th merge of a
cascade always reads slot i and the push lands at slot ``ctz(leaf_idx+1)``
— every stack access is a static index lowered to masked selects. No
per-lane gather/scatter survives (TPU serializes those). Only
``max_depth - 1`` slots exist because the final subtree of the deepest
doubling is consumed by the top-level combine, never pushed.

Optionally (``bf16_ends=True``) the stacked endpoints are stored in
bfloat16, halving the stack's share of the while-loop carry traffic.
Stored endpoints feed only U-turn inner products and endpoint copies;
integration restarts and the returned draw always read full-precision
state (the cursor, the accumulated orbit's endpoints, and the
reservoir). To keep the sampler exactly valid, the U-turn test
then rounds BOTH operands to bfloat16 — the decision becomes a
deterministic function of the exact endpoint states that is identical no
matter which side of a span pair came off the stack, so the stopping rule
stays symmetric under orbit reversal (the invariance the NUTS
detailed-balance argument needs).

Because every loop iteration costs one gradient evaluation for every lane,
SIMD divergence across vmapped chains wastes at most
``max(total micro steps over lanes) - lane's own total`` evaluations — the
minimum possible padding for data-dependent trajectories under SPMD.
"""

from __future__ import annotations

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

# phase codes (plain ints: no device work at import time)
_PH_FWD = 0
_PH_REV = 1

# packed span row indices. Spans carry NO gradients: endpoint gradients
# only matter where integration (re)starts — the frontier cursor has them,
# and the orbit's two endpoint gradients plus the selected state's
# gradient are tracked as separate (D,) state vectors, cached from the
# cursor at the moment they are observed.
_THETA_BK, _RHO_BK = 0, 1
_THETA_FW, _RHO_FW = 2, 3
_THETA_SEL = 4
_SPAN_ROWS = 5
_LOGP_BK, _LOGP_FW, _LOGP_SEL, _LOGW = 0, 1, 2, 3


def span_from_point(theta, rho, logp_pos, logp_joint) -> Tuple[Array, Array]:
    """Single-state span (``SpanW::from_initial_point``, walnuts.hpp:47-63,
    minus the gradient caches — see the row-layout note above)."""
    v = jnp.stack([theta, rho, theta, rho, theta])
    s = jnp.stack([logp_joint, logp_joint, logp_pos, logp_joint])
    return v, s


def span_uturn(older_v, newer_v, forward, inv_mass, round_ends: bool = False) -> Array:
    """U-turn test between adjacent spans (walnuts.hpp:192-201).

    ``older`` was built first; with ``forward`` travel it is the backward
    half, otherwise the forward half. ``delta = inv_mass .* (theta_end -
    theta_start)``; a U-turn occurs when either endpoint momentum opposes
    ``delta``.

    With ``round_ends`` every endpoint operand is rounded to bfloat16
    first (matching bf16 stack storage — rounding a value already round-
    tripped through the stack is the identity), so the decision is the
    same deterministic function of the exact endpoint states in both
    construction directions.
    """
    bk_theta = jnp.where(forward, older_v[_THETA_BK], newer_v[_THETA_BK])
    bk_rho = jnp.where(forward, older_v[_RHO_BK], newer_v[_RHO_BK])
    fw_theta = jnp.where(forward, newer_v[_THETA_FW], older_v[_THETA_FW])
    fw_rho = jnp.where(forward, newer_v[_RHO_FW], older_v[_RHO_FW])
    if round_ends:
        dt = bk_theta.dtype
        bk_theta = bk_theta.astype(jnp.bfloat16).astype(dt)
        bk_rho = bk_rho.astype(jnp.bfloat16).astype(dt)
        fw_theta = fw_theta.astype(jnp.bfloat16).astype(dt)
        fw_rho = fw_rho.astype(jnp.bfloat16).astype(dt)
    delta = inv_mass * (fw_theta - bk_theta)
    return (jnp.sum(fw_rho * delta) < 0) | (jnp.sum(bk_rho * delta) < 0)


def span_combine(unif, older_v, older_s, newer_v, newer_s, forward, barker: bool):
    """Merge two spans with progressive selection (walnuts.hpp:368-387).

    Barker rule (inside subtrees): take the newer selection with
    probability ``exp(logw_new - logsumexp(logw_old, logw_new))``;
    Metropolis (top level): ``exp(logw_new - logw_old)``. A ``-inf``-weight
    newer span is never selected.

    Retained as the executable specification of the reference's span
    algebra (and for tests); the transition hot path below uses the
    endpoint-only U-turn test plus streaming-reservoir selection, which
    realise the same distribution (see the module docstring).
    """
    logw_total = log_sum_exp(older_s[_LOGW], newer_s[_LOGW])
    log_denom = logw_total if barker else older_s[_LOGW]
    take_new = jnp.log(unif) < (newer_s[_LOGW] - log_denom)

    bk_v = jnp.where(forward, older_v[:2], newer_v[:2])
    fw_v = jnp.where(forward, newer_v[2:4], older_v[2:4])
    sel_v = jnp.where(take_new, newer_v[4:5], older_v[4:5])
    v = jnp.concatenate([bk_v, fw_v, sel_v], axis=0)

    s = jnp.stack(
        [
            jnp.where(forward, older_s[_LOGP_BK], newer_s[_LOGP_BK]),
            jnp.where(forward, newer_s[_LOGP_FW], older_s[_LOGP_FW]),
            jnp.where(take_new, newer_s[_LOGP_SEL], older_s[_LOGP_SEL]),
            logw_total,
        ]
    )
    return v, s


class FailStats(NamedTuple):
    """Per-chain failure/pathology counters (all int32).

    The JAX-native analog of the reference's ``on_logp_exception``
    notification (concepts.hpp:193-200, util.hpp:336-346): exceptions
    don't exist in jitted code, so pathologies are counted in the carried
    state and surfaced through ``RunInfo`` instead of a callback.

    - ``n_halve_fail``: macro steps that exhausted every step halving
      without meeting the Hamiltonian-error tolerance (the leaf failure
      at walnuts.hpp:322-343 when all ``max_step_halvings`` are spent) —
      the stuck-chain signature.
    - ``n_nonfinite``: integration attempts that ended on a non-finite
      log density (the reference's -inf/NoExceptLogpGrad trap firing).
    - ``n_depth_exhausted``: transitions that hit ``max_depth`` doublings
      without a U-turn (depth reported as ``max_depth + 1``,
      walnuts.hpp:536).
    """

    n_halve_fail: Array
    n_nonfinite: Array
    n_depth_exhausted: Array

    @staticmethod
    def zeros() -> "FailStats":
        z = jnp.int32(0)
        return FailStats(z, z, z)


class TransitionState(NamedTuple):
    """Per-chain while-loop carry. See module docstring for the phases."""

    key: Array
    done: Array            # bool
    depth: Array           # int32, current doubling (1-based)
    out_depth: Array       # int32, reported depth at termination
    acc_v: Array           # (5, D) accumulated orbit vectors
    acc_s: Array           # (4,) accumulated orbit scalars
    acc_grad_bk: Array     # (D,) gradient at the orbit's backward endpoint
    acc_grad_sel: Array    # (D,) gradient at the orbit's selected state
    acc_grad_fw: Array     # (D,) gradient at the orbit's forward endpoint
    forward: Array         # bool, direction of travel of current subtree
    leaf_idx: Array        # int32
    n_leaves: Array        # int32 (= 2^(depth-1))
    stack_e: Array         # (max_depth-1, 2, D) older-side (theta, rho)
                           # endpoint of the completed size-2^i sibling
                           # subtree (bf16 when bf16_ends)
    run_sel: Array         # (D,) reservoir: selected state of the
                           # current subtree's leaves so far
    run_sel_logp: Array    # its position log density
    run_sel_grad: Array    # (D,) its gradient (cursor-cached, free)
    run_logw: Array        # logsumexp of the subtree's leaf weights
    ms: Array              # (3, D) macro-step start [theta, rho, grad]
    ms_joint: Array        # joint log density at the macro-step start
    halvings: Array        # int32
    dt: Array              # signed current micro step size
    steps_done: Array      # int32
    steps_total: Array     # int32
    phase: Array           # int32
    cur: Array             # (3, D) integration cursor [theta, rho, grad]
    fwd: Array             # (3, D) saved forward endpoint
    fwd_logp_pos: Array
    fwd_joint: Array
    adam: AdamState
    n_grads: Array         # int32, gradient evals used by this lane
    fails: FailStats


class TransitionResult(NamedTuple):
    theta: Array
    grad: Array
    logp: Array            # position log density of the selected state
    depth: Array           # int32; max_depth + 1 when no U-turn occurred
    n_grads: Array         # int32
    adam: AdamState
    key: Array
    fails: FailStats


def make_transition_parts(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    adapt_step_size: bool,
    integrator=None,
    bf16_ends: bool = False,
):
    """Shared transition internals: ``init_state`` builds the fresh
    per-transition state from a starting point whose log density and
    gradient are already known, and ``body`` advances it by one attempt.
    Reused by the classic while-loop ``make_transition`` and by the
    flattened run-ahead sampler (``make_flat_sample_block``), which
    interleaves many transitions per lane to eliminate SPMD padding.
    """
    n_slots = max(max_depth - 1, 1)

    def init_state(key, theta, logp0, grad0, step, inv_mass, min_micro,
                   adam, n_grads, fails=None):
        dtype = theta.dtype
        e_dtype = jnp.bfloat16 if bf16_ends else dtype
        key, k_mom, k_dir = jax.random.split(key, 3)
        z = jax.random.normal(k_mom, theta.shape, dtype=dtype)
        rho = z / jnp.sqrt(inv_mass)  # chol(mass) = 1/sqrt(inv_mass)
        joint0 = logp0 + logp_momentum(rho, inv_mass)
        acc_v, acc_s = span_from_point(theta, rho, logp0, joint0)

        forward0 = jax.random.bernoulli(k_dir)
        dt0 = jnp.where(forward0, step, -step)
        start = jnp.stack([theta, rho, grad0])

        return TransitionState(
            key=key,
            done=jnp.asarray(False),
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
            stack_e=jnp.zeros((n_slots, 2) + theta.shape, dtype=e_dtype),
            run_sel=theta,
            run_sel_logp=logp0,
            run_sel_grad=grad0,
            run_logw=jnp.asarray(-jnp.inf, dtype=dtype),
            ms=start,
            ms_joint=joint0,
            halvings=jnp.int32(0),
            dt=dt0,
            steps_done=jnp.int32(0),
            steps_total=min_micro,
            phase=jnp.int32(_PH_FWD),
            cur=start,
            fwd=start,
            fwd_logp_pos=logp0,
            fwd_joint=joint0,
            adam=adam,
            n_grads=n_grads,
            fails=FailStats.zeros() if fails is None else fails,
        )

    def body(s: TransitionState, step, inv_mass, min_micro,
             max_error) -> TransitionState:
        dtype = s.ms_joint.dtype
        e_dtype = jnp.bfloat16 if bf16_ends else dtype
        key, k_u = jax.random.split(s.key)
        # one reservoir, one Metropolis, one direction draw.
        unifs = jax.random.uniform(k_u, (3,), dtype=dtype)

        # ---- INNER LOOP: integrate the current attempt to completion.
        # The inner carry is tiny (cursor + step count), so the per-
        # gradient memory traffic is just the leapfrog itself; the heavy
        # span/stack bookkeeping below runs once per ATTEMPT, not once
        # per micro step. Under vmap, lanes whose attempt is shorter
        # idle (select-masked) until the longest lane finishes — wasted
        # iterations are cheap inner ones, never outer ones. With a
        # fused ``integrator`` the whole attempt is one Pallas launch
        # with the cursor VMEM-resident.
        if integrator is None:
            def inner_cond(c):
                cur, lp, n_done = c
                return n_done < s.steps_total

            def inner_body(c):
                cur, lp, n_done = c
                theta_i, rho_i, grad_i, lp_i = leapfrog_step(
                    logp_grad, inv_mass, s.dt, cur[0], cur[1], cur[2]
                )
                return jnp.stack([theta_i, rho_i, grad_i]), lp_i, n_done + 1

            lp_init = jnp.asarray(-jnp.inf, dtype=dtype)
            cur_n, lp_n, steps_done = jax.lax.while_loop(
                inner_cond, inner_body, (s.cur, lp_init, s.steps_done)
            )
            grads_used = steps_done - s.steps_done
        else:
            n_eff = s.steps_total - s.steps_done
            cur_n, lp_n = integrator(s.cur, inv_mass, s.dt, n_eff)
            grads_used = n_eff
            steps_done = s.steps_total
        rho_n = cur_n[1]
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
        leaf_ok = f_done & f_ok & ~need_rev
        more_halvings = (s.halvings + 1) < max_step_halvings
        restart = f_done & ~f_ok & more_halvings
        halve_exhausted = f_done & ~f_ok & ~more_halvings
        leaf_fail = halve_exhausted

        # ---- reversibility level completed (reversible, walnuts.hpp:267-277)
        r_done = att_done & ~in_fwd
        r_err = jnp.abs(joint_n - s.fwd_joint)
        r_within = r_err <= max_error  # coarser level passes -> irreversible
        leaf_fail = leaf_fail | (r_done & r_within)
        more_rev = s.steps_total >= 2 * min_micro
        next_rev = r_done & ~r_within & more_rev
        leaf_ok = leaf_ok | (r_done & ~r_within & ~more_rev)

        # saved forward endpoint: refreshed when a forward attempt passes.
        set_fwd = f_done & f_ok
        fwd = jnp.where(set_fwd, cur_n, s.fwd)
        fwd_logp_pos = jnp.where(set_fwd, lp_n, s.fwd_logp_pos)
        fwd_joint = jnp.where(set_fwd, joint_n, s.fwd_joint)

        # ---- leaf accepted: U-turn cascade + reservoir selection ----
        # Stack slots are indexed BY SUBTREE LEVEL, not stack depth: the
        # older-side endpoint of a completed size-2^i subtree always
        # lives at slot i (the stack contents equal the set bits of
        # leaf_idx). Leaf j checks slots 0..ctz(j+1)-1 in order and the
        # push lands at slot ctz(j+1) — every index is STATIC, so the
        # cascade lowers to masked selects instead of per-lane
        # gathers/scatters (which serialize on TPU). Every span in the
        # cascade has THIS leaf as its newer-side endpoint, so each
        # sub-U-turn check (walnuts.hpp:192-201 via build_span,
        # walnuts.hpp:490-494) reads one slot + the cursor.
        leaf_th, leaf_rho = fwd[0], fwd[1]
        sgn = jnp.where(s.forward, jnp.asarray(1.0, dtype),
                        jnp.asarray(-1.0, dtype))

        def uturn_end(old_th, old_rho):
            # == span_uturn with the newer-side endpoint == this leaf:
            # delta points from the older to the newer side.
            l_th, l_rho = leaf_th, leaf_rho
            if bf16_ends:
                old_th = old_th.astype(jnp.bfloat16).astype(dtype)
                old_rho = old_rho.astype(jnp.bfloat16).astype(dtype)
                l_th = l_th.astype(jnp.bfloat16).astype(dtype)
                l_rho = l_rho.astype(jnp.bfloat16).astype(dtype)
            delta = sgn * inv_mass * (l_th - old_th)
            return (jnp.sum(l_rho * delta) < 0) | (jnp.sum(old_rho * delta) < 0)

        n_merges = count_trailing_zeros(s.leaf_idx + 1)
        cur_end = fwd[:2]  # older-side endpoint of the span being built
        ok = jnp.asarray(True)
        for i in range(n_slots):
            do = leaf_ok & (i < n_merges) & ok
            slot = s.stack_e[i].astype(dtype)
            ut = uturn_end(slot[0], slot[1])
            cur_end = jnp.where(do, slot, cur_end)
            ok = ok & ~(do & ut)
        sub_uturn = leaf_ok & ~ok
        leaf_ok = leaf_ok & ok

        new_leaf_idx = s.leaf_idx + 1
        subtree_done = leaf_ok & (new_leaf_idx >= s.n_leaves)
        push = leaf_ok & ~subtree_done
        write_mask = push & (
            n_merges
            == jax.lax.broadcasted_iota(jnp.int32, (n_slots, 1, 1), 0)
        )
        stack_e = jnp.where(
            write_mask, cur_end.astype(e_dtype)[None], s.stack_e
        )

        # ---- reservoir: weight-proportional selection over the current
        # subtree's leaves (== any tree of Barker merges; see module
        # docstring). A -inf-weight leaf is never selected (NaN-safe:
        # comparisons with NaN are False).
        run_logw_new = log_sum_exp(s.run_logw, fwd_joint)
        take_leaf = jnp.log(unifs[0]) < fwd_joint - run_logw_new
        upd = leaf_ok & take_leaf
        run_sel = jnp.where(upd, fwd[0], s.run_sel)
        run_sel_logp = jnp.where(upd, fwd_logp_pos, s.run_sel_logp)
        run_sel_grad = jnp.where(upd, fwd[2], s.run_sel_grad)
        run_logw = jnp.where(leaf_ok, run_logw_new, s.run_logw)

        # ---- subtree completed: top-level Metropolis + combined U-turn
        # (transition_w, walnuts.hpp:536-558): the new subtree is always
        # combined, even when the combined span U-turns. The combined
        # orbit's endpoint in the travel direction is this leaf (the
        # cursor, full precision), its opposite endpoint is the orbit's
        # own — span_combine specialised to newer == current subtree.
        acc_old = jnp.where(s.forward, s.acc_v[_THETA_BK:_RHO_BK + 1],
                            s.acc_v[_THETA_FW:_RHO_FW + 1])
        ut_top = uturn_end(acc_old[0], acc_old[1])
        take_new = jnp.log(unifs[1]) < run_logw_new - s.acc_s[_LOGW]
        upd_fw = subtree_done & s.forward
        upd_bk = subtree_done & ~s.forward
        take = subtree_done & take_new
        acc_v = jnp.stack([
            jnp.where(upd_bk, fwd[0], s.acc_v[_THETA_BK]),
            jnp.where(upd_bk, fwd[1], s.acc_v[_RHO_BK]),
            jnp.where(upd_fw, fwd[0], s.acc_v[_THETA_FW]),
            jnp.where(upd_fw, fwd[1], s.acc_v[_RHO_FW]),
            jnp.where(take, run_sel, s.acc_v[_THETA_SEL]),
        ])
        acc_s = jnp.stack([
            jnp.where(upd_bk, fwd_joint, s.acc_s[_LOGP_BK]),
            jnp.where(upd_fw, fwd_joint, s.acc_s[_LOGP_FW]),
            jnp.where(take, run_sel_logp, s.acc_s[_LOGP_SEL]),
            jnp.where(subtree_done,
                      log_sum_exp(s.acc_s[_LOGW], run_logw_new),
                      s.acc_s[_LOGW]),
        ])
        # the orbit endpoint in the travel direction becomes the last
        # leaf's endpoint, whose gradient the cursor still holds
        acc_grad_fw = jnp.where(subtree_done & s.forward, fwd[2], s.acc_grad_fw)
        acc_grad_bk = jnp.where(subtree_done & ~s.forward, fwd[2], s.acc_grad_bk)
        acc_grad_sel = jnp.where(take, run_sel_grad, s.acc_grad_sel)
        end_uturn = subtree_done & ut_top
        new_depth = s.depth + 1
        deeper = subtree_done & ~ut_top & (new_depth <= max_depth)
        exhausted = subtree_done & ~ut_top & (new_depth > max_depth)

        # ---- termination bookkeeping ----
        fail = leaf_fail | sub_uturn
        done = s.done | fail | end_uturn | exhausted
        fails = FailStats(
            n_halve_fail=s.fails.n_halve_fail
            + halve_exhausted.astype(jnp.int32),
            n_nonfinite=s.fails.n_nonfinite
            + (~jnp.isfinite(lp_n)).astype(jnp.int32),
            n_depth_exhausted=s.fails.n_depth_exhausted
            + exhausted.astype(jnp.int32),
        )
        out_depth = jnp.where(
            fail | end_uturn,
            s.depth,
            jnp.where(exhausted, jnp.int32(max_depth + 1), s.out_depth),
        )

        # ---- set up the next loop iteration ----
        new_dir = jnp.where(deeper, unifs[2] < 0.5, s.forward)
        # a new doubling starts an empty subtree: reset the reservoir
        run_logw = jnp.where(deeper, jnp.asarray(-jnp.inf, dtype), run_logw)
        depth = jnp.where(deeper, new_depth, s.depth)
        n_leaves = jnp.where(deeper, jnp.int32(1) << (new_depth - 1), s.n_leaves)
        leaf_idx = jnp.where(deeper, jnp.int32(0), new_leaf_idx)
        leaf_idx = jnp.where(leaf_ok | deeper, leaf_idx, s.leaf_idx)

        # macro-step start for the next leaf: the frontier is the last
        # leaf endpoint within a subtree, or the orbit endpoint in the
        # travel direction when a new doubling begins.
        acc_end = jnp.stack([
            jnp.where(new_dir, acc_v[_THETA_FW], acc_v[_THETA_BK]),
            jnp.where(new_dir, acc_v[_RHO_FW], acc_v[_RHO_BK]),
            jnp.where(new_dir, acc_grad_fw, acc_grad_bk),
        ])
        acc_end_joint = jnp.where(new_dir, acc_s[_LOGP_FW], acc_s[_LOGP_BK])

        next_leaf = push  # continue current subtree from the new frontier
        ms = jnp.where(deeper, acc_end, jnp.where(next_leaf, fwd, s.ms))
        ms_joint = jnp.where(
            deeper, acc_end_joint, jnp.where(next_leaf, fwd_joint, s.ms_joint)
        )

        start_macro = deeper | next_leaf
        dt_base = jnp.where(new_dir, step, -step)

        halvings = jnp.where(start_macro, jnp.int32(0),
                             jnp.where(restart, s.halvings + 1, s.halvings))
        phase = jnp.where(start_macro | restart, jnp.int32(_PH_FWD),
                          jnp.where(start_rev | next_rev, jnp.int32(_PH_REV), s.phase))
        steps_total = jnp.where(
            start_macro, min_micro,
            jnp.where(restart, s.steps_total * 2,
                      jnp.where(start_rev | next_rev, s.steps_total // 2,
                                s.steps_total)),
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
        rev_cur = fwd.at[1].multiply(-1.0)
        cur = jnp.where(from_rev, rev_cur,
                        jnp.where(start_macro | restart, ms, cur_n))

        return TransitionState(
            key=key, done=done, depth=depth, out_depth=out_depth,
            acc_v=acc_v, acc_s=acc_s,
            acc_grad_bk=acc_grad_bk, acc_grad_fw=acc_grad_fw,
            acc_grad_sel=acc_grad_sel,
            forward=new_dir, leaf_idx=leaf_idx, n_leaves=n_leaves,
            stack_e=stack_e, run_sel=run_sel,
            run_sel_logp=run_sel_logp, run_sel_grad=run_sel_grad,
            run_logw=run_logw,
            ms=ms, ms_joint=ms_joint,
            halvings=halvings, dt=dt, steps_done=steps_done,
            steps_total=steps_total, phase=phase,
            cur=cur, fwd=fwd,
            fwd_logp_pos=fwd_logp_pos, fwd_joint=fwd_joint,
            adam=adam, n_grads=s.n_grads + grads_used,
            fails=fails,
        )

    return init_state, body


def _tree_select(pred, a_tree, b_tree):
    """Per-leaf ``where(pred, a, b)`` incl. typed PRNG key leaves."""
    def sel(a, b):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(
                jnp.where(pred, jax.random.key_data(a),
                          jax.random.key_data(b)),
                impl=jax.random.key_impl(a),
            )
        return jnp.where(pred, a, b)

    return jax.tree.map(sel, a_tree, b_tree)


def make_transition(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    adapt_step_size: bool,
    integrator=None,
    bf16_ends: bool = False,
    unroll: int = 1,
) -> Callable[..., TransitionResult]:
    """Build a single-chain WALNUTS transition (walnuts.hpp:520-563).

    Returns ``transition(key, theta, step, inv_mass, min_micro, max_error,
    adam) -> TransitionResult``. All arguments but the statics here may be
    traced and per-chain; vmap over the leading axis for multi-chain use.
    When ``adapt_step_size`` is True, the carried Adam state observes
    ``exp(-|dH|)`` of the coarsest attempt of every macro step
    (walnuts.hpp:335-338), exactly as warmup requires.

    ``integrator`` optionally replaces the inner leapfrog loop with a
    fused kernel of signature ``(cur (3, D), inv_mass (D,), dt, n_steps)
    -> (cur', lp)`` (see ``walnuts_tpu.ops.integrator``); lanes with
    ``n_steps == 0`` must pass through unchanged.

    ``bf16_ends`` stores the merge stack's endpoints in bfloat16 and
    rounds both operands of every U-turn test to bfloat16 (see module
    docstring) — a valid-sampler bandwidth option. Integration, the
    selected draws, and the selection weights keep full precision; only
    U-turn decisions (hence trajectory lengths) shift slightly. Measured
    slower on v5e at D ~ 100 (convert overhead); off by default.

    ``unroll`` applies the phase-machine body ``unroll`` times per
    while-loop iteration, each application masked to the identity on
    finished lanes — the final state (hence every draw) is BITWISE
    identical to ``unroll=1``; only loop-control and scheduling
    granularity change. Amortizes per-iteration overhead when attempts
    are short (shallow-tree models at small D).
    """
    init_state, body = make_transition_parts(
        logp_grad, max_depth, max_step_halvings, adapt_step_size,
        integrator, bf16_ends,
    )

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
        logp0, grad0 = logp_grad(theta)
        state = init_state(key, theta, logp0, grad0, step, inv_mass,
                           min_micro, adam, jnp.int32(1))

        def loop_body(s):
            return body(s, step, inv_mass, min_micro, max_error)

        if unroll > 1:
            def run_body(s):
                for _ in range(unroll):
                    # identity on finished lanes, so extra applications
                    # cannot double-process an attempt
                    s = _tree_select(s.done, s, loop_body(s))
                return s
        else:
            run_body = loop_body
        final = jax.lax.while_loop(lambda s: ~s.done, run_body, state)
        # The selected state's gradient (the mass estimator's score,
        # adaptive_walnuts.hpp:247; the reference caches it per span,
        # SpanW::grad_select_, walnuts.hpp:121-124) was cached from the
        # cursor when the selected leaf was accepted — no re-evaluation.
        return TransitionResult(
            theta=final.acc_v[_THETA_SEL],
            grad=final.acc_grad_sel,
            logp=final.acc_s[_LOGP_SEL],
            depth=final.out_depth,
            n_grads=final.n_grads,
            adam=final.adam,
            key=final.key,
            fails=final.fails,
        )

    return transition



class FlatBlockResult(NamedTuple):
    draws: Array           # (num_draws, D)
    logps: Array           # (num_draws,)
    depths: Array          # (num_draws,)
    bank: TransitionState  # run-ahead progress into the NEXT transition


def make_flat_sample_block(
    logp_grad: LogpGradFn,
    max_depth: int,
    max_step_halvings: int,
    integrator=None,
    bf16_ends: bool = False,
):
    """Run-ahead flattened sampling: many draws per lane per jitted block
    with work-conserving scheduling.

    The classic path synchronises every draw: the batched transition's
    while loop runs until the SLOWEST of all vmapped lanes finishes its
    trajectory (measured 11.8x padding — mean lane 19.7 gradient evals per
    draw vs 232 for the per-iteration max lane — on funnel(101) x 4096
    chains). Here a lane that completes a transition banks the draw,
    starts the next transition IMMEDIATELY, and pauses only when it
    completes a second draw before the scan step ends; ``lax.scan`` emits
    exactly one draw per lane per step. Per-lane cumulative work
    concentrates over a block, so padding drops to the max-lane TOTAL
    (plus one banked trajectory) — near zero waste for large blocks.

    Distribution, per-lane RNG streams, and draw order are identical to
    the classic path (same transitions, different scheduling); the banked
    run-ahead is honest work for the next block. Each transition also
    SAVES the classic path's one fresh gradient evaluation at its start:
    the starting point is the previous draw, whose log density and
    gradient ride the transition state (``acc_grad_sel``).

    Returns ``(start_bank, sample_block)``:
      - ``start_bank(key, theta, step, inv_mass, min_micro, adam)`` builds
        the initial in-progress transition from the warmed-up position
        (one counted gradient evaluation);
      - ``sample_block(bank, step, inv_mass, min_micro, max_error,
        num_draws)`` advances every lane by exactly ``num_draws`` draws.
    Both are single-chain; vmap over the leading axis. Gradient totals are
    cumulative in ``bank.n_grads`` (includes banked partial work).
    """
    init_state, body = make_transition_parts(
        logp_grad, max_depth, max_step_halvings, adapt_step_size=False,
        integrator=integrator, bf16_ends=bf16_ends,
    )

    def start_bank(key, theta, step, inv_mass, min_micro, adam):
        dtype = theta.dtype
        logp0, grad0 = logp_grad(theta)
        return init_state(
            key, theta, logp0, grad0,
            jnp.asarray(step, dtype), inv_mass,
            jnp.asarray(min_micro, jnp.int32), adam, jnp.int32(1),
        )

    def sample_block(bank, step, inv_mass, min_micro, max_error, num_draws: int):
        dtype = bank.ms_joint.dtype
        min_micro = jnp.asarray(min_micro, dtype=jnp.int32)
        step = jnp.asarray(step, dtype=dtype)
        max_error = jnp.asarray(max_error, dtype=dtype)

        def reinit(ts):
            # the next transition starts at the banked draw; its log
            # density and gradient are cached in the state, so unlike the
            # classic entry point nothing is re-evaluated.
            return init_state(
                ts.key, ts.acc_v[_THETA_SEL], ts.acc_s[_LOGP_SEL],
                ts.acc_grad_sel, step, inv_mass, min_micro,
                ts.adam, ts.n_grads, ts.fails,
            )

        def scan_step(ts, _):
            def w_cond(c):
                ts, emitted, _, _, _ = c
                return ~(emitted & ts.done)

            def w_body(c):
                ts, emitted, draw, lp, dep = c
                completing = ts.done & ~emitted
                draw = jnp.where(completing, ts.acc_v[_THETA_SEL], draw)
                lp = jnp.where(completing, ts.acc_s[_LOGP_SEL], lp)
                dep = jnp.where(completing, ts.out_depth, dep)
                emitted = emitted | completing
                fresh = reinit(ts)
                ts = jax.tree.map(
                    lambda a, b: jnp.where(completing, a, b), fresh, ts
                )
                ts = body(ts, step, inv_mass, min_micro, max_error)
                return ts, emitted, draw, lp, dep

            c0 = (
                ts,
                jnp.asarray(False),
                jnp.zeros_like(ts.run_sel),
                jnp.asarray(-jnp.inf, dtype),
                jnp.int32(0),
            )
            ts, _, draw, lp, dep = jax.lax.while_loop(w_cond, w_body, c0)
            return ts, (draw, lp, dep)

        bank, (draws, logps, depths) = jax.lax.scan(
            scan_step, bank, None, length=num_draws
        )
        return FlatBlockResult(draws=draws, logps=logps, depths=depths, bank=bank)

    return start_bank, sample_block


__all__ = [
    "FailStats",
    "FlatBlockResult",
    "TransitionResult",
    "TransitionState",
    "make_flat_sample_block",
    "make_transition",
    "make_transition_parts",
    "span_combine",
    "span_from_point",
    "span_uturn",
]
