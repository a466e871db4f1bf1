"""Multi-chain runtime: block-synchronous warmup and sampling over a mesh.

The reference runs one OS thread per chain with a lock-free SPSC mailbox
per chain and a polling controller (``adapt.hpp:79-259``,
``sampler.hpp:47-192``). On TPU the chains are a vmapped batch axis sharded
across the device mesh; the asynchronous controller becomes a deterministic
*block-synchronous* loop: chains advance in lockstep blocks of
``block_size`` iterations inside one jitted scan, and the cross-chain
convergence reduction (the geometric-mean test during warmup,
adapt.hpp:203-225; the log-density R-hat during sampling,
sampler.hpp:142-152) runs between blocks as an XLA collective over the
sharded chain axis. Early stopping therefore happens at block granularity
and every chain gets the same realized length, which keeps the reference's
``[min_iter, max_iter]`` contract while removing its documented
nondeterminism (docs/py.rst "Note on reproducibility").
"""

from __future__ import annotations

import os
import time

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import mass_estimator_inv_mass
from walnuts_tpu.core.sampler import (
    FrozenParams,
    SampleState,
    WarmupState,
    make_sample_step,
    make_warmup_step,
)
from walnuts_tpu.ops.math import LogpGradFn

Array = jax.Array

CHAIN_AXIS = "chains"


def chain_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Sharding that splits the leading (chain) axis over the mesh."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(CHAIN_AXIS))


def shard_chains(tree, mesh: Optional[Mesh]):
    """Place a chain-batched pytree with its leading axis sharded."""
    if mesh is None:
        return tree
    sharding = chain_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@dataclass
class RunInfo:
    """Realized iteration counts and instrumentation for a run.

    ``n_grads`` is the per-chain count of gradient evaluations actually
    used (the reference's profiling counter, stan_cli.cpp:121-139);
    ``rhat_trace`` records the controller's R-hat sequence (the
    ``on_r_hat`` callback payload, sampler.hpp:146).

    The per-chain failure counters are the JAX-native analog of the
    reference's ``on_logp_exception`` notification (concepts.hpp:193-200):
    ``n_halve_fail`` counts macro steps that spent every step halving
    without meeting the Hamiltonian-error tolerance, ``n_nonfinite``
    counts integration attempts ending on a non-finite log density, and
    ``n_depth_exhausted`` counts transitions that hit the doubling budget
    without a U-turn. A chain with outsized counters is stuck or
    numerically struggling — visible here without post-hoc analysis.
    """

    warmup_iters: int = 0
    sampling_iters: int = 0
    n_grads: Optional[np.ndarray] = None
    n_halve_fail: Optional[np.ndarray] = None
    n_nonfinite: Optional[np.ndarray] = None
    n_depth_exhausted: Optional[np.ndarray] = None
    rhat_trace: List[float] = field(default_factory=list)
    converged_warmup: bool = False
    converged_sampling: bool = False
    interrupted: bool = False


def _warmup_convergence_stats(state: WarmupState) -> Tuple[Array, Array]:
    """Cross-chain adaptation-convergence reduction (adapt.hpp:203-225).

    Computes the max relative L2 difference of the per-chain mass diagonal
    from the cross-chain geometric mean, and the max *signed* relative
    difference of the per-chain step size from its geometric mean (the
    reference takes ``fmax`` over signed values).
    """
    inv_mass = jax.vmap(mass_estimator_inv_mass)(state.mass)  # (C, D)
    log_mass = -jnp.log(inv_mass)
    geo_mass = jnp.exp(jnp.mean(log_mass, axis=0))  # (D,)
    mass = jnp.exp(log_mass)
    rel_mass = jnp.linalg.norm((mass - geo_mass) / geo_mass, axis=1)  # (C,)
    max_rel_mass = jnp.max(rel_mass)

    log_step = state.adam.log_step  # (C,)
    geo_step = jnp.exp(jnp.mean(log_step))
    rel_step = (jnp.exp(log_step) - geo_step) / geo_step
    max_rel_step = jnp.max(rel_step)
    return max_rel_mass, max_rel_step


def _sampling_rhat(state: SampleState) -> Array:
    """Cross-chain split-free R-hat of the draw log densities
    (sampler.hpp:142-145): ``sqrt(1 + var(chain means) / mean(chain vars))``
    with sample (ddof=1) variances."""
    means = state.lp_mean
    variances = state.lp_m2 / jnp.maximum(state.lp_count - 1.0, 1.0)
    var_of_means = jnp.var(means, ddof=1)
    return jnp.sqrt(1.0 + var_of_means / jnp.mean(variances))


def _next_boundary(it: int, min_iter: int, block_size: int,
                   max_iter: int) -> int:
    """Next early-stop check point after iteration ``it``.

    Check points are a function of the USER config only — ``min_iter``,
    then every ``block_size`` after it, clamped to ``max_iter`` — never
    of realized block lengths: when :class:`_BlockBudget` caps blocks
    below ``block_size`` for wall-time reasons, capped sub-blocks
    accumulate up to the same boundaries an uncapped run checks at, so
    warmup lengths / draw counts under early stopping are identical on
    a fast and a slow machine (the capping stays pure scheduling).
    """
    if it < min_iter:
        b = min_iter
    else:
        b = it + block_size - ((it - min_iter) % block_size)
    return min(b, max_iter)


class _BlockBudget:
    """Automatic block-size capping (VERDICT r3 item 7).

    The axon TPU worker kills single jitted blocks running longer than
    ~1 minute (docs/BENCHMARKS.md round-2 root cause), and any
    preemptible deployment benefits from bounded block walls. Rather
    than asking users to hand-tune ``block_size`` per model (the old SV
    folklore), the first two blocks of each phase are timed (one
    ``block_until_ready`` each — the only pipelining perturbation) and
    the per-draw device cost estimate shrinks subsequent block lengths
    to fit ``WALNUTS_BLOCK_BUDGET`` seconds (default 45; 0 disables).
    The estimate takes the MIN of the two blocks' PER-DRAW rates (the
    two timed blocks commonly have different lengths — the first is
    clipped to ``min_iter`` — so raw wall times are not comparable) so
    a cold-compile first block does not over-shrink; draws are bitwise
    unaffected (block length is pure scheduling, and early-stop checks
    fire only at user-config block boundaries — see ``_next_boundary``;
    tests/test_runtime.py guards block-size invariance).
    """

    def __init__(self, budget, cap):
        if budget is None:
            budget = float(os.environ.get("WALNUTS_BLOCK_BUDGET", 45.0))
        self.budget = float(budget)
        self.cap = int(cap)
        self._timed = 0
        self._est = None
        self._t0 = None

    def start(self):
        self._t0 = (
            time.time() if self.budget > 0 and self._timed < 2 else None
        )

    def finish(self, state, n: int):
        if self._t0 is None:
            return
        jax.block_until_ready(state)
        dt = time.time() - self._t0
        self._t0 = None
        per_draw = dt / max(int(n), 1)
        self._est = per_draw if self._est is None else min(self._est, per_draw)
        self._timed += 1
        # shrink immediately when one block already blew the budget (raw
        # wall time, the fast path); otherwise decide once both timing
        # blocks' per-draw rates are in
        if dt > self.budget or (
            self._timed == 2 and self._est * self.cap > self.budget
        ):
            new_cap = max(1, int(self.budget / self._est * 0.8))
            if new_cap < self.cap:
                self.cap = new_cap


def run_warmup(
    logp_grad: LogpGradFn,
    state: WarmupState,
    warmup_cfg: WarmupConfig,
    sampling_cfg: SamplingConfig,
    *,
    save_warmup: bool = False,
    mesh: Optional[Mesh] = None,
    progress=None,
    integrator=None,
    bf16_ends: bool = False,
    checkpoint=None,
    start_it: int = 0,
    unroll: int = 1,
    info: Optional[RunInfo] = None,
    batched: bool = False,
    pallas_replay: bool = False,
    runahead: int = 4,
    tier2_every: int = 6,
    batched_groups: int = 1,
    bounded_sweeps: Optional[bool] = None,
    block_budget: Optional[float] = None,
) -> Tuple[WarmupState, Optional[np.ndarray], Optional[np.ndarray], RunInfo]:
    """Run adaptive warmup with block-synchronous early stopping.

    ``state`` is a chain-batched ``WarmupState`` (built by vmapping
    ``init_warmup_state``). Returns the final state, optionally the stacked
    warmup draws ``(iters, C, D)`` and their log densities ``(iters, C)``,
    and run info.

    ``checkpoint`` is an optional
    :class:`walnuts_tpu.parallel.checkpoint.BlockCheckpointer`; the state
    is persisted between blocks, and ``start_it`` (a block boundary from a
    restored checkpoint) resumes mid-warmup — the returned draws cover
    ``[start_it, end)`` only; earlier blocks live in the checkpoint.
    ``info`` carries the RunInfo restored alongside the state so counters
    (and the ``converged_warmup`` flag — a warmup that already converged
    must not keep adapting on resume) span the whole run, not just the
    resumed tail.

    ``batched=True`` uses the ASYNCHRONOUS batched-native warmup
    (:func:`walnuts_tpu.core.batched.make_batched_warmup_block`):
    adaptation applied per lane at its own draw boundary, ``runahead``
    draws of run-ahead, ``tier2_every``-amortised bookkeeping.
    ``batched_groups > 1`` additionally sorts lanes into cost groups per
    block (the sampling runtime's dynamic grouping; single-device only).
    Both are scheduling-only: draws and adaptation are bitwise-invariant
    to (runahead, batched_groups) on non-matmul models.
    """
    state = shard_chains(state, mesh)
    if batched_groups > 1 and mesh is not None:
        raise ValueError(
            "batched_groups > 1 requires mesh=None (the per-block cost "
            "sort gathers the full chain axis on the host)"
        )
    if batched_groups > 1 and not batched:
        raise ValueError("batched_groups > 1 requires batched=True")
    if batched:
        if integrator is not None:
            raise ValueError(
                "batched is incompatible with a custom integrator "
                "(pass batched=False to use it)"
            )
        # works sharded too: the scheduler's only cross-lane ops are
        # jnp.max/jnp.any reductions (order-independent), which the
        # global-view jit lowers to collectives over the chain axis
        from walnuts_tpu.core.batched import make_batched_warmup_block

        warmup_block = make_batched_warmup_block(
            logp_grad, sampling_cfg, pallas_replay=pallas_replay,
            runahead=runahead, tier2_every=tier2_every,
            bounded_sweeps=bounded_sweeps,
        )

        @partial(jax.jit, static_argnums=1, donate_argnums=0)
        def run_block(s: WarmupState, n: int):
            s, (thetas, logps) = warmup_block(s, n)
            return s, (thetas, logps) if save_warmup else None

        def run_block_grouped(s: WarmupState, n: int, cost):
            """Dynamic cost-sorted warmup groups (the sampling runtime's
            run_block_grouped, applied to the asynchronous warmup): sort
            lanes by the previous block's realized gradient count, run
            the groups sequentially, restore the caller's order. The
            asynchronous warmup is per-lane exact, so grouping —
            like any scheduling choice — leaves every lane's draws and
            adaptation bitwise unchanged (matmul-model caveat as in
            sampling: groups change the batched reduction shape)."""
            from walnuts_tpu.core.adapt import (
                adam_step_size,
                min_micro_estimate,
            )

            C = int(s.iteration.shape[0])
            G = batched_groups
            if C % G:
                raise ValueError(
                    f"num_chains ({C}) must divide by batched_groups ({G})"
                )
            if cost is None:
                # first block: pre-adaptation per-draw cost heuristic
                mm = np.asarray(
                    jax.vmap(min_micro_estimate)(s.min_micro), np.float64
                )
                st = np.asarray(adam_step_size(s.adam), np.float64)
                cost = mm / st
            n_grads_before = np.asarray(s.n_grads, np.float64)
            order0 = np.argsort(cost, kind="stable")
            inv = jnp.asarray(np.argsort(order0))
            order = jnp.asarray(order0)
            s_sorted = jax.tree.map(lambda x: x[order], s)
            cg = C // G
            outs = []
            for g in range(G):
                sub = jax.tree.map(
                    lambda x: x[g * cg:(g + 1) * cg], s_sorted
                )
                outs.append(run_block(sub, n))
            s_new = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[inv],
                *[o[0] for o in outs]
            )
            if save_warmup:
                thetas = jnp.concatenate(
                    [o[1][0] for o in outs], axis=1)[:, inv]
                logps = jnp.concatenate(
                    [o[1][1] for o in outs], axis=1)[:, inv]
                outs_c = (thetas, logps)
            else:
                outs_c = None
            cost_next = (
                np.asarray(s_new.n_grads, np.float64) - n_grads_before
            )
            return s_new, outs_c, cost_next
    else:
        warmup_step = make_warmup_step(
            logp_grad, sampling_cfg, integrator=integrator,
            bf16_ends=bf16_ends, unroll=unroll,
        )
        vstep = jax.vmap(warmup_step)

        @partial(jax.jit, static_argnums=1, donate_argnums=0)
        def run_block(s: WarmupState, n: int):
            def body(s, _):
                s, out = vstep(s)
                return s, (out.theta, out.logp) if save_warmup else None
            return jax.lax.scan(body, s, None, length=n)

    stats = jax.jit(_warmup_convergence_stats)

    info = info or RunInfo()
    draws_host: List[np.ndarray] = []
    logps_host: List[np.ndarray] = []
    it = start_it
    # A resumed run that had already converged (the checkpointed flag)
    # must not keep adapting past convergence — that would change the
    # frozen parameters vs the uninterrupted run.
    converged = bool(info.converged_warmup) if start_it > 0 else False

    def check() -> bool:
        mrm, mrs = stats(state)
        return bool(
            (mrm <= warmup_cfg.mass_converge_tol)
            & (mrs <= warmup_cfg.step_size_converge_tol)
        )

    if warmup_cfg.min_iter == 0 and warmup_cfg.max_iter > 0 and it == 0:
        converged = check()

    # A KeyboardInterrupt (the reference's SIGINT path, interrupts.hpp:34-102)
    # lands between blocks: adaptation state accumulated so far is kept and
    # warmup ends early rather than tearing the run down.
    wcost = None  # per-lane realized block cost for the group sort
    _budget = _BlockBudget(block_budget, warmup_cfg.block_size)
    try:
        while it < warmup_cfg.max_iter and not converged:
            # uniform block lengths (at most two distinct scan lengths
            # compile: the block size and one remainder), with convergence
            # checked only once min_iter is reached — same [min, max]
            # contract, without a per-configuration recompile of the first
            # block. Blocks never cross a check boundary so budget-capped
            # sub-blocks land on the same check points as uncapped runs.
            next_check = _next_boundary(
                it, warmup_cfg.min_iter, warmup_cfg.block_size,
                warmup_cfg.max_iter,
            )
            n = min(_budget.cap, warmup_cfg.block_size, next_check - it)
            _budget.start()
            if batched and batched_groups > 1:
                state, outs, wcost = run_block_grouped(state, n, wcost)
            else:
                state, outs = run_block(state, n)
            _budget.finish(state, n)
            it += n
            if save_warmup:
                draws_host.append(np.asarray(outs[0]))
                logps_host.append(np.asarray(outs[1]))
            if checkpoint is not None:
                info.warmup_iters = it
                checkpoint.block(
                    "warmup", it, state, info, block_start=it - n,
                    theta=outs[0] if save_warmup else None,
                    logp=outs[1] if save_warmup else None,
                )
            if progress is not None:
                progress("warmup", it)
            # evaluated on the final block too (not just while it can stop
            # the loop) so RunInfo reflects convergence reached exactly at
            # max_iter — the reference controller polls at the last
            # iteration as well (adapt.hpp:203-225). Only at user-config
            # boundaries: a budget-capped sub-block ending short of one
            # accumulates instead of checking early.
            if it == next_check and it >= warmup_cfg.min_iter:
                converged = check()
    except KeyboardInterrupt:
        info.interrupted = True
        jax.block_until_ready(state)

    info.warmup_iters = it
    info.converged_warmup = converged
    if checkpoint is not None and not info.interrupted:
        # persist the final convergence flag (decided after the last
        # block's save): a resumed converged warmup must not keep adapting
        checkpoint.update_info("warmup", it, info)
    info.n_halve_fail = np.asarray(state.fails.n_halve_fail)
    info.n_nonfinite = np.asarray(state.fails.n_nonfinite)
    info.n_depth_exhausted = np.asarray(state.fails.n_depth_exhausted)
    warmup_draws = np.concatenate(draws_host, axis=0) if draws_host else None
    warmup_logps = np.concatenate(logps_host, axis=0) if logps_host else None
    return state, warmup_draws, warmup_logps, info


def run_sampling(
    logp_grad: LogpGradFn,
    state: SampleState,
    params: FrozenParams,
    sampling_cfg: SamplingConfig,
    *,
    mesh: Optional[Mesh] = None,
    info: Optional[RunInfo] = None,
    progress=None,
    on_r_hat=None,
    integrator=None,
    bf16_ends: bool = False,
    chain_groups: int = 1,
    device_draws: bool = False,
    flatten: bool = False,
    checkpoint=None,
    start_it: int = 0,
    thin: int = 1,
    keep_dims=None,
    unroll: int = 1,
    batched: bool = False,
    batched_groups: int = 1,
    runahead: int = 8,
    tier2_every: int = 6,
    min_latched: int = 0,
    defer_splits: bool = True,
    pallas_replay: bool = False,
    fresh_cur: bool = False,
    bounded_sweeps: Optional[bool] = None,
    pallas_pass: bool = False,
    pass_tile: Optional[int] = None,
    block_budget: Optional[float] = None,
) -> Tuple[SampleState, np.ndarray, np.ndarray, RunInfo]:
    """Run fixed-parameter sampling with R-hat early stopping.

    Returns the final state, the draws ``(iters, C, D)``, their position
    log densities ``(iters, C)``, and run info. With ``checkpoint`` set
    (a :class:`~walnuts_tpu.parallel.checkpoint.BlockCheckpointer`), the
    state + params are persisted between blocks; ``start_it`` resumes at
    a checkpointed block boundary and the returned draws then cover
    ``[start_it, end)`` only.

    ``device_draws=True`` keeps the collected draws on the device
    (returned as jax arrays) instead of streaming each block to the host —
    on hosts with slow device links the transfer otherwise dominates the
    sampling loop; diagnostics can then run on device
    (``walnuts_tpu.summary_device``).

    ``chain_groups > 1`` sorts chains by their adapted per-draw cost
    (``min_micro / step``) and runs the groups SEQUENTIALLY inside each
    block: the batched transition's while loop runs until the slowest lane
    finishes, so one pathological chain otherwise stalls the whole batch —
    grouping similar-cost chains together bounds the stall to one group.
    Outputs are returned in the original chain order. Single-device only
    (incompatible with ``mesh``).

    ``thin > 1`` stores every ``thin``-th draw (the last of each group
    of ``thin`` iterations) — a TPU-scale extension (the reference has
    no thinning) that divides the draw-cube memory for very wide
    posteriors; the sampler itself still advances every iteration and
    the R-hat controller still sees every log density. Must divide
    ``block_size``.

    ``keep_dims`` (a sequence of parameter indices, or None for all)
    stores only those dimensions of each draw — the complement of
    ``thin`` for 1000+-dim posteriors where only a parameter subset is
    analyzed. The sampler state keeps full dimensionality.

    ``flatten=True`` uses the run-ahead flattened scheduler
    (``walnuts_tpu.core.transition.make_flat_sample_block``): lanes that
    finish a trajectory immediately start the next one instead of waiting
    for the slowest chain in the batch, eliminating the per-draw SPMD
    padding. The draws are identical to the classic path per lane
    (bitwise on CPU); only the scheduling changes.

    ``batched=True`` uses the batched-native scheduler
    (:mod:`walnuts_tpu.core.batched`): leaf-latched integration with
    amortised orbit bookkeeping and a ``runahead``-deep draw buffer
    (``tier2_every`` controls the amortisation). ``batched_groups > 1``
    additionally re-sorts chains EVERY BLOCK by their realized gradient
    cost in the previous block (lag-1 block cost correlation measured
    0.73 on the funnel) and runs the groups sequentially, so cheap
    chains stop padding against the expensive tail — the scheduler
    family measured fastest on divergent-cost models
    (docs/BENCHMARKS.md). Draws are bitwise identical to the classic
    path per lane; ``n_grads`` drops by one per draw (the trajectory
    start gradient is cached from the previous draw within a block).
    Mesh-compatible at ``batched_groups=1`` (the scheduler's cross-lane
    ops are order-independent jnp.max/jnp.any reductions, lowered to
    collectives over the sharded chain axis); the dynamic cost-sorted
    groups sort on the host and need ``mesh=None``. Compatible with
    checkpointing (the carried state is block-boundary interchangeable
    with the classic path's).
    """
    if flatten and chain_groups > 1:
        raise ValueError("flatten is incompatible with chain_groups")
    if batched and (flatten or chain_groups > 1):
        raise ValueError("batched is incompatible with flatten/chain_groups")
    if batched and integrator is not None:
        # never silently drop a user-built fused integrator: the batched
        # scheduler integrates inside its own trip loop
        raise ValueError(
            "batched is incompatible with a custom integrator "
            "(pass batched=False to use it)"
        )
    if batched_groups > 1 and mesh is not None:
        raise ValueError(
            "batched_groups > 1 requires mesh=None (the per-block cost "
            "sort is a host-side gather)"
        )
    if batched_groups > 1 and not batched:
        raise ValueError("batched_groups requires batched=True")
    if checkpoint is not None and (flatten or chain_groups > 1):
        # the flat scheduler's bank and the group permutation are not part
        # of the checkpointed state
        raise ValueError("checkpoint is incompatible with flatten/chain_groups")
    if thin < 1 or sampling_cfg.block_size % thin:
        raise ValueError(
            f"thin ({thin}) must be >= 1 and divide block_size "
            f"({sampling_cfg.block_size})"
        )
    permutation = None
    if chain_groups > 1:
        if mesh is not None:
            raise ValueError("chain_groups requires mesh=None")
        n_chains = int(params.step_size.shape[0])
        if n_chains % chain_groups:
            raise ValueError(
                f"num_chains ({n_chains}) must divide by chain_groups "
                f"({chain_groups})"
            )
        cost = np.asarray(params.min_micro, dtype=np.float64) / np.asarray(
            params.step_size, dtype=np.float64
        )
        permutation = np.argsort(cost)
        perm = jnp.asarray(permutation)
        state = jax.tree.map(lambda x: x[perm], state)
        params = jax.tree.map(lambda x: x[perm], params)
    state = shard_chains(state, mesh)
    params = shard_chains(params, mesh)
    sample_step = make_sample_step(
        logp_grad, sampling_cfg, integrator=integrator, bf16_ends=bf16_ends,
        unroll=unroll,
    )
    vstep = jax.vmap(sample_step)

    @partial(jax.jit, static_argnums=2, donate_argnums=0)
    def run_block(s: SampleState, p: FrozenParams, n: int):
        def body(s, _):
            if chain_groups > 1:
                c = s.key.shape[0]
                group = lambda x: x.reshape((chain_groups, c // chain_groups)
                                            + x.shape[1:])
                ungroup = lambda x: x.reshape((c,) + x.shape[2:])
                sg = jax.tree.map(group, s)
                pg = jax.tree.map(group, p)
                sg, res = jax.lax.map(lambda a: vstep(*a), (sg, pg))
                s = jax.tree.map(ungroup, sg)
                res = jax.tree.map(ungroup, res)
            else:
                s, res = vstep(s, p)
            return s, (res.theta, res.logp)
        return jax.lax.scan(body, s, None, length=n)

    bank = None
    if flatten:
        from walnuts_tpu.core.adapt import adam_init
        from walnuts_tpu.core.transition import make_flat_sample_block

        start_bank, sample_block = make_flat_sample_block(
            logp_grad,
            sampling_cfg.max_trajectory_doublings,
            sampling_cfg.max_step_halvings,
            integrator=integrator,
            bf16_ends=bf16_ends,
        )
        max_error = sampling_cfg.max_hamiltonian_error

        @jax.jit
        def make_bank(s: SampleState, p: FrozenParams):
            def one(key, theta, st, im, mm):
                return start_bank(
                    key, theta, st, im, mm, adam_init(st, dtype=theta.dtype)
                )

            return jax.vmap(one)(
                s.key, s.theta, p.step_size, p.inv_mass, p.min_micro
            )

        bank = shard_chains(make_bank(state, params), mesh)
        # the bank's init gradient evaluation is real work
        state = state._replace(n_grads=state.n_grads + 1)

        @partial(jax.jit, static_argnums=3, donate_argnums=(0, 1))
        def run_block_flat(s: SampleState, b, p: FrozenParams, n: int):
            def one(bl, st, im, mm):
                return sample_block(
                    bl, st, im, mm,
                    jnp.asarray(max_error, bl.ms_joint.dtype), n,
                )

            res = jax.vmap(one)(b, p.step_size, p.inv_mass, p.min_micro)
            draws = jnp.moveaxis(res.draws, 0, 1)  # (n, C, D)
            logps = jnp.moveaxis(res.logps, 0, 1)  # (n, C)
            # Chan et al. merge of the block's per-lane log-density stats
            # into the running Welford (same statistics the classic
            # per-draw updates accumulate).
            lps = res.logps  # (C, n)
            cnt_b = jnp.asarray(n, lps.dtype)
            mean_b = jnp.mean(lps, axis=1)
            m2_b = jnp.sum((lps - mean_b[:, None]) ** 2, axis=1)
            tot = s.lp_count + cnt_b
            delta = mean_b - s.lp_mean
            s = s._replace(
                key=res.bank.key,
                theta=draws[-1],
                n_grads=s.n_grads + (res.bank.n_grads - b.n_grads),
                fails=jax.tree.map(
                    lambda sf, nb, ob: sf + (nb - ob),
                    s.fails, res.bank.fails, b.fails,
                ),
                lp_count=tot,
                lp_mean=s.lp_mean + delta * cnt_b / tot,
                lp_m2=s.lp_m2 + m2_b + delta**2 * s.lp_count * cnt_b / tot,
            )
            return s, res.bank, draws, logps

    run_block_batched = None
    if batched:
        from walnuts_tpu.core.batched import make_batched_sample_block

        start_blk, sample_blk = make_batched_sample_block(
            logp_grad,
            sampling_cfg.max_trajectory_doublings,
            sampling_cfg.max_step_halvings,
            runahead=runahead,
            tier2_every=tier2_every,
            bf16_ends=bf16_ends,
            min_latched=min_latched,
            defer_splits=defer_splits,
            pallas_replay=pallas_replay,
            fresh_cur=fresh_cur,
            bounded_sweeps=bounded_sweeps,
            pallas_pass=pallas_pass,
            pass_tile=pass_tile,
        )
        b_max_error = sampling_cfg.max_hamiltonian_error

        @partial(jax.jit, static_argnums=2)
        def run_block_batched(s: SampleState, p: FrozenParams, n: int):
            st = start_blk(
                s.key, s.theta, s.n_grads, s.fails,
                p.step_size, p.inv_mass, p.min_micro,
            )
            res = sample_blk(
                st, p.step_size, p.inv_mass, p.min_micro,
                jnp.asarray(b_max_error, s.theta.dtype), n,
            )
            # Chan et al. merge of the block's per-lane log-density stats
            # into the running Welford (same statistics as the classic
            # per-draw updates)
            lps = jnp.moveaxis(res.logps, 0, 1)  # (C, n)
            cnt_b = jnp.asarray(n, lps.dtype)
            mean_b = jnp.mean(lps, axis=1)
            m2_b = jnp.sum((lps - mean_b[:, None]) ** 2, axis=1)
            tot = s.lp_count + cnt_b
            delta = mean_b - s.lp_mean
            s = s._replace(
                key=res.key,
                theta=res.draws[-1],
                # + 1: the block-entry gradient start_blk evaluated
                n_grads=s.n_grads + res.n_grads_delta + 1,
                fails=jax.tree.map(jnp.add, s.fails, res.fails_delta),
                lp_count=tot,
                lp_mean=s.lp_mean + delta * cnt_b / tot,
                lp_m2=s.lp_m2 + m2_b + delta**2 * s.lp_count * cnt_b / tot,
            )
            return s, res.draws, res.logps

        def run_block_grouped(s: SampleState, p: FrozenParams, n: int,
                              cost: Optional[np.ndarray]):
            """Sort lanes by realized previous-block cost, dispatch the
            sorted groups sequentially, and restore the caller's order.
            Returns ``(state, theta, logp, cost_next)``."""
            C = int(p.step_size.shape[0])
            G = batched_groups
            if C % G:
                raise ValueError(
                    f"num_chains ({C}) must divide by batched_groups ({G})"
                )
            if cost is None:
                # first block: the adapted per-draw cost heuristic
                cost = np.asarray(p.min_micro, np.float64) / np.asarray(
                    p.step_size, np.float64
                )
            order = np.argsort(cost, kind="stable")
            inv = jnp.asarray(np.argsort(order))
            order = jnp.asarray(order)
            s_sorted = jax.tree.map(lambda x: x[order], s)
            p_sorted = jax.tree.map(lambda x: x[order], p)
            cg = C // G
            outs = []
            for g in range(G):
                sub_s = jax.tree.map(lambda x: x[g * cg:(g + 1) * cg], s_sorted)
                sub_p = jax.tree.map(lambda x: x[g * cg:(g + 1) * cg], p_sorted)
                outs.append(run_block_batched(sub_s, sub_p, n))
            s_new = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[inv],
                *[o[0] for o in outs]
            )
            theta = jnp.concatenate([o[1] for o in outs], axis=1)[:, inv]
            logp = jnp.concatenate([o[2] for o in outs], axis=1)[:, inv]
            cost_next = np.asarray(s_new.n_grads - s.n_grads, np.float64)
            return s_new, theta, logp, cost_next

    rhat_fn = jax.jit(_sampling_rhat)

    # device-resident collection writes blocks into ONE preallocated cube
    # in place (donated dynamic_update_slice). Appending blocks and
    # concatenating at the end doubles peak memory — at the 1003-dim x
    # 4096-chain flagship the 6.6 GB cube duplicated is what killed the
    # TPU worker in round 2.
    dev_draws_buf = dev_logps_buf = None
    dev_rows = 0  # thinned rows written into the device cube
    if device_draws:
        @partial(jax.jit, donate_argnums=(0,))
        def _write_block(buf, block, start):
            idx = (start,) + (0,) * (block.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, block, idx)

    info = info or RunInfo()
    draws_host: List[np.ndarray] = []
    logps_host: List[np.ndarray] = []
    it = start_it
    # A resumed run that had already early-stopped on R-hat must stay
    # stopped: re-invoking with the same checkpoint_dir would otherwise
    # extend the chain past the documented completed-run output.
    converged = bool(info.converged_sampling) if start_it > 0 else False
    # Host collection is PIPELINED: a finished block's device->host copy
    # is started asynchronously and materialized only after the NEXT
    # block has been dispatched, so the (slow) host link transfers while
    # the device computes instead of idling it (the reference's handlers
    # write into host RAM from worker threads at ~zero cost,
    # handlers.hpp:63-116; this is the TPU analog). Draws are identical,
    # only the overlap changes.
    pending = None  # (theta, logp) of the block awaiting materialization

    def _flush_pending():
        nonlocal pending
        if pending is not None:
            draws_host.append(np.asarray(pending[0]))
            logps_host.append(np.asarray(pending[1]))
            pending = None

    group_cost: Optional[np.ndarray] = None  # realized per-lane cost
    # On KeyboardInterrupt the draws collected so far are returned (the
    # reference's interrupt path likewise leaves the already-written
    # buffers with the caller).
    _budget = _BlockBudget(block_budget, sampling_cfg.block_size)
    try:
        while it < sampling_cfg.max_iter and not converged:
            # blocks never cross a check boundary (see run_warmup): R-hat
            # early stopping fires at the same iterations whether or not
            # the block budget capped the realized block lengths
            next_check = _next_boundary(
                it, sampling_cfg.min_iter, sampling_cfg.block_size,
                sampling_cfg.max_iter,
            )
            n = min(_budget.cap, sampling_cfg.block_size, next_check - it)
            _budget.start()
            if batched and batched_groups > 1:
                state, theta, logp, group_cost = run_block_grouped(
                    state, params, n, group_cost
                )
            elif batched:
                state, theta, logp = run_block_batched(state, params, n)
            elif flatten:
                state, bank, theta, logp = run_block_flat(state, bank, params, n)
            else:
                state, (theta, logp) = run_block(state, params, n)
            _budget.finish(state, n)
            it += n
            if thin > 1:
                theta = theta[thin - 1::thin]
                logp = logp[thin - 1::thin]
            if keep_dims is not None:
                theta = theta[:, :, jnp.asarray(keep_dims)]
            if device_draws:
                if dev_draws_buf is None:
                    n_left = (sampling_cfg.max_iter - start_it) // thin
                    shape = (n_left,) + theta.shape[1:]
                    dev_draws_buf = jnp.zeros(shape, theta.dtype)
                    dev_logps_buf = jnp.zeros(
                        (n_left,) + logp.shape[1:], logp.dtype
                    )
                # write at the cumulative thinned-row count, NOT at
                # (it - start_it) // thin: a block whose length is not a
                # thin multiple (min_iter clamp / max_iter remainder)
                # yields floor(n/thin) rows, and the iteration-derived
                # offset would then leave a zero-row gap in the cube
                dev_draws_buf = _write_block(dev_draws_buf, theta, dev_rows)
                dev_logps_buf = _write_block(dev_logps_buf, logp, dev_rows)
                dev_rows += theta.shape[0]
            else:
                _flush_pending()
                pending = (theta, logp)
                for x in pending:
                    try:
                        x.copy_to_host_async()
                    except Exception:
                        pass  # backend without async copy: np.asarray later
            if checkpoint is not None:
                info.sampling_iters = it
                checkpoint.block(
                    "sampling", it, state, info, block_start=it - n,
                    theta=theta, logp=logp, params=params,
                )
            if progress is not None:
                progress("sampling", it)
            # also evaluated on the final block (see the warmup note): the
            # last R-hat lands in rhat_trace / on_r_hat and
            # converged_sampling is true when the tolerance is met at
            # exactly max_iter (sampler.hpp:142-152 polls there too).
            # Boundary-gated like warmup so rhat_trace / early stopping
            # are invariant to budget capping.
            if it == next_check and it >= max(sampling_cfg.min_iter, 2):
                r = float(rhat_fn(state))
                info.rhat_trace.append(r)
                if on_r_hat is not None:
                    on_r_hat(r)
                converged = r <= sampling_cfg.rhat_converge_tol
    except KeyboardInterrupt:
        info.interrupted = True
        jax.block_until_ready(state)

    _flush_pending()  # materialize the last block's async copy
    info.sampling_iters = it
    info.converged_sampling = converged
    if checkpoint is not None and not info.interrupted:
        # persist the final R-hat convergence flag (see run_warmup): a
        # re-invoked early-stopped run must return the same draws, not
        # resume sampling past the stop point
        checkpoint.update_info("sampling", it, info)
    info.n_grads = np.asarray(state.n_grads)
    info.n_halve_fail = np.asarray(state.fails.n_halve_fail)
    info.n_nonfinite = np.asarray(state.fails.n_nonfinite)
    info.n_depth_exhausted = np.asarray(state.fails.n_depth_exhausted)
    if device_draws:
        if dev_draws_buf is None:
            draws = logps = np.empty((0,))
        elif dev_rows == dev_draws_buf.shape[0]:
            draws, logps = dev_draws_buf, dev_logps_buf
        else:  # early stop / interrupt: return only the filled prefix
            draws = dev_draws_buf[:dev_rows]
            logps = dev_logps_buf[:dev_rows]
    else:
        draws = np.concatenate(draws_host, axis=0) if draws_host else np.empty((0,))
        logps = np.concatenate(logps_host, axis=0) if logps_host else np.empty((0,))
    if permutation is not None:
        # restore the caller's chain order
        inverse = np.argsort(permutation)
        state = jax.tree.map(lambda x: x[jnp.asarray(inverse)], state)
        info.n_grads = info.n_grads[inverse]
        info.n_halve_fail = info.n_halve_fail[inverse]
        info.n_nonfinite = info.n_nonfinite[inverse]
        info.n_depth_exhausted = info.n_depth_exhausted[inverse]
        if draws.size:
            inv = jnp.asarray(inverse) if device_draws else inverse
            draws = draws[:, inv]
            logps = logps[:, inv]
    return state, draws, logps, info


__all__ = [
    "CHAIN_AXIS",
    "RunInfo",
    "chain_sharding",
    "run_sampling",
    "run_warmup",
    "shard_chains",
]
