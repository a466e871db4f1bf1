"""Single-chain WALNUTS samplers: adaptive warmup and fixed-parameter steps.

The reference wraps these as stateful classes (``AdaptiveWalnuts``,
adaptive_walnuts.hpp:182-364, and ``WalnutsSampler``, walnuts.hpp:605-766).
Here each is a pure step function over an immutable chain-state pytree,
ready for ``vmap`` over chains and ``lax.scan`` over iterations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import (
    AdamState,
    MassEstimatorState,
    MinMicroState,
    adam_init,
    adam_step_size,
    mass_estimator_init,
    mass_estimator_inv_mass,
    mass_estimator_observe,
    min_micro_estimate,
    min_micro_init,
    min_micro_observe,
)
from walnuts_tpu.core.transition import (
    FailStats,
    TransitionResult,
    make_transition,
)
from walnuts_tpu.ops.math import LogpGradFn

Array = jax.Array


class WarmupState(NamedTuple):
    """Carry of the adaptive warmup loop (one chain)."""

    key: Array
    theta: Array
    adam: AdamState
    mass: MassEstimatorState
    min_micro: MinMicroState
    iteration: Array  # int32
    n_grads: Array    # int32, cumulative gradient evaluations
    fails: FailStats  # cumulative failure counters (see FailStats)


class WarmupOutput(NamedTuple):
    """Per-iteration warmup emissions (the ``on_warmup`` callback payload,
    handlers.hpp:73-89: draw, log density, step size, inverse mass)."""

    theta: Array
    logp: Array
    step_size: Array
    inv_mass: Array
    depth: Array


class FrozenParams(NamedTuple):
    """Tuning parameters frozen at the end of warmup
    (``AdaptiveWalnuts::sampler()``, adaptive_walnuts.hpp:263-271)."""

    step_size: Array
    inv_mass: Array
    min_micro: Array  # int32


class SampleState(NamedTuple):
    """Carry of the fixed-parameter sampling loop (one chain)."""

    key: Array
    theta: Array
    n_grads: Array
    fails: FailStats
    # running Welford of the draw log densities, powering the cross-chain
    # R-hat early-stopping reduction (sampler.hpp:30-39, 88-92).
    lp_count: Array
    lp_mean: Array
    lp_m2: Array


def init_warmup_state(
    key: Array,
    theta: Array,
    init_mass: Array,
    step_size: Array,
    warmup_cfg: WarmupConfig,
    sampling_cfg: SamplingConfig,
) -> WarmupState:
    """Build the warmup carry for one chain.

    ``init_mass`` is the MASS diagonal (e.g. from the Nutpie gradient rule),
    matching ``MassEstimator``'s constructor (adaptive_walnuts.hpp:54-62).
    """
    dtype = theta.dtype
    return WarmupState(
        key=key,
        theta=theta,
        adam=adam_init(
            step_size,
            target_accept=warmup_cfg.step_accept_rate_target,
            lr=warmup_cfg.step_learning_rate,
            b1=warmup_cfg.step_gradient_decay,
            b2=warmup_cfg.step_sq_gradient_decay,
            eps=warmup_cfg.step_stabilization,
            lr_decay=warmup_cfg.step_learn_rate_decay,
            dtype=dtype,
        ),
        mass=mass_estimator_init(
            jnp.asarray(init_mass, dtype=dtype), warmup_cfg.mass_init_count
        ),
        min_micro=min_micro_init(
            warmup_cfg.max_macro_steps_target,
            sampling_cfg.min_micro_steps,
            dtype=dtype,
        ),
        iteration=jnp.int32(0),
        n_grads=jnp.int32(0),
        fails=FailStats.zeros(),
    )


def make_warmup_step(
    logp_grad: LogpGradFn, sampling_cfg: SamplingConfig, integrator=None,
    bf16_ends: bool = False, unroll: int = 1,
) -> Callable[[WarmupState], Tuple[WarmupState, WarmupOutput]]:
    """One continuous-warmup iteration (adaptive_walnuts.hpp:234-251).

    Reads the current mass/step/min-micro estimates, runs one transition
    with Adam observing every coarsest macro-step attempt, then feeds the
    selected draw and its score back into the estimators with the
    ``1 - 1/(count0 + t)`` discount.
    """
    transition = make_transition(
        logp_grad,
        max_depth=sampling_cfg.max_trajectory_doublings,
        max_step_halvings=sampling_cfg.max_step_halvings,
        adapt_step_size=True,
        integrator=integrator,
        bf16_ends=bf16_ends,
        unroll=unroll,
    )
    max_error = sampling_cfg.max_hamiltonian_error

    def warmup_step(state: WarmupState) -> Tuple[WarmupState, WarmupOutput]:
        inv_mass = mass_estimator_inv_mass(state.mass)
        step = adam_step_size(state.adam)
        min_micro = min_micro_estimate(state.min_micro)
        res: TransitionResult = transition(
            state.key, state.theta, step, inv_mass, min_micro,
            jnp.asarray(max_error, dtype=state.theta.dtype), state.adam,
        )
        mass = mass_estimator_observe(state.mass, res.theta, res.grad, state.iteration)
        mm = min_micro_observe(state.min_micro, jnp.int32(1) << res.depth)
        new_state = WarmupState(
            key=res.key,
            theta=res.theta,
            adam=res.adam,
            mass=mass,
            min_micro=mm,
            iteration=state.iteration + 1,
            n_grads=state.n_grads + res.n_grads,
            fails=jax.tree.map(jnp.add, state.fails, res.fails),
        )
        out = WarmupOutput(
            theta=res.theta,
            logp=res.logp,
            step_size=adam_step_size(res.adam),
            inv_mass=inv_mass,
            depth=res.depth,
        )
        return new_state, out

    return warmup_step


def freeze_params(state: WarmupState) -> FrozenParams:
    """Freeze the adapted tuning parameters into a fixed sampler
    (adaptive_walnuts.hpp:263-271)."""
    return FrozenParams(
        step_size=adam_step_size(state.adam),
        inv_mass=mass_estimator_inv_mass(state.mass),
        min_micro=min_micro_estimate(state.min_micro),
    )


def init_sample_state(state: WarmupState) -> SampleState:
    dtype = state.theta.dtype
    zero = jnp.zeros((), dtype=dtype)
    return SampleState(
        key=state.key,
        theta=state.theta,
        n_grads=state.n_grads,
        fails=state.fails,
        lp_count=zero,
        lp_mean=zero,
        lp_m2=zero,
    )


def make_sample_step(
    logp_grad: LogpGradFn, sampling_cfg: SamplingConfig, integrator=None,
    bf16_ends: bool = False, unroll: int = 1,
) -> Callable[[SampleState, FrozenParams], Tuple[SampleState, TransitionResult]]:
    """One fixed-parameter WALNUTS draw (``WalnutsSampler::operator()``,
    walnuts.hpp:682-692), plus the running log-density Welford used by the
    R-hat early-stopping controller."""
    transition = make_transition(
        logp_grad,
        max_depth=sampling_cfg.max_trajectory_doublings,
        max_step_halvings=sampling_cfg.max_step_halvings,
        adapt_step_size=False,
        integrator=integrator,
        bf16_ends=bf16_ends,
        unroll=unroll,
    )
    max_error = sampling_cfg.max_hamiltonian_error

    def sample_step(
        state: SampleState, params: FrozenParams
    ) -> Tuple[SampleState, TransitionResult]:
        dummy_adam = adam_init(params.step_size, dtype=state.theta.dtype)
        res = transition(
            state.key, state.theta, params.step_size, params.inv_mass,
            params.min_micro,
            jnp.asarray(max_error, dtype=state.theta.dtype), dummy_adam,
        )
        count = state.lp_count + 1.0
        delta = res.logp - state.lp_mean
        mean = state.lp_mean + delta / count
        m2 = state.lp_m2 + delta * (res.logp - mean)
        new_state = SampleState(
            key=res.key,
            theta=res.theta,
            n_grads=state.n_grads + res.n_grads,
            fails=jax.tree.map(jnp.add, state.fails, res.fails),
            lp_count=count,
            lp_mean=mean,
            lp_m2=m2,
        )
        return new_state, res

    return sample_step


__all__ = [
    "FrozenParams",
    "SampleState",
    "WarmupOutput",
    "WarmupState",
    "freeze_params",
    "init_sample_state",
    "init_warmup_state",
    "make_sample_step",
    "make_warmup_step",
]
