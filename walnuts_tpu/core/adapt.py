"""Adaptation state for continuous (Nutpie-style) WALNUTS warmup.

The reference implements these as small mutable C++ classes
(``include/walnutpie/adam.hpp``, ``online_moments.hpp``,
``adaptive_walnuts.hpp:25-164``). Here each is an immutable pytree with a
pure ``update(state, obs) -> state`` function so it can be carried through
``lax.scan`` / ``lax.while_loop`` and vmapped across thousands of chains.
All arithmetic matches the reference exactly (same discount schedules,
same estimators) so ESS-per-gradient parity is achievable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class AdamState(NamedTuple):
    """Adam on log step size (adam.hpp:35-109).

    The gradient signal is ``target_accept - observed_accept``; the
    learning rate decays as ``lr / t^decay``. Hyperparameters ride in the
    state so they can differ per chain under vmap if ever needed.
    """

    log_step: Array
    m: Array
    v: Array
    t: Array
    b1_pow: Array
    b2_pow: Array
    target_accept: Array
    lr: Array
    b1: Array
    b2: Array
    eps: Array
    lr_decay: Array


def adam_init(
    step_size_init,
    target_accept=0.8,
    lr=0.05,
    b1=0.8,
    b2=0.9,
    eps=1e-4,
    lr_decay=0.5,
    dtype=jnp.float32,
) -> AdamState:
    f = lambda x: jnp.asarray(x, dtype=dtype)
    return AdamState(
        log_step=jnp.log(f(step_size_init)),
        m=f(0.0),
        v=f(0.0),
        t=f(0.0),
        b1_pow=f(1.0),
        b2_pow=f(1.0),
        target_accept=f(target_accept),
        lr=f(lr),
        b1=f(b1),
        b2=f(b2),
        eps=f(eps),
        lr_decay=f(lr_decay),
    )


def adam_update(state: AdamState, accept: Array) -> AdamState:
    """One Adam observation of an acceptance probability (adam.hpp:70-86)."""
    t = state.t + 1.0
    b1_pow = state.b1_pow * state.b1
    b2_pow = state.b2_pow * state.b2
    grad = state.target_accept - accept
    m = state.b1 * state.m + (1.0 - state.b1) * grad
    v = state.b2 * state.v + (1.0 - state.b2) * grad * grad
    m_hat = m / (1.0 - b1_pow)
    v_hat = v / (1.0 - b2_pow)
    lr_t = state.lr / jnp.power(t, state.lr_decay)
    log_step = state.log_step - lr_t * m_hat / (jnp.sqrt(v_hat) + state.eps)
    return state._replace(log_step=log_step, m=m, v=v, t=t, b1_pow=b1_pow, b2_pow=b2_pow)


def adam_step_size(state: AdamState) -> Array:
    return jnp.exp(state.log_step)


class OnlineMomentsState(NamedTuple):
    """Exponentially discounted Welford moments (online_moments.hpp:125-247).

    ``weight`` is the combined (discounted) count; ``sum_sq_dev`` the
    weighted sum of squared deviations. With discount 1 this reduces to the
    plain Welford accumulator.
    """

    weight: Array
    mean: Array
    sum_sq_dev: Array


def online_moments_init(init_weight, init_mean: Array, init_variance: Array) -> OnlineMomentsState:
    init_mean = jnp.asarray(init_mean)
    w = jnp.asarray(init_weight, dtype=init_mean.dtype)
    return OnlineMomentsState(
        weight=w,
        mean=init_mean,
        sum_sq_dev=w * jnp.asarray(init_variance, dtype=init_mean.dtype),
    )


def online_moments_observe(
    state: OnlineMomentsState, discount: Array, y: Array
) -> OnlineMomentsState:
    """Discount the past by ``discount`` then fold in ``y`` with weight 1.

    Bitwise note: the ``a*b + c`` sites may or may not be FMA-contracted
    by the backend depending on the surrounding fusion — measured on CPU:
    the classic warmup's fused scan body contracts ``sum_sq_dev`` while
    the batched asynchronous warmup's pass kernel rounds each product
    (matching a NumPy per-op replay), ~1 ulp apart, and
    ``lax.optimization_barrier`` around the products does NOT stop the
    contraction. Cross-program bitwise equality of warmup adaptation is
    therefore not guaranteed; the warmup parity oracle pins the RNG keys
    and integer outputs exactly and the floats to tight tolerances
    (tests/test_batched.py).
    """
    weight = discount * state.weight + 1.0
    delta = y - state.mean
    mean = state.mean + delta / weight
    sum_sq_dev = discount * state.sum_sq_dev + delta * (y - mean)
    return OnlineMomentsState(weight=weight, mean=mean, sum_sq_dev=sum_sq_dev)


def online_moments_variance(state: OnlineMomentsState) -> Array:
    """MLE variance, or ones when nothing has been observed."""
    var = state.sum_sq_dev / state.weight
    return jnp.where(state.weight > 0, var, jnp.ones_like(var))


class MassEstimatorState(NamedTuple):
    """Fisher-divergence diagonal mass estimator (adaptive_walnuts.hpp:25-105).

    Two discounted moment accumulators — one over draws, one over scores
    (gradients) — whose variances combine as
    ``inv_mass = sqrt(var(draws) / var(scores))`` (the geometric mean of
    the variance and inverse-score-variance estimators). The discount at
    iteration t is ``1 - 1/(mass_init_count + t)``.
    """

    draws: OnlineMomentsState
    scores: OnlineMomentsState
    init_count: Array


def mass_estimator_init(init_mass: Array, mass_init_count) -> MassEstimatorState:
    """``init_mass`` is the MASS diagonal M: score variance starts at M and
    draw variance at 1/M, so the initial inverse-mass estimate is 1/M."""
    zero = jnp.zeros_like(init_mass)
    return MassEstimatorState(
        draws=online_moments_init(mass_init_count, zero, 1.0 / init_mass),
        scores=online_moments_init(mass_init_count, zero, init_mass),
        init_count=jnp.asarray(mass_init_count, dtype=init_mass.dtype),
    )


def mass_estimator_observe(
    state: MassEstimatorState, theta: Array, grad: Array, iteration: Array
) -> MassEstimatorState:
    discount = 1.0 - 1.0 / (state.init_count + iteration.astype(state.init_count.dtype))
    return state._replace(
        draws=online_moments_observe(state.draws, discount, theta),
        scores=online_moments_observe(state.scores, discount, grad),
    )


def mass_estimator_inv_mass(state: MassEstimatorState) -> Array:
    inv = jnp.sqrt(
        online_moments_variance(state.draws) / online_moments_variance(state.scores)
    )
    # f32 on TPU flushes subnormals to zero, so a near-frozen coordinate's
    # draw variance can underflow to EXACT 0 — and inv_mass = 0 is an
    # absorbing state: the theta update freezes the coordinate, the
    # momentum draw z/sqrt(inv_mass) is inf, every |dH| check goes
    # non-finite, and the whole chain dies while burning the full halving
    # budget each draw (measured round 4: 238/1024 SV bench chains dead,
    # 51k grads each vs 27k live, draws frozen — the ~10% ESS/grad parity
    # deficit). The f64 reference (adaptive_walnuts.hpp:89-94) computes
    # the same quotient but its arithmetic range never reaches the
    # absorbing zero. The clamp floor must keep the whole downstream
    # algebra representable, not just nonzero: momenta are
    # z/sqrt(inv_mass), and at floor=finfo.tiny the momentum itself
    # squares to inf in f32 for |z| > 1.9 (measured: the ex-dead chains
    # kept failing every |dH| check) — so the floor is sqrt(finfo.tiny)
    # (f32 1.1e-19: momentum ~3e9 z, its square ~9e18 z^2, kinetic
    # contribution exactly z^2/2; f64 1.5e-154, never reached), with the
    # symmetric cap against the var(scores)->0 blowup. Binds only where
    # the f64 reference's arithmetic could not follow anyway: it is
    # efficiency tuning, not distribution (any positive diagonal mass is
    # a valid kernel), and is an exact no-op for every f64 oracle in the
    # suite.
    # When BOTH variances underflow to exact 0 (a fully frozen
    # coordinate) the quotient is 0/0 = NaN and jnp.clip passes NaN
    # through — same dead-chain symptom by another route. No data:
    # fall back to unit inverse mass (the estimator's own prior).
    inv = jnp.where(jnp.isnan(inv), jnp.asarray(1.0, inv.dtype), inv)
    tiny = jnp.sqrt(jnp.asarray(jnp.finfo(inv.dtype).tiny, inv.dtype))
    return jnp.clip(inv, tiny, 1.0 / tiny)


class MinMicroState(NamedTuple):
    """Minimum micro-step-count estimator (adaptive_walnuts.hpp:119-164).

    Observes ``2^depth`` macro steps per trajectory; the estimate is the
    historical mean divided by the target macro-step count, rounded to the
    nearest integer and floored at the configured minimum. Initialized with
    one pseudo-observation of 2 macro steps.
    """

    total_macro_steps: Array
    count: Array
    target: Array
    floor: Array


def min_micro_init(target_macro_steps, min_micro_steps, dtype=jnp.float32) -> MinMicroState:
    return MinMicroState(
        total_macro_steps=jnp.asarray(2.0, dtype=dtype),
        count=jnp.asarray(1.0, dtype=dtype),
        target=jnp.asarray(target_macro_steps, dtype=dtype),
        floor=jnp.asarray(min_micro_steps, dtype=jnp.int32),
    )


def min_micro_observe(state: MinMicroState, macro_steps: Array) -> MinMicroState:
    return state._replace(
        total_macro_steps=state.total_macro_steps + macro_steps.astype(state.count.dtype),
        count=state.count + 1.0,
    )


def min_micro_estimate(state: MinMicroState) -> Array:
    mean_macro = state.total_macro_steps / state.count
    # std::lround rounds half away from zero; values are positive here.
    est = jnp.floor(mean_macro / state.target + 0.5).astype(jnp.int32)
    return jnp.maximum(state.floor, est)


def nutpie_init_mass(grad: Array, mass_smoothing: Array) -> Array:
    """Nutpie gradient-based mass initialization (config.hpp:360-382):
    ``mass = (1 - s) * |grad| + s``."""
    return (1.0 - mass_smoothing) * jnp.abs(grad) + mass_smoothing


__all__ = [
    "AdamState",
    "MassEstimatorState",
    "MinMicroState",
    "OnlineMomentsState",
    "adam_init",
    "adam_step_size",
    "adam_update",
    "mass_estimator_init",
    "mass_estimator_inv_mass",
    "mass_estimator_observe",
    "min_micro_estimate",
    "min_micro_init",
    "min_micro_observe",
    "nutpie_init_mass",
    "online_moments_init",
    "online_moments_observe",
    "online_moments_variance",
]
