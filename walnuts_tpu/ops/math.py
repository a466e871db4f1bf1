"""Core math primitives for the WALNUTS TPU framework.

These are the JAX-native counterparts of the reference's foundation layer
(``/root/reference/include/walnutpie/util.hpp``). Everything here is pure,
shape-static, and jit/vmap compatible. There are no exceptions in traced
code: model failures are represented by ``-inf`` log densities and zeroed
gradients (the reference's ``NoExceptLogpGrad`` trap, util.hpp:311-351,
becomes value-level masking).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

#: Signature of a target: position -> scalar unnormalized log density.
LogDensityFn = Callable[[Array], Array]

#: Signature of a fused log density + gradient: position -> (logp, grad).
LogpGradFn = Callable[[Array], Tuple[Array, Array]]


def log_sum_exp(x1: Array, x2: Array) -> Array:
    """Numerically stable log(exp(x1) + exp(x2)) for scalars.

    Matches the edge-case semantics of the reference implementation
    (util.hpp:174-183): NaN inputs give NaN, matched infinities give that
    infinity, and ``-inf`` acts as the identity.
    """
    m = jnp.maximum(x1, x2)
    mn = jnp.minimum(x1, x2)
    # Where m is infinite (or both -inf) return m directly: exp(x - m)
    # would produce nan for inf - inf.
    safe = m + jnp.log1p(jnp.exp(mn - m))
    out = jnp.where(jnp.isinf(m), m, safe)
    return jnp.where(jnp.isnan(x1) | jnp.isnan(x2), jnp.nan, out)


def log_sum_exp_vec(x: Array, axis=None) -> Array:
    """Stable logsumexp over an array (util.hpp:195-205 semantics)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(x - safe_m), axis=axis, keepdims=True)
    out = safe_m + jnp.log(s)
    out = jnp.where(jnp.isinf(m), m, out)
    if axis is None:
        return out.reshape(())
    return jnp.squeeze(out, axis=axis)


def logp_momentum(rho: Array, inv_mass: Array) -> Array:
    """Unnormalized log density (negative kinetic energy) of a momentum.

    ``-0.5 * sum(inv_mass * rho**2)`` for a diagonal mass matrix
    (util.hpp:220-223).
    """
    return -0.5 * jnp.sum(inv_mass * jnp.square(rho), axis=-1)


def sanitize_logp_grad(logp: Array, grad: Array) -> Tuple[Array, Array]:
    """Mask model failures the way the reference traps exceptions.

    A NaN log density becomes ``-inf`` and any non-finite gradient entries
    become zero, so a bad proposal is simply rejected and sampling
    continues (the TPU-native equivalent of ``NoExceptLogpGrad``,
    util.hpp:336-346). A legitimately ``-inf`` log density (out of support)
    is preserved.
    """
    logp = jnp.where(jnp.isnan(logp), -jnp.inf, logp)
    logp = jnp.where(logp == jnp.inf, -jnp.inf, logp)
    grad = jnp.where(jnp.isfinite(grad), grad, jnp.zeros_like(grad))
    return logp, grad


def make_logp_grad(logp_fn: LogDensityFn) -> LogpGradFn:
    """Build a sanitized fused value-and-gradient function from a log density.

    This replaces the reference's ``LogpGrad`` callback concept
    (concepts.hpp:259) with JAX autodiff: one ``value_and_grad`` evaluation
    per leapfrog step, which XLA fuses with the integrator updates.
    """
    vag = jax.value_and_grad(logp_fn)

    def logp_grad(theta: Array) -> Tuple[Array, Array]:
        logp, grad = vag(theta)
        return sanitize_logp_grad(logp, grad)

    return logp_grad


def leapfrog_step(
    logp_grad: LogpGradFn,
    inv_mass: Array,
    step: Array,
    theta: Array,
    rho: Array,
    grad: Array,
) -> Tuple[Array, Array, Array, Array]:
    """One leapfrog micro step (the hot kernel).

    Mirrors the inner loop of ``macro_step`` (walnuts.hpp:328-333):

        rho   += step/2 * grad
        theta += step * inv_mass .* rho
        logp, grad = logp_grad(theta)
        rho   += step/2 * grad

    Returns ``(theta_next, rho_next, grad_next, logp_pos_next)``. ``step``
    may be negative for backward-in-time integration.
    """
    half = 0.5 * step
    rho_half = rho + half * grad
    theta_next = theta + step * inv_mass * rho_half
    logp_next, grad_next = logp_grad(theta_next)
    rho_next = rho_half + half * grad_next
    return theta_next, rho_next, grad_next, logp_next


def leapfrog_error(
    logp_grad: LogpGradFn,
    theta: Array,
    rho: Array,
    inv_mass: Array,
    step: Array,
) -> Array:
    """Difference in joint log density across one leapfrog step.

    The signed change ``logp_joint(after) - logp_joint(before)`` used by the
    step-size initialization heuristic (util.hpp:243-259). For a standard
    normal target this has the closed form ``-step**4 * inv_mass**3 *
    rho**2 / 8`` per dimension to leading order, which the tests use as an
    oracle (mirroring util_test.cpp:385-476).
    """
    logp0, grad0 = logp_grad(theta)
    h0 = logp0 + logp_momentum(rho, inv_mass)
    _, rho1, _, logp1 = leapfrog_step(logp_grad, inv_mass, step, theta, rho, grad0)
    h1 = logp1 + logp_momentum(rho1, inv_mass)
    return h1 - h0


def adapt_step_size(
    key: Array,
    logp_grad: LogpGradFn,
    theta: Array,
    mass: Array,
    step: Array,
    max_doublings: int = 64,
) -> Array:
    """Coarse initial step-size search (util.hpp:285-303).

    Draws one momentum, then doubles the step while the one-step acceptance
    exceeds 0.9 and afterwards shrinks by ``sqrt(1/2)`` until it exceeds
    0.6. Both phases are bounded ``lax.while_loop``s (the reference leaves
    them unbounded; here a cap of ``max_doublings`` guards traced code
    against non-termination on pathological targets).
    """
    inv_mass = 1.0 / mass
    z = jax.random.normal(key, theta.shape, dtype=theta.dtype)
    rho = z * jnp.sqrt(mass)

    log_09 = jnp.log(jnp.asarray(0.9, dtype=theta.dtype))
    log_06 = jnp.log(jnp.asarray(0.6, dtype=theta.dtype))

    def err(s):
        return leapfrog_error(logp_grad, theta, rho, inv_mass, s)

    def grow_cond(carry):
        s, it = carry
        return (err(s) > log_09) & (it < max_doublings)

    def grow_body(carry):
        s, it = carry
        return s * 2.0, it + 1

    step = jnp.asarray(step, dtype=theta.dtype)
    step, _ = jax.lax.while_loop(grow_cond, grow_body, (step, 0))

    inv_sqrt2 = jnp.sqrt(jnp.asarray(0.5, dtype=theta.dtype))

    def shrink_cond(carry):
        s, it = carry
        return (err(s) < log_06) & (it < max_doublings)

    def shrink_body(carry):
        s, it = carry
        return s * inv_sqrt2, it + 1

    step, _ = jax.lax.while_loop(shrink_cond, shrink_body, (step, 0))
    return step


def count_trailing_zeros(x: Array) -> Array:
    """Number of trailing zero bits of a positive integer array.

    ``ctz(x) = popcount((x & -x) - 1)``; used to compute how many subtree
    merges follow each new leaf in the iterative tree doubling.
    """
    x = x.astype(jnp.uint32)
    low_bit = x & (~x + jnp.uint32(1))
    return jax.lax.population_count(low_bit - jnp.uint32(1)).astype(jnp.int32)


__all__ = [
    "Array",
    "LogDensityFn",
    "LogpGradFn",
    "adapt_step_size",
    "count_trailing_zeros",
    "leapfrog_error",
    "leapfrog_step",
    "log_sum_exp",
    "log_sum_exp_vec",
    "logp_momentum",
    "make_logp_grad",
    "sanitize_logp_grad",
]
