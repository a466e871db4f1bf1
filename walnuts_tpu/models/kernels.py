"""Hand-written batched value-and-gradient kernels for the model zoo.

Autodiff is not available inside Pallas kernels, so models that want the
fused integrator or fused transition provide a manual batched
``theta (B, D), *consts -> (logp (B,), grad (B, D))`` built from
Pallas-supported ops. Each factory returns ``(vg, dim, consts)`` where
``consts`` is a tuple of constant arrays passed into the kernel as
replicated inputs (Pallas forbids closure-captured array constants).
Each kernel is validated against the autodiff version in the tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def std_normal_vg(dim: int):
    def logp_grad(theta: Array) -> Tuple[Array, Array]:
        lp = -0.5 * jnp.sum(theta * theta, axis=-1)
        return lp, -theta

    return logp_grad, dim, ()


def funnel_vg(dim: int = 10, scale: float = 3.0):
    """Neal's funnel (see targets.funnel): v = theta[:, 0], x = theta[:, 1:].

    logp = -v^2/(2 s^2) - 0.5 ||x||^2 e^{-v} - 0.5 d v
    dv   = -v/s^2 + 0.5 ||x||^2 e^{-v} - 0.5 d
    dx   = -x e^{-v}
    """
    d_latent = dim - 1
    inv_s2 = 1.0 / (scale * scale)

    def logp_grad(theta: Array) -> Tuple[Array, Array]:
        # column-masked formulation: no lane slicing/concatenation, which
        # keeps the function usable inside Pallas kernels (Mosaic's lane
        # offsets choke on mid-vector slices of unaligned widths)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, theta.shape[-1]), 1)
        is_v = col == 0
        v = jnp.sum(jnp.where(is_v, theta, 0.0), axis=-1, keepdims=True)
        e = jnp.exp(-v)
        ssq = jnp.sum(jnp.where(is_v, 0.0, theta * theta), axis=-1, keepdims=True)
        lp = (-0.5 * v * v * inv_s2 - 0.5 * ssq * e - 0.5 * d_latent * v)[:, 0]
        dv = -v * inv_s2 + 0.5 * ssq * e - 0.5 * d_latent
        grad = jnp.where(is_v, dv, -theta * e)
        return lp, grad

    return logp_grad, dim, ()


def logistic_regression_vg(num_data: int = 1000, dim: int = 25,
                           seed: int = 20260816):
    """Logistic regression (see targets.logistic_regression), manual grad:

    logits = theta @ X^T; lp = sum log_sigmoid(y*logits) - 0.5||theta||^2
    grad = (y * sigmoid(-y*logits)) @ X - theta

    The design matrix and labels ride in as kernel constants (100 KB,
    VMEM-resident).
    """
    from walnuts_tpu.models.targets import logistic_regression_data

    design, y_sign = logistic_regression_data(num_data, dim, seed)
    x = jnp.asarray(design, dtype=jnp.float32)
    xt = jnp.asarray(design.T.copy(), dtype=jnp.float32)
    y = jnp.asarray(y_sign, dtype=jnp.float32)[None, :]  # (1, N)

    def logp_grad(theta: Array, xt_c=None, x_c=None, y_c=None) -> Tuple[Array, Array]:
        xt_c = xt if xt_c is None else xt_c
        x_c = x if x_c is None else x_c
        y_c = y if y_c is None else y_c
        # HIGHEST precision: the default bf16 MXU pass puts O(0.1-1) noise
        # on the 1000-term likelihood sum and breaks |dH| <= max_error on
        # real TPU (CLAUDE.md invariants; same rule as targets.py)
        logits = jnp.dot(
            theta, xt_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        z = y_c * logits                                    # (B, N)
        lp = (
            jnp.sum(-jnp.logaddexp(0.0, -z), axis=-1)
            - 0.5 * jnp.sum(theta * theta, axis=-1)
        )
        s = y_c * jax.nn.sigmoid(-z)
        grad = jnp.dot(
            s, x_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) - theta
        return lp, grad

    return logp_grad, dim, (xt, x, y)


def ill_conditioned_normal_vg(dim: int):
    inv_var = jnp.asarray(
        1.0 / np.arange(1.0, dim + 1.0) ** 2, dtype=jnp.float32
    )[None, :]

    def logp_grad(theta: Array, inv_var_c=None) -> Tuple[Array, Array]:
        iv = inv_var if inv_var_c is None else inv_var_c
        g = -iv * theta
        lp = 0.5 * jnp.sum(g * theta, axis=-1)
        return lp, g

    return logp_grad, dim, (inv_var,)


__all__ = [
    "funnel_vg",
    "ill_conditioned_normal_vg",
    "logistic_regression_vg",
    "std_normal_vg",
]
