"""Pallas TPU kernels for hot model evaluations.

The sampler's only real work is the fused leapfrog + model gradient; XLA
fuses the elementwise integrator updates already, so Pallas is reserved
for model evaluations where keeping intermediates in VMEM beats XLA's
schedule. The first such kernel is the logistic-regression fused
value-and-gradient: for a ``(B, P)`` batch of chain positions it computes

    logits = theta @ X^T                (MXU)
    logp   = sum log_sigmoid(y*logits) - 0.5 ||theta||^2
    grad   = (y * sigmoid(-y*logits)) @ X - theta   (MXU)

with the design matrix and the ``(B_tile, N)`` logits tile resident in
VMEM — the ``(B, N)`` intermediate never round-trips to HBM, and both
contractions use the MXU. Falls back to plain XLA off-TPU (and under
``interpret=True`` for tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _logreg_kernel(theta_ref, xt_ref, x_ref, y_ref, logp_ref, grad_ref):
    theta = theta_ref[...]          # (Bt, P)
    xt = xt_ref[...]                # (P, N)
    y = y_ref[...]                  # (1, N)
    # HIGHEST precision: default bf16 MXU passes put O(0.1-1) noise on the
    # 1000-term likelihood and break |dH| <= max_error (CLAUDE.md invariants)
    logits = jnp.dot(
        theta, xt,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (Bt, N)
    z = y * logits
    # log sigmoid(z), stable: -softplus(-z)
    logp_lik = jnp.sum(-jnp.logaddexp(0.0, -z), axis=1)              # (Bt,)
    logp_prior = -0.5 * jnp.sum(theta * theta, axis=1)
    logp_ref[...] = (logp_lik + logp_prior)[:, None]
    s = y * jax.nn.sigmoid(-z)                                       # (Bt, N)
    grad_ref[...] = (
        jnp.dot(
            s, x_ref[...],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) - theta
    )


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _logreg_fused_batch(
    theta: Array, x: Array, y_sign: Array, block_b: int = 256, interpret: bool = False
) -> Tuple[Array, Array]:
    """Batched fused logp+grad: theta (B, P) -> (logp (B,), grad (B, P))."""
    from jax.experimental import pallas as pl

    b, p = theta.shape
    n = x.shape[0]
    pad_b = (-b) % block_b
    theta_p = jnp.pad(theta, ((0, pad_b), (0, 0))) if pad_b else theta
    bp = theta_p.shape[0]
    grid = (bp // block_b,)
    logp, grad = pl.pallas_call(
        _logreg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, p), lambda i: (i, 0)),
            pl.BlockSpec((p, n), lambda i: (0, 0)),
            pl.BlockSpec((n, p), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_b, p), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1), theta.dtype),
            jax.ShapeDtypeStruct((bp, p), theta.dtype),
        ],
        interpret=interpret,
    )(theta_p, x.T, x, y_sign[None, :])
    return logp[:b, 0], grad[:b]


def logistic_regression_fused(
    num_data: int = 1000,
    dim: int = 25,
    seed: int = 20260816,
    block_b: int = 256,
    interpret: bool = False,
):
    """Logistic-regression target with a Pallas fused value-and-gradient.

    Returns ``(logp_grad_fn, dim)`` where ``logp_grad_fn`` has the fused
    signature ``theta (P,) -> (logp, grad)`` expected by the transition; it
    is written batched and registered with a custom vmap so the whole
    vmapped chain batch lands in ONE kernel launch per leapfrog step.
    """
    from walnuts_tpu.models.targets import logistic_regression_data

    design, y_sign = logistic_regression_data(num_data, dim, seed)
    x = jnp.asarray(design, dtype=jnp.float32)
    y = jnp.asarray(y_sign, dtype=jnp.float32)

    @jax.custom_batching.custom_vmap
    def logp_grad(theta: Array) -> Tuple[Array, Array]:
        lp, g = _logreg_fused_batch(
            theta[None].astype(jnp.float32), x, y, block_b=block_b,
            interpret=interpret,
        )
        return lp[0].astype(theta.dtype), g[0].astype(theta.dtype)

    @logp_grad.def_vmap
    def _batched(axis_size, in_batched, theta):
        (theta_batched,) = in_batched
        assert theta_batched
        lp, g = _logreg_fused_batch(
            theta.astype(jnp.float32), x, y, block_b=block_b, interpret=interpret
        )
        return (lp.astype(theta.dtype), g.astype(theta.dtype)), (True, True)

    return logp_grad, dim


__all__ = ["logistic_regression_fused"]
