"""Pallas fused leapfrog integrator: the sampler's hot loop as one kernel.

The transition's inner loop integrates ``n`` leapfrog micro steps per
attempt. As XLA ops, every micro step pays kernel-launch latency and HBM
round-trips for the cursor state; fused into a single Pallas kernel the
cursor lives in VMEM (registers, effectively) for the whole attempt:

  - grid over chain tiles; each tile loops ``max(n_steps in tile)`` times
    with per-lane masking, so a slow lane only stalls its own tile rather
    than the whole batch;
  - the model's value-and-gradient is inlined INTO the kernel — autodiff
    is unavailable inside Pallas, so models supply a hand-written batched
    ``theta (B, D) -> (logp (B,), grad (B, D))`` (see
    ``walnuts_tpu.models.kernels``);
  - per-lane step size ``dt``, diagonal inverse mass, and step counts ride
    in as ``(B, 1)`` / ``(B, D)`` blocks.

``make_pallas_integrator`` returns a function with the single-chain
integrator signature the transition expects, registered with
``custom_vmap`` so the vmapped chain batch becomes one kernel launch.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

#: batched model: theta (B, D) -> (logp (B,), grad (B, D)); must be
#: expressible with Pallas-supported ops (no autodiff inside kernels).
BatchedLogpGrad = Callable[[Array], Tuple[Array, Array]]


def _integrate_kernel(batched_logp_grad, n_consts):
    def kernel(theta_ref, rho_ref, grad_ref, inv_mass_ref, dt_ref, nsteps_ref,
               *rest):
        const_refs = rest[:n_consts]
        theta_out, rho_out, grad_out, lp_out = rest[n_consts:]
        model_consts = tuple(r[...] for r in const_refs)
        theta = theta_ref[...]          # (Bt, D)
        rho = rho_ref[...]
        grad = grad_ref[...]
        inv_mass = inv_mass_ref[...]    # (Bt, D)
        dt = dt_ref[...]                # (Bt, 1)
        n_steps = nsteps_ref[...]       # (Bt, 1) int32
        max_n = jnp.max(n_steps)

        lp0 = jnp.full(dt.shape, -jnp.inf, dtype=theta.dtype)

        def body(i, carry):
            theta, rho, grad, lp = carry
            active = i < n_steps        # (Bt, 1)
            half = 0.5 * dt
            rho_h = rho + half * grad
            theta_n = theta + dt * inv_mass * rho_h
            lp_n, grad_n = batched_logp_grad(theta_n, *model_consts)
            rho_n = rho_h + half * grad_n
            return (
                jnp.where(active, theta_n, theta),
                jnp.where(active, rho_n, rho),
                jnp.where(active, grad_n, grad),
                jnp.where(active, lp_n[:, None], lp),
            )

        theta, rho, grad, lp = jax.lax.fori_loop(
            0, max_n, body, (theta, rho, grad, lp0)
        )
        theta_out[...] = theta
        rho_out[...] = rho
        grad_out[...] = grad
        lp_out[...] = lp

    return kernel


@functools.partial(
    jax.jit, static_argnames=("batched_logp_grad", "block_b", "interpret")
)
def _integrate_batch(
    theta: Array, rho: Array, grad: Array, inv_mass: Array, dt: Array,
    n_steps: Array, *consts, batched_logp_grad, block_b: int = 256,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl

    b, d = theta.shape
    pad = (-b) % block_b
    if pad:
        pad2 = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
        theta, rho, grad, inv_mass = map(pad2, (theta, rho, grad, inv_mass))
        dt = jnp.pad(dt, ((0, pad), (0, 0)))
        n_steps = jnp.pad(n_steps, ((0, pad), (0, 0)))
    bp = theta.shape[0]
    grid = (bp // block_b,)
    vec = lambda: pl.BlockSpec((block_b, d), lambda i: (i, 0))
    scl = lambda: pl.BlockSpec((block_b, 1), lambda i: (i, 0))
    const_specs = [
        pl.BlockSpec(c.shape, (lambda nd: (lambda i: (0,) * nd))(c.ndim))
        for c in consts
    ]
    theta_o, rho_o, grad_o, lp_o = pl.pallas_call(
        _integrate_kernel(batched_logp_grad, len(consts)),
        grid=grid,
        in_specs=[vec(), vec(), vec(), vec(), scl(), scl()] + const_specs,
        out_specs=[vec(), vec(), vec(), scl()],
        out_shape=[
            jax.ShapeDtypeStruct((bp, d), theta.dtype),
            jax.ShapeDtypeStruct((bp, d), theta.dtype),
            jax.ShapeDtypeStruct((bp, d), theta.dtype),
            jax.ShapeDtypeStruct((bp, 1), theta.dtype),
        ],
        interpret=interpret,
    )(theta, rho, grad, inv_mass, dt, n_steps, *consts)
    return theta_o[:b], rho_o[:b], grad_o[:b], lp_o[:b, 0]


def make_pallas_integrator(
    batched_logp_grad: BatchedLogpGrad,
    block_b: int = 256,
    interpret: bool = False,
    consts: tuple = (),
):
    """Build an attempt integrator for ``make_transition(integrator=...)``.

    Signature (single chain): ``integrator(cur (3, D), inv_mass (D,),
    dt, n_steps) -> (cur' (3, D), lp)`` where ``n_steps`` micro steps of
    size ``dt`` advance the cursor; lanes with ``n_steps == 0`` pass
    through unchanged with ``lp = -inf``. Registered with ``custom_vmap``:
    the batched form is one Pallas launch over chain tiles.
    """

    def single(cur, inv_mass, dt, n_steps):
        theta, rho, grad, lp = _integrate_batch(
            cur[0][None], cur[1][None], cur[2][None], inv_mass[None],
            jnp.asarray(dt, cur.dtype).reshape(1, 1),
            jnp.asarray(n_steps, jnp.int32).reshape(1, 1),
            *consts,
            batched_logp_grad=batched_logp_grad, block_b=block_b,
            interpret=interpret,
        )
        return jnp.stack([theta[0], rho[0], grad[0]]), lp[0]

    integrator = jax.custom_batching.custom_vmap(single)

    @integrator.def_vmap
    def _batched(axis_size, in_batched, cur, inv_mass, dt, n_steps):
        cur_b, im_b, dt_b, ns_b = in_batched
        assert cur_b, "cursor must be batched"
        if not im_b:
            inv_mass = jnp.broadcast_to(inv_mass, (axis_size,) + inv_mass.shape)
        if not dt_b:
            dt = jnp.broadcast_to(dt, (axis_size,))
        if not ns_b:
            n_steps = jnp.broadcast_to(n_steps, (axis_size,))
        theta, rho, grad, lp = _integrate_batch(
            cur[:, 0], cur[:, 1], cur[:, 2], inv_mass,
            dt.astype(cur.dtype).reshape(-1, 1),
            n_steps.astype(jnp.int32).reshape(-1, 1),
            *consts,
            batched_logp_grad=batched_logp_grad, block_b=block_b,
            interpret=interpret,
        )
        out = jnp.stack([theta, rho, grad], axis=1), lp
        return out, (True, True)

    return integrator


__all__ = ["BatchedLogpGrad", "make_pallas_integrator"]
