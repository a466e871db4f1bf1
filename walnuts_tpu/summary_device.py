"""On-device (jnp) posterior diagnostics for large runs.

The host summary (``walnuts_tpu.summary``) mirrors the reference exactly
but requires the draws on the host. For 4096-chain x 1000+-dim runs the
transfer dominates, so this module provides jit-compatible equal-length
implementations of the same estimators:

  - batched FFT autocovariance (biased 1/N, 2x 5-smooth padding,
    summary.hpp:39-91),
  - chain-balanced R-hat (summary.hpp:594-619),
  - Geyer ESS with the initial-positive + initial-monotone paired-lag
    sequence, cross-chain averaged autocovariances, ``var_plus``
    adjustment, antithetic tail, and the ``1/log10(N)`` tau floor
    (summary.hpp:664-749), vectorized over dimensions with a masked
    ``lax.fori_loop`` over lag pairs.

Equal chain lengths only (draws as a ``(chains, N, D)`` array) — that is
what the block-synchronous runtime produces; ragged chains use the host
implementation. Results match the host implementation to float tolerance
(tested) and the reference's deterministic ESS anchor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from walnuts_tpu.summary import fft_next_good_size

Array = jax.Array


def autocovariance_device(draws: Array) -> Array:
    """Per-chain autocovariances: (C, N, D) -> (C, N, D)."""
    c, n, d = draws.shape
    m2 = 2 * fft_next_good_size(n)
    centered = draws - jnp.mean(draws, axis=1, keepdims=True)
    freq = jnp.fft.fft(centered, n=m2, axis=1)
    ac = jnp.fft.ifft(jnp.abs(freq) ** 2, axis=1).real[:, :n, :]
    return ac / n


def r_hat_device(draws: Array) -> Array:
    """Chain-balanced R-hat: (C, N, D) -> (D,)."""
    mu = jnp.mean(draws, axis=1)               # (C, D)
    sigma_sq = jnp.var(draws, axis=1, ddof=1)  # (C, D)
    return jnp.sqrt(1.0 + jnp.var(mu, axis=0, ddof=1) / jnp.mean(sigma_sq, axis=0))


def effective_sample_size_device(draws: Array) -> Array:
    """Geyer ESS: (C, N, D) -> (D,). Matches the host implementation."""
    c, n, d = draws.shape
    n_total = c * n

    chain_means = jnp.mean(draws, axis=1)
    chain_vars = jnp.var(draws, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)           # (D,)
    var_plus = w
    if c > 1:
        var_plus = var_plus + jnp.var(chain_means, axis=0, ddof=1)

    macov = jnp.mean(autocovariance_device(draws), axis=0)  # (N, D)

    rho = jnp.zeros((n, d), dtype=draws.dtype)
    rho = rho.at[0].set(1.0)
    rho_even0 = jnp.ones((d,), dtype=draws.dtype)
    rho_odd0 = 1.0 - (w - macov[1]) / var_plus
    rho = rho.at[1].set(rho_odd0)

    active0 = jnp.ones((d,), dtype=bool)
    max_t0 = jnp.full((d,), 1, dtype=jnp.int32)
    last_even0 = rho_even0

    n_pairs = max((n - 4 - 1 + 1) // 2, 0)  # t = 1, 3, ... while t < n - 4

    def body(p, carry):
        rho, rho_even, rho_odd, active, max_t, last_even = carry
        t = 1 + 2 * p
        active = active & ((rho_even + rho_odd) > 0.0)
        max_t = jnp.where(active, t + 2, max_t)
        new_even = 1.0 - (w - macov[t + 1]) / var_plus
        new_odd = 1.0 - (w - macov[t + 2]) / var_plus
        store = active & ((new_even + new_odd) >= 0.0)
        r1 = jnp.where(store, new_even, rho[t + 1])
        r2 = jnp.where(store, new_odd, rho[t + 2])
        cap = active & (r1 + r2 > rho[t - 1] + rho[t])
        capped = (rho[t - 1] + rho[t]) / 2.0
        r1 = jnp.where(cap, capped, r1)
        r2 = jnp.where(cap, capped, r2)
        rho = rho.at[t + 1].set(r1).at[t + 2].set(r2)
        rho_even = jnp.where(active, new_even, rho_even)
        rho_odd = jnp.where(active, new_odd, rho_odd)
        last_even = jnp.where(active, new_even, last_even)
        return rho, rho_even, rho_odd, active, max_t, last_even

    rho, rho_even, rho_odd, active, max_t, last_even = jax.lax.fori_loop(
        0, n_pairs, body, (rho, rho_even0, rho_odd0, active0, max_t0, last_even0)
    )
    t_end = 1 + 2 * n_pairs
    max_t = jnp.where(active & ((rho_even + rho_odd) > 0.0), t_end, max_t)
    max_t = jnp.minimum(max_t, t_end)

    # antithetic tail (summary.hpp:735-741)
    tail_ok = (last_even > 0.0) & (max_t + 1 < n)
    tail = jnp.where(tail_ok, last_even, 0.0)

    lag_idx = jnp.arange(n)[:, None]
    head_sum = jnp.sum(jnp.where(lag_idx < max_t[None, :], rho, 0.0), axis=0)
    tau_hat = -1.0 + 2.0 * head_sum + tail
    tau_hat = jnp.maximum(tau_hat, 1.0 / jnp.log10(jnp.asarray(n_total, draws.dtype)))
    return n_total / tau_hat


def mcse_device(draws: Array) -> Array:
    """MCSE = pooled sd / sqrt(ESS), on device."""
    c, n, d = draws.shape
    flat = draws.reshape(c * n, d)
    sd = jnp.std(flat, axis=0, ddof=1)
    return sd / jnp.sqrt(effective_sample_size_device(draws))


def effective_sample_size_device_chunked(draws: Array, chunk: int = 64) -> Array:
    """Geyer ESS over dimension chunks for very wide posteriors.

    The full-width FFT intermediate is (C, 2*pad(N), D) complex64 — at
    4096 chains x 400 draws x 1003 dims that is ~34 GB and OOMs the chip
    (the round-1 blocker for the stochastic-volatility benchmark,
    BASELINE.json configs[4]). Chunking the dimension axis bounds the
    intermediate at (C, 2*pad(N), chunk) while the draw cube itself stays
    device-resident; one jitted program is reused for every full chunk.
    """
    c, n, d = draws.shape
    ess_fn = jax.jit(effective_sample_size_device)
    outs = []
    for lo in range(0, d, chunk):
        hi = min(lo + chunk, d)
        outs.append(ess_fn(jax.lax.slice_in_dim(draws, lo, hi, axis=2)))
    return jnp.concatenate(outs)


__all__ = [
    "autocovariance_device",
    "effective_sample_size_device",
    "effective_sample_size_device_chunked",
    "mcse_device",
    "r_hat_device",
]
