"""Fused PRNG kernels: the deferred key-split replay chain as ONE kernel.

The batched scheduler (``core/batched.py``) defers the per-attempt key
splits out of the integration loop and replays them in the amortised
tier-2 pass: per lane, ``n_ends`` SEQUENTIAL splits (split ``j`` feeds
split ``j+1``) with the leaf-completing attempt's second subkey latched
as ``ku``. As XLA ops that replay is a ``lax.while_loop`` paying one
fused-elementwise launch per round — up to ``tier2_every`` rounds per
pass on (C,)-sized u32 data where the FIXED per-op cost dominates the
~microsecond of ARX compute. This module runs the whole chain in one
Pallas launch with the keys resident in VMEM.

Bit-exactness: ``jax.random.split`` under the default
``jax_threefry_partitionable`` lowering computes ``subkey_j =
threefry2x32(key, hi=0, lo=j)`` (jax _src/prng.py
``_threefry_split_foldlike``; Threefry-2x32, 20 rounds, rotations
[13,15,26,6]/[17,29,16,24], key schedule ``k0, k1, k0^k1^0x1BD11BDA``).
``_threefry2x32`` below restates that arithmetic with plain uint32 ops —
integer ARX is exact, so the kernel's subkeys equal
``jax.random.split``'s bitwise (tests/test_prng.py asserts it, and the
batched scheduler's bitwise-vs-classic oracle covers the composition).

Reference scope note: the reference samples ``std::mt19937_64`` draws
inline per attempt (walnuts.hpp:322-345 via util.hpp Random); the
counter-based replay schedule is this rebuild's TPU-native redesign of
that stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_ROTS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = np.uint32(0x1BD11BDA)


def _threefry2x32(k0: Array, k1: Array, c0: Array, c1: Array):
    """Threefry-2x32 hash on uint32 arrays — bit-identical to jax's
    ``threefry2x32_p`` lowering (jax _src/prng.py
    ``_threefry2x32_lowering``)."""

    def rotl(x, r):
        return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    for i in range(5):
        for r in _ROTS[i % 2]:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x0 ^ x1
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0, x1


def split_data(key_data: Array) -> Array:
    """``jax.random.split`` on raw key data: (..., 2) u32 -> (..., 2, 2).

    Pure-jnp restatement (usable inside Pallas kernels); bitwise equal
    to ``jax.random.key_data(jax.random.split(key))`` under the
    partitionable threefry lowering.
    """
    k0, k1 = key_data[..., 0], key_data[..., 1]
    zero = jnp.zeros_like(k0)
    a0, a1 = _threefry2x32(k0, k1, zero, zero)
    b0, b1 = _threefry2x32(k0, k1, zero, zero + np.uint32(1))
    sub0 = jnp.stack([a0, a1], axis=-1)
    sub1 = jnp.stack([b0, b1], axis=-1)
    return jnp.stack([sub0, sub1], axis=-2)


def split_n_data(key_data: Array, n: int):
    """``jax.random.split(key, n)`` on raw key data: (..., 2) u32 ->
    tuple of n (..., 2) u32 subkeys (partitionable lowering:
    ``subkey_j = threefry2x32(key, hi=0, lo=j)``). Bitwise equal to
    ``jax.random.key_data(jax.random.split(key, n))`` (tests/test_prng)."""
    k0, k1 = key_data[..., 0], key_data[..., 1]
    zero = jnp.zeros_like(k0)
    subs = []
    for j in range(n):
        a0, a1 = _threefry2x32(k0, k1, zero, zero + np.uint32(j))
        subs.append(jnp.stack([a0, a1], axis=-1))
    return tuple(subs)


def random_bits32_data(key_data: Array, n: int) -> Array:
    """``random_bits(key, 32, (n,))`` on raw key data, batched: (..., 2)
    u32 -> (..., n) u32 (partitionable lowering: ``bits_j = x0 ^ x1``
    with ``(x0, x1) = threefry2x32(key, hi=0, lo=j)``). One batched
    threefry over the broadcast counter axis."""
    k0, k1 = key_data[..., 0, None], key_data[..., 1, None]
    idx = jax.lax.broadcasted_iota(jnp.uint32, k0.shape[:-1] + (n,),
                                   k0.ndim - 1)
    x0, x1 = _threefry2x32(k0 + jnp.uint32(0), k1 + jnp.uint32(0),
                           jnp.zeros_like(idx), idx)
    return x0 ^ x1


def uniform01_from_bits(bits: Array, dtype) -> Array:
    """jax's ``uniform(key, shape, dtype, 0, 1)`` bit transform on
    pre-drawn random bits (jax _src/random.py ``_uniform``): randomize
    the mantissa at exponent 1, subtract 1. ``bits`` is u32 for 32-bit
    floats, u64 for f64."""
    dtype = jnp.dtype(dtype)
    nmant = jnp.finfo(dtype).nmant
    nbits = jnp.finfo(dtype).bits
    udt = bits.dtype
    fb = (bits >> udt.type(nbits - nmant)) | jnp.asarray(
        np.array(1.0, dtype).view(udt.type), dtype=udt
    )
    return jax.lax.bitcast_convert_type(fb, dtype) - jnp.asarray(1.0, dtype)


def random_bits_data(key_data: Array, n: int, dtype) -> Array:
    """Random bits at the width of ``dtype``: u32 for 32-bit floats,
    u64 (``(x0 << 32) | x1``, no xor — jax's 64-bit path) for f64."""
    if jnp.finfo(dtype).bits == 64:
        k0, k1 = key_data[..., 0, None], key_data[..., 1, None]
        idx = jax.lax.broadcasted_iota(jnp.uint32, k0.shape[:-1] + (n,),
                                       k0.ndim - 1)
        x0, x1 = _threefry2x32(k0 + jnp.uint32(0), k1 + jnp.uint32(0),
                               jnp.zeros_like(idx), idx)
        return (x0.astype(jnp.uint64) << jnp.uint64(32)) | x1.astype(
            jnp.uint64
        )
    return random_bits32_data(key_data, n)


def uniform_from_data(key_data: Array, n: int, dtype) -> Array:
    """``jax.random.uniform(key, (n,), dtype)`` on raw key data
    (batched over leading dims). Bitwise equal (tests/test_prng.py)."""
    return uniform01_from_bits(random_bits_data(key_data, n, dtype), dtype)


def normal_from_data(key_data: Array, n: int, dtype) -> Array:
    """``jax.random.normal(key, (n,), dtype)`` on raw key data:
    ``sqrt(2) * erf_inv(uniform(lo=nextafter(-1, 0), hi=1))`` — jax
    _src/random.py ``_normal_real``. Bitwise equal on CPU; on TPU
    ``erf_inv`` lowers through the same expansion (measured bitwise in
    the Mosaic spike)."""
    dtype = jnp.dtype(dtype)
    lo = np.nextafter(np.array(-1.0, dtype), np.array(0.0, dtype),
                      dtype=dtype)
    hi = np.array(1.0, dtype)
    u = uniform01_from_bits(random_bits_data(key_data, n, dtype), dtype)
    u = u * jnp.asarray(hi - lo, dtype) + jnp.asarray(lo, dtype)
    u = jnp.maximum(jnp.asarray(lo, dtype), u)
    return jnp.asarray(np.sqrt(2), dtype) * jax.lax.erf_inv(u)


def bernoulli_half_from_data(key_data: Array) -> Array:
    """``jax.random.bernoulli(key)`` on raw key data. The default
    ``p = 0.5`` is a Python float, so ``lax.dtype(p)`` — and with it the
    comparison uniform's bit width — follows the canonical float dtype:
    f64 under x64 (the CPU test configuration), f32 otherwise (TPU).
    Returns bool, n=1 axis squeezed."""
    dtype = jnp.result_type(0.5)
    u = uniform_from_data(key_data, 1, dtype)
    return (u < jnp.asarray(0.5, dtype))[..., 0]


def _replay_kernel(k0_ref, k1_ref, ku0_ref, ku1_ref, nends_ref, leafend_ref,
                   k0_out, k1_out, ku0_out, ku1_out):
    k0 = k0_ref[...]
    k1 = k1_ref[...]
    ku0 = ku0_ref[...]
    ku1 = ku1_ref[...]
    n_ends = nends_ref[...]
    leaf_end = leafend_ref[...]
    zero = jnp.zeros_like(k0)

    def body(j, carry):
        k0, k1, ku0, ku1 = carry
        s00, s01 = _threefry2x32(k0, k1, zero, zero)
        s10, s11 = _threefry2x32(k0, k1, zero, zero + np.uint32(1))
        adv = j < n_ends
        hit = adv & (leaf_end == j + 1)
        return (
            jnp.where(adv, s00, k0),
            jnp.where(adv, s01, k1),
            jnp.where(hit, s10, ku0),
            jnp.where(hit, s11, ku1),
        )

    k0, k1, ku0, ku1 = jax.lax.fori_loop(
        0, jnp.max(n_ends), body, (k0, k1, ku0, ku1)
    )
    k0_out[...] = k0
    k1_out[...] = k1
    ku0_out[...] = ku0
    ku1_out[...] = ku1


@functools.partial(jax.jit, static_argnames=("interpret",))
def replay_split_chain(key_data: Array, ku_data: Array, n_ends: Array,
                       leaf_end_at: Array, *, interpret: bool = False):
    """Run the whole deferred-split replay in one Pallas launch.

    Per lane: advance ``key`` through ``n_ends`` sequential splits
    (taking subkey 0 each round); at round ``leaf_end_at`` (1-based)
    latch subkey 1 into ``ku``. Lanes with ``n_ends == 0`` pass through.

    Args: ``key_data``/``ku_data`` (C, 2) uint32, ``n_ends``/
    ``leaf_end_at`` (C,) int32. Returns updated ``(key_data, ku_data)``
    — bitwise equal to the XLA while-loop replay in
    ``core/batched.py`` (same arithmetic, integer-exact).
    """
    from jax.experimental import pallas as pl

    c = key_data.shape[0]
    col = lambda a, i: a[:, i].reshape(c, 1)
    args = (
        col(key_data, 0), col(key_data, 1),
        col(ku_data, 0), col(ku_data, 1),
        n_ends.reshape(c, 1), leaf_end_at.reshape(c, 1),
    )
    spec_u = pl.BlockSpec((c, 1), lambda: (0, 0))
    outs = pl.pallas_call(
        _replay_kernel,
        in_specs=[spec_u] * 6,
        out_specs=[spec_u] * 4,
        out_shape=[jax.ShapeDtypeStruct((c, 1), jnp.uint32)] * 4,
        interpret=interpret,
    )(*args)
    k0, k1, ku0, ku1 = (o[:, 0] for o in outs)
    return jnp.stack([k0, k1], axis=-1), jnp.stack([ku0, ku1], axis=-1)


__all__ = [
    "split_data",
    "split_n_data",
    "random_bits32_data",
    "random_bits_data",
    "uniform01_from_bits",
    "uniform_from_data",
    "normal_from_data",
    "bernoulli_half_from_data",
    "replay_split_chain",
]
