"""Fused replay-chain PRNG kernel: bit-exactness vs jax.random.

The kernel (ops/prng.py) restates jax's partitionable threefry split in
plain uint32 ARX ops; integer arithmetic is exact, so every output must
equal ``jax.random.split``'s bitwise — any drift corrupts the sampler's
RNG stream silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.ops.prng import replay_split_chain, split_data


@pytest.fixture(scope="module")
def keys():
    base = jax.random.key(20260817)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(64))


class TestSplitData:
    def test_bitwise_equals_jax_split(self, keys):
        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ref = jax.vmap(
            lambda k: jax.random.key_data(jax.random.split(k))
        )(keys).astype(jnp.uint32)
        np.testing.assert_array_equal(np.asarray(ref),
                                      np.asarray(split_data(kd)))


class TestReplayChain:
    def _reference(self, kd, ku, n_ends, leaf_end_at):
        """The XLA replay loop's semantics (core/batched.py leaf_apply)."""
        kd, ku = np.array(kd), np.array(ku)
        for lane in range(kd.shape[0]):
            k = kd[lane]
            for j in range(int(n_ends[lane])):
                subs = np.asarray(split_data(jnp.asarray(k[None])))[0]
                k = subs[0]
                if int(leaf_end_at[lane]) == j + 1:
                    ku[lane] = subs[1]
            kd[lane] = k
        return kd, ku

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference_loop(self, keys, seed):
        rng = np.random.RandomState(seed)
        c = 64
        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ku = jnp.asarray(
            rng.randint(0, 2**31, size=(c, 2)), dtype=jnp.uint32
        )
        n_ends = jnp.asarray(rng.randint(0, 7, size=c), jnp.int32)
        # leaf_end_at in [0, n_ends]: 0 = no latch this window
        leaf = jnp.asarray(
            (rng.randint(0, 100, size=c) % (np.asarray(n_ends) + 1)),
            jnp.int32,
        )
        got_k, got_u = replay_split_chain(kd, ku, n_ends, leaf,
                                          interpret=True)
        ref_k, ref_u = self._reference(kd, ku, n_ends, leaf)
        np.testing.assert_array_equal(ref_k, np.asarray(got_k))
        np.testing.assert_array_equal(ref_u, np.asarray(got_u))

    def test_all_idle_passthrough(self, keys):
        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ku = jnp.zeros_like(kd)
        zero = jnp.zeros(64, jnp.int32)
        got_k, got_u = replay_split_chain(kd, ku, zero, zero,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(kd), np.asarray(got_k))
        np.testing.assert_array_equal(np.asarray(ku), np.asarray(got_u))


class TestRandomRestatements:
    """The fused-pass kernel derives every trajectory-entry random value
    (split / uniform / normal / bernoulli) from raw key data with the
    jnp restatements below — each must match jax.random BITWISE (f32 and
    f64), or the Pallas pass would silently fork the RNG stream."""

    def test_split_n(self, keys):
        from walnuts_tpu.ops.prng import split_n_data

        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ref = jax.vmap(
            lambda k: jax.random.key_data(jax.random.split(k, 3))
        )(keys).astype(jnp.uint32)
        got = split_n_data(kd, 3)
        for j in range(3):
            np.testing.assert_array_equal(np.asarray(ref[:, j]),
                                          np.asarray(got[j]))

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    @pytest.mark.parametrize("n", [3, 101])
    def test_uniform(self, keys, dtype, n):
        from walnuts_tpu.ops.prng import uniform_from_data

        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ref = jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype))(keys)
        got = uniform_from_data(kd, n, dtype)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    @pytest.mark.parametrize("n", [101, 1003])
    def test_normal(self, keys, dtype, n):
        from walnuts_tpu.ops.prng import normal_from_data

        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ref = jax.vmap(lambda k: jax.random.normal(k, (n,), dtype))(keys)
        got = normal_from_data(kd, n, dtype)
        np.testing.assert_array_equal(
            np.asarray(ref).view(np.uint32 if dtype == jnp.float32
                                 else np.uint64),
            np.asarray(got).view(np.uint32 if dtype == jnp.float32
                                 else np.uint64),
        )

    def test_bernoulli(self, keys):
        from walnuts_tpu.ops.prng import bernoulli_half_from_data

        kd = jax.random.key_data(keys).astype(jnp.uint32)
        ref = jax.vmap(jax.random.bernoulli)(keys)
        got = bernoulli_half_from_data(kd)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
