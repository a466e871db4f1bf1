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
