"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The TPU-native replacement for the reference's multi-threading tests
(SURVEY.md section 4.3): chains sharded over a ``jax.sharding.Mesh`` must
produce the same contracts and statistics as the single-device path, with
the convergence reductions riding XLA collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from walnuts_tpu import walnuts
from walnuts_tpu.models import std_normal
from walnuts_tpu.parallel.runtime import CHAIN_AXIS, chain_sharding, shard_chains


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual CPU devices"
    return Mesh(np.array(devices), (CHAIN_AXIS,))


class TestShardingHelpers:
    def test_chain_sharding_none(self):
        assert chain_sharding(None) is None

    def test_shard_chains_places_leading_axis(self, mesh):
        x = jnp.zeros((16, 3))
        sharded = shard_chains(x, mesh)
        assert sharded.sharding == NamedSharding(mesh, P(CHAIN_AXIS))


class TestShardedSampling:
    def test_end_to_end_on_mesh(self, mesh):
        logp, dim = std_normal(4)
        out = walnuts(
            logp, num_params=dim, num_chains=16, seed=7, mesh=mesh,
            min_warmup_iter=50, max_warmup_iter=50,
            min_sampling_iter=100, max_sampling_iter=100,
            save_inv_metric=True,
        )
        assert len(out) == 16
        draws = np.concatenate([np.asarray(c) for c in out], axis=0)
        assert np.abs(draws.mean(0)).max() < 0.2
        assert np.abs(draws.var(0) - 1.0).max() < 0.35

    def test_mesh_matches_single_device(self, mesh):
        """Sharding must not change the math: same seed, same fixed
        iteration counts -> identical draws with and without the mesh."""
        logp, dim = std_normal(2)
        kwargs = dict(
            num_params=dim, num_chains=8, seed=321,
            min_warmup_iter=10, max_warmup_iter=10,
            min_sampling_iter=10, max_sampling_iter=10,
        )
        out_mesh = walnuts(logp, mesh=mesh, **kwargs)
        out_single = walnuts(logp, mesh=None, **kwargs)
        for a, b in zip(out_mesh, out_single):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_device_draws_and_thin_on_mesh(self, mesh):
        """The bench's device-resident collection path and thinning work
        under a sharded mesh and match the host-collection draws."""
        from walnuts_tpu.config import SamplingConfig, WarmupConfig
        from walnuts_tpu.core.adapt import nutpie_init_mass
        from walnuts_tpu.core.sampler import (
            freeze_params, init_sample_state, init_warmup_state,
        )
        from walnuts_tpu.ops.math import make_logp_grad
        from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

        import jax
        import jax.numpy as jnp

        logp, dim = std_normal(3)
        lg = make_logp_grad(logp)
        wcfg = WarmupConfig(min_iter=8, max_iter=8, block_size=4)
        scfg = SamplingConfig(min_iter=8, max_iter=8, block_size=4)
        C = 8
        base = jax.random.key(5)
        keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
        theta0 = jax.random.normal(jax.random.fold_in(base, 99), (C, dim))
        grads = jax.vmap(lambda t: lg(t)[1])(theta0)
        mass = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5)))(grads)
        step0 = jnp.full((C,), 0.5, theta0.dtype)

        def pipeline(device_draws, thin):
            ws = jax.vmap(
                lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
            )(keys, theta0, mass, step0)
            ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg, mesh=mesh)
            params = jax.vmap(freeze_params)(ws)
            ss = jax.vmap(init_sample_state)(ws)
            _, draws, _, _ = run_sampling(
                lg, ss, params, scfg, mesh=mesh,
                device_draws=device_draws, thin=thin,
            )
            return np.asarray(draws)

        host = pipeline(False, 1)
        dev = pipeline(True, 1)
        np.testing.assert_array_equal(host, dev)
        thinned = pipeline(True, 2)
        np.testing.assert_array_equal(host[1::2], thinned)

    def test_batched_on_mesh_matches_single_device(self, mesh):
        """The batched-native scheduler's cross-lane ops (jnp.max/jnp.any)
        must lower to collectives under the mesh without touching the
        chain: sharded batched == single-device batched through warmup AND
        sampling. Same tolerance as the classic mesh test above — the
        per-device batch shape perturbs XLA's vectorization at the ULP
        level (measured 9e-16 on 2/36 elements), exactly as for the
        classic path; single-device batched == classic stays bitwise
        (tests/test_batched.py)."""
        logp, dim = std_normal(3)
        kwargs = dict(
            num_params=dim, num_chains=16, seed=99,
            min_warmup_iter=12, max_warmup_iter=12,
            min_sampling_iter=12, max_sampling_iter=12, block_size=6,
        )
        out_mesh = walnuts(logp, mesh=mesh, batched=True, **kwargs)
        out_single = walnuts(logp, mesh=None, batched=True, **kwargs)
        for a, b in zip(out_mesh, out_single):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-10)

    def test_early_stopping_on_mesh(self, mesh):
        logp, dim = std_normal(2)
        out, info = walnuts(
            logp, num_params=dim, num_chains=8, seed=11, mesh=mesh,
            min_warmup_iter=20, max_warmup_iter=200,
            min_sampling_iter=20, max_sampling_iter=500,
            block_size=10, return_info=True,
        )
        assert 20 <= info.sampling_iters <= 500
        assert 20 <= info.warmup_iters <= 200
        for chain in out:
            assert chain.shape[0] == info.sampling_iters
