"""Pallas fused-kernel tests (interpret mode on CPU) and the fused API path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu.models import logistic_regression
from walnuts_tpu.ops.math import make_logp_grad
from walnuts_tpu.ops.pallas_kernels import logistic_regression_fused


@pytest.fixture(scope="module")
def fused_and_ref():
    fused, dim = logistic_regression_fused(interpret=True)
    ref_logp, _ = logistic_regression()
    return fused, make_logp_grad(ref_logp), dim


class TestFusedLogReg:
    def test_matches_xla_batched(self, fused_and_ref):
        fused, ref, dim = fused_and_ref
        theta = 0.3 * jax.random.normal(jax.random.key(0), (8, dim), dtype=jnp.float32)
        lp_f, g_f = jax.vmap(fused)(theta)
        lp_r, g_r = jax.vmap(ref)(theta)
        np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=2e-3)

    def test_matches_xla_unbatched(self, fused_and_ref):
        fused, ref, dim = fused_and_ref
        theta = 0.2 * jax.random.normal(jax.random.key(1), (dim,), dtype=jnp.float32)
        lp_f, g_f = fused(theta)
        lp_r, g_r = ref(theta)
        assert float(jnp.abs(lp_f - lp_r)) < 1e-2
        assert float(jnp.max(jnp.abs(g_f - g_r))) < 2e-3

    def test_batch_not_multiple_of_block(self, fused_and_ref):
        """Padding path: batch sizes that don't divide the block size."""
        fused, ref, dim = fused_and_ref
        theta = 0.1 * jax.random.normal(jax.random.key(2), (3, dim), dtype=jnp.float32)
        lp_f, _ = jax.vmap(fused)(theta)
        lp_r, _ = jax.vmap(ref)(theta)
        np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_r), rtol=1e-5)


class TestFusedSampling:
    def test_walnuts_fused_path(self, fused_and_ref):
        """The fused=True API path samples the same posterior as the
        autodiff path."""
        from walnuts_tpu import walnuts

        fused, _, dim = fused_and_ref
        out = walnuts(
            fused, num_params=dim, num_chains=2, seed=3, fused=True,
            dtype=jnp.float32,
            min_warmup_iter=15, max_warmup_iter=15,
            min_sampling_iter=25, max_sampling_iter=25,
        )
        draws = np.concatenate([np.asarray(c) for c in out], axis=0)
        assert np.isfinite(draws).all()
        assert draws.shape == (50, dim)
        # posterior is concentrated near the MAP; draws should be small
        assert np.abs(draws).max() < 3.0
