"""On-device diagnostics must match the host implementation exactly."""

import jax.numpy as jnp
import numpy as np

from walnuts_tpu.summary import effective_sample_size, monte_carlo_standard_error, r_hat
from walnuts_tpu.summary_device import (
    autocovariance_device,
    effective_sample_size_device,
    mcse_device,
    r_hat_device,
)
from tests.test_summary import make_ar1_chain


def fixture(c=3, n=40, seed0=1):
    return np.stack([make_ar1_chain(n, 0.9, s) for s in range(seed0, seed0 + c)])


class TestDeviceSummary:
    def test_ess_matches_host(self):
        draws = fixture()
        host = effective_sample_size([draws[i] for i in range(draws.shape[0])])
        dev = np.asarray(effective_sample_size_device(jnp.asarray(draws)))
        np.testing.assert_allclose(dev, host, rtol=1e-8)

    def test_ess_chunked_matches_full(self):
        """Dimension-chunked ESS (the wide-posterior memory path) equals
        the full-width computation, including a remainder chunk."""
        from walnuts_tpu.summary_device import (
            effective_sample_size_device_chunked,
        )

        rng = np.random.default_rng(0)
        draws = np.cumsum(rng.standard_normal((3, 40, 7)) * 0.5, axis=1)
        full = np.asarray(effective_sample_size_device(jnp.asarray(draws)))
        chunked = np.asarray(
            effective_sample_size_device_chunked(jnp.asarray(draws), chunk=3)
        )
        np.testing.assert_allclose(chunked, full, rtol=1e-7)

    def test_ess_reference_anchor(self):
        """The deterministic anchor (summary_test.cpp:993-994) through the
        device path."""
        draws = np.stack([make_ar1_chain(20, 0.9, s) for s in (1, 2, 3)])
        dev = np.asarray(effective_sample_size_device(jnp.asarray(draws)))
        np.testing.assert_allclose(dev, [96.2568, 7.3150], atol=5e-4)

    def test_rhat_matches_host(self):
        draws = fixture(c=4, n=30)
        host = r_hat([draws[i] for i in range(4)])
        dev = np.asarray(r_hat_device(jnp.asarray(draws)))
        np.testing.assert_allclose(dev, host, rtol=1e-10)

    def test_mcse_matches_host(self):
        draws = fixture(c=4, n=50, seed0=7)
        host = monte_carlo_standard_error([draws[i] for i in range(4)])
        dev = np.asarray(mcse_device(jnp.asarray(draws)))
        np.testing.assert_allclose(dev, host, rtol=1e-8)

    def test_autocovariance_matches_direct(self):
        rng = np.random.default_rng(3)
        draws = rng.standard_normal((2, 23, 2))
        dev = np.asarray(autocovariance_device(jnp.asarray(draws)))
        for c in range(2):
            centered = draws[c] - draws[c].mean(0)
            for lag in range(23):
                direct = (centered[: 23 - lag] * centered[lag:]).sum(0) / 23
                np.testing.assert_allclose(dev[c, lag], direct, atol=1e-10)

    def test_jittable(self):
        import jax

        draws = jnp.asarray(fixture())
        f = jax.jit(effective_sample_size_device)
        np.testing.assert_allclose(
            np.asarray(f(draws)),
            np.asarray(effective_sample_size_device(draws)),
            rtol=1e-7,
        )
