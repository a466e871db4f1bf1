"""Config validation tests (mirroring config_test.cpp's default and
throw-on-invalid coverage; bad-value lists follow test_util.hpp:35-66)."""

import math

import pytest

from walnuts_tpu.config import InitConfig, SamplingConfig, WalnutsConfig, WarmupConfig

INF = float("inf")
NAN = float("nan")

BAD_POSITIVE = [INF, -INF, NAN, -1.0, 0.0]
BAD_NONNEGATIVE = [INF, -INF, NAN, -1.0]


class TestSamplingConfigDefaults:
    def test_defaults(self):
        cfg = SamplingConfig()
        assert cfg.min_iter == 50
        assert cfg.max_iter == 1000
        assert cfg.max_trajectory_doublings == 5
        assert cfg.max_step_halvings == 5
        assert cfg.min_micro_steps == 1
        assert cfg.max_hamiltonian_error == 0.5
        assert cfg.rhat_converge_tol == 1.01


class TestWarmupConfigDefaults:
    def test_defaults(self):
        cfg = WarmupConfig()
        assert cfg.min_iter == 50
        assert cfg.max_iter == 1000
        assert cfg.step_size_converge_tol == 0.1
        assert cfg.mass_converge_tol == 1.0
        assert cfg.mass_init_count == 4.0
        assert cfg.mass_additive_smoothing == 1e-5
        assert cfg.max_macro_steps_target == 15.0
        assert cfg.step_accept_rate_target == 0.8
        assert cfg.step_learning_rate == 0.05
        assert cfg.step_gradient_decay == 0.8
        assert cfg.step_sq_gradient_decay == 0.9
        assert cfg.step_stabilization == 1e-4
        assert cfg.step_learn_rate_decay == 0.5


class TestValidation:
    def test_iter_ordering(self):
        with pytest.raises(ValueError):
            SamplingConfig(min_iter=10, max_iter=5)
        with pytest.raises(ValueError):
            WarmupConfig(min_iter=10, max_iter=5)

    @pytest.mark.parametrize("bad", [0, -1])
    def test_positive_ints(self, bad):
        with pytest.raises(ValueError):
            SamplingConfig(max_trajectory_doublings=bad)
        with pytest.raises(ValueError):
            SamplingConfig(max_step_halvings=bad)
        with pytest.raises(ValueError):
            SamplingConfig(min_micro_steps=bad)

    @pytest.mark.parametrize("bad", BAD_POSITIVE)
    def test_positive_floats(self, bad):
        with pytest.raises(ValueError):
            SamplingConfig(max_hamiltonian_error=bad)
        with pytest.raises(ValueError):
            WarmupConfig(step_size_converge_tol=bad)
        with pytest.raises(ValueError):
            WarmupConfig(mass_converge_tol=bad)
        with pytest.raises(ValueError):
            WarmupConfig(mass_init_count=bad)
        with pytest.raises(ValueError):
            WarmupConfig(max_macro_steps_target=bad)
        with pytest.raises(ValueError):
            WarmupConfig(step_learning_rate=bad)
        with pytest.raises(ValueError):
            InitConfig(init_radius=bad)

    @pytest.mark.parametrize("bad", BAD_NONNEGATIVE)
    def test_nonnegative_floats(self, bad):
        with pytest.raises(ValueError):
            WarmupConfig(mass_additive_smoothing=bad)
        with pytest.raises(ValueError):
            WarmupConfig(step_stabilization=bad)
        with pytest.raises(ValueError):
            WarmupConfig(step_learn_rate_decay=bad)

    @pytest.mark.parametrize("bad", [0.0, 1.0, -0.5, 1.5, NAN])
    def test_accept_rate_in_open_interval(self, bad):
        with pytest.raises(ValueError):
            WarmupConfig(step_accept_rate_target=bad)

    @pytest.mark.parametrize("bad", [1.0, 0.99, NAN, INF])
    def test_rhat_tol_greater_than_one(self, bad):
        with pytest.raises(ValueError):
            SamplingConfig(rhat_converge_tol=bad)

    def test_bundle_constructs(self):
        cfg = WalnutsConfig()
        assert cfg.warmup.max_iter == 1000
        assert cfg.sampling.max_iter == 1000
        assert cfg.init.init_radius == 2.0

    def test_frozen(self):
        cfg = SamplingConfig()
        with pytest.raises(Exception):
            cfg.max_iter = 7  # type: ignore[misc]

    def test_to_kwargs_drives_walnuts(self):
        """WalnutsConfig.to_kwargs() flattens into valid walnuts() kwargs
        (the single-tier analog of walnutpy.cpp:134-149) and a config-driven
        run honors the iteration bounds."""
        import inspect

        import jax.numpy as jnp

        from walnuts_tpu.api import walnuts
        from walnuts_tpu.config import InitConfig

        cfg = WalnutsConfig(
            init=InitConfig(init_radius=0.5),
            warmup=WarmupConfig(min_iter=8, max_iter=8),
            sampling=SamplingConfig(min_iter=6, max_iter=6,
                                    max_trajectory_doublings=3,
                                    max_step_halvings=3),
        )
        kw = cfg.to_kwargs()
        sig = set(inspect.signature(walnuts).parameters)
        assert set(kw).issubset(sig)
        outs, info = walnuts(
            lambda t: -0.5 * jnp.sum(t * t),
            num_params=2, num_chains=2, seed=3, return_info=True, **kw,
        )
        assert info.warmup_iters == 8
        assert info.sampling_iters == 6
        assert outs[0].shape == (6, 2)
