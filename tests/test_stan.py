"""Stan-backend tests, mirroring python/tests/test_stan.py of the
reference but using a fake BridgeStan model shared object (the bs_* C ABI
implemented by csrc/fake_stan_model.cpp) so no Stan toolchain is needed."""

import os
import subprocess

import numpy as np
import pytest

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
FAKE_SO = os.path.join(CSRC, "libfake_stan_model.so")


@pytest.fixture(scope="module", autouse=True)
def built_artifacts():
    from walnuts_tpu.models.stan import build_bridge

    build_bridge()
    src = os.path.join(CSRC, "fake_stan_model.cpp")
    if not os.path.exists(FAKE_SO) or os.path.getmtime(FAKE_SO) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", FAKE_SO, src]
        )


class TestStanBridge:
    def test_open_and_introspect(self):
        from walnuts_tpu.models.stan import StanBridge

        b = StanBridge(FAKE_SO)
        assert b.param_unc_num == 3
        assert b.param_num() == 3
        assert b.param_names() == ["mu", "sigma", "z"]
        b.close()

    def test_batched_logp_grad(self):
        from walnuts_tpu.models.stan import StanBridge

        b = StanBridge(FAKE_SO, n_threads=2)
        theta = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0], [1.0, 1.0, 1.0]])
        lp, grad = b.logp_grad_batch(theta)
        np.testing.assert_allclose(lp, [-0.5, -2.0, -1.5])
        np.testing.assert_allclose(grad, -theta)
        b.close()

    def test_error_rows_become_neg_inf(self):
        """A failing model evaluation yields -inf / zero gradient for that
        row only (load_stan.hpp:132-146 semantics)."""
        from walnuts_tpu.models.stan import StanBridge

        b = StanBridge(FAKE_SO, data='{"bad_region": true}')
        theta = np.array([[3.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        lp, grad = b.logp_grad_batch(theta)
        assert lp[0] == -np.inf
        np.testing.assert_array_equal(grad[0], 0.0)
        assert lp[1] == pytest.approx(-0.5)
        b.close()

    def test_constrain_batch(self):
        from walnuts_tpu.models.stan import StanBridge

        b = StanBridge(FAKE_SO)
        unc = np.array([[0.5, 0.0, -1.0], [0.0, 1.0, 2.0]])
        con = b.constrain_batch(unc)
        np.testing.assert_allclose(con[:, 0], unc[:, 0])
        np.testing.assert_allclose(con[:, 1], np.exp(unc[:, 1]))
        np.testing.assert_allclose(con[:, 2], unc[:, 2])
        b.close()

    def test_missing_library_raises(self):
        from walnuts_tpu.models.stan import StanBridge

        with pytest.raises(RuntimeError):
            StanBridge("/nonexistent/model.so")


class TestWalnutsStan:
    def test_end_to_end(self):
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=5, num_chains=2,
            min_warmup_iter=20, max_warmup_iter=20,
            min_sampling_iter=50, max_sampling_iter=50,
            save_inv_metric=True,
        )
        assert len(out) == 2
        assert out[0].parameters == ["mu", "sigma", "z"]
        assert out[0].data.shape == (50, 3)
        # sigma is returned on the constrained (positive) scale
        assert (out[0]["sigma"] > 0).all()
        assert out[0].stepsize > 0
        assert out[0].inv_metric.shape == (3,)

    def test_checkpoint_resume_through_ffi(self, tmp_path):
        """Checkpoint/resume composes with the FFI model path: a rerun
        on the finished checkpoint replays the identical constrained
        draws without resampling."""
        import numpy as np

        from walnuts_tpu.models.stan import walnuts_stan

        kwargs = dict(
            seed=5, num_chains=2,
            min_warmup_iter=12, max_warmup_iter=12,
            min_sampling_iter=12, max_sampling_iter=12,
            block_size=4, checkpoint_dir=str(tmp_path / "ck"),
        )
        first = walnuts_stan(FAKE_SO, **kwargs)
        second = walnuts_stan(FAKE_SO, **kwargs)
        for a, b in zip(first, second):
            np.testing.assert_array_equal(a.data, b.data)

    def test_abi_model_eight_schools_parity(self):
        """A nontrivial BridgeStan-ABI model (csrc/abi_models.cpp eight
        schools, matching targets.eight_schools exactly): the FFI path
        must produce the SAME gradient counts and statistically matching
        draws as the JAX-autodiff path with the same seed."""
        from walnuts_tpu.api import walnuts
        from walnuts_tpu.models import eight_schools
        from walnuts_tpu.models.stan import walnuts_stan

        so = os.path.join(CSRC, "libabi_eight_schools.so")
        src = os.path.join(CSRC, "abi_models.cpp")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.check_call([
                "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                "-DABI_MODEL_EIGHT_SCHOOLS", "-o", so, src,
            ])

        kw = dict(seed=31, num_chains=2,
                  min_warmup_iter=30, max_warmup_iter=30,
                  min_sampling_iter=40, max_sampling_iter=40,
                  return_info=True)
        outs_ffi, info_ffi = walnuts_stan(so, **kw)
        logp, dim = eight_schools()
        outs_jax, info_jax = walnuts(logp, num_params=dim, **kw)
        np.testing.assert_array_equal(info_ffi.n_grads, info_jax.n_grads)
        assert outs_ffi[0].parameters[:2] == ["mu", "tau"]
        assert (outs_ffi[0]["tau"] > 0).all()
        # identical seeds + identical densities: the unconstrained chains
        # agree up to float accumulation differences
        for o_f, o_j in zip(outs_ffi, outs_jax):
            mu_ffi = o_f["mu"]
            mu_jax = np.asarray(o_j)[:, 0]
            np.testing.assert_allclose(mu_ffi, mu_jax, rtol=1e-3, atol=1e-3)

    def test_iteration_contract(self):
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=6, num_chains=2,
            min_warmup_iter=5, max_warmup_iter=8,
            min_sampling_iter=10, max_sampling_iter=14, block_size=2,
        )
        assert 10 <= out[0].data.shape[0] <= 14

    def test_create_inits(self):
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=7, num_chains=2,
            min_warmup_iter=5, max_warmup_iter=5,
            min_sampling_iter=10, max_sampling_iter=10,
        )
        inits = out[0].create_inits(seed=1, chains=3)
        assert len(inits) == 3
        assert set(inits[0].keys()) == {"mu", "sigma", "z"}

    def test_bad_model_type(self):
        from walnuts_tpu.models.stan import walnuts_stan

        with pytest.raises(TypeError):
            walnuts_stan(12345)

    def test_unknown_parameter_keyerror(self):
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=8, num_chains=2,
            min_warmup_iter=2, max_warmup_iter=2,
            min_sampling_iter=3, max_sampling_iter=3,
        )
        with pytest.raises(KeyError):
            out[0]["nope"]


class TestInitDicts:
    def test_constrained_init_dicts_unconstrained_via_model(self):
        """walnuts_stan accepts create_inits-style constrained dicts
        (stan.py:233-236 semantics)."""
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=9, num_chains=2,
            min_warmup_iter=3, max_warmup_iter=3,
            min_sampling_iter=4, max_sampling_iter=4,
        )
        inits = out[0].create_inits(seed=2, chains=2)
        out2 = walnuts_stan(
            FAKE_SO, seed=10, num_chains=2, inits=inits,
            min_warmup_iter=3, max_warmup_iter=3,
            min_sampling_iter=4, max_sampling_iter=4,
        )
        assert out2[0].data.shape == (4, 3)

    def test_single_dict_init(self):
        from walnuts_tpu.models.stan import walnuts_stan

        out = walnuts_stan(
            FAKE_SO, seed=11, num_chains=2,
            inits={"mu": 0.5, "sigma": 1.0, "z": -0.2},
            min_warmup_iter=2, max_warmup_iter=2,
            min_sampling_iter=3, max_sampling_iter=3,
        )
        assert len(out) == 2
