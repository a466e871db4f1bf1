"""Structured (array/matrix) Stan parameter handling.

The reference parses constrained-output headers with stanio
(/root/reference/python/src/walnutpie/stan.py:31,108-145): dotted names
like ``M.2.3`` become variables with declared dims, reassembled
COLUMN-MAJOR, and ``create_inits`` emits correctly-shaped init dicts.
These tests cover the stanio-equivalent parser (``parse_variables``) and
the full round trip on a BridgeStan-ABI model exposing a scalar + vector
+ 2x3 matrix (csrc/abi_models.cpp ABI_MODEL_MATRIX), including
unconstraining ``create_inits`` output through the model's
``bs_param_unconstrain_json``.
"""

import os
import subprocess

import numpy as np
import pytest

from walnuts_tpu.models.stan import StanOutput, parse_variables

CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc"
)
MATRIX_SO = os.path.join(CSRC, "libabi_matrix.so")
CONSTRAINED_SO = os.path.join(CSRC, "libabi_constrained.so")


@pytest.fixture(scope="module", autouse=True)
def built_artifacts():
    from walnuts_tpu.models.stan import build_bridge

    build_bridge()
    src = os.path.join(CSRC, "abi_models.cpp")
    for so, macro in [(MATRIX_SO, "MATRIX"), (CONSTRAINED_SO, "CONSTRAINED")]:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.check_call(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 f"-DABI_MODEL_{macro}", "-o", so, src]
            )


class TestParseVariables:
    def test_scalar_vector_matrix(self):
        names = ["alpha", "v.1", "v.2", "v.3",
                 "M.1.1", "M.2.1", "M.1.2", "M.2.2", "M.1.3", "M.2.3"]
        out = parse_variables(names)
        assert list(out) == ["alpha", "v", "M"]
        assert out["alpha"].dims == () and out["alpha"].start == 0
        assert out["v"].dims == (3,) and out["v"].start == 1
        assert out["M"].dims == (2, 3) and out["M"].start == 4

    def test_column_major_reassembly(self):
        names = ["M.1.1", "M.2.1", "M.1.2", "M.2.2", "M.1.3", "M.2.3"]
        var = parse_variables(names)["M"]
        row = np.arange(6.0)
        m = var.extract_reshape(row)
        # column-major: M[r, c] = flat[c * 2 + r]
        expected = np.array([[0.0, 2.0, 4.0], [1.0, 3.0, 5.0]])
        np.testing.assert_array_equal(m, expected)

    def test_3d_array(self):
        names = [
            f"T.{i}.{j}.{k}"
            for k in (1, 2)
            for j in (1, 2)
            for i in (1, 2)
        ]
        var = parse_variables(names)["T"]
        assert var.dims == (2, 2, 2)
        t = var.extract_reshape(np.arange(8.0))
        assert t[0, 0, 0] == 0.0 and t[1, 0, 0] == 1.0 and t[0, 1, 0] == 2.0
        assert t[0, 0, 1] == 4.0

    def test_length_one_vector(self):
        out = parse_variables(["x.1", "y"])
        assert out["x"].dims == (1,)
        assert out["y"].dims == ()

    def test_batch_extraction(self):
        names = ["a", "v.1", "v.2"]
        out = parse_variables(names)
        data = np.arange(12.0).reshape(4, 3)
        np.testing.assert_array_equal(out["a"].extract_reshape(data), data[:, 0])
        np.testing.assert_array_equal(out["v"].extract_reshape(data), data[:, 1:])


class TestStanOutputStructured:
    NAMES = ["sigma", "v.1", "v.2",
             "M.1.1", "M.2.1", "M.1.2", "M.2.2", "M.1.3", "M.2.3"]

    def make_output(self):
        data = np.arange(18.0).reshape(2, 9) + 1.0
        return StanOutput(parameters=self.NAMES, data=data)

    def test_getitem_shapes(self):
        out = self.make_output()
        assert out["sigma"].shape == (2,)
        assert out["v"].shape == (2, 2)
        assert out["M"].shape == (2, 2, 3)
        # column-major: draw 0 flat block 4..9 -> M[0][1, 0] == flat[1]
        assert out["M"][0, 1, 0] == out.data[0, 4]
        assert out["M"][0, 0, 1] == out.data[0, 5]
        # raw dotted names still resolve
        np.testing.assert_array_equal(out["M.2.1"], out.data[:, 4])

    def test_create_inits_shapes(self):
        out = self.make_output()
        inits = out.create_inits(seed=0, chains=3)
        assert len(inits) == 3
        for d in inits:
            assert set(d) == {"sigma", "v", "M"}
            assert np.shape(d["sigma"]) == ()
            assert np.shape(d["v"]) == (2,)
            assert np.shape(d["M"]) == (2, 3)
            # values must come from one stored draw, correctly mapped
            row = 0 if d["sigma"] == out.data[0, 0] else 1
            np.testing.assert_array_equal(
                np.asarray(d["M"]),
                out.data[row, 3:9].reshape(2, 3, order="F"),
            )


class TestMatrixModelRoundTrip:
    def test_names_and_round_trip(self):
        """create_inits dicts (row-major JSON arrays) unconstrain through
        the model back to the exact unconstrained vector."""
        import json

        from walnuts_tpu.models.stan import StanBridge

        b = StanBridge(MATRIX_SO)
        names = b.param_names()
        assert names == TestStanOutputStructured.NAMES
        unc = np.array([0.3, -1.0, 2.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        con = b.constrain_batch(unc[None], False, False, 1)[0]
        out = StanOutput(parameters=names, data=con[None])
        d = out.create_inits(seed=0, chains=1)[0]
        assert d["sigma"] == pytest.approx(np.exp(0.3))
        js = json.dumps(
            d, default=lambda o: o.tolist() if hasattr(o, "tolist") else o
        )
        unc_back = b.unconstrain_json(js)
        np.testing.assert_allclose(unc_back, unc, rtol=0, atol=1e-12)
        b.close()

    def test_walnuts_stan_structured_end_to_end(self):
        """Full sampling on the matrix model; structured extraction and
        re-initialising a second run from create_inits."""
        from walnuts_tpu.models.stan import walnuts_stan

        kw = dict(
            num_chains=2, seed=5,
            min_warmup_iter=10, max_warmup_iter=10,
            min_sampling_iter=10, max_sampling_iter=10, block_size=5,
        )
        outs = walnuts_stan(MATRIX_SO, **kw)
        assert outs[0]["M"].shape == (10, 2, 3)
        assert np.all(outs[0]["sigma"] > 0)
        inits = outs[0].create_inits(seed=1, chains=2)
        outs2 = walnuts_stan(MATRIX_SO, inits=inits, **kw)
        assert outs2[0]["M"].shape == (10, 2, 3)


def simplex_constrain_oracle(y):
    """Stan math simplex_constrain (stick-breaking), independent NumPy
    reimplementation: z_k = inv_logit(y_k - log(N - k)), N = K-1."""
    n = y.shape[0]
    x = np.empty(n + 1)
    stick = 1.0
    for k in range(n):
        z = 1.0 / (1.0 + np.exp(-(y[k] - np.log(n - k))))
        x[k] = stick * z
        stick -= x[k]
    x[n] = stick
    return x


def chol_corr_constrain_oracle(y, K):
    """Stan math cholesky_corr_constrain: z = tanh(y) filled row-wise
    below the diagonal with unit-norm rows."""
    L = np.zeros((K, K))
    L[0, 0] = 1.0
    k = 0
    for i in range(1, K):
        L[i, 0] = np.tanh(y[k]); k += 1
        sum_sqs = L[i, 0] ** 2
        for j in range(1, i):
            L[i, j] = np.tanh(y[k]) * np.sqrt(1.0 - sum_sqs); k += 1
            sum_sqs += L[i, j] ** 2
        L[i, i] = np.sqrt(1.0 - sum_sqs)
    return L


class TestConstrainedTransforms:
    """Dimension-changing Stan parameterizations (simplex,
    cholesky_factor_corr) through the full FFI path — the closest
    exercise of the reference's real-Stan-model constrain/unconstrain
    (load_stan.hpp:101-228) obtainable without a Stan toolchain."""

    NAMES = ["p.1", "p.2", "p.3", "p.4",
             "L.1.1", "L.2.1", "L.3.1", "L.1.2", "L.2.2", "L.3.2",
             "L.1.3", "L.2.3", "L.3.3"]

    def make_bridge(self):
        from walnuts_tpu.models.stan import StanBridge

        return StanBridge(CONSTRAINED_SO)

    def test_dims_and_names(self):
        b = self.make_bridge()
        assert b.param_unc_num == 6
        assert b.param_num() == 13
        assert b.param_names() == self.NAMES
        b.close()

    def test_constrain_matches_stan_oracle(self):
        """The C++ transforms agree with an independent NumPy
        reimplementation of Stan math's formulas, and the outputs are
        valid (simplex sums to 1; L is a correlation-matrix Cholesky
        factor: lower-triangular, unit-norm rows, positive diagonal)."""
        b = self.make_bridge()
        rng = np.random.default_rng(7)
        for _ in range(5):
            y = rng.normal(size=6) * 1.5
            con = b.constrain_batch(y[None])[0]
            p, l_cols = con[:4], con[4:]
            np.testing.assert_allclose(
                p, simplex_constrain_oracle(y[:3]), rtol=0, atol=1e-14)
            L = l_cols.reshape(3, 3, order="F")  # column-major flat row
            np.testing.assert_allclose(
                L, chol_corr_constrain_oracle(y[3:], 3), rtol=0, atol=1e-14)
            assert np.all(p > 0) and np.isclose(p.sum(), 1.0)
            np.testing.assert_allclose(np.triu(L, 1), 0.0, atol=0)
            np.testing.assert_allclose(
                np.diag(L @ L.T), 1.0, rtol=0, atol=1e-12)
            assert np.all(np.diag(L) > 0)
        b.close()

    def test_create_inits_round_trip(self):
        """create_inits reassembles p (4,) and L (3, 3); the dict
        unconstrains through the model back to the exact y."""
        import json

        from walnuts_tpu.models.stan import StanOutput

        b = self.make_bridge()
        y = np.array([0.4, -1.2, 0.9, 0.3, -0.8, 1.1])
        con = b.constrain_batch(y[None])[0]
        out = StanOutput(parameters=b.param_names(), data=con[None])
        assert out["p"].shape == (1, 4)
        assert out["L"].shape == (1, 3, 3)
        d = out.create_inits(seed=0, chains=1)[0]
        assert np.shape(d["p"]) == (4,) and np.shape(d["L"]) == (3, 3)
        js = json.dumps(
            d, default=lambda o: o.tolist() if hasattr(o, "tolist") else o
        )
        y_back = b.unconstrain_json(js)
        np.testing.assert_allclose(y_back, y, rtol=0, atol=1e-10)
        b.close()

    def test_invalid_inits_rejected(self):
        """Constraint-violating init dicts fail cleanly (reference:
        bs_param_unconstrain_json error trap, load_stan.hpp)."""
        b = self.make_bridge()
        good_L = [[1.0, 0.0, 0.0], [0.5, 0.8660254037844386, 0.0],
                  [0.0, 0.0, 1.0]]
        for bad in [
            '{"p": [0.5, 0.5, 0.5, 0.5], "L": %s}' % good_L,   # sum != 1
            '{"p": [0.7, 0.3, 0.0, 0.0], "L": %s}' % good_L,   # zero entry
            '{"p": [0.25, 0.25, 0.25, 0.25], "L": [[1, 0.3, 0],'
            ' [0.5, 0.866, 0], [0, 0, 1]]}',                   # not lower-tri
        ]:
            with pytest.raises(RuntimeError, match="unconstrain"):
                b.unconstrain_json(bad.replace("'", '"'))
        b.close()

    def test_walnuts_stan_constrained_end_to_end(self):
        """Sampling with con-dim != unc-dim: every returned draw is a
        valid simplex + Cholesky factor, and a second run initialises
        from create_inits dicts."""
        from walnuts_tpu.models.stan import walnuts_stan

        kw = dict(
            num_chains=2, seed=11,
            min_warmup_iter=10, max_warmup_iter=10,
            min_sampling_iter=10, max_sampling_iter=10, block_size=5,
        )
        outs = walnuts_stan(CONSTRAINED_SO, **kw)
        p = outs[0]["p"]
        L = outs[0]["L"]
        assert p.shape == (10, 4) and L.shape == (10, 3, 3)
        assert np.all(p > 0)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=0, atol=1e-12)
        gram_diag = np.einsum("dij,dij->di", L, L)
        np.testing.assert_allclose(gram_diag, 1.0, rtol=0, atol=1e-10)
        inits = outs[0].create_inits(seed=3, chains=2)
        outs2 = walnuts_stan(CONSTRAINED_SO, inits=inits, **kw)
        assert outs2[0]["p"].shape == (10, 4)
