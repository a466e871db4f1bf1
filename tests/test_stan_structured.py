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


@pytest.fixture(scope="module", autouse=True)
def built_artifacts():
    from walnuts_tpu.models.stan import build_bridge

    build_bridge()
    src = os.path.join(CSRC, "abi_models.cpp")
    if not os.path.exists(MATRIX_SO) or os.path.getmtime(
        MATRIX_SO
    ) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             "-DABI_MODEL_MATRIX", "-o", MATRIX_SO, src]
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
