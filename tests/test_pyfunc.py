"""walnuts_pyfunc tests, mirroring python/tests/test_pyfunc.py of the
reference: plain-Python callables, the numba-style ``.ctypes`` fast path,
and the ``(ctypes_cfunc, data)`` tuple path (pyfunc.py:215-227), plus the
exception trap."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from walnuts_tpu.api import walnuts_pyfunc

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
CB_SO = os.path.join(CSRC, "libcallback_model.so")
CB_SRC = os.path.join(CSRC, "callback_model.c")

KW = dict(
    num_params=3, num_chains=2, seed=4,
    min_warmup_iter=15, max_warmup_iter=15,
    min_sampling_iter=25, max_sampling_iter=25,
)


def py_logp(theta):
    return -0.5 * float(theta @ theta), -theta


@pytest.fixture(scope="module")
def cb_lib():
    """A std-normal log density compiled to the nutpie RawLogpFunc C
    signature (walnutpy.cpp:127-132); data carries an inverse-variance."""
    if not os.path.exists(CB_SRC):
        with open(CB_SRC, "w") as f:
            f.write(
                "#include <stddef.h>\n"
                "int logp_cb(size_t n, const double* theta, double* grad,\n"
                "            double* lp, void* data) {\n"
                "  double iv = data ? *(double*)data : 1.0;\n"
                "  double acc = 0.0;\n"
                "  for (size_t i = 0; i < n; ++i) {\n"
                "    grad[i] = -iv * theta[i];\n"
                "    acc += theta[i] * theta[i];\n"
                "  }\n"
                "  *lp = -0.5 * iv * acc;\n"
                "  return 0;\n"
                "}\n"
                "int logp_fail(size_t n, const double* theta, double* grad,\n"
                "              double* lp, void* data) {\n"
                "  (void)n; (void)theta; (void)grad; (void)lp; (void)data;\n"
                "  return 1;\n"
                "}\n"
            )
    if not os.path.exists(CB_SO) or os.path.getmtime(CB_SO) < os.path.getmtime(CB_SRC):
        subprocess.check_call(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", CB_SO, CB_SRC]
        )
    lib = ctypes.CDLL(CB_SO)
    proto = ctypes.CFUNCTYPE(
        ctypes.c_int, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_void_p,
    )
    return proto(("logp_cb", lib)), proto(("logp_fail", lib))


class TestPyfunc:
    def test_plain_callable(self):
        out = walnuts_pyfunc(py_logp, **KW)
        draws = np.stack([np.asarray(c) for c in out])
        assert draws.shape == (2, 25, 3)
        assert np.isfinite(draws).all()

    def test_raising_callable_traps_to_rejection(self):
        def bad(theta):
            if theta[0] > 0.2:
                raise RuntimeError("boom")
            return -0.5 * float(theta @ theta), -theta

        out = walnuts_pyfunc(bad, **KW)
        draws = np.stack([np.asarray(c) for c in out])
        assert np.isfinite(draws).all()

    def test_ctypes_tuple_path_matches_python(self, cb_lib):
        """(cfunc, None): identical model and seed as the plain-callable
        path -> identical draws (same sampler, same evaluations)."""
        cfunc, _ = cb_lib
        out_c = walnuts_pyfunc((cfunc, None), **KW)
        out_p = walnuts_pyfunc(py_logp, **KW)
        for a, b in zip(out_c, out_p):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_ctypes_data_argument(self, cb_lib):
        """data rides through as the void* argument: inverse variance 4
        -> posterior sd 1/2."""
        cfunc, _ = cb_lib
        iv = ctypes.c_double(4.0)
        kw = dict(KW, min_warmup_iter=100, max_warmup_iter=100,
                  min_sampling_iter=300, max_sampling_iter=300)
        out = walnuts_pyfunc((cfunc, iv), **kw)
        draws = np.stack([np.asarray(c) for c in out])
        assert abs(draws.std() - 0.5) < 0.08

    def test_cfunc_attribute_fast_path(self, cb_lib):
        """Anything carrying .ctypes (the numba @cfunc duck type,
        pyfunc.py:215-217) dispatches through the C fast path."""
        cfunc, _ = cb_lib

        class FakeNumbaCfunc:
            ctypes = cfunc

        out = walnuts_pyfunc(FakeNumbaCfunc(), **KW)
        assert np.isfinite(np.stack([np.asarray(c) for c in out])).all()

    def test_error_code_traps_to_rejection(self, cb_lib):
        _, fail = cb_lib
        out = walnuts_pyfunc((fail, None), **KW)
        draws = np.stack([np.asarray(c) for c in out])
        # every evaluation fails -> chains never move but stay finite
        assert np.isfinite(draws).all()
