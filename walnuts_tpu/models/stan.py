"""Stan model backend via the native BridgeStan bridge.

Mirrors the reference's Stan path (``python/src/walnutpie/stan.py`` +
``include/walnutpie/load_stan.hpp``): a compiled BridgeStan model shared
object is dlopened by the native bridge (``csrc/stan_bridge.cpp``), which
exposes BATCHED log-density/gradient and constrain operations over a
persistent thread pool. Inside the jitted sampler the model is reached
with one ``jax.pure_callback`` per leapfrog step for the WHOLE chain batch
— the host round-trip is amortized across all chains, the C++ pool fans
rows out over threads (the analog of the reference's thread-per-chain
evaluation; models must be built with ``STAN_THREADS=true``,
stan.py:302-305).

Two entry styles:

- ``walnuts_stan(model, ...)`` accepts a ``bridgestan.StanModel`` (when the
  bridgestan package is installed, as in the reference) OR a path to the
  compiled model ``.so`` plus a data JSON string.
- ``StanBridge`` is the low-level ctypes handle, usable directly.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from dataclasses import dataclass
from typing import Any, List, Optional, Union

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc")

#: Separator used by the reference to join per-chain init JSONs
#: (walnutpy.cpp:224-225, stan.py:157-167).
SEPARATOR = chr(0x1C)


def _bridge_lib_path() -> str:
    return os.path.join(_CSRC, "libwalnuts_stan_bridge.so")


def build_bridge(force: bool = False) -> str:
    """Compile the native bridge shared library on demand (cached)."""
    lib = _bridge_lib_path()
    src = os.path.join(_CSRC, "stan_bridge.cpp")
    if force or not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        subprocess.check_call(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-o", lib, src, "-ldl", "-lpthread",
            ]
        )
    return lib


class StanBridge:
    """ctypes handle to a dlopened BridgeStan model via the native bridge.

    The TPU-native counterpart of ``DynamicStanModel``
    (load_stan.hpp:101-228), plus batching and a thread pool.
    """

    def __init__(
        self,
        model_so: str,
        data: Union[str, dict, None] = None,
        seed: int = 0,
        n_threads: int = 0,
    ):
        self._lib = ctypes.CDLL(build_bridge())
        self._lib.wtpu_stan_open.restype = ctypes.c_void_p
        self._lib.wtpu_stan_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint, ctypes.c_int,
        ]
        self._lib.wtpu_stan_last_error.restype = ctypes.c_char_p
        self._lib.wtpu_stan_close.argtypes = [ctypes.c_void_p]
        self._lib.wtpu_stan_param_unc_num.argtypes = [ctypes.c_void_p]
        self._lib.wtpu_stan_param_num.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        self._lib.wtpu_stan_param_names.restype = ctypes.c_char_p
        self._lib.wtpu_stan_param_names.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        self._lib.wtpu_stan_logp_grad_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        self._lib.wtpu_stan_constrain_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_uint,
        ]
        if isinstance(data, dict):
            data = json.dumps(data)
        data_bytes = (data or "").encode()
        self._handle = self._lib.wtpu_stan_open(
            model_so.encode(), data_bytes, seed, n_threads
        )
        if not self._handle:
            err = self._lib.wtpu_stan_last_error().decode()
            raise RuntimeError(f"failed to load Stan model {model_so}: {err}")

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.wtpu_stan_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    @property
    def param_unc_num(self) -> int:
        return self._lib.wtpu_stan_param_unc_num(self._handle)

    def param_num(self, include_tp: bool = False, include_gq: bool = False) -> int:
        return self._lib.wtpu_stan_param_num(
            self._handle, int(include_tp), int(include_gq)
        )

    def param_names(
        self, include_tp: bool = False, include_gq: bool = False
    ) -> List[str]:
        raw = self._lib.wtpu_stan_param_names(
            self._handle, int(include_tp), int(include_gq)
        )
        return raw.decode().split(",") if raw else []

    def logp_grad_batch(self, theta: np.ndarray):
        """theta (batch, dim) -> (logp (batch,), grad (batch, dim))."""
        theta = np.ascontiguousarray(theta, dtype=np.float64)
        batch, dim = theta.shape
        logp = np.empty(batch, dtype=np.float64)
        grad = np.empty((batch, dim), dtype=np.float64)
        self._lib.wtpu_stan_logp_grad_batch(
            self._handle, batch, dim,
            theta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            logp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            grad.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return logp, grad

    def unconstrain_json(self, json_str: str) -> np.ndarray:
        """Unconstrain one draw given as a JSON dict of constrained values
        (bs_param_unconstrain_json; used for user inits, stan.py:233-236)."""
        self._lib.wtpu_stan_unconstrain_json.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ]
        unc = np.empty(self.param_unc_num, dtype=np.float64)
        rc = self._lib.wtpu_stan_unconstrain_json(
            self._handle, json_str.encode(),
            unc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            err = self._lib.wtpu_stan_last_error().decode()
            raise RuntimeError(f"unconstrain failed: {err}")
        return unc

    def constrain_batch(
        self,
        unc: np.ndarray,
        include_tp: bool = False,
        include_gq: bool = False,
        seed: int = 0,
    ) -> np.ndarray:
        unc = np.ascontiguousarray(unc, dtype=np.float64)
        batch, unc_dim = unc.shape
        con_dim = self.param_num(include_tp, include_gq)
        con = np.empty((batch, con_dim), dtype=np.float64)
        self._lib.wtpu_stan_constrain_batch(
            self._handle, batch, unc_dim, con_dim,
            unc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            con.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(include_tp), int(include_gq), seed,
        )
        return con


def make_stan_logp(bridge: StanBridge):
    """Build a JAX-traceable scalar log density backed by the bridge.

    ``pure_callback`` with ``vmap_method='expand_dims'`` delivers the whole
    vmapped chain batch to one host call; the bridge's thread pool spreads
    rows over cores. The gradient comes from the same batched call through
    a custom JVP (autodiff cannot see through a callback).
    """
    import jax
    import jax.numpy as jnp

    dim = bridge.param_unc_num

    def host_call(theta_np: np.ndarray):
        theta2d = np.atleast_2d(np.asarray(theta_np, dtype=np.float64))
        lead = theta_np.shape[:-1]
        lp, grad = bridge.logp_grad_batch(theta2d.reshape(-1, dim))
        return lp.reshape(lead), grad.reshape(lead + (dim,))

    def call(theta):
        return jax.pure_callback(
            host_call,
            (
                jax.ShapeDtypeStruct(theta.shape[:-1], theta.dtype),
                jax.ShapeDtypeStruct(theta.shape, theta.dtype),
            ),
            theta,
            vmap_method="expand_dims",
        )

    @jax.custom_jvp
    def logp_fn(theta):
        lp, _ = call(theta)
        return lp

    @logp_fn.defjvp
    def _jvp(primals, tangents):
        (theta,), (dtheta,) = primals, tangents
        lp, grad = call(theta)
        return lp, jnp.sum(grad * dtheta, axis=-1)

    return logp_fn, dim


class StanVariable:
    """One Stan variable's slice of the flat constrained row.

    The stanio-equivalent (the reference parses headers with
    ``stanio.parse_header``, stan.py:31): a flat column block plus the
    declared dims recovered from the BridgeStan ``name.i.j`` suffixes,
    reassembled COLUMN-MAJOR (Stan order). ``extract_reshape`` mirrors
    ``stanio.Variable.extract_reshape``.
    """

    def __init__(self, name: str, start: int, dims: tuple):
        self.name = name
        self.start = start
        self.dims = dims
        self.size = int(np.prod(dims, dtype=np.int64)) if dims else 1

    def extract_reshape(self, data: np.ndarray) -> np.ndarray:
        block = data[..., self.start:self.start + self.size]
        if not self.dims:
            return block[..., 0]
        return block.reshape(block.shape[:-1] + self.dims, order="F")


def parse_variables(names: List[str]) -> dict:
    """Group flat BridgeStan column names into :class:`StanVariable`\\ s.

    Names look like ``alpha``, ``v.1`` ... ``v.K``, ``M.1.1`` ... ``M.R.C``
    (indices column-major); the dims are the componentwise maxima of the
    index suffixes. Matches the reference's stanio header parsing
    (/root/reference/python/src/walnutpie/stan.py:31,108-145).
    """
    groups: dict = {}
    order: List[str] = []
    for i, n in enumerate(names):
        parts = n.split(".")
        base_end = len(parts)
        while base_end > 1 and parts[base_end - 1].isdigit():
            base_end -= 1
        base = ".".join(parts[:base_end])
        idx = tuple(int(p) for p in parts[base_end:])
        if base not in groups:
            groups[base] = {"start": i, "idxs": []}
            order.append(base)
        groups[base]["idxs"].append((i, idx))
    out = {}
    for base in order:
        rec = groups[base]
        idxs = rec["idxs"]
        if len(idxs) == 1 and idxs[0][1] == ():
            out[base] = StanVariable(base, rec["start"], ())
            continue
        ndim = len(idxs[0][1])
        dims = tuple(
            max(ix[d] for _, ix in idxs) for d in range(ndim)
        )
        var = StanVariable(base, rec["start"], dims)
        cols = [c for c, _ in idxs]
        if cols != list(range(rec["start"], rec["start"] + var.size)):
            raise ValueError(
                f"parameter {base!r} occupies non-contiguous columns"
            )
        out[base] = var
    return out


@dataclass
class StanOutput:
    """Constrained draws of one chain plus metadata (stan.py:19-145).

    ``parameters`` holds the RAW flat column names; ``variables`` the
    parsed per-variable views (``obj["M"]`` returns draws reshaped to the
    declared dims, column-major, like the reference's stanio-backed
    ``StanOutputBase.get``).
    """

    parameters: List[str]
    data: np.ndarray  # (draws, constrained dim)
    stepsize: Optional[float] = None
    inv_metric: Optional[np.ndarray] = None
    warmup_data: Optional[np.ndarray] = None

    def __post_init__(self):
        self.variables = parse_variables(self.parameters)

    def __getitem__(self, name: str) -> np.ndarray:
        """Draws of one variable, reshaped to its declared dims (a flat
        column name like ``"M.2.1"`` is also accepted)."""
        var = self.variables.get(name)
        if var is not None:
            return var.extract_reshape(self.data)
        try:
            idx = self.parameters.index(name)
        except ValueError as e:
            raise KeyError(name) from e
        return self.data[:, idx]

    def get(self, name: str) -> np.ndarray:
        """Synonym for ``obj[name]`` (StanOutputBase.get, stan.py:51)."""
        return self[name]

    def create_inits(
        self, seed: Optional[int] = None, chains: int = 4
    ) -> List[dict]:
        """Resample draws into init dicts for a follow-up run
        (stan.py:108-145). Array/matrix parameters come back with their
        declared shapes (column-major reassembly), so the dicts are valid
        Stan JSON inits for ANY parameterization, not just vectors."""
        rng = np.random.default_rng(seed)
        rows = rng.choice(self.data.shape[0], size=chains, replace=True)
        return [
            {
                name: var.extract_reshape(self.data[r])
                for name, var in self.variables.items()
            }
            for r in rows
        ]


def walnuts_stan(
    model: Any,
    *,
    data: Union[str, dict, None] = None,
    seed: Optional[int] = None,
    n_threads: int = 0,
    include_tp: bool = False,
    include_gq: bool = False,
    **kwargs,
) -> List[StanOutput]:
    """Sample from a compiled Stan model with adaptive WALNUTS.

    ``model`` is a ``bridgestan.StanModel`` (reference-compatible,
    stan.py:178-211) or a path to the compiled BridgeStan model ``.so``.
    Remaining keyword arguments are forwarded to
    :func:`walnuts_tpu.walnuts`. Draws are returned on the CONSTRAINED
    scale via the bridge's batched ``bs_param_constrain``
    (StanBufferHandler semantics, handlers.hpp:127-154).
    """
    from walnuts_tpu.api import walnuts
    from walnuts_tpu.utils.output import prepare_seed

    seed = prepare_seed(seed)
    if hasattr(model, "lib_path"):  # bridgestan.StanModel
        model_so = model.lib_path
    elif isinstance(model, (str, os.PathLike)):
        model_so = os.fspath(model)
    else:
        raise TypeError(
            "model must be a bridgestan.StanModel or a path to a compiled "
            f"model shared object; got {type(model)!r}"
        )

    bridge = StanBridge(model_so, data=data, seed=seed, n_threads=n_threads)
    logp_fn, dim = make_stan_logp(bridge)

    # constrained-scale init dicts (e.g. from StanOutput.create_inits,
    # stan.py:108-145) are unconstrained through the model
    def _dumps(d):
        # create_inits dicts carry numpy scalars/arrays (declared-shape
        # reassembly); Stan JSON wants plain lists
        return json.dumps(
            d, default=lambda o: o.tolist() if hasattr(o, "tolist") else o
        )

    inits = kwargs.get("inits")
    if isinstance(inits, dict):
        kwargs["inits"] = bridge.unconstrain_json(_dumps(inits))
    elif isinstance(inits, (list, tuple)) and inits and isinstance(inits[0], dict):
        kwargs["inits"] = np.stack(
            [bridge.unconstrain_json(_dumps(d)) for d in inits]
        )

    kwargs.setdefault("num_params", dim)
    kwargs["seed"] = seed
    save_warmup = kwargs.get("save_warmup", False)
    return_info = kwargs.get("return_info", False)
    outputs = walnuts(logp_fn, **kwargs)
    info = None
    if return_info:
        outputs, info = outputs

    names = bridge.param_names(include_tp, include_gq)
    results: List[StanOutput] = []
    for chain in outputs:
        con = bridge.constrain_batch(
            np.asarray(chain), include_tp, include_gq, seed
        )
        warm = None
        if save_warmup and chain.warmup.warmup_draws is not None:
            warm = bridge.constrain_batch(
                np.asarray(chain.warmup.warmup_draws), include_tp, include_gq, seed
            )
        results.append(
            StanOutput(
                parameters=names,
                data=con,
                stepsize=chain.warmup.stepsize,
                inv_metric=chain.warmup.inv_metric,
                warmup_data=warm,
            )
        )
    bridge.close()
    if return_info:
        return results, info
    return results


__all__ = [
    "SEPARATOR",
    "StanBridge",
    "StanOutput",
    "StanVariable",
    "build_bridge",
    "make_stan_logp",
    "parse_variables",
    "walnuts_stan",
]
