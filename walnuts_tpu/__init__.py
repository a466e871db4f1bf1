"""walnuts_tpu: a TPU-native JAX implementation of the WALNUTS sampler.

A from-scratch rebuild of the capabilities of flatironinstitute/walnuts
(the "walnutpie" C++ library) designed for TPU hardware: the transition is
a flat XLA while-loop doing one batched leapfrog per iteration, chains are
a vmapped/sharded batch axis over a device mesh, and the lock-free
cross-chain controllers become block-synchronous collective reductions.

Public surface mirrors the reference Python package
(python/src/walnutpie/__init__.py): ``walnuts_pyfunc``-style sampling via
:func:`walnuts`, the :class:`Summarizer` diagnostics API, and the free
statistics functions.
"""

from walnuts_tpu.api import walnuts, walnuts_pyfunc
from walnuts_tpu.config import InitConfig, SamplingConfig, WalnutsConfig, WarmupConfig
from walnuts_tpu.parallel.checkpoint import BlockCheckpointer
from walnuts_tpu.parallel.runtime import RunInfo
from walnuts_tpu.summary import (
    Summarizer,
    effective_sample_size,
    ess,
    mcse,
    mean,
    monte_carlo_standard_error,
    quantiles,
    r_hat,
    standard_deviation,
    variance,
)
from walnuts_tpu.utils.output import WalnutsOutputArray, WarmupInfo

try:  # optional: requires the bridgestan package and a C++ toolchain
    from walnuts_tpu.models.stan import walnuts_stan
except Exception:  # pragma: no cover - mirrors reference __init__.py:3-10
    def walnuts_stan(*args, **kwargs):  # type: ignore
        raise ImportError(
            "walnuts_stan requires the 'bridgestan' package to be installed"
        )

__version__ = "0.2.0"

__all__ = [
    "BlockCheckpointer",
    "InitConfig",
    "RunInfo",
    "SamplingConfig",
    "Summarizer",
    "WalnutsConfig",
    "WalnutsOutputArray",
    "WarmupConfig",
    "WarmupInfo",
    "effective_sample_size",
    "ess",
    "mcse",
    "mean",
    "monte_carlo_standard_error",
    "quantiles",
    "r_hat",
    "standard_deviation",
    "variance",
    "walnuts",
    "walnuts_pyfunc",
    "walnuts_stan",
]
