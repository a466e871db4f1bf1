"""walnuts_tpu: a TPU-native JAX implementation of the WALNUTS sampler.

A from-scratch rebuild of the capabilities of flatironinstitute/walnuts
(the "walnutpie" C++ library) designed for TPU hardware: the transition is
a flat XLA while-loop doing one batched leapfrog per iteration, chains are
a vmapped/sharded batch axis over a device mesh, and the lock-free
cross-chain controllers become block-synchronous collective reductions.
"""

from walnuts_tpu.config import InitConfig, SamplingConfig, WalnutsConfig, WarmupConfig

__version__ = "0.1.0"
