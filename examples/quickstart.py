"""Quickstart: the full walnuts-tpu workflow on one page.

Mirrors the reference's example notebook (docs/example.ipynb): define a
target, sample with adaptive WALNUTS, summarize, warm-start a second run.
Run with: python examples/quickstart.py [--cpu]
"""

import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from walnuts_tpu import Summarizer, walnuts

# ---------------------------------------------------------------- target
# Any JAX-traceable function theta -> unnormalized log density. Here, a
# correlated Gaussian: x1 ~ N(0,1), x2 | x1 ~ N(0.8 x1, 0.36).


def logp(theta):
    x1, x2 = theta[0], theta[1]
    return -0.5 * (x1**2 + (x2 - 0.8 * x1) ** 2 / 0.36)


# ---------------------------------------------------------------- sample
chains = walnuts(
    logp,
    num_params=2,
    num_chains=8,
    seed=2026,
    max_warmup_iter=400,
    max_sampling_iter=1000,
    save_inv_metric=True,
    save_warmup=True,
)

# each chain is an ndarray of draws with a .warmup attribute
print(f"chains: {len(chains)}, draws per chain: {chains[0].shape[0]}")
print(f"adapted step size (chain 0): {chains[0].warmup.stepsize:.3f}")
print(f"adapted inverse metric (chain 0): {chains[0].warmup.inv_metric.round(3)}")

# ------------------------------------------------------------- summarize
s = Summarizer([np.asarray(c) for c in chains])
print("\nposterior summary:")
print("  mean:", s.mean().round(3), "(truth: [0, 0])")
print("  sd:  ", s.standard_deviation().round(3), "(truth: [1, 1])")
print("  corr: %.3f (truth: 0.8)"
      % np.corrcoef(np.concatenate(chains).T)[0, 1])
print("  ESS: ", s.ess().round(0))
print("  Rhat:", s.r_hat().round(4))
print("  MCSE:", s.mcse().round(4))

# ------------------------------------------------------------ warm start
# Reuse the adapted metric and final positions to skip warmup entirely.
warm = walnuts(
    logp,
    num_params=2,
    num_chains=8,
    seed=2027,
    inits=np.stack([np.asarray(c)[-1] for c in chains]),
    init_inv_metric=np.stack([c.warmup.inv_metric for c in chains]),
    min_warmup_iter=0,
    max_warmup_iter=0,
    max_sampling_iter=500,
)
print(f"\nwarm-started run: {warm[0].shape[0]} draws/chain, "
      f"mean {np.concatenate(warm).mean(0).round(3)}")

# ------------------------------------------------- checkpointed long run
# For long production runs on preemptible hardware: the full state
# persists between blocks, and rerunning the SAME call after a crash
# resumes where it left off, reproducing the uninterrupted run's draws
# bitwise (a strict superset of the reference's warm-start story).
import tempfile

ckdir = tempfile.mkdtemp(prefix="walnuts_ck_")
ck = walnuts(
    logp,
    num_params=2,
    num_chains=8,
    seed=2028,
    min_warmup_iter=100, max_warmup_iter=100,
    min_sampling_iter=200, max_sampling_iter=200,
    block_size=20,
    checkpoint_dir=ckdir,      # resume=True is the default
    thin=2,                    # keep every 2nd draw (wide posteriors); divides block_size
)
print(f"checkpointed run: {ck[0].shape[0]} thinned draws/chain "
      f"(resumable from {ckdir})")
