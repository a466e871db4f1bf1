"""Env-gated REAL-TPU smoke of the Pallas fused kernels.

The regular suite forces CPU (tests/conftest.py) and exercises the
Pallas paths in interpret mode only — a jax/Mosaic toolchain bump could
silently rot the real-TPU lowering of ``ops/fused_transition.py`` /
``ops/integrator.py``. This module re-runs the shipped real-hardware
check (``examples/fused_tpu_check.py``) as a test when explicitly asked:

    WALNUTS_TPU_SMOKE=1 python -m pytest tests/test_pallas_tpu.py -q

It must run in a process where the TPU backend is importable (do NOT
rely on tests/conftest.py having already pinned the platform: run this
file alone). Skipped otherwise so CI and the CPU suite are unaffected.
First-run Mosaic compiles take minutes; they land in the persistent
compile cache.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not int(os.environ.get("WALNUTS_TPU_SMOKE", "0")),
    reason="real-TPU Pallas smoke is opt-in (WALNUTS_TPU_SMOKE=1)",
)
def test_fused_kernels_on_real_tpu():
    """Runs the full fused-kernel validation (variances vs analytic
    truth, ESS health, state consistency, gradient accounting) in a
    fresh process so the TPU backend initializes unforced."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin win
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "fused_tpu_check.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"fused_tpu_check failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )


@pytest.mark.skipif(
    not int(os.environ.get("WALNUTS_TPU_SMOKE", "0")),
    reason="real-TPU Pallas smoke is opt-in (WALNUTS_TPU_SMOKE=1)",
)
def test_replay_chain_kernel_on_real_tpu():
    """The fused replay-chain PRNG kernel (ops/prng.py) compiled by
    Mosaic must still produce jax.random.split's exact bits — integer
    ARX leaves no tolerance, so any real-TPU mismatch is a lowering
    bug."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    code = r"""
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform != "cpu"
import sys; sys.path.insert(0, %r)
from walnuts_tpu.ops.prng import replay_split_chain, split_data
base = jax.random.key(7)
keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(256))
kd = jax.random.key_data(keys).astype(jnp.uint32)
ref = jax.vmap(lambda k: jax.random.key_data(jax.random.split(k)))(keys)
assert np.array_equal(np.asarray(ref, np.uint32), np.asarray(split_data(kd)))
rng = np.random.RandomState(0)
n_ends = jnp.asarray(rng.randint(0, 7, size=256), jnp.int32)
leaf = jnp.asarray(rng.randint(0, 100, size=256) % (np.asarray(n_ends) + 1),
                   jnp.int32)
ku = jnp.zeros_like(kd)
gk, gu = replay_split_chain(kd, ku, n_ends, leaf, interpret=False)
# reference chain in plain XLA
k, u = kd, ku
for j in range(int(n_ends.max())):
    subs = split_data(k)
    adv = (j < n_ends)[:, None]
    hit = adv & (leaf == j + 1)[:, None]
    k = jnp.where(adv, subs[:, 0], k)
    u = jnp.where(hit, subs[:, 1], u)
assert np.array_equal(np.asarray(k), np.asarray(gk))
assert np.array_equal(np.asarray(u), np.asarray(gu))
print("replay kernel real-TPU bitwise OK")
""" % (ROOT,)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"replay kernel smoke failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
