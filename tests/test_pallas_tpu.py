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
