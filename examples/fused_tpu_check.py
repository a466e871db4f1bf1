"""Real-TPU validation of the fused Pallas transition kernels.

The pytest suite runs on a forced-CPU virtual mesh (tests/conftest.py),
so the Pallas kernels are exercised there in interpret mode only. This
script is the real-hardware check: it compiles both fused kernels
(`make_fused_transition`, `make_fused_sample_block`) for the current
backend and verifies, on the ill-conditioned Gaussian with its TRUE
(non-unit) inverse mass matrix:

  - posterior variances within 10% of the analytic truth,
  - pooled Geyer ESS in the healthy range,
  - final carried state consistent with the model (lp/grad),
  - gradient-count accounting (block kernel excludes the cached initial
    evaluation).

Run: ``python examples/fused_tpu_check.py`` (on the TPU host; ~2-4 min of
Mosaic compiles on the first run, cached afterwards). Exits nonzero on
failure. Replaces macro_step/build_span of the reference
(walnuts.hpp:307-495) — see ops/fused_transition.py.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from walnuts_tpu.models.kernels import ill_conditioned_normal_vg
from walnuts_tpu.ops.fused_transition import (
    make_fused_sample_block,
    make_fused_transition,
)
from walnuts_tpu.summary import effective_sample_size

DIM, CHAINS, ITERS = 16, 256, 400
TRUE_VAR = np.arange(1.0, DIM + 1.0) ** 2


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    interpret = jax.default_backend() == "cpu"
    vg, _, consts = ill_conditioned_normal_vg(DIM)
    key = jax.random.key(5)
    theta0 = jax.random.normal(jax.random.fold_in(key, 1), (CHAINS, DIM),
                               jnp.float32)
    step = jnp.full((CHAINS,), 1.0, jnp.float32)
    inv_mass = jnp.broadcast_to(jnp.asarray(TRUE_VAR, jnp.float32),
                                (CHAINS, DIM))
    mm = jnp.ones((CHAINS,), jnp.int32)
    failures = []

    def check(label, d, burn):
        d = np.asarray(d)[burn:]
        var_ratio = d.reshape(-1, DIM).var(0) / TRUE_VAR
        ess = effective_sample_size([d[:, c] for c in range(CHAINS)])
        ok = np.all(np.abs(var_ratio - 1) < 0.10) and np.median(ess) > 5000
        print(f"[{label}] var_ratio range "
              f"[{var_ratio.min():.3f}, {var_ratio.max():.3f}] "
              f"ess_med={np.median(ess):.0f} -> {'OK' if ok else 'FAIL'}",
              flush=True)
        if not ok:
            failures.append(label)

    # --- single-transition kernel ---
    ft = make_fused_transition(vg, DIM, max_depth=5, max_step_halvings=8,
                               block_b=128, interpret=interpret,
                               consts=consts)

    def one_iter(carry, i):
        k, theta = carry
        k, k1 = jax.random.split(k)
        rho = jax.random.normal(k1, (CHAINS, DIM), jnp.float32) / jnp.sqrt(
            inv_mass)
        lp0, g0 = vg(theta, *consts)
        th, g, lp, depth, ng = ft(i, theta, rho, lp0, g0, step, inv_mass,
                                  mm, 0.5)
        return (k, th), (th, ng)

    runf = jax.jit(lambda c: jax.lax.scan(one_iter, c, jnp.arange(ITERS)))
    (_, _), (draws, ngs) = runf((key, theta0))
    check("single-transition", draws, 100)

    # --- multi-draw sampling block (4 launches of 100) ---
    fsb = make_fused_sample_block(vg, DIM, max_depth=5, max_step_halvings=8,
                                  num_draws=100, block_b=128,
                                  interpret=interpret, consts=consts)
    th, (lp, g) = theta0, jax.jit(vg)(theta0, *consts)
    blocks, ng_tot = [], 0
    for j in range(4):
        rho = jax.random.normal(jax.random.fold_in(key, 100 + j),
                                (100, CHAINS, DIM), jnp.float32) / jnp.sqrt(
            inv_mass)
        d, _, th, g, lp, ng = fsb(17 + j, th, lp, g, rho, step, inv_mass,
                                  mm, 0.5)
        blocks.append(d)
        ng_tot = ng_tot + ng
    check("sample-block", jnp.concatenate(blocks, axis=0), 100)

    lp_m, g_m = jax.jit(vg)(th, *consts)
    cons = float(jnp.max(jnp.abs(lp - lp_m)))
    print(f"final-state lp consistency: {cons:.2e}", flush=True)
    if cons > 1e-3:
        failures.append("state-consistency")
    if float(np.asarray(ng_tot).mean()) / ITERS <= 1.0:
        failures.append("grad-accounting")

    if failures:
        print("FAILED:", failures)
        return 1
    print("ALL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
