"""Profile the ASYNCHRONOUS warmup block's device-kernel breakdown.

VERDICT r4 item 7 follow-up. NOTE: the first reconcile_warmup session
solved the warmup trip at ~55 us and this profiler was written to name
the inflation — but the clean re-measure (tools/warmup_trip_isolate.py,
IDENTICAL scheduler counters, wall 3.76 -> 2.06 s) showed that session
was on a degraded worker: the true warmup t_trip is ~12 us, equal to
the sampling block's at the same state. Kept as the generic warmup
kernel profiler: traces ONE ``adapt_full`` block at bench shape
(funnel(101) x 4096, radius-2 inits, the bench's actual first warmup
block) and attributes kernels by occurrence count (trip-frequency ~T,
pass-frequency ~P, per-draw ~R).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_warmup.py \
        [n_chains=4096] [block=25]

Env: PW_K (6), PW_B (4), PW_HALVINGS (8), PW_MODEL (funnel), PW_OUT
(/tmp/warmup_profile). JSON summary to stdout, per-kernel table to
stderr.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from profile_pass import parse_trace  # noqa: E402
from reconcile_warmup import initial_warmup_state  # noqa: E402


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    out_dir = os.environ.get("PW_OUT", "/tmp/warmup_profile")

    import jax
    import jax.numpy as jnp

    if os.environ.get("PW_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PW_PLATFORM"])
    for k, v in [("jax_compilation_cache_dir", "/tmp/jax_tpu_cache"),
                 ("jax_persistent_cache_min_entry_size_bytes", -1),
                 ("jax_persistent_cache_min_compile_time_secs", 0.0)]:
        try:
            jax.config.update(k, v)
        except Exception:
            pass

    from walnuts_tpu.core.adapt import (
        adam_step_size,
        mass_estimator_inv_mass,
        min_micro_estimate,
    )
    from walnuts_tpu.core.batched import make_batched_sample_block
    from walnuts_tpu.core.sampler import WarmupState

    model = os.environ.get("PW_MODEL", "funnel")
    K = int(os.environ.get("PW_K", 6))
    B = int(os.environ.get("PW_B", 4))
    halvings = int(os.environ.get("PW_HALVINGS", 8))
    logp_grad, ws0, scfg = initial_warmup_state(
        model, C, R, halvings, jax, jnp)
    jax.block_until_ready(ws0)
    max_error = float(scfg.max_hamiltonian_error)

    _, sample_block = make_batched_sample_block(
        logp_grad, scfg.max_trajectory_doublings,
        scfg.max_step_halvings, runahead=B, tier2_every=K,
        adapt_step_size=True, adapt_full=True)
    block_adapt = sample_block.adapt
    start_cached = sample_block.start_block_cached

    @jax.jit
    def blk(ws):
        dtype = ws.theta.dtype
        logp0, grad0 = jax.vmap(logp_grad)(ws.theta)
        inv_mass = jax.vmap(mass_estimator_inv_mass)(ws.mass)
        step = adam_step_size(ws.adam)
        min_micro = jax.vmap(min_micro_estimate)(ws.min_micro)
        st = start_cached(
            ws.key, ws.theta, logp0, grad0, step, inv_mass, min_micro,
            ws.adam, ws.n_grads + 1, ws.fails,
        )
        aux = (ws.mass, ws.min_micro, ws.iteration,
               inv_mass, step, min_micro)
        res, st, aux = block_adapt(
            st, aux, jnp.asarray(max_error, dtype), R)
        mass, mm_est, iteration, *_ = aux
        ws2 = WarmupState(
            key=res.key, theta=res.draws[-1], adam=st.adam,
            mass=mass, min_micro=mm_est, iteration=iteration,
            n_grads=st.n_grads, fails=st.fails,
        )
        return (ws2, res.n_inner_trips, res.n_outer_trips,
                res.n_grads_delta.sum(), res.draws[-1, 0, 0])

    # compile + warm (value fetch synchronizes — CLAUDE.md rule)
    out = blk(ws0)
    T = int(out[1])
    P = int(out[2])
    G = int(out[3])
    _ = float(out[4])
    t0 = time.time()
    out = blk(ws0)
    _ = float(out[4])
    untraced_s = time.time() - t0

    t0 = time.time()
    with jax.profiler.trace(out_dir):
        out = blk(ws0)
        _ = float(out[4])
    traced_s = time.time() - t0

    rows = parse_trace(out_dir)
    total_ms = sum(r["total_ms"] for r in rows)
    for r in rows[:40]:
        print(json.dumps(r), file=sys.stderr)
    print(json.dumps({
        "model": model, "n_chains": C, "block": R, "K": K, "B": B,
        "inner_trips": T, "passes": P, "used_grads": G,
        "untraced_s": round(untraced_s, 3), "traced_s": round(traced_s, 3),
        "device_total_ms": round(total_ms, 1),
        "n_kernels": len(rows),
        "top": [{k: r[k] for k in
                 ("name", "count", "total_ms", "mean_us", "gb_per_s",
                  "category")}
                for r in rows[:30]],
    }))


if __name__ == "__main__":
    main()
