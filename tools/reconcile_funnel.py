"""Funnel throughput reconciliation: where does the 7.9x go?

VERDICT r4 item 3: realized funnel sampling throughput (8.4M grads/s)
sits ~7.9x under the trip-loop peak (C / t_trip ~ 66M/s at 62 us
trips), while the measured scheduling floor is 3.9-5.9x. This tool
drives ``make_batched_sample_block`` DIRECTLY at the bench flagship
shape so the scheduler's own counters (``n_inner_trips``,
``n_outer_trips``, per-lane grads) decompose the gap exactly:

    wall = T * t_trip + P * t_pass + edges
    realized grads/s = used_grads / wall
    padding          = C * T / used_grads      (lanes idle or latched)
    pass share       = P * t_pass / wall
    trip efficiency  = T * t_trip / wall

t_trip is measured in-session by a second run at K=0 ... no — K is
load-bearing; instead t_pass is isolated by running TWO K values
(K and 2K have ~equal T and ~halved P, two equations in t_trip,
t_pass), all arms interleaved in ONE process against worker drift.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/reconcile_funnel.py \
        [n_chains=4096] [draws=100] [reps=3]

Env: RC_K (6), RC_K2 (12), RC_B (4), RC_HALVINGS (8), RC_WARMUP (400).
Prints one JSON line; the derived table goes to docs/BENCHMARKS.md.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp

    for k, v in [("jax_compilation_cache_dir", "/tmp/jax_tpu_cache"),
                 ("jax_persistent_cache_min_entry_size_bytes", -1),
                 ("jax_persistent_cache_min_compile_time_secs", 0.0)]:
        try:
            jax.config.update(k, v)
        except Exception:
            pass

    from walnuts_tpu.core.batched import make_batched_sample_block
    from tools.profile_pass import adapted_state

    K = int(os.environ.get("RC_K", 6))
    K2 = int(os.environ.get("RC_K2", 12))
    B = int(os.environ.get("RC_B", 4))
    logp_grad, sstate, params, scfg, _ = adapted_state(
        "funnel", C, R, 100, jax, jnp)

    def build(k):
        start_block, sample_block = make_batched_sample_block(
            logp_grad, scfg.max_trajectory_doublings,
            scfg.max_step_halvings, runahead=B, tier2_every=k)

        @jax.jit
        def blk(key, theta, n_grads, fails):
            st = start_block(key, theta, n_grads, fails,
                             params.step_size, params.inv_mass,
                             params.min_micro)
            res = sample_block(
                st, params.step_size, params.inv_mass, params.min_micro,
                jnp.asarray(scfg.max_hamiltonian_error, jnp.float32), R)
            return (res.n_inner_trips, res.n_outer_trips,
                    res.n_grads_delta.sum(), res.draws[-1, 0, 0])

        return blk

    blks = {K: build(K), K2: build(K2)}
    args0 = (sstate.key, sstate.theta, sstate.n_grads, sstate.fails)
    # compile both
    for k, blk in blks.items():
        out = blk(*args0)
        _ = [int(x) for x in out[:3]] + [float(out[3])]
    results = {k: [] for k in blks}
    counters = {}
    for _ in range(reps):
        for k, blk in blks.items():  # interleaved arms (worker drift)
            t0 = time.time()
            out = blk(*args0)
            vals = (int(out[0]), int(out[1]), int(out[2]), float(out[3]))
            dt = time.time() - t0  # the value fetch synchronizes
            results[k].append(dt)
            counters[k] = vals
    summary = {"n_chains": C, "draws": R, "B": B, "reps": reps}
    for k in blks:
        T, P, G, _ = counters[k]
        w = min(results[k])
        summary[f"K{k}"] = {
            "wall_s": round(w, 4), "walls": [round(x, 4) for x in results[k]],
            "inner_trips": T, "passes": P, "used_grads": G,
            "padding_x": round(C * T / G, 3),
            "grads_per_s": round(G / w / 1e6, 3),
        }
    # solve wall = T*t_trip + P*t_pass (+edges folded into t_trip) from
    # the two arms
    Ta, Pa, Ga, _ = counters[K]
    Tb, Pb, Gb, _ = counters[K2]
    wa, wb = min(results[K]), min(results[K2])
    det = Ta * Pb - Tb * Pa
    if det:
        t_trip = (wa * Pb - wb * Pa) / det
        t_pass = (Ta * wb - Tb * wa) / det
        summary["derived"] = {
            "t_trip_us": round(t_trip * 1e6, 2),
            "t_pass_us": round(t_pass * 1e6, 2),
            "trip_share_K%d" % K: round(Ta * t_trip / wa, 3),
            "pass_share_K%d" % K: round(Pa * t_pass / wa, 3),
            "trip_peak_Mgrads_s": round(C / t_trip / 1e6, 2),
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
