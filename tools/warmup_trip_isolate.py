"""Isolate the warmup trip inflation (56 us vs sampling's 9.6 us).

The two-K warmup reconciliation (tools/reconcile_warmup.py,
docs/reconcile_warmup_r5.json) solved the async warmup block's atoms at
t_trip ~55-57 us where the sampling block's identical-shape solve gives
9.64 us (docs/BENCHMARKS.md "Funnel throughput reconciliation"). The
trip body (`inner_trip`, core/batched.py) differs between the two
programs in exactly two ways:

  1. ``adapt_step_size=True`` adds a masked per-lane Adam observe
     (scalar (C,) math) and puts the Adam state on the trip carry;
  2. ``adapt_full=True`` moves step/inv_mass/min_micro from jit-scope
     constants into the OUTER while carry (they change per pass), and
     adds the Welford/estimator ``aux`` planes to that carry.

This tool two-K-solves t_trip/t_pass for three variants from the SAME
initial state (one block, arms interleaved per rep against worker
drift):

  full      adapt_full=True,  adapt_step_size=True   (the warmup block)
  noadam    adapt_full=True,  adapt_step_size=False  (isolates 1)
  sampling  plain sample_block, per-lane params      (the 9.6 us ref)

Chains differ across variants (noadam freezes the step size) — that is
fine: t_trip is per-trip, and each variant's solve uses its own
counters.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/warmup_trip_isolate.py \
        [n_chains=4096] [block=100] [reps=3]

Env: WI_K (6), WI_K2 (12), WI_B (4), WI_HALVINGS (8), WI_MODEL (funnel).
Prints one JSON line.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reconcile_warmup import initial_warmup_state  # noqa: E402


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp

    if os.environ.get("WI_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WI_PLATFORM"])
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

    model = os.environ.get("WI_MODEL", "funnel")
    K = int(os.environ.get("WI_K", 6))
    K2 = int(os.environ.get("WI_K2", 12))
    B = int(os.environ.get("WI_B", 4))
    halvings = int(os.environ.get("WI_HALVINGS", 8))
    logp_grad, ws0, scfg = initial_warmup_state(
        model, C, R, halvings, jax, jnp)
    jax.block_until_ready(ws0)
    max_error = float(scfg.max_hamiltonian_error)

    def build_warmup(k, adapt_ss):
        _, sb = make_batched_sample_block(
            logp_grad, scfg.max_trajectory_doublings,
            scfg.max_step_halvings, runahead=B, tier2_every=k,
            adapt_step_size=adapt_ss, adapt_full=True)

        @jax.jit
        def blk(ws):
            dtype = ws.theta.dtype
            logp0, grad0 = jax.vmap(logp_grad)(ws.theta)
            inv_mass = jax.vmap(mass_estimator_inv_mass)(ws.mass)
            step = adam_step_size(ws.adam)
            min_micro = jax.vmap(min_micro_estimate)(ws.min_micro)
            st = sb.start_block_cached(
                ws.key, ws.theta, logp0, grad0, step, inv_mass, min_micro,
                ws.adam, ws.n_grads + 1, ws.fails,
            )
            aux = (ws.mass, ws.min_micro, ws.iteration,
                   inv_mass, step, min_micro)
            res, st, aux = sb.adapt(
                st, aux, jnp.asarray(max_error, dtype), R)
            return (res.n_inner_trips, res.n_outer_trips,
                    res.n_grads_delta.sum(), res.draws[-1, 0, 0])

        return blk

    def build_sampling(k):
        _, sb = make_batched_sample_block(
            logp_grad, scfg.max_trajectory_doublings,
            scfg.max_step_halvings, runahead=B, tier2_every=k)

        @jax.jit
        def blk(ws):
            dtype = ws.theta.dtype
            logp0, grad0 = jax.vmap(logp_grad)(ws.theta)
            inv_mass = jax.vmap(mass_estimator_inv_mass)(ws.mass)
            step = adam_step_size(ws.adam)
            min_micro = jax.vmap(min_micro_estimate)(ws.min_micro)
            st = sb.start_block_cached(
                ws.key, ws.theta, logp0, grad0, step, inv_mass, min_micro,
                ws.adam, ws.n_grads + 1, ws.fails,
            )
            res = sb(st, step, inv_mass, min_micro,
                     jnp.asarray(max_error, dtype), R)
            return (res.n_inner_trips, res.n_outer_trips,
                    res.n_grads_delta.sum(), res.draws[-1, 0, 0])

        return blk

    variants = {
        "full": {K: build_warmup(K, True), K2: build_warmup(K2, True)},
        "noadam": {K: build_warmup(K, False), K2: build_warmup(K2, False)},
        "sampling": {K: build_sampling(K), K2: build_sampling(K2)},
    }

    # compile pass (value fetch synchronizes — CLAUDE.md rule)
    for arms in variants.values():
        for blk in arms.values():
            out = blk(ws0)
            _ = [int(x) for x in out[:3]] + [float(out[3])]

    walls = {(v, k): [] for v, arms in variants.items() for k in arms}
    counters = {}
    for _ in range(reps):
        for v, arms in variants.items():
            for k, blk in arms.items():
                t0 = time.time()
                out = blk(ws0)
                vals = (int(out[0]), int(out[1]), int(out[2]),
                        float(out[3]))
                dt = time.time() - t0
                walls[(v, k)].append(dt)
                counters[(v, k)] = vals

    summary = {"model": model, "n_chains": C, "block": R, "B": B,
               "reps": reps, "K": K, "K2": K2}
    for v in variants:
        Ta, Pa, Ga, _ = counters[(v, K)]
        Tb, Pb, Gb, _ = counters[(v, K2)]
        wa = min(walls[(v, K)])
        wb = min(walls[(v, K2)])
        det = Ta * Pb - Tb * Pa
        t_trip = (wa * Pb - wb * Pa) / det if det else None
        t_pass = (Ta * wb - Tb * wa) / det if det else None
        summary[v] = {
            "wall_K": round(wa, 4), "wall_K2": round(wb, 4),
            "walls_K": [round(x, 4) for x in walls[(v, K)]],
            "walls_K2": [round(x, 4) for x in walls[(v, K2)]],
            "trips_K": Ta, "passes_K": Pa, "grads_K": Ga,
            "trips_K2": Tb, "passes_K2": Pb, "grads_K2": Gb,
            "t_trip_us": round(t_trip * 1e6, 2) if t_trip else None,
            "t_pass_us": round(t_pass * 1e6, 2) if t_pass else None,
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
