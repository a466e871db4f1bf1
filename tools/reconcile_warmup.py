"""Warmup throughput reconciliation: why is warmup at 44% of sampling?

VERDICT r4 item 7: funnel warmup runs 3.70M grads/s vs sampling's
8.41M/s and is 62% of total wall. This tool drives the asynchronous
adaptive-warmup block (``adapt_full=True`` — the exact program
``make_batched_warmup_block`` builds, re-assembled here so the
scheduler counters ``n_inner_trips``/``n_outer_trips``/grads are
visible) through the bench's ACTUAL warmup trajectory — 4 blocks of
100 draws from the radius-2 inits — at TWO K values, all arms
interleaved per block against worker drift.

Per block this decomposes wall into the same atoms as the sampling
reconciliation (tools/reconcile_funnel.py):

    padding          = C * T / used_grads   (lane idling; early-warmup
                                             raggedness shows up here)
    t_trip, t_pass   from the two-K solve   (adaptation cost shows up
                                             as t_pass/t_trip inflation
                                             vs sampling's numbers)

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/reconcile_warmup.py \
        [n_chains=4096] [block=100] [n_blocks=4] [reps=2]

Env: RW_K (6), RW_K2 (12), RW_B (4), RW_HALVINGS (8), RW_MODEL
(funnel). Prints one JSON line; the derived table goes to
docs/BENCHMARKS.md.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def initial_warmup_state(model_name, C, block, halvings, jax, jnp):
    """Bench-shaped pre-warmup state (profile_pass.adapted_state's prep)."""
    from walnuts_tpu.config import SamplingConfig, WarmupConfig
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import init_warmup_state
    from walnuts_tpu.models import funnel, logistic_regression
    from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad

    if model_name == "funnel":
        logp, dim = funnel(101)
    elif model_name == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
    else:
        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)
    dtype = jnp.float32
    warmup_cfg = WarmupConfig(min_iter=400, max_iter=400, block_size=block)
    sampling_cfg = SamplingConfig(min_iter=400, max_iter=400,
                                  block_size=block,
                                  max_step_halvings=halvings)
    base = jax.random.key(2026)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(
        jax.random.fold_in(base, 0xFFFFFFFF), (C, dim), dtype=dtype)
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    init_mass = jax.vmap(
        lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    step_keys = jax.vmap(
        lambda c: jax.random.fold_in(base, c + C))(jnp.arange(C))
    step0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, logp_grad, t, m,
                                        jnp.asarray(1.0, dtype))
    ))(step_keys, theta0, init_mass)
    wstate = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, warmup_cfg,
                                             sampling_cfg)
    )(keys, theta0, init_mass, step0)
    return logp_grad, wstate, sampling_cfg


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    NB = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax
    import jax.numpy as jnp

    if os.environ.get("RW_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RW_PLATFORM"])
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

    model = os.environ.get("RW_MODEL", "funnel")
    K = int(os.environ.get("RW_K", 6))
    K2 = int(os.environ.get("RW_K2", 12))
    B = int(os.environ.get("RW_B", 4))
    halvings = int(os.environ.get("RW_HALVINGS", 8))
    logp_grad, ws0, scfg = initial_warmup_state(
        model, C, R, halvings, jax, jnp)
    jax.block_until_ready(ws0)
    max_error = float(scfg.max_hamiltonian_error)

    def build(k):
        _, sample_block = make_batched_sample_block(
            logp_grad, scfg.max_trajectory_doublings,
            scfg.max_step_halvings, runahead=B, tier2_every=k,
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

        return blk

    arms = {K: build(K), K2: build(K2)}
    # compile once (block program identical across blocks)
    for blk in arms.values():
        out = blk(ws0)
        jax.block_until_ready(out[0])
        _ = [int(x) for x in out[1:4]] + [float(out[4])]

    # timed reps: blocks chained within each arm, arms interleaved per
    # block index (worker-drift control)
    walls = {k: [[] for _ in range(NB)] for k in arms}
    counters = {k: [None] * NB for k in arms}
    for _ in range(reps):
        states = {k: ws0 for k in arms}
        for b in range(NB):
            for k, blk in arms.items():
                t0 = time.time()
                out = blk(states[k])
                vals = (int(out[1]), int(out[2]), int(out[3]),
                        float(out[4]))  # value fetch synchronizes
                dt = time.time() - t0
                states[k] = out[0]
                walls[k][b].append(dt)
                counters[k][b] = vals

    summary = {"model": model, "n_chains": C, "block": R,
               "n_blocks": NB, "B": B, "reps": reps}
    for k in arms:
        rows = []
        for b in range(NB):
            T, P, G, _ = counters[k][b]
            w = min(walls[k][b])
            rows.append({
                "wall_s": round(w, 4),
                "walls": [round(x, 4) for x in walls[k][b]],
                "inner_trips": T, "passes": P, "used_grads": G,
                "padding_x": round(C * T / G, 3) if G else None,
                "grads_per_s": round(G / w / 1e6, 3),
            })
        tot_w = sum(r["wall_s"] for r in rows)
        tot_g = sum(r["used_grads"] for r in rows)
        summary[f"K{k}"] = {
            "blocks": rows,
            "total_wall_s": round(tot_w, 3),
            "total_grads": tot_g,
            "grads_per_s_M": round(tot_g / tot_w / 1e6, 3),
        }
    # two-K solve per block: wall = T*t_trip + P*t_pass
    derived = []
    for b in range(NB):
        Ta, Pa, Ga, _ = counters[K][b]
        Tb, Pb, Gb, _ = counters[K2][b]
        wa = min(walls[K][b])
        wb = min(walls[K2][b])
        det = Ta * Pb - Tb * Pa
        if det:
            t_trip = (wa * Pb - wb * Pa) / det
            t_pass = (Ta * wb - Tb * wa) / det
            derived.append({
                "block": b,
                "t_trip_us": round(t_trip * 1e6, 2),
                "t_pass_us": round(t_pass * 1e6, 2),
                "trip_share_K%d" % K: round(Ta * t_trip / wa, 3),
                "pass_share_K%d" % K: round(Pa * t_pass / wa, 3),
            })
    summary["derived"] = derived
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
