"""Profile the batched scheduler's device-kernel breakdown on TPU.

VERDICT r3 item 1: before building a fused tier-2 pass kernel, capture a
``jax.profiler`` trace of ``run_sampling`` at bench shape and decide
whether the ~253 us/pass cost is FRAGMENTATION (XLA splits the pass into
many small kernels around the bounded whiles — a hand-fused Pallas
kernel wins) or BANDWIDTH (each kernel already runs near HBM peak —
pursue traffic cuts instead).

Protocol: one full batched warmup builds the adapted state (exactly the
round-3 knob-sweep harness, examples/sched_ab.py), a short run compiles
the block program, then ONE block is traced. The trace's device events
carry per-kernel ``device_duration_ps`` and ``bytes_accessed``, so each
kernel gets an achieved-GB/s figure vs the ~820 GB/s v5e HBM peak.
Kernels are attributed by OCCURRENCE COUNT: the inner trip body runs
~trips times (~200/draw on the funnel), the tier-2 pass ~trips/K times —
the two populations are an order of magnitude apart.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_pass.py \
        [funnel|logreg|sv] [n_chains] [profile_draws]

Env: PP_WARMUP (400), PP_BLOCK (100), PP_HALVINGS (8), PP_GROUPS (1),
PP_RUNAHEAD (4 funnel / 8 else), PP_K (6 funnel / 12 sv), PP_OUT
(/tmp/pass_profile). Prints a JSON summary line; the full per-kernel
table goes to stderr.
"""

import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

import numpy as np  # noqa: E402


def adapted_state(model_name, C, draws, block, jax, jnp):
    from walnuts_tpu.config import SamplingConfig, WarmupConfig
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import (
        freeze_params,
        init_sample_state,
        init_warmup_state,
    )
    from walnuts_tpu.models import funnel, logistic_regression
    from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
    from walnuts_tpu.parallel.runtime import run_warmup

    if model_name == "funnel":
        logp, dim = funnel(101)
    elif model_name == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
    else:
        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)
    dtype = jnp.float32
    warmup_iters = int(os.environ.get("PP_WARMUP",
                                      200 if model_name == "sv" else 400))
    halvings = int(os.environ.get("PP_HALVINGS", 8))
    warmup_cfg = WarmupConfig(min_iter=warmup_iters, max_iter=warmup_iters,
                              block_size=min(block, warmup_iters))
    sampling_cfg = SamplingConfig(min_iter=draws, max_iter=draws,
                                  block_size=min(block, draws),
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
    wstate, _, _, info = run_warmup(logp_grad, wstate, warmup_cfg,
                                    sampling_cfg, batched=True)
    jax.block_until_ready(wstate)
    params = jax.vmap(freeze_params)(wstate)
    sstate = jax.vmap(init_sample_state)(wstate)
    return logp_grad, sstate, params, sampling_cfg, info


def parse_trace(out_dir):
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    tr = json.load(gzip.open(paths[-1]))
    pids = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    agg = {}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        a = e.get("args", {})
        # jit_* envelope events duplicate the per-op rows — skip them
        if "device_duration_ps" not in a or e["name"].startswith(
                ("jit_", "jit(")):
            continue
        rec = agg.setdefault(e["name"], {
            "count": 0, "ps": 0, "bytes": 0,
            "long_name": a.get("long_name", "")[:160],
            "category": a.get("hlo_category", ""),
        })
        rec["count"] += 1
        rec["ps"] += int(a["device_duration_ps"])
        rec["bytes"] += int(a.get("bytes_accessed", 0))
    rows = []
    for name, r in agg.items():
        secs = r["ps"] * 1e-12
        rows.append({
            "name": name,
            "count": r["count"],
            "total_ms": round(secs * 1e3, 3),
            "mean_us": round(secs / r["count"] * 1e6, 2),
            "gb_per_s": round(r["bytes"] / secs / 1e9, 1) if secs else 0.0,
            "bytes_per_call": int(r["bytes"] / r["count"]),
            "category": r["category"],
            "long_name": r["long_name"],
        })
    rows.sort(key=lambda r: -r["total_ms"])
    return rows


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "funnel"
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    profile_draws = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    out_dir = os.environ.get("PP_OUT", "/tmp/pass_profile")

    import jax
    import jax.numpy as jnp

    if os.environ.get("PP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PP_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from walnuts_tpu.config import SamplingConfig
    from walnuts_tpu.parallel.runtime import run_sampling

    block = int(os.environ.get(
        "PP_BLOCK", 50 if model_name == "sv" else 100))
    logp_grad, sstate, params, _, info = adapted_state(
        model_name, C, profile_draws, block, jax, jnp)

    kwargs = dict(
        batched=True, device_draws=True,
        batched_groups=int(os.environ.get("PP_GROUPS", 1)),
        runahead=int(os.environ.get(
            "PP_RUNAHEAD", 4 if model_name == "funnel" else 8)),
        tier2_every=int(os.environ.get(
            "PP_K", 12 if model_name == "sv" else 6)),
        fresh_cur=bool(int(os.environ.get("PP_FRESHCUR", 0))),
        pallas_pass=bool(int(os.environ.get("PP_PPASS", 0))),
    )
    if os.environ.get("PP_TILE"):
        kwargs["pass_tile"] = int(os.environ["PP_TILE"])
    cfg = SamplingConfig(min_iter=profile_draws, max_iter=profile_draws,
                         block_size=profile_draws,
                         max_step_halvings=int(
                             os.environ.get("PP_HALVINGS", 8)))
    # compile + warm
    out = run_sampling(logp_grad, sstate, params, cfg, info=info, **kwargs)
    jax.block_until_ready(out[1])
    t0 = time.time()
    out = run_sampling(logp_grad, sstate, params, cfg, info=info, **kwargs)
    jax.block_until_ready(out[1])
    untraced_s = time.time() - t0

    t0 = time.time()
    with jax.profiler.trace(out_dir):
        s2, d2, _, i2 = run_sampling(logp_grad, sstate, params, cfg,
                                     info=info, **kwargs)
        jax.block_until_ready((s2, d2))
    traced_s = time.time() - t0
    grads = int(np.sum(np.asarray(i2.n_grads)) -
                np.sum(np.asarray(info.n_grads)))

    rows = parse_trace(out_dir)
    total_ms = sum(r["total_ms"] for r in rows)
    for r in rows[:40]:
        print(json.dumps(r), file=sys.stderr)
    print(json.dumps({
        "model": model_name, "n_chains": C, "draws": profile_draws,
        "untraced_s": round(untraced_s, 3), "traced_s": round(traced_s, 3),
        "device_total_ms": round(total_ms, 1),
        "sampling_grads": grads,
        "n_kernels": len(rows),
        "top": [{k: r[k] for k in
                 ("name", "count", "total_ms", "mean_us", "gb_per_s",
                  "category")}
                for r in rows[:25]],
    }))


if __name__ == "__main__":
    main()
