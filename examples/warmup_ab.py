"""Warmup scheduler A/B: classic synchronous vs batched asynchronous.

Times ``run_warmup`` arms on identical initial states (the adaptation
schedule is exact across arms — keys/ints bitwise, floats ~1 ulp/observe;
docs/BENCHMARKS.md round 3), so wall time decides the default. One
compile pass (half-length warmup) precedes each timed arm.

Usage: python examples/warmup_ab.py funnel 4096 '[{"batched":false},{"batched":true},{"batched":true,"runahead":8}]'
Env: AB_WARMUP (400), AB_BLOCK (100), AB_REPS (2), AB_HALVINGS (8).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "funnel"
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    configs = json.loads(sys.argv[3]) if len(sys.argv) > 3 else [
        {"batched": False}, {"batched": True}]

    import jax
    import jax.numpy as jnp

    if os.environ.get("AB_PLATFORM"):  # CPU smoke runs (axon overrides env)
        jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jax_tpu_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from walnuts_tpu.config import SamplingConfig, WarmupConfig
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import init_warmup_state
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

    warmup_iters = int(os.environ.get("AB_WARMUP",
                                      200 if model_name == "sv" else 400))
    block = int(os.environ.get("AB_BLOCK", 50 if model_name == "sv" else 100))
    reps = int(os.environ.get("AB_REPS", 2))
    halvings = int(os.environ.get("AB_HALVINGS", 8))
    dtype = jnp.float32

    sampling_cfg = SamplingConfig(min_iter=block, max_iter=block,
                                  block_size=block,
                                  max_step_halvings=halvings)

    def init_state(C):
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
        return keys, theta0, init_mass, step0

    results = []
    for cfg in configs:
        cfg = dict(cfg)
        C = int(cfg.pop("n_chains", n_chains))
        keys, theta0, init_mass, step0 = init_state(C)

        def fresh(iters):
            wcfg = WarmupConfig(min_iter=iters, max_iter=iters,
                                block_size=min(block, iters))
            ws = jax.vmap(
                lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg,
                                                     sampling_cfg)
            )(keys, theta0, init_mass, step0)
            return ws, wcfg

        # compile pass: one block-length warmup (same block program)
        ws, wcfg = fresh(block)
        out = run_warmup(logp_grad, ws, wcfg, sampling_cfg, **cfg)
        jax.block_until_ready(out[0])
        times = []
        grads = None
        for _ in range(reps):
            ws, wcfg = fresh(warmup_iters)
            t0 = time.time()
            ws2, _, _, info = run_warmup(logp_grad, ws, wcfg, sampling_cfg,
                                         **cfg)
            jax.block_until_ready(ws2)
            times.append(round(time.time() - t0, 3))
            grads = int(np.sum(np.asarray(ws2.n_grads)))
        rec = {"model": model_name, "n_chains": C, "iters": warmup_iters,
               "config": cfg, "times": times, "min": min(times),
               "warmup_grads": grads}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    base_t = results[0]["min"]
    print(json.dumps({"summary": [
        {"config": r["config"], "min": r["min"],
         "vs_first": round(base_t / r["min"], 3)} for r in results]}),
        flush=True)


if __name__ == "__main__":
    main()
