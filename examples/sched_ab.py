"""Scheduler A/B harness: time ``run_sampling`` configs on one adapted state.

Recreates the round-3 knob-sweep protocol (docs/BENCHMARKS.md): one full
warmup produces an adapted state, then each scheduler configuration is
timed on the SAME state — compile pass (one block) first, then reps of
the full draw count. Scheduling knobs never change the draws (bitwise,
tests/test_batched.py), so wall time is the whole comparison.

Usage:
    python examples/sched_ab.py funnel 4096 '[{"tier2_every":12}, {}]'

Env: AB_DRAWS (400), AB_REPS (2), AB_BLOCK (100), AB_WARMUP (400),
AB_HALVINGS (8). Each config dict is passed as ``run_sampling`` kwargs on
top of ``batched=True, device_draws=True``; ``n_chains`` in a config
overrides the chain count for that arm (e.g. a throughput
arm). Prints one JSON line per config as it lands, plus a final summary.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "funnel"
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    configs = json.loads(sys.argv[3]) if len(sys.argv) > 3 else [{}]

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
    from walnuts_tpu.core.sampler import (
        freeze_params,
        init_sample_state,
        init_warmup_state,
    )
    from walnuts_tpu.models import funnel, logistic_regression
    from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
    from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

    if model_name == "funnel":
        logp, dim = funnel(101)
    elif model_name == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
    else:
        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)

    draws = int(os.environ.get("AB_DRAWS", 400))
    reps = int(os.environ.get("AB_REPS", 2))
    block = int(os.environ.get("AB_BLOCK", 50 if model_name == "sv" else 100))
    warmup_iters = int(os.environ.get("AB_WARMUP",
                                      200 if model_name == "sv" else 400))
    halvings = int(os.environ.get("AB_HALVINGS", 8))
    dtype = jnp.float32

    warm_cache = {}

    def adapted_state(C):
        """Warmup once per chain count; reuse across configs."""
        if C in warm_cache:
            return warm_cache[C]
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
        t0 = time.time()
        wstate, _, _, info = run_warmup(logp_grad, wstate, warmup_cfg,
                                        sampling_cfg, batched=True)
        jax.block_until_ready(wstate)
        print(json.dumps({"warmup": C, "time": round(time.time() - t0, 3)}),
              flush=True)
        params = jax.vmap(freeze_params)(wstate)
        sstate = jax.vmap(init_sample_state)(wstate)
        warm_cache[C] = (sstate, params, sampling_cfg, info)
        return warm_cache[C]

    results = []
    for cfg in configs:
        cfg = dict(cfg)
        C = int(cfg.pop("n_chains", n_chains))
        sstate, params, sampling_cfg, info = adapted_state(C)
        kwargs = dict(batched=True, device_draws=True)
        kwargs.update(cfg)
        # compile pass: one block (same block program the timed run uses)
        short_cfg = SamplingConfig(
            min_iter=min(block, draws), max_iter=min(block, draws),
            block_size=min(block, draws), max_step_halvings=halvings)
        out = run_sampling(logp_grad, sstate, params, short_cfg,
                           info=info, **kwargs)
        jax.block_until_ready(out[1])
        times = []
        grads = None
        for _ in range(reps):
            t0 = time.time()
            s2, d2, _, i2 = run_sampling(logp_grad, sstate, params,
                                         sampling_cfg, info=info, **kwargs)
            jax.block_until_ready((s2, d2))
            times.append(round(time.time() - t0, 3))
            grads = int(np.sum(np.asarray(i2.n_grads)) -
                        np.sum(np.asarray(info.n_grads)))
        rec = {"model": model_name, "n_chains": C, "draws": draws,
               "config": cfg, "times": times, "min": min(times),
               "sampling_grads": grads}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    base_t = results[0]["min"]
    summary = [{"config": r["config"], "min": r["min"],
                "vs_first": round(base_t / r["min"], 3)} for r in results]
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
