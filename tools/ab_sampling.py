"""Sampling-only TPU A/B: warm up once at the bench protocol, then time
run_sampling repeats under different scheduler configs.

Unlike tools/ab_tpu.py (full warmup+sampling per arm), this isolates the
sampling phase so scheduler-representation changes (e.g. the round-4
plane splits) can be A/B'd without warmup-time noise, and repeats are
cheap.  One JSON line per config plus a summary, mirroring the
/tmp/ab_planes*.json format from the round-4 plane-split measurements.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_sampling.py \
      [repeats] > /tmp/ab.json
Env: AB_MODEL (funnel), AB_CHAINS (4096), AB_DRAWS (400), AB_REPEATS.
Configs are fixed: {} (groups=1) and {"batched_groups": 4} for funnel,
{} only otherwise.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from walnuts_tpu.config import SamplingConfig, WarmupConfig  # noqa: E402
from walnuts_tpu.core.adapt import nutpie_init_mass  # noqa: E402
from walnuts_tpu.core.sampler import (  # noqa: E402
    freeze_params,
    init_sample_state,
    init_warmup_state,
)
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad  # noqa: E402
from walnuts_tpu.parallel.runtime import run_sampling, run_warmup  # noqa: E402


def main():
    model = os.environ.get("AB_MODEL", "funnel")
    if model == "funnel":
        from walnuts_tpu.models import funnel

        logp, dim = funnel(101)
    elif model == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
        # model-impl A/B (round 4 filter rewrite): a config entry
        # {"_impl": "assoc"|"fma"} swaps the SV scan implementation for
        # the timed run_sampling only (warmup uses the default impl;
        # adapted params are impl-agnostic to float noise)
        impl_variants = {
            name: make_logp_grad(stochastic_volatility(scan_impl=name)[0])
            for name in ("assoc", "fma")
        }
    else:
        from walnuts_tpu.models import logistic_regression

        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)

    n_chains = int(os.environ.get("AB_CHAINS", 1024 if model == "sv" else 4096))
    draws = int(os.environ.get("AB_DRAWS", 200 if model == "sv" else 400))
    warm = int(os.environ.get("AB_WARMUP", 200 if model == "sv" else 400))
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("AB_REPEATS", 3))
    block = 50 if model == "sv" else 100
    dtype = jnp.float32
    t2k = 12 if model == "sv" else 6

    warmup_cfg = WarmupConfig(min_iter=warm, max_iter=warm,
                              block_size=min(block, warm))
    sampling_cfg = SamplingConfig(min_iter=draws, max_iter=draws,
                                  block_size=min(block, draws),
                                  max_step_halvings=8)

    base = jax.random.key(2026)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(n_chains))
    theta0 = 2.0 * jax.random.normal(
        jax.random.fold_in(base, 0xFFFFFFFF), (n_chains, dim), dtype=dtype)
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    init_mass = jax.vmap(
        lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    step_keys = jax.vmap(
        lambda c: jax.random.fold_in(base, c + n_chains))(jnp.arange(n_chains))
    step0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, logp_grad, t, m,
                                        jnp.asarray(1.0, dtype))
    ))(step_keys, theta0, init_mass)
    jax.block_until_ready(step0)

    wstate = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, warmup_cfg,
                                             sampling_cfg)
    )(keys, theta0, init_mass, step0)
    t0 = time.time()
    wstate, _, _, info = run_warmup(logp_grad, wstate, warmup_cfg,
                                    sampling_cfg, batched=True, runahead=4)
    jax.block_until_ready(wstate)
    print(json.dumps({"warmup": n_chains, "time": round(time.time() - t0, 3)}),
          flush=True)

    params = jax.vmap(freeze_params)(wstate)
    if os.environ.get("AB_CONFIGS"):
        configs = json.loads(os.environ["AB_CONFIGS"])
    else:
        configs = [{}]
        if model == "funnel":
            configs.append({"batched_groups": 4})
    summary = []
    for cfg_orig in configs:
        cfg = dict(cfg_orig)
        lg = logp_grad
        if "_impl" in cfg:
            lg = impl_variants[cfg.pop("_impl")]
        # "_block": N — per-arm sampling block size (block length is pure
        # scheduling: draws are bitwise invariant, only block-edge costs
        # move). First use of a new length pays its compile; repeats reuse.
        arm_cfg = sampling_cfg
        if "_block" in cfg:
            arm_cfg = SamplingConfig(
                min_iter=draws, max_iter=draws,
                block_size=min(int(cfg.pop("_block")), draws),
                max_step_halvings=8)
        times = []
        for _ in range(repeats):
            sstate = jax.vmap(init_sample_state)(wstate)
            jax.block_until_ready(sstate)
            t0 = time.time()
            kw = dict(device_draws=True, batched=True,
                      runahead=8 if model == "sv" else 4,
                      tier2_every=t2k)
            kw.update(cfg)
            sstate, dr, _, _ = run_sampling(
                lg, sstate, params, arm_cfg, info=info, **kw)
            jax.block_until_ready((sstate, dr))
            times.append(round(time.time() - t0, 3))
            del dr
        print(json.dumps({"model": model, "n_chains": n_chains,
                          "draws": draws, "config": cfg_orig, "times": times,
                          "min": min(times)}), flush=True)
        summary.append({"config": cfg_orig, "min": min(times)})
    for s in summary:
        s["vs_first"] = round(summary[0]["min"] / s["min"], 3)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
