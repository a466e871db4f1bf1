"""TPU A/B harness for the scheduler options (async warmup /
tier-2 knobs; the removed speculate/multiplex arms live in git history).

Recreated after the 2026-08-17 worker outage wiped the /tmp scripts
(docs/ROADMAP.md item 4). Reuses ``bench._run_once`` so every arm runs
the exact bench protocol: funnel(101) x 4096 chains, 400+400 iters,
f32, fixed blocks of 100, max_step_halvings=8. Draws are bitwise (or
1-ulp) equal across arms, so wall time is the only metric
that differs; ESS is recomputed only for the chain-count-changing
throughput arm.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_tpu.py [arm ...]
Arms default to the full list. One JSON line per arm to stdout, plus a
running log on stderr. Results land in /tmp/ab_results.jsonl too.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402

# each arm: (name, env overrides, n_chains)
ARMS = {
    # batched defaults (groups=4 funnel, B=4, K=6) — the round-3 shipped config
    "base": ({}, 4096),
    # classic vmapped path (also the classic-warmup reference for the warmup A/B)
    "classic": ({"BENCH_BATCHED": "0"}, 4096),
    "k12": ({"BENCH_T2K": "12"}, 4096),
    # fresh-cur pass-traffic lever (bitwise; pure wall A/B)
    "freshcur": ({"BENCH_FRESHCUR": "1"}, 4096),
    # round-4 fused tier-2 pass kernel (ops/fused_pass.py; bitwise)
    "ppass": ({"BENCH_PPASS": "1"}, 4096),
    "xlapass": ({"BENCH_PPASS": "0"}, 4096),
    # round-5 warmup arms (reconcile_warmup found warmup K=12 -11% wall
    # at the block level, and warmup runs G=1 where sampling won at G=4)
    "wk12": ({"BENCH_WARMUP_T2K": "12"}, 4096),
    "wk18": ({"BENCH_WARMUP_T2K": "18"}, 4096),
    "wk24": ({"BENCH_WARMUP_T2K": "24"}, 4096),
    "wb8": ({"BENCH_WARMUP_B": "8"}, 4096),
    "wg4": ({"BENCH_WARMUP_GROUPS": "4"}, 4096),
    "wk12g4": ({"BENCH_WARMUP_T2K": "12", "BENCH_WARMUP_GROUPS": "4"}, 4096),
}

BASE_ENV = [
    "BENCH_BATCHED", "BENCH_T2K",
    "BENCH_FRESHCUR", "BENCH_BGROUPS", "BENCH_RUNAHEAD",
    "BENCH_PPASS", "BENCH_WARMUP_T2K", "BENCH_WARMUP_GROUPS",
    "BENCH_WARMUP_B",
]


def run_arm(name, env, n_chains, logp_grad, dim, model="funnel",
            seeds=(2027, 2028)):
    for k in BASE_ENV:
        os.environ.pop(k, None)
    os.environ.update(env)
    import jax.numpy as jnp

    tiny = bool(int(os.environ.get("AB_TINY", 0)))
    if tiny:
        n_chains, seeds = max(8, n_chains // 512), seeds[:1]
    # SV flagship protocol: 1024 chains, 200+200, blocks of 50 (bench.py).
    # Scale EVERY arm's chain count by the same 4x factor (not just the
    # 4096 default) so the 8192-chain throughput arm runs 2048 — past
    # that the axon worker's ~1-min jitted-block watchdog kills SV
    # blocks (docs/BENCHMARKS.md round-2 root cause).
    if model == "sv" and not tiny:
        n_chains = max(256, n_chains // 4)
    block = 50 if model == "sv" else 100
    iters = (100, 100) if tiny else (
        (200, 200) if model == "sv" else (400, 400))
    # compile pass at block shapes, then timed full run per seed
    t0 = time.time()
    bench._run_once(logp_grad, dim, n_chains, block, block, 2026, jnp.float32,
                    model_name=model)
    compile_s = time.time() - t0
    res = []
    for s in seeds:
        r = bench._run_once(logp_grad, dim, n_chains, iters[0], iters[1], s,
                            jnp.float32, model_name=model)
        draws = r.pop("draws")
        r.pop("tight_inputs", None)  # (C, N, 2) arrays for bench's own
        # tight-protocol stats — not a timing field
        ess = None
        if name.endswith("_8192") or os.environ.get("AB_ESS"):
            if isinstance(draws, np.ndarray):
                from walnuts_tpu.summary import effective_sample_size

                d = np.moveaxis(draws, 0, 1)
                ess = float(np.median(effective_sample_size(
                    [d[c] for c in range(d.shape[0])])))
            else:
                # wide posteriors (SV) stay device-resident — the host
                # link cannot move the cube (mirrors bench._ess_per_sec)
                from walnuts_tpu.summary_device import (
                    effective_sample_size_device_chunked,
                )

                ess = float(np.median(np.asarray(
                    effective_sample_size_device_chunked(
                        jnp.moveaxis(draws, 0, 1)))))
        del draws
        res.append({**{k: round(v, 3) for k, v in r.items()}, "ess": ess})
    out = {
        "arm": name,
        "model": model,
        "n_chains": n_chains,
        "compile_s": round(compile_s, 1),
        "warmup_s": [x["warmup_time"] for x in res],
        "sampling_s": [x["sampling_time"] for x in res],
        "grads": [x["total_grads"] for x in res],
        "ess": [x["ess"] for x in res],
    }
    return out


def main():
    import jax

    if os.environ.get("AB_PLATFORM"):  # CPU smoke: AB_PLATFORM=cpu AB_TINY=1
        jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from walnuts_tpu.ops.math import make_logp_grad

    model = os.environ.get("AB_MODEL", "funnel")
    if model == "funnel":
        from walnuts_tpu.models import funnel

        logp, dim = funnel(101)
    elif model == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
    else:
        from walnuts_tpu.models import logistic_regression

        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)

    names = sys.argv[1:] or list(ARMS)
    for name in names:
        env, n_chains = ARMS[name]
        print(f"[ab] {name} starting ({env}, C={n_chains}, {model})",
              file=sys.stderr, flush=True)
        t0 = time.time()
        out = run_arm(name, env, n_chains, logp_grad, dim, model=model)
        out["wall_s"] = round(time.time() - t0, 1)
        line = json.dumps(out)
        print(line, flush=True)
        with open("/tmp/ab_results.jsonl", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
