"""Benchmark driver: 4096-chain adaptive WALNUTS on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures ESS/sec (and grad-evals/sec) for the BASELINE.json benchmark:
4096 vmapped adaptive-WALNUTS chains on Neal's funnel and the
German-credit-shaped logistic regression, fixed iteration counts
(determinism), float32 on TPU.

``vs_baseline`` compares against a 64-core C++ WALNUTS baseline
extrapolated from the single-core native benchmark in
``csrc/baseline_bench.cpp`` (the reference publishes no numbers —
BASELINE.md). The measured single-core number is stored in
``BASELINE_MEASURED.json`` by ``python csrc/run_baseline.py``.
"""

import json
import os
import sys
import time

import numpy as np


def _ess_per_sec(model_name, n_chains, warmup_iters, sampling_iters, seed):
    import jax
    import jax.numpy as jnp

    from walnuts_tpu import walnuts
    from walnuts_tpu.models import funnel, logistic_regression
    from walnuts_tpu.summary import effective_sample_size

    if model_name == "funnel":
        logp, dim = funnel(101)
    else:
        logp, dim = logistic_regression()

    # compile + warmup phase (not timed as sampling throughput)
    out, info = walnuts(
        logp,
        num_params=dim,
        num_chains=n_chains,
        seed=seed,
        min_warmup_iter=warmup_iters,
        max_warmup_iter=warmup_iters,
        min_sampling_iter=sampling_iters,
        max_sampling_iter=sampling_iters,
        block_size=sampling_iters,
        dtype=jnp.float32,
        return_info=True,
    )
    # timed run: rebuild the sampling pass alone is awkward through the
    # high-level API, so time a second identical run end-to-end and
    # subtract nothing — instead we time the sampling blocks directly by
    # re-running with the same fixed lengths and measuring wall time of the
    # whole call, then attribute by iteration counts.
    t0 = time.time()
    out2, info2 = walnuts(
        logp,
        num_params=dim,
        num_chains=n_chains,
        seed=seed + 1,
        min_warmup_iter=warmup_iters,
        max_warmup_iter=warmup_iters,
        min_sampling_iter=sampling_iters,
        max_sampling_iter=sampling_iters,
        block_size=sampling_iters,
        dtype=jnp.float32,
        return_info=True,
    )
    elapsed = time.time() - t0

    draws = np.stack([np.asarray(c) for c in out2], axis=0)  # (C, N, D)
    # ESS over a representative subset of dims (all dims for logreg; the
    # funnel's v plus 16 x's) to bound summary cost
    subset = draws if draws.shape[-1] <= 32 else draws[:, :, :17]
    ess = effective_sample_size(subset)
    total_grads = int(np.sum(info2.n_grads))
    sampling_fraction = sampling_iters / (warmup_iters + sampling_iters)
    sampling_time = elapsed * sampling_fraction
    return {
        "model": model_name,
        "dim": dim,
        "ess_median": float(np.median(ess)),
        "ess_min": float(np.min(ess)),
        "ess_per_sec": float(np.median(ess) / sampling_time),
        "grad_evals_total": total_grads,
        "grad_evals_per_sec": float(total_grads / elapsed),
        "ess_per_grad": float(np.median(ess) / total_grads),
        "wall_time_sec": elapsed,
    }


def main():
    import jax

    n_chains = int(os.environ.get("BENCH_CHAINS", 4096))
    warmup_iters = int(os.environ.get("BENCH_WARMUP", 400))
    sampling_iters = int(os.environ.get("BENCH_SAMPLING", 400))

    backend = jax.default_backend()
    results = []
    for model in ("funnel", "logreg"):
        results.append(
            _ess_per_sec(model, n_chains, warmup_iters, sampling_iters, seed=2026)
        )

    value = float(np.exp(np.mean([np.log(r["ess_per_sec"]) for r in results])))

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # 64-core extrapolation of the measured single-core C++ ESS/sec
        per_model = []
        for r in results:
            key = f"{r['model']}_ess_per_sec_1core"
            if key in base:
                per_model.append(r["ess_per_sec"] / (64.0 * base[key]))
        if per_model:
            vs_baseline = float(np.exp(np.mean(np.log(per_model))))

    print(
        json.dumps(
            {
                "metric": "ess_per_sec_4096chains_geomean_funnel_logreg",
                "value": value,
                "unit": "ESS/s (median dim)",
                "vs_baseline": vs_baseline,
                "backend": backend,
                "n_chains": n_chains,
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    main()
