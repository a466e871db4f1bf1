"""Benchmark driver: 4096-chain adaptive WALNUTS on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures ESS/sec (and grad-evals/sec) for the BASELINE.json benchmark:
4096 vmapped adaptive-WALNUTS chains on Neal's funnel and the
German-credit-shaped logistic regression, fixed iteration counts
(deterministic), float32 on TPU. Warmup and sampling are timed separately;
programs are compiled by a first identical run before the timed run.

``vs_baseline`` compares against a 64-core C++ WALNUTS baseline
extrapolated from the single-core native benchmark in
``csrc/baseline_bench.cpp`` (the reference publishes no numbers —
BASELINE.md). The measured single-core numbers live in
``BASELINE_MEASURED.json`` (written by ``python csrc/run_baseline.py``);
for the logistic regression both samplers target the exact same dataset.
"""

import json
import os
import time

import numpy as np


def _run_once(logp_grad, dim, n_chains, warmup_iters, sampling_iters, seed, dtype,
              model_name=""):
    """One full warmup+sampling pipeline with separate phase timings."""
    import jax
    import jax.numpy as jnp

    from walnuts_tpu.config import SamplingConfig, WarmupConfig
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import (
        freeze_params,
        init_sample_state,
        init_warmup_state,
    )
    from walnuts_tpu.ops.math import adapt_step_size
    from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

    # max_step_halvings=8: the WALNUTS halving budget sized so tail chains
    # (a few per 4096 at radius-2 inits) can always recover instead of
    # sticking and poisoning the cross-chain ESS; the native baseline is
    # measured with the same budget (BASELINE_MAX_HALVINGS=8).
    halvings = int(os.environ.get("BENCH_HALVINGS", 8))
    # fixed 100-iteration blocks: the short compile pass (100+100 iters)
    # compiles the same block programs the timed 400+400 run reuses. The
    # 1003-dim SV uses 50: the axon worker kills single jitted blocks
    # running longer than ~1 min (docs/BENCHMARKS.md round-2 root cause)
    # and SV blocks of 100 draws sit near that threshold.
    block = int(os.environ.get("BENCH_BLOCK", 50 if model_name == "sv" else 100))
    warmup_cfg = WarmupConfig(
        min_iter=warmup_iters, max_iter=warmup_iters,
        block_size=min(block, warmup_iters),
    )
    sampling_cfg = SamplingConfig(
        min_iter=sampling_iters, max_iter=sampling_iters,
        block_size=min(block, sampling_iters), max_step_halvings=halvings,
    )

    base = jax.random.key(seed)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(n_chains))
    theta0 = 2.0 * jax.random.normal(
        jax.random.fold_in(base, 0xFFFFFFFF), (n_chains, dim), dtype=dtype
    )
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    init_mass = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    step_keys = jax.vmap(lambda c: jax.random.fold_in(base, c + n_chains))(
        jnp.arange(n_chains)
    )
    step0 = jax.jit(
        jax.vmap(lambda k, t, m: adapt_step_size(k, logp_grad, t, m, jnp.asarray(1.0, dtype)))
    )(step_keys, theta0, init_mass)
    jax.block_until_ready(step0)

    wstate = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, warmup_cfg, sampling_cfg)
    )(keys, theta0, init_mass, step0)

    t0 = time.time()
    bf16 = bool(int(os.environ.get("BENCH_BF16_ENDS", 0)))
    unroll = int(os.environ.get("BENCH_UNROLL", 1))
    groups_env = int(os.environ.get("BENCH_GROUPS", 1))
    batched = bool(int(os.environ.get("BENCH_BATCHED", 1))) and groups_env == 1
    # warmup scheduler knobs (the batched warmup is asynchronous per lane;
    # runahead/K/groups are scheduling-only — BENCH_WARMUP_B/_T2K/_GROUPS
    # override; tools/ab_tpu.py re-measures the warmup arms).
    # Warmup tier2_every default is 12 on funnel/SV, 6 on logreg: at
    # the early-warmup state tier-2 passes are ~75% of block wall at
    # K=6 (clean two-K isolate, docs/warmup_isolate_r5.json: t_trip
    # 12.1 us == sampling's, t_pass 222 us) — K=12 measured warmup wall
    # -17% on funnel AND SV with identical grad counts; K=18 ties K=12
    # (pass floor), warmup groups=4 loses, and logreg (expensive matmul
    # trips, passes a small share — its sampling K=6 preference) runs
    # +5% at K=12 (docs/BENCHMARKS.md round 5)
    # block_budget=0: the bench hand-tunes block sizes per model (see
    # `block` above) and the ref-accounting correction below infers
    # block counts from them — a transient worker slowdown must not
    # shrink realized blocks mid-run (skewing that correction and
    # recompiling new scan lengths inside the timed region)
    wstate, _, _, info = run_warmup(
        logp_grad, wstate, warmup_cfg, sampling_cfg, bf16_ends=bf16,
        unroll=unroll, batched=batched, block_budget=0.0,
        runahead=int(os.environ.get("BENCH_WARMUP_B", 4)),
        tier2_every=int(os.environ.get(
            "BENCH_WARMUP_T2K", 6 if model_name == "logreg" else 12)),
        batched_groups=int(os.environ.get("BENCH_WARMUP_GROUPS", 1))
        if batched else 1,
    )
    jax.block_until_ready(wstate)  # dispatch is async; time the actual work
    warmup_time = time.time() - t0
    warmup_grads = int(np.sum(np.asarray(wstate.n_grads)))

    params = jax.vmap(freeze_params)(wstate)
    sstate = jax.vmap(init_sample_state)(wstate)
    groups = int(os.environ.get("BENCH_GROUPS", 1))
    bf16 = bool(int(os.environ.get("BENCH_BF16_ENDS", 0)))
    t0 = time.time()
    # draws stay device-resident during the timed loop (the C++ baseline's
    # in-RAM stores are likewise ~free); the host transfer is timed
    # separately below
    # batched-native scheduler (core/batched.py): the measured winner on
    # every bench model (funnel 1.3x with dynamic cost groups, logreg
    # 1.3x, SV 2.6x — docs/BENCHMARKS.md round 3); BENCH_BATCHED /
    # BENCH_BGROUPS / BENCH_RUNAHEAD / BENCH_T2K override. Dynamic
    # cost-sorted groups only pay on the funnel's heavy-tailed per-chain
    # costs; logreg/SV run one group.
    default_groups = 4 if model_name == "funnel" else 1
    # per-model (B, K) from the round-3 knob sweep (docs/BENCHMARKS.md):
    # the funnel's cheap body wants a shallow B=4 buffer (-6.5%), the
    # 1003-dim SV's wide tier-2 rows want K=12 amortisation (-17%).
    default_runahead = 4 if model_name == "funnel" else 8
    default_t2k = 12 if model_name == "sv" else 6
    sstate, draws, _, info = run_sampling(
        logp_grad, sstate, params, sampling_cfg, info=info,
        chain_groups=groups, device_draws=True, bf16_ends=bf16,
        block_budget=0.0,
        flatten=bool(int(os.environ.get("BENCH_FLATTEN", 0))) and groups == 1,
        batched=batched,
        batched_groups=int(os.environ.get("BENCH_BGROUPS", default_groups))
        if batched else 1,
        runahead=int(os.environ.get("BENCH_RUNAHEAD", default_runahead)),
        tier2_every=int(os.environ.get("BENCH_T2K", default_t2k)),
        pallas_replay=bool(int(os.environ.get("BENCH_PREPLAY", 0))),
        fresh_cur=bool(int(os.environ.get("BENCH_FRESHCUR", 0))),
        # fused tier-2 pass kernel (ops/fused_pass.py) — LOST its
        # round-4 A/B in both kernel orientations (docs/BENCHMARKS.md
        # "Fused-pass kernel post-mortem"); off by default
        pallas_pass=bool(int(os.environ.get("BENCH_PPASS", 0))) and batched
        and not any(int(os.environ.get(k, 0)) for k in
                    ("BENCH_FRESHCUR", "BENCH_BF16_ENDS")),
        unroll=unroll,
    )
    jax.block_until_ready((sstate, draws))
    sampling_time = time.time() - t0
    # per-chain sampling grads + a dim-0/1 draw slice for the tight
    # parity statistics (walnuts_tpu.parity; ~13 MB host copy at the
    # funnel flagship shape — negligible, and OUTSIDE the timed region)
    wg_chain = np.asarray(wstate.n_grads, np.int64)
    sg_chain = np.asarray(info.n_grads, np.int64) - wg_chain
    n_blocks = -(-sampling_iters // min(block, max(sampling_iters, 1)))
    sg_chain_ref = sg_chain + (
        (sampling_iters - n_blocks) if batched else 0
    )
    d01 = np.asarray(jax.device_get(draws[:, :, :2]), np.float64)
    t0 = time.time()
    # Round 4: the bench is device-resident end to end by default —
    # the funnel's host transfer alone cost ~27 s/seed on this tunnel
    # (BENCH_r01/r02 detail) and ESS runs on device anyway
    # (summary_device, matches the host estimator to float tolerance;
    # tested). BENCH_DEVICE_ESS=0 restores the host path. Very wide
    # posteriors (the 1003-dim SV) ALWAYS stay device-resident: the
    # host link cannot move the 6.6 GB cube.
    if dim <= 256 and not int(os.environ.get("BENCH_DEVICE_ESS", 1)):
        draws = np.asarray(draws)
    transfer_time = time.time() - t0
    total_grads = int(np.sum(info.n_grads))
    # REFERENCE-ACCOUNTING gradient counter (VERDICT r3 item 2): the
    # batched scheduler caches the trajectory-start gradient within a
    # block where the reference re-evaluates it every draw
    # (walnuts.hpp:531-532) — its counter is lower by one per draw per
    # chain, minus the block entries it does pay. Emitting both lets
    # the "within 5%" ESS/grad parity claim be judged on like counters.
    import math

    w_blocks = math.ceil(warmup_iters / min(block, max(warmup_iters, 1)))
    s_blocks = math.ceil(
        sampling_iters / min(block, max(sampling_iters, 1)))
    cached = (
        n_chains * (warmup_iters - w_blocks + sampling_iters - s_blocks)
        if batched else 0
    )
    return {
        "draws": draws,  # (iters, C, D); jax array when dim > 256
        "tight_inputs": (np.moveaxis(d01, 0, 1), sg_chain_ref),  # (C,N,2)
        "warmup_time": warmup_time,
        "sampling_time": sampling_time,
        "transfer_time": transfer_time,
        "warmup_grads": warmup_grads,
        "sampling_grads": total_grads - warmup_grads,
        "total_grads": total_grads,
        "total_grads_ref_acct": total_grads + cached,
    }


def _ess_per_sec(model_name, n_chains, warmup_iters, sampling_iters, seed):
    import jax.numpy as jnp

    if model_name == "sv":
        # the SV flagship protocol (and its native baseline,
        # sv_ess_per_grad_1024c): 1024 chains, 200+200 — chain scaling is
        # sublinear past 1024/chip on this model (docs/ROADMAP.md item 2)
        n_chains = int(os.environ.get("BENCH_SV_CHAINS", 1024))
        warmup_iters = int(os.environ.get("BENCH_SV_WARMUP", 200))
        sampling_iters = int(os.environ.get("BENCH_SV_SAMPLING", 200))

    from walnuts_tpu.models import funnel, logistic_regression
    from walnuts_tpu.ops.math import make_logp_grad
    from walnuts_tpu.summary import effective_sample_size

    if model_name == "funnel":
        logp, dim = funnel(101)
    elif model_name == "sv":
        from walnuts_tpu.models import stochastic_volatility

        logp, dim = stochastic_volatility()
    else:
        logp, dim = logistic_regression()
    logp_grad = make_logp_grad(logp)

    # compile pass: one block of each phase compiles the programs the
    # timed run reuses (identical shapes via the fixed block size; SV
    # default 50 — see _run_once)
    block = int(os.environ.get("BENCH_BLOCK", 50 if model_name == "sv" else 100))
    _run_once(logp_grad, dim, n_chains, min(block, warmup_iters),
              min(block, sampling_iters), seed, jnp.float32,
              model_name=model_name)
    # full-length untimed warm run (BENCH_WARMRUN=0 skips): the worker
    # is TRANSIENTLY degraded right after heavy compiles (CLAUDE.md) —
    # the first timed SV seed measured 20.6/24.6 s vs 12.7-14.5 s for
    # seeds 2-3 in BOTH the round-4 official run and the round-5 smoke.
    # One discarded full run burns that window so every timed seed runs
    # in steady state (the calibration arm then attributes any residual
    # drift). Uses seed+0, disjoint from the timed seeds (seed+1+s).
    if int(os.environ.get("BENCH_WARMRUN", 1)):
        _run_once(logp_grad, dim, n_chains, warmup_iters, sampling_iters,
                  seed, jnp.float32, model_name=model_name)

    # seed-averaged: the funnel's median-dim pooled ESS carries ~30% seed
    # noise even at 4096 chains (measured, docs/BENCHMARKS.md), so the
    # headline aggregates means over BENCH_SEEDS runs — matching the
    # seed-averaged native baseline (csrc/run_baseline.py). Ratios are
    # taken of means, not means of ratios. Round 4: the SV flagship runs
    # 3 seeds too (VERDICT r3 item 2 — its matched parity ratio was
    # judged on ONE TPU seed; ~40 s/seed is affordable now that the
    # bench is device-resident end to end). Round 5: funnel/logreg run
    # 5 seeds, matching the native side's 5 (BASELINE_MEASURED
    # *_n_seeds) — the r4→r5 headline move (1.011→0.973 on bitwise
    # -identical funnel draws at equal wall) was pure pooled-ESS seed
    # noise at 3 TPU vs 5 native seeds; ~+35 s of bench wall.
    n_seeds = int(os.environ.get(
        "BENCH_SEEDS", 3 if model_name == "sv" else 5))
    per_seed_ess = []
    per_seed_time = []  # transient worker slowdowns show up here
    per_seed_grads = []  # per-seed ESS/grad -> parity-ratio seed spread
    per_seed_grads_ref = []  # reference-accounting counters (see _run_once)
    tight_rhos, tight_xs, tight_live_g, tight_live_n = [], [], 0, 0
    agg = None
    for s in range(n_seeds):
        r = _run_once(logp_grad, dim, n_chains, warmup_iters, sampling_iters,
                      seed + 1 + s, jnp.float32, model_name=model_name)
        draws = r.pop("draws")
        d01, sg_chain_ref = r.pop("tight_inputs")
        if model_name in ("funnel", "sv"):
            # tight fixed-window parity statistics (walnuts_tpu.parity):
            # live-chain autocorrelations + ref-accounting grads
            from walnuts_tpu.parity import chain_autocorr_stats

            rho, live, x = chain_autocorr_stats(d01)
            tight_rhos.append(rho)
            tight_xs.append(x)
            tight_live_g += int(sg_chain_ref[live].sum())
            tight_live_n += int(live.sum())
        # ESS over ALL dims; the native baseline records all dims too
        # (csrc/baseline_bench.cpp keep_dims), so the median-ESS estimator
        # is the same protocol on both sides of vs_baseline
        if isinstance(draws, np.ndarray):
            draws = np.moveaxis(draws, 0, 1)  # (C, iters, D)
            ess = effective_sample_size(
                [draws[c] for c in range(draws.shape[0])])
        else:
            # device-resident wide cube: chunked on-device Geyer ESS
            # (matches the host estimator to float tolerance; tested)
            import jax.numpy as jnp_

            from walnuts_tpu.summary_device import (
                effective_sample_size_device_chunked,
            )

            ess = np.asarray(effective_sample_size_device_chunked(
                jnp_.moveaxis(draws, 0, 1)))
        per_seed_ess.append(float(np.median(ess)))
        per_seed_time.append(round(r["sampling_time"], 3))
        per_seed_grads.append(float(r["total_grads"]))
        per_seed_grads_ref.append(float(r["total_grads_ref_acct"]))
        r["ess_min"] = float(np.min(ess))
        agg = r if agg is None else {
            k: (v + r[k] if isinstance(v, (int, float)) else r[k])
            for k, v in agg.items()
        }
    r = {k: (v / n_seeds if isinstance(v, (int, float)) else v)
         for k, v in agg.items()}
    ess_median = float(np.mean(per_seed_ess))
    total_time = r["warmup_time"] + r["sampling_time"]
    tight = None
    if tight_rhos:
        from walnuts_tpu.parity import tight_ratio, tight_summary

        tight = tight_summary(
            np.concatenate(tight_rhos), np.concatenate(tight_xs),
            tight_live_g / max(tight_live_n * sampling_iters, 1),
        )
        # certifiable ratio vs the checked-in native tight stats
        # (docs/parity_tight_r4.json funnel; docs/parity_tight_sv_r5.json
        # SV — regenerate with tools/parity_tight.py when the native
        # protocol changes). The pooled matched fields below are
        # noisy-legacy next to this (±30-40 % seed noise).
        npath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "docs",
            "parity_tight_r4.json" if model_name == "funnel"
            else "parity_tight_sv_r5.json")
        if os.path.exists(npath):
            with open(npath) as f:
                native = json.load(f).get("native")
            if native and warmup_iters == (
                400 if model_name == "funnel" else 200
            ) and sampling_iters == warmup_iters and n_chains == (
                4096 if model_name == "funnel" else 1024
            ):
                rt, se = tight_ratio(tight, native)
                tight["ratio_vs_native"] = rt
                tight["ratio_se"] = se
            else:
                tight["ratio_vs_native"] = None  # protocol mismatch:
                # the stored native stats are for the flagship protocol
        tight.pop("rho_bar", None)
        tight.pop("rho_bar_se", None)
        tight["accounting"] = "live-chain, reference counters"
    return {
        "model": model_name,
        "dim": dim,
        "n_chains": n_chains,
        "n_seeds": n_seeds,
        "ess_median": ess_median,
        "ess_median_per_seed": per_seed_ess,
        "sampling_time_per_seed": per_seed_time,
        "ess_per_grad_per_seed": [e / g for e, g
                                  in zip(per_seed_ess, per_seed_grads)],
        "ess_per_grad_ref_acct_per_seed": [
            e / g for e, g in zip(per_seed_ess, per_seed_grads_ref)],
        "ess_min": r.pop("ess_min"),
        "ess_per_sec": float(ess_median / r["sampling_time"]),
        "ess_per_sec_incl_warmup": float(ess_median / total_time),
        "grad_evals_per_sec": float(r["total_grads"] / total_time),
        "sampling_grad_evals_per_sec": float(r["sampling_grads"] / r["sampling_time"]),
        "ess_per_grad": float(ess_median / r["total_grads"]),
        "ess_per_grad_ref_acct": float(
            ess_median / r["total_grads_ref_acct"]),
        **({"tight": tight} if tight else {}),
        **{k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()},
    }


def main():
    # The axon TPU plugin initialises at `import jax` and BLOCKS
    # indefinitely while its worker is unreachable (observed: a >24 h
    # worker outage hung every jax process at import). Probe device
    # availability in a SUBPROCESS with a timeout first, so a dead
    # worker yields one honest JSON error line instead of hanging the
    # bench driver until its own timeout kills it. BENCH_PLATFORM (the
    # TPU-less smoke override) and BENCH_SKIP_PROBE=1 skip the probe.
    if not os.environ.get("BENCH_PLATFORM") and not int(
        os.environ.get("BENCH_SKIP_PROBE", 0)
    ):
        import subprocess
        import sys

        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True,
                timeout=float(os.environ.get("BENCH_PROBE_TIMEOUT", 300)),
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({
                "metric": "ess_per_sec_4096chains_geomean_funnel_logreg",
                "value": None,
                "unit": "ESS/s (median dim, sampling phase)",
                "vs_baseline": None,
                "error": "device backend unreachable (jax import/device "
                         "probe failed or timed out — TPU worker outage?)",
            }))
            return

    import jax

    # BENCH_PLATFORM=cpu forces a backend for TPU-less smoke runs (the
    # axon plugin overrides the JAX_PLATFORMS env var, so this must be a
    # config update before any device use — CLAUDE.md environment rules)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # persistent compile cache: repeat runs (and the driver's) skip the
    # multi-minute XLA compiles
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    n_chains = int(os.environ.get("BENCH_CHAINS", 4096))
    warmup_iters = int(os.environ.get("BENCH_WARMUP", 400))
    sampling_iters = int(os.environ.get("BENCH_SAMPLING", 400))

    backend = jax.default_backend()

    # Fixed-work calibration arm (VERDICT r4 item 4): a deterministic
    # elementwise loop timed on the same device immediately before the
    # models. Cross-round headline movement at the ±20 % level
    # (observed: logreg 10.73x vs 8.37x on the SAME build within one
    # day) is attributable iff this number moved with it — the axon
    # worker's speed state drifts after crashes (CLAUDE.md). The work
    # is deliberately SMALL and synchronized by a host VALUE fetch:
    # axon's block_until_ready can return before remote execution
    # finishes, and a big un-awaited dispatch wedges the worker for
    # many minutes (measured the hard way, round 5). Take the min of 3
    # reps (dispatch jitter).
    def _calibration_time():
        import jax.numpy as jnp_

        x = jax.random.normal(jax.random.key(0), (1024, 1024), jnp_.float32)

        @jax.jit
        def work(x):
            y = jax.lax.fori_loop(
                0, 50, lambda i, x: 0.999 * x + 0.001 * jnp_.tanh(x), x
            )
            return y.sum()

        float(work(x))  # compile + first run outside the timing
        reps = []
        for _ in range(3):
            t0 = time.time()
            float(work(x))
            reps.append(time.time() - t0)
        return round(min(reps), 4)

    try:
        calibration_time = _calibration_time()
    except Exception:  # never let the control arm kill the bench line
        calibration_time = None
    # headline metric = funnel + logreg geomean (BASELINE.json); the
    # 1003-dim stochastic-volatility flagship (configs[4]) runs by default
    # into the detail (its matched parity ratio belongs in every round's
    # record) without changing the headline; BENCH_SV=0 skips it
    models = ["funnel", "logreg"]
    if int(os.environ.get("BENCH_SV", 1)):
        models.append("sv")
    if os.environ.get("BENCH_MODELS"):  # explicit override, e.g. "sv"
        models = os.environ["BENCH_MODELS"].split(",")
    results = []
    for model in models:
        try:
            results.append(
                _ess_per_sec(model, n_chains, warmup_iters, sampling_iters,
                             seed=2026)
            )
        except Exception as e:  # a worker crash on one model (the SV
            # flagship runs ~1-min jitted blocks near the axon watchdog)
            # must not take down the whole bench line
            if model in ("funnel", "logreg") and not os.environ.get(
                    "BENCH_MODELS"):
                raise  # headline models: fail loudly
            results.append({"model": model, "error": repr(e)})

    # headline = geomean over the funnel+logreg subset; with an explicit
    # BENCH_MODELS override that excludes both, fall back to the geomean
    # over whatever ran (never an empty mean -> NaN -> invalid JSON)
    ran = [r for r in results if "ess_per_sec" in r]
    vals = [np.log(r["ess_per_sec"]) for r in ran if r["model"] != "sv"]
    if not vals:
        vals = [np.log(r["ess_per_sec"]) for r in ran]
    value = float(np.exp(np.mean(vals))) if vals else None

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # 64-core extrapolation of the measured single-core C++ ESS/sec,
        # compared on sampling-phase throughput for both sides
        per_model = []
        for r in ran:
            key = f"{r['model']}_ess_per_sec_1core"
            if key in base:
                r["ess_per_sec_vs_baseline_64core"] = float(
                    r["ess_per_sec"] / (64.0 * base[key])
                )
                if r["model"] != "sv":  # headline stays funnel+logreg
                    per_model.append(r["ess_per_sec"] / (64.0 * base[key]))
            # ESS/grad parity vs the native reference implementation, from
            # the SAME run that produces the throughput number (north star:
            # within 5%; reference counting per stan_cli.cpp:121-139)
            pkey = f"{r['model']}_ess_per_grad"
            if pkey in base:
                r["ess_per_grad_vs_baseline"] = float(r["ess_per_grad"] / base[pkey])
            # matched-chain-count parity where a native run at THIS chain
            # count exists (the pooled ESS estimator scales with chain
            # count, so the 16-chain ratio above is not a parity metric;
            # docs/BENCHMARKS.md "ESS-per-gradient parity")
            mkey = f"{r['model']}_ess_per_grad_{r.get('n_chains', n_chains)}c"
            if mkey in base:
                r["ess_per_grad_vs_baseline_matched"] = float(
                    r["ess_per_grad"] / base[mkey]
                )
                # like-for-like counters: the batched path's cached
                # trajectory-start gradients added back (see _run_once)
                r["ess_per_grad_vs_baseline_matched_ref_acct"] = float(
                    r["ess_per_grad_ref_acct"] / base[mkey]
                )
                # seed-spread interval on the matched ratio: worst-case
                # pairing of the per-seed ESS/grad ranges on both sides
                # (TPU seeds from this run; native seeds from
                # csrc/run_matched_baseline.py). The north-star "within
                # 5%" claim is judged against this interval, not the
                # point ratio.
                bspread = base.get(f"{mkey}_seed_spread")
                tpu_epg = r.get("ess_per_grad_per_seed")
                if bspread and tpu_epg:
                    r["ess_per_grad_vs_baseline_matched_range"] = [
                        float(min(tpu_epg) / bspread[1]),
                        float(max(tpu_epg) / bspread[0]),
                    ]
                    r["matched_native_n_seeds"] = base.get(
                        f"{r['model']}_{r.get('n_chains', n_chains)}c_n_seeds"
                    )
        if per_model:
            vs_baseline = float(np.exp(np.mean(np.log(per_model))))

    print(
        json.dumps(
            {
                "metric": "ess_per_sec_4096chains_geomean_funnel_logreg",
                "value": value,
                "unit": "ESS/s (median dim, sampling phase)",
                "vs_baseline": vs_baseline,
                "backend": backend,
                "n_chains": n_chains,
                "calibration_time": calibration_time,
                "detail": results,
            }
        )
    )


if __name__ == "__main__":
    main()
