"""Tight ESS/grad parity protocol: fixed-window mean autocorrelation.

The pooled-ESS ratio estimator that backs the headline "within 5%"
parity claim is too noisy to certify 5% on the funnel (per-seed pooled
ESS swings 30-40% at 4096 chains x 400 draws — rank-normalization +
Geyer adaptive truncation jitter; VERDICT r3 "What's weak" item 1).
This protocol compares the same underlying quantity — sampling
efficiency per gradient — through statistics whose standard errors
shrink with the CHAIN count instead of the seed count:

  1. rho_bar_k: the cross-chain mean autocorrelation of coordinate 0
     (the slow hyperparameter direction: funnel log-scale / SV mu)
     at FIXED lags k = 1..K. SE = cross-chain std / sqrt(C_live); no
     adaptive truncation.
  2. a fixed-window ESS fraction  1 / (1 + 2 sum_{k<=K} rho_bar_k)
     with a delta-method CI from the rho_bar covariances.
  3. reference-accounting sampling gradients per LIVE chain per draw
     (SV: ~52% of the protocol's chains are stuck-from-birth in BOTH
     implementations — docs/BENCHMARKS.md "SV stuck-chain discovery" —
     and carry zero dim-0 variance, so they are excluded from the
     autocorrelation estimate; their gradient budget is excluded to
     match. All-chain accounting is reported alongside.)
  4. marginal moment parity of dim 0 (mean/var with cross-chain SEs).

Ratio (2)/(3) across implementations is the tight ESS/grad parity
statistic. Native side: csrc/baseline_bench with BASELINE_KEEP_DIMS
dumps (chain-major) f64 draws and BASELINE_CHAIN_STATS=1 emits
per-chain CHAINSTAT grad counters on stderr; TPU side: this script
replays the exact bench.py flagship protocols and stores dim-0/1
draws + per-chain grad counters per seed.

Usage:
  python tools/parity_tight.py tpu [seed...]          # funnel f32 seeds
  python tools/parity_tight.py tpu-sv [seed...]       # SV f32 seeds
  python tools/parity_tight.py tpu-sv-f64 [seed...]   # SV f64 seeds
  python tools/parity_tight.py tpu-sv-mixed [seed...] # SV f64 state + f32 model
  python tools/parity_tight.py analyze                # funnel vs native
  python tools/parity_tight.py analyze-sv             # SV arms vs native

Round-4 funnel result: ratio 1.0081 +/- 0.0018 (docs/parity_tight_r4.json).

Reference counter semantics: stan_cli.cpp:121-139 (grad counts);
walnuts.hpp:520-563 (the hot loop both sides schedule).
"""
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from walnuts_tpu.parity import (  # noqa: E402
    LAGS,
    chain_autocorr_stats as _chain_stats,
    tight_summary as _summ,
    tight_ratio as _tight_ratio,
)

TPU_OUT = "/tmp/parity_tight_tpu_s{seed}.npz"
NATIVE_GLOB = "/tmp/native_funnel_tight_s*.bin"
TPU_SV_OUT = "/tmp/parity_tight_tpu_sv_s{seed}.npz"
TPU_SV64_OUT = "/tmp/parity_tight_tpu_sv64_s{seed}.npz"
TPU_SVMIXED_OUT = "/tmp/parity_tight_tpu_svmixed_s{seed}.npz"
NATIVE_SV_GLOB = "/tmp/native_sv_tight_s*.bin"

# bench.py flagship protocols (keep in sync with bench._run_once /
# _ess_per_sec defaults: funnel G=4/K=6/B=4 block 100; SV G=1/K=12/B=8
# block 50; warmup B=4 both; halvings=8 both)
PROTO = {
    "funnel": dict(C=4096, W=400, N=400, block=100, groups=4, t2k=6,
                   runahead=4, warmup_b=4),
    "sv": dict(C=1024, W=200, N=200, block=50, groups=1, t2k=12,
               runahead=8, warmup_b=4),
}


def run_tpu(seed: int, model: str = "funnel", f64: bool = False,
            mixed: bool = False) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    import jax

    if f64 or mixed:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from walnuts_tpu.config import SamplingConfig, WarmupConfig
    from walnuts_tpu.core.adapt import nutpie_init_mass
    from walnuts_tpu.core.sampler import (
        freeze_params,
        init_sample_state,
        init_warmup_state,
    )
    from walnuts_tpu.models import funnel, stochastic_volatility
    from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
    from walnuts_tpu.parallel.runtime import run_sampling, run_warmup

    p = PROTO[model]
    if model == "sv":
        logp, dim = stochastic_volatility()
    else:
        logp, dim = funnel(101)
    if mixed:
        # the shipped model_dtype=f32 island (api.py): f64 sampler state,
        # model value+gradient in f32 cast up
        _logp64 = logp

        def logp(theta):
            return _logp64(theta.astype(jnp.float32)).astype(jnp.float64)
    logp_grad = make_logp_grad(logp)
    C, W, N = p["C"], p["W"], p["N"]
    dtype = jnp.float64 if (f64 or mixed) else jnp.float32
    wc = WarmupConfig(min_iter=W, max_iter=W, block_size=min(p["block"], W))
    sc = SamplingConfig(min_iter=N, max_iter=N, block_size=min(p["block"], N),
                        max_step_halvings=8)
    base = jax.random.key(seed)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(
        jax.random.fold_in(base, 0xFFFFFFFF), (C, dim), dtype=dtype)
    grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
    im = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
    sk = jax.vmap(lambda c: jax.random.fold_in(base, c + C))(jnp.arange(C))
    s0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, logp_grad, t, m, jnp.asarray(1.0, dtype))
    ))(sk, theta0, im)
    ws = jax.vmap(lambda k, t, m, s: init_warmup_state(k, t, m, s, wc, sc))(
        keys, theta0, im, s0)
    ws, _, _, info = run_warmup(logp_grad, ws, wc, sc, batched=True,
                                runahead=p["warmup_b"])
    wg = np.asarray(ws.n_grads, np.int64)
    ss = jax.vmap(init_sample_state)(ws)
    ss, dr, _, info = run_sampling(
        logp_grad, ss, params := jax.vmap(freeze_params)(ws), sc, info=info,
        device_draws=True, batched=True, batched_groups=p["groups"],
        runahead=p["runahead"], tier2_every=p["t2k"])
    del params
    sg = np.asarray(ss.n_grads, np.int64) - wg
    # reference accounting: + the cached trajectory-start gradient per
    # draw (minus block entries) — mirrors bench.py's counter
    blocks = N // sc.block_size
    sg_ref = sg + (N - blocks)
    d01 = np.asarray(jax.device_get(dr[:, :, :2]), np.float64)  # (N, C, 2)
    out = (TPU_SVMIXED_OUT if mixed else TPU_SV64_OUT if f64
           else TPU_SV_OUT) if model == "sv" else TPU_OUT
    np.savez(out.format(seed=seed),
             draws=np.moveaxis(d01, 0, 1),  # (C, N, 2)
             sg=sg, sg_ref=sg_ref)
    tag = "-mixed" if mixed else "-f64" if f64 else ""
    print(f"{model}{tag} seed {seed}: draws (C,N,2) saved, "
          f"sampling grads {sg.sum()} (ref-acct {sg_ref.sum()})")


def _ratio(sides: dict, a: str, b: str = "native"):
    return _tight_ratio(sides[a], sides[b])


def analyze() -> None:
    sides = {}
    # ---- native ----
    rhos, xs, grads, chains, draws_n = [], [], [], 0, 0
    for path in sorted(glob.glob(NATIVE_GLOB)):
        with open(path, "rb") as f:
            C, N, K = np.fromfile(f, np.int32, 3)
            cube = np.fromfile(f, np.float64, C * N * K).reshape(C, N, K)
        jpath = path.replace(".bin", ".json")
        meta = json.load(open(jpath))
        rho, live, x = _chain_stats(cube)
        rhos.append(rho)
        xs.append(x)
        grads.append(meta["sampling_grad_evals"])
        chains += int(C)
        draws_n += int(C) * int(N)
        print(f"native {os.path.basename(path)}: live {live.sum()}/{C}")
    g = sum(grads) / draws_n  # grads per chain-draw (native accounting
    # == reference accounting: it re-evaluates trajectory starts)
    sides["native"] = _summ(np.concatenate(rhos), np.concatenate(xs), g)

    # ---- tpu ----
    rhos, xs, sg, sgr, chains, draws_n = [], [], 0, 0, 0, 0
    for path in sorted(glob.glob(TPU_OUT.format(seed="*"))):
        z = np.load(path)
        rho, live, x = _chain_stats(z["draws"])
        rhos.append(rho)
        xs.append(x)
        sg += int(z["sg"].sum())
        sgr += int(z["sg_ref"].sum())
        C, N = z["draws"].shape[:2]
        chains += C
        draws_n += C * N
        print(f"tpu {os.path.basename(path)}: live {live.sum()}/{C}")
    sides["tpu"] = _summ(np.concatenate(rhos), np.concatenate(xs),
                         sgr / draws_n)
    sides["tpu"]["grads_per_chain_draw_cached_acct"] = sg / draws_n

    sides["ratio_tpu_over_native"], sides["ratio_se"] = _ratio(sides, "tpu")
    print(json.dumps(sides, indent=1))
    with open("/tmp/parity_tight_result.json", "w") as f:
        json.dump(sides, f, indent=1)


def _native_chainstat_grads(path: str) -> np.ndarray:
    """Per-chain sampling grads from a BASELINE_CHAIN_STATS=1 stderr dump."""
    out = {}
    for line in open(path):
        m = re.match(r"CHAINSTAT (\d+) step \S+ min_micro \S+ samp_grads (\d+)", line)
        if m:
            out[int(m.group(1))] = int(m.group(2))
    return np.array([out[i] for i in range(len(out))], np.int64)


def analyze_sv() -> None:
    """SV tight parity: live-chain ESS/grad, TPU f32 and f64 arms vs native.

    The SV protocol's stuck-from-birth chains (zero accepted moves; same
    ~52% cohort in both implementations) carry zero dim-0 variance and a
    pinned full-budget grad count, so the primary statistic masks them on
    BOTH numerator (autocorrelation) and denominator (grads). All-chain
    grad accounting is reported for reference.
    """
    sides = {}
    N_draws = PROTO["sv"]["N"]

    rhos, xs, live_g, all_g, live_n, all_n = [], [], 0, 0, 0, 0
    for path in sorted(glob.glob(NATIVE_SV_GLOB)):
        with open(path, "rb") as f:
            C, N, K = np.fromfile(f, np.int32, 3)
            cube = np.fromfile(f, np.float64, C * N * K).reshape(C, N, K)
        sg = _native_chainstat_grads(path.replace(".bin", ".chainstats"))
        assert len(sg) == C, (path, len(sg), C)
        rho, live, x = _chain_stats(cube)
        rhos.append(rho)
        xs.append(x)
        live_g += int(sg[live].sum())
        all_g += int(sg.sum())
        live_n += int(live.sum())
        all_n += int(C)
        print(f"native {os.path.basename(path)}: live {live.sum()}/{C}")
    sides["native"] = _summ(np.concatenate(rhos), np.concatenate(xs),
                            live_g / (live_n * N_draws))
    sides["native"]["grads_per_chain_draw_all"] = all_g / (all_n * N_draws)

    for arm, pat in [("tpu_f32", TPU_SV_OUT), ("tpu_f64", TPU_SV64_OUT),
                     ("tpu_mixed", TPU_SVMIXED_OUT)]:
        paths = sorted(glob.glob(pat.format(seed="*")))
        if not paths:
            continue
        rhos, xs, live_g, all_g, live_n, all_n = [], [], 0, 0, 0, 0
        for path in paths:
            z = np.load(path)
            rho, live, x = _chain_stats(z["draws"])
            rhos.append(rho)
            xs.append(x)
            live_g += int(z["sg_ref"][live].sum())
            all_g += int(z["sg_ref"].sum())
            live_n += int(live.sum())
            all_n += int(z["draws"].shape[0])
            print(f"{arm} {os.path.basename(path)}: live {live.sum()}/{z['draws'].shape[0]}")
        sides[arm] = _summ(np.concatenate(rhos), np.concatenate(xs),
                           live_g / (live_n * N_draws))
        sides[arm]["grads_per_chain_draw_all"] = all_g / (all_n * N_draws)
        r, se = _ratio(sides, arm)
        sides[f"ratio_{arm}_over_native"] = r
        sides[f"ratio_{arm}_se"] = se
    print(json.dumps(sides, indent=1))
    with open("/tmp/parity_tight_sv_result.json", "w") as f:
        json.dump(sides, f, indent=1)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "analyze"
    seeds = [int(a) for a in sys.argv[2:]] or [2027, 2028, 2029]
    if cmd == "tpu":
        for s in seeds:
            run_tpu(s)
    elif cmd == "tpu-sv":
        for s in seeds:
            run_tpu(s, model="sv")
    elif cmd == "tpu-sv-f64":
        for s in seeds:
            run_tpu(s, model="sv", f64=True)
    elif cmd == "tpu-sv-mixed":
        for s in seeds:
            run_tpu(s, model="sv", mixed=True)
    elif cmd == "analyze-sv":
        analyze_sv()
    else:
        analyze()
