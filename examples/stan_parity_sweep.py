"""BridgeStan-ABI parity sweep (BASELINE.json configs[3]).

The image has no Stan toolchain, so the posteriordb-style sweep runs
native C++ densities compiled into BridgeStan-ABI shared objects
(csrc/abi_models.cpp) that exactly match the walnuts_tpu.models.targets
densities. For each posterior the sweep samples through BOTH paths:

  - the FFI path: ``walnuts_stan`` -> ctypes -> csrc/stan_bridge.cpp ->
    dlopen'd bs_* model (the reference's load_stan.hpp:101-228 route);
  - the JAX path: ``walnuts`` on the autodiff density.

and reports ESS/gradient for each (the north-star parity metric), plus
the native single-core C++ baseline's number where measured
(BASELINE_MEASURED.json). Both paths run the same chain count and fixed
iteration schedule; ESS uses the same all-dims median protocol as
bench.py. Run on CPU: ``python examples/stan_parity_sweep.py``.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
CSRC = os.path.join(ROOT, "csrc")
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

MODELS = {
    "ill_gauss": ("ILL_GAUSS", None),
    "eight_schools": ("EIGHT_SCHOOLS", None),
    "funnel": ("FUNNEL", None),
    "logreg": ("LOGREG", os.path.join(CSRC, "logreg_data.bin")),
}


def build_model_so(name: str) -> str:
    macro, _ = MODELS[name]
    so = os.path.join(CSRC, f"libabi_{name}.so")
    src = os.path.join(CSRC, "abi_models.cpp")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.check_call([
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            f"-DABI_MODEL_{macro}", "-o", so, src,
        ])
    return so


def jax_target(name: str):
    from walnuts_tpu.models import (
        eight_schools, funnel, ill_conditioned_normal, logistic_regression,
    )

    if name == "ill_gauss":
        return ill_conditioned_normal(24)
    if name == "eight_schools":
        return eight_schools()
    if name == "funnel":
        return funnel(101)
    return logistic_regression()


def constrain_like_model(name: str, draws: np.ndarray) -> np.ndarray:
    """Apply the ABI model's constrain map to unconstrained JAX draws so
    ESS is computed on the same scale for both paths."""
    if name != "eight_schools":
        return draws
    mu = draws[..., :1]
    tau = np.exp(draws[..., 1:2])
    return np.concatenate([mu, tau, mu + tau * draws[..., 2:]], axis=-1)


def median_ess(draws_by_chain, sampling_seconds, n_grads):
    from walnuts_tpu.summary import effective_sample_size

    ess = effective_sample_size(draws_by_chain)
    med = float(np.median(ess))
    return {
        "ess_median": med,
        "ess_per_grad": med / float(np.sum(n_grads)),
        "ess_per_sec": med / sampling_seconds if sampling_seconds else None,
    }


def run_ffi(name: str, chains: int, warm: int, samp: int, seed: int):
    import time

    from walnuts_tpu.models.stan import walnuts_stan

    so = build_model_so(name)
    data = MODELS[name][1]
    if name == "logreg":
        sys.path.insert(0, CSRC)
        from run_baseline import export_logreg_data

        export_logreg_data(data)
    t0 = time.time()
    outs, info = walnuts_stan(
        so, data=data, seed=seed, num_chains=chains,
        min_warmup_iter=warm, max_warmup_iter=warm,
        min_sampling_iter=samp, max_sampling_iter=samp,
        return_info=True,
    )
    wall = time.time() - t0
    draws = [np.asarray(o.data) for o in outs]
    r = median_ess(draws, wall, info.n_grads)
    r["grads"] = int(np.sum(info.n_grads))
    r["wall_seconds"] = round(wall, 2)
    return r


def run_jax(name: str, chains: int, warm: int, samp: int, seed: int):
    import time

    from walnuts_tpu.api import walnuts

    logp, dim = jax_target(name)
    t0 = time.time()
    outs, info = walnuts(
        logp, num_params=dim, num_chains=chains, seed=seed,
        min_warmup_iter=warm, max_warmup_iter=warm,
        min_sampling_iter=samp, max_sampling_iter=samp,
        return_info=True,
    )
    wall = time.time() - t0
    draws = [constrain_like_model(name, np.asarray(c)) for c in outs]
    r = median_ess(draws, wall, info.n_grads)
    r["grads"] = int(np.sum(info.n_grads))
    r["wall_seconds"] = round(wall, 2)
    return r


def main():
    chains = int(os.environ.get("SWEEP_CHAINS", 16))
    warm = int(os.environ.get("SWEEP_WARMUP", 400))
    samp = int(os.environ.get("SWEEP_SAMPLING", 400))
    seed = int(os.environ.get("SWEEP_SEED", 2026))

    base = {}
    bp = os.path.join(ROOT, "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        with open(bp) as f:
            base = json.load(f)

    rows = []
    for name in MODELS:
        ffi = run_ffi(name, chains, warm, samp, seed)
        jx = run_jax(name, chains, warm, samp, seed)
        native = base.get(f"{name}_ess_per_grad")
        rows.append({
            "model": name,
            "ffi_ess_per_grad": ffi["ess_per_grad"],
            "jax_ess_per_grad": jx["ess_per_grad"],
            "native_ess_per_grad": native,
            "ffi_vs_jax": ffi["ess_per_grad"] / jx["ess_per_grad"],
            "ffi_vs_native": (ffi["ess_per_grad"] / native) if native else None,
            "ffi": ffi, "jax": jx,
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\n| model | FFI ESS/grad | JAX ESS/grad | native ESS/grad |"
          " FFI/JAX | FFI/native |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        nat = f"{r['native_ess_per_grad']:.3e}" if r["native_ess_per_grad"] else "—"
        vs_nat = f"{r['ffi_vs_native']:.3f}" if r["ffi_vs_native"] else "—"
        print(f"| {r['model']} | {r['ffi_ess_per_grad']:.3e} |"
              f" {r['jax_ess_per_grad']:.3e} | {nat} |"
              f" {r['ffi_vs_jax']:.3f} | {vs_nat} |")


if __name__ == "__main__":
    main()
