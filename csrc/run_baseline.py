"""Build and run the native single-core WALNUTS baseline, store results.

Produces ``BASELINE_MEASURED.json`` at the repo root with single-core
ESS/sec for the benchmark targets; ``bench.py`` extrapolates x64 for the
64-core C++ comparison (BASELINE.md measurement plan).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from walnuts_tpu.summary import effective_sample_size  # noqa: E402


def build() -> str:
    binary = os.path.join(HERE, "baseline_bench")
    src = os.path.join(HERE, "baseline_bench.cpp")
    if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", binary, src]
        )
    return binary


def export_logreg_data(path: str) -> None:
    """Write the Python logistic-regression dataset for the C++ bench so
    both implementations sample the SAME posterior."""
    import struct

    from walnuts_tpu.models.targets import logistic_regression_data

    design, y_sign = logistic_regression_data()
    with open(path, "wb") as f:
        f.write(struct.pack("ii", design.shape[0], design.shape[1]))
        design.astype(np.float64).tofile(f)
        y_sign.astype(np.float64).tofile(f)


def export_sv_data(path: str) -> None:
    """Write the stochastic-volatility returns series so the C++ bench
    samples the SAME posterior (targets.stochastic_volatility_data)."""
    import struct

    from walnuts_tpu.models.targets import stochastic_volatility_data

    returns = stochastic_volatility_data()
    with open(path, "wb") as f:
        f.write(struct.pack("i", len(returns)))
        returns.astype(np.float64).tofile(f)


def run_model(binary: str, model: str, chains: int, warmup: int, sampling: int):
    """Average the baseline over several seeds.

    The funnel's median-dimension pooled ESS has ~40% seed noise at 16
    chains (measured: 5 seeds span 0.0032-0.0105 ESS/grad), so a
    single-seed baseline silently moves the vs_baseline goalposts between
    rounds. Ratios are taken of seed-MEANS (ESS, grads, seconds), not
    means of per-seed ratios.
    """
    extra = []
    if model == "logreg":
        data_path = os.path.join(HERE, "logreg_data.bin")
        export_logreg_data(data_path)
        extra = [data_path]
    elif model == "sv":
        data_path = os.path.join(HERE, "sv_data.bin")
        export_sv_data(data_path)
        extra = [data_path]
    n_seeds = int(os.environ.get("BASELINE_SEEDS", 5 if model != "sv" else 1))
    per_seed = {"ess": [], "grads": [], "secs": [], "total": []}
    for s in range(n_seeds):
        with tempfile.NamedTemporaryFile(suffix=".bin") as tmp:
            out = subprocess.check_output(
                [binary, model, str(chains), str(warmup), str(sampling),
                 str(2026 + s), tmp.name] + extra
            )
            stats = json.loads(out.decode())
            raw = np.fromfile(tmp.name, dtype=np.float64, offset=12)
            header = np.fromfile(tmp.name, dtype=np.int32, count=3)
        n_chains, n_samp, keep = header
        draws = raw.reshape(n_chains, n_samp, keep)
        ess = effective_sample_size([draws[c] for c in range(n_chains)])
        per_seed["ess"].append(float(np.median(ess)))
        per_seed["grads"].append(stats["grad_evals"])
        per_seed["secs"].append(stats["total_seconds"] - stats["warmup_seconds"])
        per_seed["total"].append(stats["total_seconds"])
    mean = {k: float(np.mean(v)) for k, v in per_seed.items()}
    return {
        f"{model}_ess_median": mean["ess"],
        f"{model}_ess_median_per_seed": per_seed["ess"],
        f"{model}_sampling_seconds_1core": mean["secs"],
        f"{model}_ess_per_sec_1core": mean["ess"] / mean["secs"],
        f"{model}_grad_evals": mean["grads"],
        f"{model}_total_seconds_1core": mean["total"],
        f"{model}_ess_per_grad": mean["ess"] / mean["grads"],
        f"{model}_chains": int(n_chains),
        f"{model}_sampling_iters": int(n_samp),
        f"{model}_n_seeds": n_seeds,
    }


def main():
    binary = build()
    chains = int(os.environ.get("BASELINE_CHAINS", 16))
    warmup = int(os.environ.get("BASELINE_WARMUP", 400))
    sampling = int(os.environ.get("BASELINE_SAMPLING", 400))
    out_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    results = {"note": "single-core native C++ WALNUTS baseline (csrc/baseline_bench.cpp)"}
    if os.path.exists(out_path):
        # merge: re-running a model subset keeps the other models' entries
        with open(out_path) as f:
            results.update(json.load(f))
    models = os.environ.get("BASELINE_MODELS", "funnel,logreg,sv").split(",")
    for model in models:
        results.update(run_model(binary, model, chains, warmup, sampling))
        print(model, "done")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
