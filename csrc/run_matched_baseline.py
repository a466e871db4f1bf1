"""Seed-replicated native baseline at MATCHED flagship chain counts.

The ESS-per-gradient north star ("within 5% of the reference") must be
judged at matched chain counts (the pooled ESS estimator scales with
chain count — docs/BENCHMARKS.md "ESS-per-gradient parity"), and the
round-2 matched numbers rested on single native seeds. This runs the
native C++ WALNUTS (csrc/baseline_bench.cpp) at the TPU flagship
protocols with several seeds each and merges per-seed ESS/grad arrays +
ratio-of-means summaries into BASELINE_MEASURED.json:

    funnel(101): 4096 chains, 400+400   (matches bench.py)
    logreg(25):  4096 chains, 400+400   (matches bench.py)
    SV(1003):    1024 chains, 200+200   (matches the SV flagship)

max_step_halvings=8 on all (BASELINE_MAX_HALVINGS), seeds 5000..5002.
Single-core wall: ~4 h dominated by logreg (its 1000x25 likelihood).
Run: nice -n 19 python csrc/run_matched_baseline.py [models...]
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
from run_baseline import build, export_logreg_data, export_sv_data  # noqa: E402

PROTOCOLS = {
    "funnel": dict(chains=4096, warmup=400, sampling=400, keep=101),
    "logreg": dict(chains=4096, warmup=400, sampling=400, keep=25),
    "sv": dict(chains=1024, warmup=200, sampling=200, keep=1003),
}
N_SEEDS = int(os.environ.get("MATCHED_SEEDS", 3))
SEED0 = 5000


def run_model(binary: str, model: str) -> dict:
    cfg = PROTOCOLS[model]
    extra = []
    if model == "logreg":
        path = os.path.join(HERE, "logreg_data.bin")
        export_logreg_data(path)
        extra = [path]
    elif model == "sv":
        path = os.path.join(HERE, "sv_data.bin")
        export_sv_data(path)
        extra = [path]
    env = dict(os.environ)
    env["BASELINE_MAX_HALVINGS"] = "8"
    env["BASELINE_KEEP_DIMS"] = str(cfg["keep"])  # all dims: the ESS
    # median is the same all-dims statistic the TPU bench computes
    ess_list, grads_list, secs_list = [], [], []
    for s in range(N_SEEDS):
        with tempfile.NamedTemporaryFile(suffix=".bin") as tmp:
            out = subprocess.check_output(
                [binary, model, str(cfg["chains"]), str(cfg["warmup"]),
                 str(cfg["sampling"]), str(SEED0 + s), tmp.name] + extra,
                env=env,
            )
            stats = json.loads(out.decode())
            header = np.fromfile(tmp.name, dtype=np.int32, count=3)
            raw = np.fromfile(tmp.name, dtype=np.float64, offset=12)
        c, n, k = header
        draws = raw.reshape(c, n, k)
        ess = effective_sample_size([draws[i] for i in range(c)])
        del draws, raw
        ess_list.append(float(np.median(ess)))
        grads_list.append(float(stats["grad_evals"]))
        secs_list.append(float(stats["total_seconds"] - stats["warmup_seconds"]))
        print(f"{model} seed {SEED0 + s}: ess_median={ess_list[-1]:.1f} "
              f"grads={grads_list[-1]:.0f} sampling={secs_list[-1]:.1f}s",
              flush=True)
    mean_ess, mean_grads = float(np.mean(ess_list)), float(np.mean(grads_list))
    per_seed_epg = [e / g for e, g in zip(ess_list, grads_list)]
    tag = f"{model}_ess_per_grad_{cfg['chains']}c"
    return {
        tag: mean_ess / mean_grads,
        f"{tag}_per_seed": per_seed_epg,
        f"{tag}_seed_spread": [float(np.min(per_seed_epg)),
                               float(np.max(per_seed_epg))],
        f"{model}_{cfg['chains']}c_ess_median_per_seed": ess_list,
        f"{model}_{cfg['chains']}c_grads_per_seed": grads_list,
        f"{model}_{cfg['chains']}c_sampling_seconds_per_seed": secs_list,
        f"{model}_{cfg['chains']}c_n_seeds": N_SEEDS,
        f"{model}_{cfg['chains']}c_protocol":
            f"{cfg['warmup']}+{cfg['sampling']}, halvings=8, "
            f"keep_dims={cfg['keep']}, seeds {SEED0}..{SEED0 + N_SEEDS - 1}",
    }


def main():
    binary = build()
    out_path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    with open(out_path) as f:
        results = json.load(f)
    models = sys.argv[1:] or ["funnel", "sv", "logreg"]
    for model in models:
        results.update(run_model(binary, model))
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(model, "merged into BASELINE_MEASURED.json", flush=True)


if __name__ == "__main__":
    main()
