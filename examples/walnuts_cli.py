"""Command-line sampler, the TPU-native counterpart of the reference's
``stan_cli`` (examples/stan_cli.cpp:180-366).

Samples either a built-in model from the zoo or a compiled BridgeStan
model shared object, prints a summary table, and reports the built-in
profile: wall time, gradient-evaluation count, gradients/second — the same
instrumentation the reference CLI wraps around its logp callback
(stan_cli.cpp:121-139).

Usage:
  python examples/walnuts_cli.py --model funnel --dim 25 --chains 8
  python examples/walnuts_cli.py --stan-so model_model.so --data data.json
"""

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="WALNUTS TPU sampler CLI")
    p.add_argument("--model", default="std_normal",
                   help="model zoo target: std_normal, ill_conditioned_normal, "
                        "condition_gaussian, ar1_normal, funnel, eight_schools, "
                        "logistic_regression, stochastic_volatility")
    p.add_argument("--dim", type=int, default=10, help="dimension for sized targets")
    p.add_argument("--stan-so", default=None,
                   help="path to a compiled BridgeStan model .so (overrides --model)")
    p.add_argument("--data", default=None, help="JSON data file for the Stan model")
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--warmup", type=int, default=None,
                   help="fixed warmup iterations (sets min=max)")
    p.add_argument("--sampling", type=int, default=None,
                   help="fixed sampling iterations (sets min=max)")
    p.add_argument("--min-warmup", type=int, default=50)
    p.add_argument("--max-warmup", type=int, default=1000)
    p.add_argument("--min-sampling", type=int, default=50)
    p.add_argument("--max-sampling", type=int, default=1000)
    p.add_argument("--max-depth", type=int, default=5)
    p.add_argument("--max-step-halvings", type=int, default=5)
    p.add_argument("--max-error", type=float, default=0.5)
    p.add_argument("--init-radius", type=float, default=2.0)
    p.add_argument("--refresh", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--f64", action="store_true", help="use float64")
    p.add_argument("--out", default=None, help="write draws to this .npz file")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    from walnuts_tpu import Summarizer, walnuts
    from walnuts_tpu.models import targets

    kwargs = dict(
        num_chains=args.chains,
        seed=args.seed,
        init_radius=args.init_radius,
        min_warmup_iter=args.warmup or args.min_warmup,
        max_warmup_iter=args.warmup or args.max_warmup,
        min_sampling_iter=args.sampling or args.min_sampling,
        max_sampling_iter=args.sampling or args.max_sampling,
        max_trajectory_doublings=args.max_depth,
        max_step_halvings=args.max_step_halvings,
        max_hamiltonian_error=args.max_error,
        refresh=args.refresh,
        return_info=True,
    )

    t0 = time.time()
    if args.stan_so:
        from walnuts_tpu.models.stan import walnuts_stan

        data = None
        if args.data:
            with open(args.data) as f:
                data = f.read()
        kwargs.pop("return_info")
        outputs = walnuts_stan(args.stan_so, data=data, **kwargs)
        names = outputs[0].parameters
        chains = [o.data for o in outputs]
        info = None
    else:
        factory = getattr(targets, args.model, None)
        if factory is None:
            print(f"unknown model {args.model!r}", file=sys.stderr)
            return 2
        try:
            logp, dim = factory(args.dim)
        except TypeError:
            logp, dim = factory()
        outputs, info = walnuts(logp, num_params=dim, **kwargs)
        names = [f"theta[{i}]" for i in range(dim)]
        chains = [np.asarray(o) for o in outputs]

    elapsed = time.time() - t0
    s = Summarizer(chains)
    mean, sd, ess, rhat = s.mean(), s.standard_deviation(), s.ess(), s.r_hat()
    mcse = sd / np.sqrt(ess)

    print(f"{'parameter':>14} {'mean':>10} {'sd':>10} {'mcse':>10} "
          f"{'ess':>10} {'rhat':>8}")
    show = min(len(names), 20)
    for i in range(show):
        print(f"{names[i]:>14} {mean[i]:>10.4f} {sd[i]:>10.4f} "
              f"{mcse[i]:>10.4f} {ess[i]:>10.1f} {rhat[i]:>8.4f}")
    if len(names) > show:
        print(f"  ... ({len(names) - show} more parameters)")

    print(f"\nchains: {len(chains)}  draws/chain: {chains[0].shape[0]}")
    print(f"total wall time: {elapsed:.2f}s")
    if info is not None:
        total_grads = int(np.sum(info.n_grads))
        print(f"warmup iterations: {info.warmup_iters}  "
              f"sampling iterations: {info.sampling_iters}")
        print(f"gradient evaluations: {total_grads}  "
              f"({total_grads / elapsed:.0f}/s)  "
              f"time/gradient: {1e6 * elapsed / max(total_grads, 1):.2f}us")

    if args.out:
        np.savez(args.out, draws=np.stack(chains), parameters=names)
        print(f"draws written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
