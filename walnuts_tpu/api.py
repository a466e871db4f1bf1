"""End-to-end sampling API.

``walnuts`` is the TPU-native counterpart of the reference's
``walnuts_pyfunc`` (python/src/walnutpie/pyfunc.py:45-286) and of the C++
driver ``walnutpie::walnuts`` (api.hpp:33-69). The keyword surface and
defaults match pyfunc.py so reference users can switch directly; the one
semantic difference is the model argument: instead of a C callback, the
target is a JAX-traceable function ``theta -> scalar log density`` whose
gradient comes from autodiff (the callback/FFI path of the reference is
covered by ``walnuts_tpu.models.stan`` and ``walnuts_pyfunc`` below).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.sampler import (
    freeze_params,
    init_sample_state,
    init_warmup_state,
)
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import RunInfo, run_sampling, run_warmup
from walnuts_tpu.utils.output import WalnutsOutputArray, WarmupInfo, prepare_seed

Array = jax.Array


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def walnuts(
    logp: Callable[[Array], Array],
    *,
    num_params: Optional[int] = None,
    inits: Optional[np.ndarray] = None,
    num_chains: int = 4,
    seed: Optional[int] = None,
    id: int = 1,
    init_radius: float = 2.0,
    init_inv_metric: Optional[np.ndarray] = None,
    average_masses: bool = False,
    save_inv_metric: bool = False,
    min_warmup_iter: int = 50,
    max_warmup_iter: int = 1000,
    min_sampling_iter: int = 50,
    max_sampling_iter: int = 1000,
    max_trajectory_doublings: int = 5,
    max_step_halvings: int = 5,
    min_micro_steps: int = 1,
    max_hamiltonian_error: float = 0.5,
    step_size_converge_tol: float = 0.1,
    mass_converge_tol: float = 1.0,
    rhat_converge_tol: float = 1.01,
    mass_init_count: float = 4.0,
    mass_additive_smoothing: float = 1e-5,
    max_macro_steps_target: float = 15.0,
    step_size_init: float = 1.0,
    step_accept_rate_target: float = 0.8,
    step_learning_rate: float = 0.05,
    step_gradient_decay: float = 0.8,
    step_sq_gradient_decay: float = 0.9,
    step_stabilization: float = 1e-4,
    step_learn_rate_decay: float = 0.5,
    save_warmup: bool = False,
    refresh: int = 0,
    # TPU-native extensions
    dtype=None,
    model_dtype=None,
    mesh: Optional[Mesh] = None,
    adapt_init_step: bool = True,
    block_size: int = 25,
    return_info: bool = False,
    profile_dir: Optional[str] = None,
    fused: bool = False,
    chain_groups: int = 1,
    integrator=None,
    bf16_ends: bool = False,
    flatten: bool = False,
    batched: Optional[bool] = None,
    batched_groups: int = 1,
    runahead: int = 8,
    tier2_every: int = 6,
    warmup_tier2_every: Optional[int] = None,
    min_latched: int = 0,
    defer_splits: bool = True,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    checkpoint_keep_last_n: Optional[int] = None,
    resume: bool = True,
    thin: int = 1,
    keep_dims=None,
) -> Union[List[WalnutsOutputArray], Tuple[List[WalnutsOutputArray], RunInfo]]:
    """Sample from a JAX log density with adaptive WALNUTS.

    Parameters follow ``walnuts_pyfunc`` (pyfunc.py:45-174).
    ``average_masses`` replaces each chain's Nutpie gradient-rule init
    mass with the cross-chain geometric mean (config.hpp:360-382; only
    meaningful without ``init_inv_metric``). Extensions:

    - ``dtype``: computation dtype (defaults to float64 under x64, else
      float32 — the TPU-native default).
    - ``model_dtype``: evaluate the model's value+gradient in this dtype
      while sampler state/integration/adaptation stay in ``dtype``.
      ``dtype=jnp.float64, model_dtype=jnp.float32`` is the measured
      mixed-precision fix for posteriors whose semi-stuck recovery is
      f32-noise-limited (the SV flagship — docs/BENCHMARKS.md).
    - ``mesh``: a ``jax.sharding.Mesh`` with a ``"chains"`` axis to shard
      chains across devices; ``None`` runs on one device.
    - ``adapt_init_step``: run the coarse step-size search
      (util.hpp:285-303) before warmup, as the reference driver does
      (walnutpy.cpp:75-79).
    - ``block_size``: iterations per jitted convergence block.
    - ``return_info``: also return :class:`RunInfo` instrumentation.
    - ``profile_dir``: write a ``jax.profiler`` trace of the run there (the
      TPU counterpart of the reference CLI's built-in timing profile,
      stan_cli.cpp:121-139, which is also available via ``RunInfo.n_grads``).
    - ``fused``: when True, ``logp`` already has the fused signature
      ``theta -> (logp, grad)`` (e.g. a Pallas kernel from
      ``walnuts_tpu.ops.pallas_kernels``) and autodiff is bypassed.
    - ``chain_groups``: sort chains by adapted cost and sample them in
      this many sequential groups so slow tail chains only stall their
      own group (single-device only).
    - ``integrator``: a fused attempt integrator from
      ``walnuts_tpu.ops.integrator.make_pallas_integrator`` replacing the
      inner leapfrog loop.
    - ``flatten``: run-ahead flattened sampling — a chain that finishes
      a trajectory immediately starts the next one instead of waiting for
      the slowest chain in the batch. Per-lane draws are bitwise identical
      to the synchronous path; only the scheduling changes. EXPERIMENTAL:
      with the current one-transition-deep bank it does not yet reduce the
      per-draw synchronisation (measured slower on v5e; see
      docs/ROADMAP.md for the ring-buffer extension), so it is off by
      default.
    - ``batched``: batched-native sampling scheduler
      (:mod:`walnuts_tpu.core.batched`) — leaf-latched integration with
      amortised orbit bookkeeping (``tier2_every`` trips per pass, but a
      pass is deferred until at least ``min_latched`` lanes have latched
      a leaf; warmup uses ``warmup_tier2_every``, default 12 — passes
      carry the adaptation applies and dominate early-warmup wall, and
      K=12 measured −17 % warmup on funnel and SV with the draw
      schedule unchanged), a ``runahead``-deep run-ahead draw buffer, and deferred
      key-split replay (``defer_splits``; both scheduling-only — draws
      are bitwise identical for every setting); ``batched_groups > 1``
      re-sorts chains every block by realized gradient cost and runs the
      groups sequentially. Draws are bitwise identical to the classic
      scheduler per chain; the fastest path measured on EVERY bench
      model (funnel/logreg/SV — docs/BENCHMARKS.md), so the default
      (``None``) selects it automatically whenever it is compatible
      (no custom ``integrator``, no ``flatten``/``chain_groups``); pass
      ``False`` to force the classic per-draw scheduler. Applies to
      warmup and sampling; mesh-compatible at ``batched_groups=1``.
    - ``speculate`` / ``multiplex`` (round-3 scheduling experiments)
      were REMOVED in round 5 after losing every TPU A/B arm; the
      post-mortems live in docs/BENCHMARKS.md "Scheduler-option TPU
      A/B" and the implementations in git history.
    - ``bf16_ends``: store the transition's merge-stack endpoints in
      bfloat16 and round both operands of every U-turn test to bfloat16
      (a valid sampler either way — see
      ``walnuts_tpu.core.transition``). Draws and integration keep full
      precision. Measured SLOWER on v5e at D ~ 100 (the converts cost
      more than the saved bandwidth) — off by default; try at large D.

    Returns a list of per-chain draw arrays (``shape (draws, dim)``), each
    carrying ``.warmup`` with the adapted step size, optionally the adapted
    inverse metric, and optionally the warmup draws (+ their log
    densities).

    Interrupts: Ctrl-C is honored BETWEEN jitted blocks (every
    ``block_size`` iterations), not mid-iteration — a compiled block runs
    to completion before the interrupt lands. Everything adapted/sampled
    so far is returned, like the reference's SIGINT path
    (interrupts.hpp:34-102); lower ``block_size`` for finer granularity.

    ``thin`` (a TPU-scale extension; the reference has no thinning)
    stores every ``thin``-th sampling draw, dividing draw memory for
    very wide posteriors; the sampler still advances every iteration
    and the R-hat controller still sees every log density. Must divide
    ``block_size``. ``keep_dims`` (a sequence of parameter indices)
    stores only those dimensions of each draw — the other axis of the
    same memory lever; the sampler itself keeps full dimensionality.

    Checkpointing (a TPU-native extension; the reference only
    warm-starts, handlers.hpp:91-100): with ``checkpoint_dir`` set, the
    full run state is persisted with orbax every ``checkpoint_every``
    blocks, and a rerun with the same arguments ``resume``\\ s from the
    latest checkpoint — mid-warmup or mid-sampling — reproducing the
    exact draws an uninterrupted run would have produced (the PRNG keys
    are part of the state). Incompatible with ``chain_groups``/
    ``flatten``. Pass ``resume=False`` to start over. A checkpoint
    written under different run arguments (seed, iteration counts, thin,
    ...) is refused with a warning and the run starts over.
    ``checkpoint_keep_last_n`` bounds the per-phase block-file count by
    compacting older blocks into one file (no draws are dropped);
    ``checkpoint_every > 1`` additionally pipelines the device->host draw
    transfers behind the sampler.
    """
    dtype = dtype or _default_dtype()
    if batched is None:
        # auto-select the measured-fastest compatible scheduler: the
        # batched-native path emits bitwise-identical draws, so this is a
        # pure scheduling default (docs/BENCHMARKS.md round 3)
        batched = integrator is None and not flatten and chain_groups == 1
    if num_chains < 1:
        raise ValueError(
            f"num_chains must be positive; found num_chains = {num_chains}"
        )
    if num_params is None:
        if inits is None:
            raise ValueError("must specify at least one of num_params or inits")
        init_shape = np.shape(inits)
        num_params = init_shape[1] if len(init_shape) == 2 else init_shape[0]
    if num_params <= 0:
        raise ValueError(
            f"num_params must be positive; found num_params = {num_params}"
        )

    user_seed = seed  # None = auto-generated (recorded as such in the
    # checkpoint fingerprint: not reproducible, so resume stays allowed)
    seed = prepare_seed(seed)
    base_key = jax.random.key(seed)
    chain_ids = np.arange(id, id + num_chains)
    chain_keys = jax.vmap(lambda c: jax.random.fold_in(base_key, c))(
        jnp.asarray(chain_ids)
    )

    if model_dtype is not None and jnp.dtype(model_dtype) != jnp.dtype(dtype):
        # precision islands: the model is evaluated in ``model_dtype``
        # while positions/momenta/gradients stay in ``dtype``.
        # - model_dtype NARROWER than dtype (f64 state + f32 model):
        #   value and gradient are cast UP (exact widening) — trajectory
        #   and adaptation arithmetic run wide, the expensive model eval
        #   runs narrow.
        # - model_dtype WIDER than dtype (f32 rows + f64 logp chain):
        #   the value is NOT cast down — the batched scheduler carries
        #   its logp/joint/|dH| fields in the value's dtype, so the
        #   scalar chain stays wide over narrow rows (the measured SV
        #   semi-stuck-tail fix, docs/BENCHMARKS.md round 5); the
        #   gradient comes back in ``dtype`` through AD's backward cast.
        _mdt, _user_logp = jnp.dtype(model_dtype), logp
        _vdt = jnp.promote_types(dtype, _mdt)
        if fused:
            def logp(theta):  # noqa: F811 — intentional island wrapper
                lp, grad = _user_logp(theta.astype(_mdt))
                return lp.astype(_vdt), grad.astype(dtype)
        else:
            def logp(theta):  # noqa: F811
                return _user_logp(theta.astype(_mdt)).astype(_vdt)

    if fused:
        from walnuts_tpu.ops.math import sanitize_logp_grad

        def logp_grad(theta):
            lp, grad = logp(theta)
            return sanitize_logp_grad(lp, grad)
    else:
        logp_grad = make_logp_grad(logp)

    # --- initial positions (pyfunc.py:194-203; walnutpy.cpp:172-190) ---
    if inits is not None:
        inits = np.asarray(inits, dtype=np.float64)
        if inits.shape == (num_params,):
            inits = np.repeat(inits[np.newaxis], num_chains, axis=0)
        elif inits.shape != (num_chains, num_params):
            raise ValueError(
                f"Invalid inits size. Expected a {(num_params,)} "
                f"or {(num_chains, num_params)} matrix."
            )
        theta0 = jnp.asarray(inits, dtype=dtype)
    else:
        init_key = jax.random.fold_in(base_key, 0xFFFFFFFF)
        theta0 = init_radius * jax.random.normal(
            init_key, (num_chains, num_params), dtype=dtype
        )

    # --- initial mass: explicit inverse metric or the Nutpie gradient rule
    # (walnutpy.cpp:64-73, config.hpp:360-382) ---
    if init_inv_metric is not None:
        inv_metric = np.asarray(init_inv_metric, dtype=np.float64)
        if inv_metric.shape == (num_params,):
            inv_metric = np.repeat(inv_metric[np.newaxis], num_chains, axis=0)
        elif inv_metric.shape != (num_chains, num_params):
            raise ValueError(
                f"Invalid init_inv_metric size. Expected {(num_params,)} "
                f"or {(num_chains, num_params)}."
            )
        if not np.all(np.isfinite(inv_metric)) or np.any(inv_metric <= 0):
            raise ValueError("init_inv_metric must be finite and positive")
        init_mass = jnp.asarray(1.0 / inv_metric, dtype=dtype)
    else:
        grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
        init_mass = jax.vmap(
            lambda g: nutpie_init_mass(g, jnp.asarray(mass_additive_smoothing, dtype))
        )(grads)
        if average_masses:
            # cross-chain geometric mean of the Nutpie masses, broadcast
            # back to every chain (config.hpp:360-382: average_masses on
            # the gradient-rule builder only — an explicit metric is the
            # user's to average)
            geo = jnp.exp(jnp.mean(jnp.log(init_mass), axis=0))
            init_mass = jnp.broadcast_to(geo, init_mass.shape)

    # --- initial step sizes, optionally heuristically adapted
    # (walnutpy.cpp:75-79 -> util.hpp:285-303); scalar or per-chain array
    # (InitConfigBuilder::step_sizes, config.hpp:221-242) ---
    step_init_arr = np.asarray(step_size_init, dtype=np.float64)
    if step_init_arr.ndim == 0:
        step0 = jnp.full((num_chains,), float(step_init_arr), dtype=dtype)
    elif step_init_arr.shape == (num_chains,):
        if not np.all(np.isfinite(step_init_arr)) or np.any(step_init_arr <= 0):
            raise ValueError("step_size_init must be finite and positive")
        step0 = jnp.asarray(step_init_arr, dtype=dtype)
    else:
        raise ValueError(
            f"step_size_init must be a scalar or shape ({num_chains},); "
            f"got shape {step_init_arr.shape}"
        )
    if adapt_init_step:
        step_keys = jax.vmap(lambda c: jax.random.fold_in(base_key, c))(
            jnp.asarray(chain_ids + num_chains)
        )
        step0 = jax.jit(
            jax.vmap(lambda k, t, m, s: adapt_step_size(k, logp_grad, t, m, s))
        )(step_keys, theta0, init_mass, step0)

    warmup_cfg = WarmupConfig(
        min_iter=min_warmup_iter,
        max_iter=max_warmup_iter,
        step_size_converge_tol=step_size_converge_tol,
        mass_converge_tol=mass_converge_tol,
        mass_init_count=mass_init_count,
        mass_additive_smoothing=mass_additive_smoothing,
        max_macro_steps_target=max_macro_steps_target,
        step_size_init=float(np.mean(step_init_arr)),
        step_accept_rate_target=step_accept_rate_target,
        step_learning_rate=step_learning_rate,
        step_gradient_decay=step_gradient_decay,
        step_sq_gradient_decay=step_sq_gradient_decay,
        step_stabilization=step_stabilization,
        step_learn_rate_decay=step_learn_rate_decay,
        block_size=block_size,
    )
    sampling_cfg = SamplingConfig(
        min_iter=min_sampling_iter,
        max_iter=max_sampling_iter,
        max_trajectory_doublings=max_trajectory_doublings,
        max_step_halvings=max_step_halvings,
        min_micro_steps=min_micro_steps,
        max_hamiltonian_error=max_hamiltonian_error,
        rhat_converge_tol=rhat_converge_tol,
        block_size=block_size,
    )

    progress = None
    on_r_hat = None
    if refresh > 0:
        def progress(phase: str, iteration: int) -> None:
            # per-chain lines in the reference PythonPrinter format
            # (handlers.hpp:44-47). Chains run in lockstep blocks here, so
            # all chains report the same iteration; the per-chain lines are
            # kept for output compatibility (capped so thousands of vmapped
            # chains don't flood the console — the reference never runs
            # more chains than threads).
            if iteration % refresh == 0 or iteration == 0:
                tag = "(Warmup)" if phase == "warmup" else "(Sampling)"
                if num_chains <= 32:
                    for cid in chain_ids:
                        print(f"Chain [{cid}]: Iteration {iteration}\t{tag}")
                else:
                    print(f"All chains: Iteration {iteration} {tag}")

        # the reference's GlobalHandler prints each controller R-hat
        # (handlers.hpp:160-176)
        def on_r_hat(value: float) -> None:
            print(f"R-hat: {value:.4f}")

    import contextlib

    profiler_ctx = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    ckpt = None
    resume_meta = None
    if checkpoint_dir is not None:
        from walnuts_tpu.parallel.checkpoint import BlockCheckpointer

        # The fingerprint pins every argument that changes which draws a
        # run produces; resume refuses a checkpoint written under
        # different arguments (it would silently replay the old run). An
        # auto-generated seed (seed=None) is recorded as None: such runs
        # are not reproducible by construction, so any same-shape
        # checkpoint may resume.
        fingerprint = {
            "seed": None if user_seed is None else int(seed),
            "num_chains": int(num_chains),
            "num_params": int(num_params),
            "warmup_iter": [int(min_warmup_iter), int(max_warmup_iter)],
            "sampling_iter": [int(min_sampling_iter), int(max_sampling_iter)],
            "thin": int(thin),
            "keep_dims": None if keep_dims is None else [int(k) for k in keep_dims],
            "dtype": jnp.dtype(dtype).name,
            "block_size": int(block_size),
        }
        ckpt = BlockCheckpointer(
            checkpoint_dir, every=checkpoint_every,
            keep_last_n=checkpoint_keep_last_n, fingerprint=fingerprint,
        )
        if resume:
            resume_meta = ckpt.latest()
        if resume_meta is None:
            ckpt.reset()  # drop stale blocks from a previous run

    with profiler_ctx:
        # --- warmup (the state built here also serves as the restore
        # template when resuming from a checkpoint) ---
        wstate = jax.vmap(
            lambda k, t, m, s: init_warmup_state(k, t, m, s, warmup_cfg, sampling_cfg)
        )(chain_keys, theta0, init_mass, step0)

        start_sampling = 0
        warmup_draws = warmup_logps = None
        if resume_meta is not None and resume_meta["phase"] == "sampling":
            # killed mid-sampling: skip warmup, restore frozen state
            params_t = jax.vmap(freeze_params)(wstate)
            sstate_t = jax.vmap(init_sample_state)(wstate)
            sstate, params, info = ckpt.restore(sstate_t, params_t)
            start_sampling = resume_meta["it"]
            if save_warmup:
                warmup_draws, warmup_logps = ckpt.saved_blocks(
                    "warmup", info.warmup_iters + 1
                )
        else:
            start_warmup = 0
            warmup_info = None
            if resume_meta is not None and resume_meta["phase"] == "warmup":
                # keep the restored RunInfo so counters (and the
                # converged_warmup flag, which must stop a resumed warmup
                # that had already converged) cover the whole run
                wstate, _, warmup_info = ckpt.restore(wstate)
                start_warmup = resume_meta["it"]
            wstate, warmup_draws, warmup_logps, info = run_warmup(
                logp_grad, wstate, warmup_cfg, sampling_cfg,
                save_warmup=save_warmup, mesh=mesh, progress=progress,
                integrator=integrator, bf16_ends=bf16_ends,
                checkpoint=ckpt, start_it=start_warmup, info=warmup_info,
                batched=batched,
                batched_groups=batched_groups if batched else 1,
                # warmup defaults to K=12, not sampling's tier2_every:
                # tier-2 passes dominate the early-warmup block (~75 %
                # of wall at K=6) and K=12 measured warmup wall -17 %
                # on funnel AND SV with the draw schedule unchanged
                # (scheduling-only; logreg-like models with expensive
                # matmul trips measured +5 % — pass 6 there;
                # docs/BENCHMARKS.md round 5)
                tier2_every=(12 if warmup_tier2_every is None
                             else warmup_tier2_every),
            )
            if ckpt is not None and start_warmup and save_warmup:
                prev_d, prev_l = ckpt.saved_blocks("warmup", start_warmup)
                if prev_d is not None:
                    if warmup_draws is not None:
                        warmup_draws = np.concatenate([prev_d, warmup_draws])
                        warmup_logps = np.concatenate([prev_l, warmup_logps])
                    else:
                        warmup_draws, warmup_logps = prev_d, prev_l
            params = jax.vmap(freeze_params)(wstate)
            sstate = jax.vmap(init_sample_state)(wstate) if not info.interrupted else None
            if ckpt is not None and not info.interrupted:
                # durable phase transition: a crash before the first
                # sampling block resumes here, not back in warmup
                ckpt.save("sampling", 0, sstate, info, params=params)

        if info.interrupted:
            # Ctrl-C during warmup: stop the run; report the adaptation
            # reached so far with zero sampling draws.
            out_dim = num_params if keep_dims is None else len(keep_dims)
            draws = np.zeros((0, num_chains, out_dim))
        else:
            sstate, draws, _logps, info = run_sampling(
                logp_grad, sstate, params, sampling_cfg,
                mesh=mesh, info=info, progress=progress, on_r_hat=on_r_hat,
                chain_groups=chain_groups, integrator=integrator,
                bf16_ends=bf16_ends,
                flatten=flatten and chain_groups == 1,
                batched=batched, batched_groups=batched_groups,
                runahead=runahead, tier2_every=tier2_every,
                min_latched=min_latched, defer_splits=defer_splits,
                checkpoint=ckpt, start_it=start_sampling,
                thin=thin, keep_dims=keep_dims,
            )
            if ckpt is not None and start_sampling:
                prev_d, _pl = ckpt.saved_blocks("sampling", start_sampling)
                if prev_d is not None:
                    # run_sampling counts iterations from start_it, so
                    # info.sampling_iters is already the absolute total
                    draws = (
                        np.concatenate([prev_d, draws])
                        if draws.size
                        else prev_d
                    )

    step_sizes = np.asarray(params.step_size)
    inv_metric_out = np.asarray(params.inv_mass) if save_inv_metric else None

    outputs: List[WalnutsOutputArray] = []
    for c in range(num_chains):
        wi = WarmupInfo(
            stepsize=float(step_sizes[c]),
            inv_metric=inv_metric_out[c] if inv_metric_out is not None else None,
            warmup_draws=warmup_draws[:, c, :] if warmup_draws is not None else None,
            warmup_logps=warmup_logps[:, c] if warmup_logps is not None else None,
        )
        outputs.append(WalnutsOutputArray(draws[:, c, :], wi))

    if return_info:
        return outputs, info
    return outputs


def walnuts_pyfunc(
    logp,
    **kwargs,
) -> List[WalnutsOutputArray]:
    """Compatibility shim for the reference's host-callback model paths.

    Accepts, like the reference (pyfunc.py:215-227):

    - a plain Python callable ``theta -> (logp, grad)`` on NumPy arrays
      (the trampoline signature, pyfunc.py:32-42);
    - anything with a ``.ctypes`` attribute — e.g. a numba ``@cfunc``
      compiled to the nutpie ``RawLogpFunc`` signature ``int(size_t n,
      const double* theta, double* grad, double* lp, void* data)``
      (walnutpy.cpp:127-132) — called directly, no Python in the loop;
    - a ``(ctypes_cfunc, data)`` tuple with the same C signature, where
      ``data`` (a ctypes object or None) is passed through as the last
      argument.

    All three bridge into the jitted sampler with ``jax.pure_callback``;
    a raising callable or a nonzero C return code becomes ``logp=-inf,
    grad=0`` (the NoExceptLogpGrad trap, util.hpp:336-346). Prefer a
    JAX-traceable density with :func:`walnuts`.

    The callback is BATCHED (``vmap_method="expand_dims"``): the whole
    vmapped chain batch crosses to the host in ONE round trip per
    leapfrog step and the model is evaluated row by row on the host —
    the same batching the Stan bridge uses
    (``models/stan.py:logp_grad_batch``) and the analog of the
    reference's in-process callback (pyfunc.py:215-227, which pays one
    GIL acquisition per call from each worker thread). Measured ~30x
    faster than the previous one-callback-per-chain trampoline at 64
    chains (tests/test_pyfunc.py).
    """
    import ctypes

    num_params = kwargs.get("num_params")
    inits = kwargs.get("inits")
    if num_params is None:
        if inits is None:
            raise ValueError("must specify at least one of num_params or inits")
        shape = np.shape(inits)
        num_params = shape[1] if len(shape) == 2 else shape[0]
        kwargs["num_params"] = num_params

    cfunc = data_ref = None
    if hasattr(logp, "ctypes"):  # numba @cfunc fast path (pyfunc.py:215-217)
        cfunc = logp.ctypes
    elif isinstance(logp, tuple):  # (ctypes_cfunc, data) (pyfunc.py:219-221)
        cfunc, data = logp
        data_ref = ctypes.byref(data) if data is not None else None

    if cfunc is not None:
        c_double_p = ctypes.POINTER(ctypes.c_double)

        def eval_row(row: np.ndarray, grad_out: np.ndarray) -> float:
            lp = ctypes.c_double()
            rc = cfunc(
                row.size,
                row.ctypes.data_as(c_double_p),
                grad_out.ctypes.data_as(c_double_p),
                ctypes.byref(lp),
                data_ref,
            )
            if rc != 0:  # error code -> rejected proposal
                grad_out[:] = 0.0
                return -np.inf
            return lp.value
    else:
        def eval_row(row: np.ndarray, grad_out: np.ndarray) -> float:
            try:
                lp, grad = logp(row)
                grad_out[:] = np.asarray(grad, dtype=np.float64)
                return float(lp)
            except Exception:
                # the NoExceptLogpGrad trap (util.hpp:336-346)
                grad_out[:] = 0.0
                return -np.inf

    def host_logp(theta_np: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        # one host call for the WHOLE batch: leading vmap dims flattened,
        # model evaluated per row (the unbatched call is a (D,) row)
        th = np.ascontiguousarray(theta_np, dtype=np.float64)
        flat = th.reshape(-1, th.shape[-1])
        lps = np.empty(flat.shape[0], dtype=np.float64)
        grads = np.empty_like(flat)
        for i in range(flat.shape[0]):
            lps[i] = eval_row(flat[i], grads[i])
        return lps.reshape(th.shape[:-1]), grads.reshape(th.shape)

    def callback(theta: Array):
        return jax.pure_callback(
            host_logp,
            (
                jax.ShapeDtypeStruct(theta.shape[:-1], theta.dtype),
                jax.ShapeDtypeStruct(theta.shape, theta.dtype),
            ),
            theta,
            vmap_method="expand_dims",
        )

    # Autodiff cannot see through the callback: wire the callback's own
    # gradient in with custom_vjp-free value_and_grad replacement.
    @jax.custom_jvp
    def logp_fn(theta: Array) -> Array:
        lp, _ = callback(theta)
        return lp

    @logp_fn.defjvp
    def _logp_jvp(primals, tangents):
        (theta,), (dtheta,) = primals, tangents
        lp, grad = callback(theta)
        return lp, jnp.sum(grad * dtheta, axis=-1)

    return walnuts(logp_fn, **kwargs)


__all__ = ["walnuts", "walnuts_pyfunc"]
