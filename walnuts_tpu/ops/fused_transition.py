"""The entire WALNUTS transition (and whole sampling blocks) as Pallas kernels.

STATUS: compiles and runs on real TPU (v5e) as of round 2, and remains
interpret-mode testable everywhere (tests/test_fused_transition.py —
moments, halving/reversibility paths, statistics matching the XLA
transition).

The XLA transition (core/transition.py) is bandwidth-bound on its
per-attempt span/stack bookkeeping: at 4096 chains x funnel(101) each
outer iteration moves ~250 MB of HBM traffic plus per-op launch latency.
A 256-chain tile's ENTIRE transition state (orbit span, merge stack,
cursors — a few MB) fits in VMEM, so these kernels run the full
transition per tile with zero HBM traffic inside the loop:

  - the model's batched value-and-gradient is inlined (same hand-written
    kernels as the fused integrator, ``walnuts_tpu.models.kernels``);
  - decision randomness comes from a counter-based in-kernel PRNG
    (murmur3-finalizer hash of seed ^ lane ^ counter; portable uint32
    ops); momenta are drawn OUTSIDE with ``jax.random`` and streamed in;
  - each tile iterates until ITS lanes finish — tail-lane divergence only
    stalls one tile, not the whole batch (compose with cost-sorted chain
    tiles for the full effect);
  - the algorithm is the same two-level structure as core/transition.py,
    with the inner integration loop inlined (one fori per attempt).

Two entry points:

  - ``make_fused_transition``: ONE transition per launch (same signature
    shape as the XLA transition; momentum passed in).
  - ``make_fused_sample_block``: ``num_draws`` transitions per launch per
    tile — the sampling-phase hot loop. Per-draw synchronisation is
    tile-local instead of batch-global, draws are written to a VMEM
    output block, and there is no per-draw launch/bookkeeping round trip.

Mosaic pitfalls these kernels work around (each bisected against the
real-TPU compiler, jax 0.9.0):

  1. (B, 1) and (B, 4) loop carries: layout inference marks them
     lane-replicated and the while-loop back-edge relayout of computed
     updates crashes ("Invalid relayout"). EVERY per-lane scalar —
     integer and float, including the four span scalars — is carried at
     (B, lane_width) instead, with narrow [:, :1] views at use sites.
  2. Constant-folded inits: zeros built as ``data * 0`` or ``x - x``
     canonicalize to splat constants whose carry layout is FULLY
     replicated ({*,*}); the body computes lane-replicated ({0,*})
     values and the back-edge relayout {0,*} -> {*,*} is invalid. This
     surfaces as an unlocated ``Check failed: limits[i] <= dim(i)
     (B/8 vs. 1)`` abort unless most of the body is dead code. Zeros are
     derived as ``jnp.minimum(data, 0)`` (fold-proof: positivity of the
     data is runtime knowledge), so every carry keeps a concrete
     lane-replicated layout.
  3. select_n on integer/bool operands with mixed replicated layouts:
     integer selects are arithmetic blends (``_iwhere``).
  4. Mid-dimension slicing/concat of span rows: spans are built with
     row-masked full-array selects over an iota (``pack8``/``pack3``).
  5. The default 16 MB scoped-VMEM limit: the carried state exceeds it;
     ``vmem_limit_bytes`` raises it via CompilerParams.

Statistically these are the same sampler as the XLA path (identical
decision structure; independent uniforms per decision) but NOT bitwise
identical — the PRNG streams differ. Distribution-level tests compare
the two.

Replaces macro_step/build_span/transition_w of the reference
(walnuts.hpp:307-563) for sampling-phase zoo models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# span vector rows
_TB, _RB, _GB = 0, 1, 2      # backward endpoint: theta, rho, grad
_TF, _RF, _GF = 3, 4, 5      # forward endpoint
_TS, _GS = 6, 7              # selected: theta, grad


def _hash32(x):
    """murmur3 finalizer: a stateless high-avalanche uint32 hash."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _iwhere(pred, a, b):
    """Integer select as an arithmetic blend (Mosaic select_n relayout
    bug workaround)."""
    m = pred.astype(a.dtype if hasattr(a, "dtype") else jnp.int32)
    return b + m * (a - b)


def _uniform_from_bits(bits):
    """uint32 random bits -> uniform (0, 1] float32 (24-bit mantissa)."""
    return (
        (bits >> 8).astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(1.0 / (1 << 24))
        + jnp.float32(1e-12)
    )


def _row8():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)


def _row3():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 3, 1), 1)


def _pack8(theta, rho, grad):
    """Span vectors (B, 8, D): rows {0,3,6}=theta, {1,4}=rho, {2,5,7}=grad."""
    ROW8 = _row8()
    is_theta = (ROW8 == 0) | (ROW8 == 3) | (ROW8 == 6)
    is_rho = (ROW8 == 1) | (ROW8 == 4)
    return jnp.where(is_theta, theta[:, None],
                     jnp.where(is_rho, rho[:, None], grad[:, None]))


def _pack3(theta, rho, grad):
    ROW3 = _row3()
    return jnp.where(
        ROW3 == 0, theta[:, None],
        jnp.where(ROW3 == 1, rho[:, None], grad[:, None]),
    )


def _kinetic(rho, inv_mass):
    return -0.5 * jnp.sum(inv_mass * rho * rho, axis=-1, keepdims=True)


def _lse(a, b):
    m = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = m + jnp.log1p(jnp.exp(mn - m))
    return jnp.where(jnp.isinf(m), m, safe)


def _uturn(older_v, newer_v, fwd, inv_mass):
    # fwd: (B, 1) bool; spans: (B, 8, D)
    bk_t = jnp.where(fwd, older_v[:, _TB], newer_v[:, _TB])
    bk_r = jnp.where(fwd, older_v[:, _RB], newer_v[:, _RB])
    fw_t = jnp.where(fwd, newer_v[:, _TF], older_v[:, _TF])
    fw_r = jnp.where(fwd, newer_v[:, _RF], older_v[:, _RF])
    delta = inv_mass * (fw_t - bk_t)
    lo = jnp.sum(bk_r * delta, axis=-1, keepdims=True)
    hi = jnp.sum(fw_r * delta, axis=-1, keepdims=True)
    return (hi < 0) | (lo < 0)


def _combine(u, old_v, old_s, new_v, new_s, fwd, barker):
    """Merge two spans. Scalars are 4-tuples (lb, lf, ls, lw) of wide
    (B, L) arrays; u/fwd are (B, 1). Returns (vectors, scalars)."""
    o_lb, o_lf, o_ls, o_lw = old_s
    n_lb, n_lf, n_ls, n_lw = new_s
    logw = _lse(o_lw, n_lw)                      # (B, L)
    denom = logw if barker else o_lw
    take_new = jnp.log(u) < (n_lw[:, :1] - denom[:, :1])  # (B, 1)
    f3 = fwd[:, :, None]
    pick_bk = jnp.where(f3, old_v, new_v)
    pick_fw = jnp.where(f3, new_v, old_v)
    pick_sel = jnp.where(take_new[:, :, None], new_v, old_v)
    ROW8 = _row8()
    is_bk = ROW8 < 3
    is_fw = (ROW8 >= 3) & (ROW8 < 6)
    v = jnp.where(is_bk, pick_bk, jnp.where(is_fw, pick_fw, pick_sel))
    s = (
        jnp.where(fwd, o_lb, n_lb),
        jnp.where(fwd, n_lf, o_lf),
        jnp.where(take_new, n_ls, o_ls),
        logw,
    )
    return v, s


def _tile_machine(batched_vg, model_consts, D, MD, max_step_halvings,
                  B, L, step, inv_mass, min_micro, max_error, draw_uniform):
    """Build (init, cond, body) of the per-tile transition while loop.

    All runtime tile values (step, inv_mass, ... and the PRNG closure)
    are captured; carries are a dict of arrays with EVERY per-lane scalar
    at width (B, L) (see module docstring, pitfall 1). Shared by the
    single-transition kernel and the sampling-block kernel.
    """

    def init(theta0, rho0, lp0, grad0, ctr0):
        joint0 = lp0 + _kinetic(rho0, inv_mass)   # (B, 1)
        point_v = _pack8(theta0, rho0, grad0)     # (B, 8, D)

        min_micro_w = jnp.broadcast_to(min_micro, (B, L))
        # fold-proof runtime zeros (module docstring, pitfall 2)
        izero = jnp.minimum(min_micro_w, 0)
        u0, ctr0 = draw_uniform(ctr0)
        fwd0 = (u0 < 0.5).astype(jnp.int32) + izero
        dt0 = jnp.where(fwd0[:, :1] != 0, step, -step)   # (B, 1)
        start = _pack3(theta0, rho0, grad0)  # (B, 3, D)

        fzero = izero.astype(jnp.float32)  # (B, L) runtime zero
        wjoint0 = fzero + joint0
        state = dict(
            done=izero,
            depth=izero + 1,
            out_depth=izero + (MD + 1),
            acc_v=point_v,
            acc_lb=wjoint0, acc_lf=wjoint0, acc_ls=fzero + lp0,
            acc_lw=wjoint0,
            fwd_dir=fwd0,
            leaf_idx=izero,
            n_leaves=izero + 1,
            ms=start, ms_joint=wjoint0,
            halvings=izero,
            dt=fzero + dt0,
            steps_total=min_micro_w,
            phase=izero,  # 0 fwd, 1 rev
            rng_ctr=ctr0,
            cur=start,
            fwd=start, fwd_lp=fzero + lp0, fwd_joint=wjoint0,
            n_grads=izero + 1,
        )
        z3 = fzero[:, :1][:, :, None]  # (B, 1, 1) runtime zero
        for _i in range(MD):
            state[f"stk{_i}_v"] = point_v * z3
            for nm in ("lb", "lf", "ls", "lw"):
                state[f"stk{_i}_{nm}"] = fzero
        return state

    keys = None  # filled on first init call by the kernels (sorted below)

    def cond(carry):
        s = dict(zip(keys, carry))
        return jnp.any(s["done"] == 0)

    def body(carry):
        s = dict(zip(keys, carry))
        live_w = s["done"] == 0          # (B, L) bool
        live = live_w[:, :1]             # (B, 1)
        fwd_dir = s["fwd_dir"][:, :1] != 0
        ctr = s["rng_ctr"]
        wide = lambda x: jnp.broadcast_to(x, (B, L))
        dt1 = s["dt"][:, :1]
        ms_joint1 = s["ms_joint"][:, :1]
        acc_s = (s["acc_lb"], s["acc_lf"], s["acc_ls"], s["acc_lw"])

        # ---- integrate the attempt (masked fori over the tile max) ----
        n_eff_w = _iwhere(live_w, s["steps_total"], s["steps_total"] * 0)
        n_eff = n_eff_w[:, :1]
        max_n = jnp.max(n_eff)

        def istep(i, c):
            th, rh, gr, lp = c
            active = i < n_eff  # (B, 1)
            half = 0.5 * dt1
            rh_h = rh + half * gr
            th_n = th + dt1 * inv_mass * rh_h
            lp_n, gr_n = batched_vg(th_n, *model_consts)
            rh_n = rh_h + half * gr_n
            return (
                jnp.where(active, th_n, th),
                jnp.where(active, rh_n, rh),
                jnp.where(active, gr_n, gr),
                jnp.where(active, lp_n[:, None], lp),
            )

        lp_neg_inf = s["fwd_lp"][:, :1] * 0 - jnp.float32(jnp.inf)
        th, rh, gr, lp_n = jax.lax.fori_loop(
            0, max_n, istep,
            (s["cur"][:, 0], s["cur"][:, 1], s["cur"][:, 2], lp_neg_inf),
        )
        cur_n = _pack3(th, rh, gr)
        n_grads = s["n_grads"] + n_eff
        joint_n = lp_n + _kinetic(rh, inv_mass)   # (B, 1)
        in_fwd = s["phase"][:, :1] == 0

        # ---- forward attempt completed ----
        f_err = jnp.abs(ms_joint1 - joint_n)
        f_ok = f_err <= max_error
        f_done = live & in_fwd
        need_rev = s["steps_total"][:, :1] >= 2 * min_micro
        start_rev = f_done & f_ok & need_rev
        leaf_ok = f_done & f_ok & ~need_rev
        more_h = (s["halvings"][:, :1] + 1) < max_step_halvings
        restart = f_done & ~f_ok & more_h
        leaf_fail = f_done & ~f_ok & ~more_h

        # ---- reversibility level completed ----
        r_done = live & ~in_fwd
        r_err = jnp.abs(joint_n - s["fwd_joint"][:, :1])
        r_within = r_err <= max_error
        leaf_fail = leaf_fail | (r_done & r_within)
        more_rev = s["steps_total"][:, :1] >= 2 * min_micro
        next_rev = r_done & ~r_within & more_rev
        leaf_ok = leaf_ok | (r_done & ~r_within & ~more_rev)

        set_fwd = f_done & f_ok
        fwd = jnp.where(set_fwd[:, :, None], cur_n, s["fwd"])
        fwd_lp = jnp.where(set_fwd, wide(lp_n), s["fwd_lp"])
        fwd_joint = jnp.where(set_fwd, wide(joint_n), s["fwd_joint"])

        # ---- merge cascade (level-indexed static slots) ----
        leaf_v = _pack8(fwd[:, 0], fwd[:, 1], fwd[:, 2])
        leaf_s = (fwd_joint, fwd_joint, fwd_lp, fwd_joint)
        lp1 = s["leaf_idx"][:, :1] + 1
        n_merges = lp1 * 0
        for i in range(1, MD + 1):
            n_merges = n_merges + (
                jnp.bitwise_and(lp1, (1 << i) - 1) == 0
            ).astype(jnp.int32)

        cur_v, cur_s = leaf_v, leaf_s
        ok = jnp.ones((B, 1), jnp.bool_)
        for i in range(MD):
            do = leaf_ok & (i < n_merges) & ok
            top_v = s[f"stk{i}_v"]
            top_s = (s[f"stk{i}_lb"], s[f"stk{i}_lf"],
                     s[f"stk{i}_ls"], s[f"stk{i}_lw"])
            ut = _uturn(top_v, cur_v, fwd_dir, inv_mass)
            u, ctr = draw_uniform(ctr)
            m_v, m_s = _combine(u, top_v, top_s,
                                cur_v, cur_s, fwd_dir, barker=True)
            cur_v = jnp.where(do[:, :, None], m_v, cur_v)
            cur_s = tuple(jnp.where(do, m, c) for m, c in zip(m_s, cur_s))
            ok = ok & ~(do & ut)
        sub_uturn = leaf_ok & ~ok
        leaf_ok = leaf_ok & ok

        new_leaf_idx = s["leaf_idx"] + 1
        subtree_done = leaf_ok & (
            new_leaf_idx[:, :1] >= s["n_leaves"][:, :1]
        )
        push = leaf_ok & ~subtree_done
        stacks = {}
        for i in range(MD):
            wm = push & (n_merges == i)
            stacks[f"stk{i}_v"] = jnp.where(wm[:, :, None], cur_v, s[f"stk{i}_v"])
            for nm, cs in zip(("lb", "lf", "ls", "lw"), cur_s):
                stacks[f"stk{i}_{nm}"] = jnp.where(wm, cs, s[f"stk{i}_{nm}"])

        # ---- top-level Metropolis + combined U-turn ----
        ut_top = _uturn(s["acc_v"], cur_v, fwd_dir, inv_mass)
        u, ctr = draw_uniform(ctr)
        comb_v, comb_s = _combine(u, s["acc_v"], acc_s,
                                  cur_v, cur_s, fwd_dir, barker=False)
        acc_v = jnp.where(subtree_done[:, :, None], comb_v, s["acc_v"])
        acc_s_new = tuple(
            jnp.where(subtree_done, m, c) for m, c in zip(comb_s, acc_s)
        )
        end_uturn = subtree_done & ut_top
        new_depth = s["depth"] + 1
        deeper = subtree_done & ~ut_top & (new_depth[:, :1] <= MD)
        exhausted = subtree_done & ~ut_top & (new_depth[:, :1] > MD)

        fail = leaf_fail | sub_uturn
        done = _iwhere(fail | end_uturn | exhausted,
                       jnp.ones_like(s["done"]), s["done"])
        out_depth = _iwhere(fail | end_uturn, s["depth"],
                            _iwhere(exhausted, jnp.full_like(s["out_depth"], MD + 1),
                                    s["out_depth"]))

        u, ctr = draw_uniform(ctr)
        new_dir = _iwhere(deeper, (u < 0.5).astype(jnp.int32), s["fwd_dir"])
        new_dir_b = new_dir[:, :1] != 0
        depth = _iwhere(deeper, new_depth, s["depth"])
        n_leaves = _iwhere(deeper, jnp.left_shift(jnp.ones_like(new_depth), new_depth - 1),
                           s["n_leaves"])
        leaf_idx = _iwhere(deeper, jnp.zeros_like(new_leaf_idx), new_leaf_idx)
        leaf_idx = _iwhere(leaf_ok | deeper, leaf_idx, s["leaf_idx"])

        acc_end = jnp.where(new_dir_b[:, :, None], acc_v[:, 3:6], acc_v[:, 0:3])
        acc_end_joint = jnp.where(new_dir_b, acc_s_new[1][:, :1],
                                  acc_s_new[0][:, :1])
        next_leaf = push
        ms = jnp.where(deeper[:, :, None], acc_end,
                       jnp.where(next_leaf[:, :, None], fwd, s["ms"]))
        ms_joint = jnp.where(deeper, wide(acc_end_joint),
                             jnp.where(next_leaf, fwd_joint, s["ms_joint"]))

        start_macro = deeper | next_leaf
        dt_base = jnp.where(new_dir_b, step, -step)  # (B, 1)
        halvings = _iwhere(start_macro, jnp.zeros_like(s["halvings"]),
                           _iwhere(restart, s["halvings"] + 1,
                                   s["halvings"]))
        phase = _iwhere(start_macro | restart, jnp.zeros_like(s["phase"]),
                        _iwhere(start_rev | next_rev,
                                jnp.ones_like(s["phase"]), s["phase"]))
        steps_total = _iwhere(
            start_macro, min_micro,
            _iwhere(restart, s["steps_total"] * 2,
                    _iwhere(start_rev | next_rev,
                            s["steps_total"] // 2, s["steps_total"])))
        dt = jnp.where(start_macro, wide(dt_base),
                       jnp.where(restart, s["dt"] * 0.5,
                                 jnp.where(start_rev | next_rev,
                                           s["dt"] * 2.0, s["dt"])))
        from_rev = start_rev | next_rev
        rev_sign = jnp.where(_row3() == 1, jnp.float32(-1.0), jnp.float32(1.0))
        rev_cur = fwd * rev_sign
        cur = jnp.where(from_rev[:, :, None], rev_cur,
                        jnp.where((start_macro | restart)[:, :, None], ms,
                                  cur_n))

        n_grads = _iwhere(live, n_grads, s["n_grads"])

        new = dict(
            done=done, depth=depth, out_depth=out_depth,
            acc_v=acc_v,
            acc_lb=acc_s_new[0], acc_lf=acc_s_new[1],
            acc_ls=acc_s_new[2], acc_lw=acc_s_new[3],
            fwd_dir=new_dir, leaf_idx=leaf_idx,
            n_leaves=n_leaves, **stacks,
            ms=ms, ms_joint=ms_joint, halvings=halvings, dt=dt,
            steps_total=steps_total, phase=phase, rng_ctr=ctr, cur=cur,
            fwd=fwd, fwd_lp=fwd_lp, fwd_joint=fwd_joint, n_grads=n_grads,
        )
        out = []
        for k in keys:
            old_x, new_x = s[k], new[k]
            m = live.reshape((B,) + (1,) * (new_x.ndim - 1))
            if jnp.issubdtype(new_x.dtype, jnp.floating):
                out.append(jnp.where(m, new_x, old_x))
            else:
                out.append(_iwhere(m, new_x, old_x))
        return tuple(out)

    def run(theta0, rho0, lp0, grad0, ctr0):
        """One full transition: init + while; returns the final dict."""
        nonlocal keys
        state = init(theta0, rho0, lp0, grad0, ctr0)
        keys = sorted(state.keys())
        final = jax.lax.while_loop(cond, body, tuple(state[k] for k in keys))
        return dict(zip(keys, final))

    return run


def make_fused_transition(
    batched_vg,
    dim: int,
    max_depth: int,
    max_step_halvings: int,
    block_b: int = 128,
    interpret: bool = False,
    consts: tuple = (),
    lane_width: int = 8,
    vmem_limit_bytes: int = 64 * 1024 * 1024,
):
    """One WALNUTS transition per launch (see module docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = dim
    MD = max_depth
    L = lane_width

    def kernel(seed_ref, theta_ref, rho_ref, lp0_ref, grad0_ref, step_ref,
               invm_ref, minmu_ref, maxerr_ref, *rest):
        const_refs = rest[:len(consts)]
        theta_out, grad_out, lp_out, depth_out, ngrads_out = rest[len(consts):]
        model_consts = tuple(r[...] for r in const_refs)
        B = block_b
        lane = (
            jax.lax.broadcasted_iota(jnp.uint32, (B, 1), 0)
            + jnp.uint32(B) * pl.program_id(0).astype(jnp.uint32)
        )
        seed_mix = _hash32(seed_ref[0].astype(jnp.uint32) ^ jnp.uint32(0x9E3779B9))

        def draw_uniform(ctr):
            bits = _hash32(
                seed_mix ^ _hash32(lane) ^ (ctr[:, :1] * jnp.uint32(0x27D4EB2F))
            )
            return _uniform_from_bits(bits), ctr + 1

        theta0 = theta_ref[...]
        rho0 = rho_ref[...]
        grad0 = grad0_ref[...]
        lp0 = lp0_ref[...]            # (B, 1)
        step = step_ref[...]          # (B, 1)
        inv_mass = invm_ref[...]      # (B, D)
        min_micro = minmu_ref[...]    # (B, 1) int32
        max_error = maxerr_ref[0]

        run = _tile_machine(batched_vg, model_consts, D, MD,
                            max_step_halvings, B, L, step, inv_mass,
                            min_micro, max_error, draw_uniform)
        min_micro_w = jnp.broadcast_to(min_micro, (B, L))
        ctr0 = (jnp.minimum(min_micro_w, 0) + 1).astype(jnp.uint32)
        fs = run(theta0, rho0, lp0, grad0, ctr0)
        theta_out[...] = fs["acc_v"][:, _TS]
        grad_out[...] = fs["acc_v"][:, _GS]
        lp_out[...] = fs["acc_ls"][:, :1]
        depth_out[...] = fs["out_depth"][:, :1]
        ngrads_out[...] = fs["n_grads"][:, :1]

    @functools.partial(jax.jit, static_argnames=())
    def fused_transition(seed, theta, rho, logp0, grad0, step, inv_mass,
                         min_micro, max_error):
        c = theta.shape[0]
        pad = (-c) % block_b
        if pad:
            p2 = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
            theta, rho, grad0, inv_mass = map(p2, (theta, rho, grad0, inv_mass))
            logp0 = jnp.pad(logp0, ((0, pad),))
            step = jnp.pad(step, ((0, pad),), constant_values=1.0)
            min_micro = jnp.pad(min_micro, ((0, pad),), constant_values=1)
        cp = theta.shape[0]
        grid = (cp // block_b,)
        vec = lambda: pl.BlockSpec((block_b, D), lambda i: (i, 0))
        scl = lambda: pl.BlockSpec((block_b, 1), lambda i: (i, 0))
        const_specs = [
            pl.BlockSpec(c.shape, (lambda nd: (lambda i: (0,) * nd))(c.ndim))
            for c in consts
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                vec(), vec(), scl(), vec(), scl(), vec(), scl(),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # max_error (1,)
            ] + const_specs,
            out_specs=[vec(), vec(), scl(), scl(), scl()],
            out_shape=[
                jax.ShapeDtypeStruct((cp, D), jnp.float32),
                jax.ShapeDtypeStruct((cp, D), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.int32),
                jax.ShapeDtypeStruct((cp, 1), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            theta, rho,
            logp0.reshape(-1, 1).astype(jnp.float32),
            grad0,
            step.reshape(-1, 1).astype(jnp.float32),
            inv_mass,
            min_micro.reshape(-1, 1).astype(jnp.int32),
            jnp.asarray(max_error, jnp.float32).reshape(1),
            *consts,
        )
        theta_o, grad_o, lp_o, depth_o, ng_o = outs
        return (theta_o[:c], grad_o[:c], lp_o[:c, 0], depth_o[:c, 0],
                ng_o[:c, 0])

    return fused_transition


def make_fused_sample_block(
    batched_vg,
    dim: int,
    max_depth: int,
    max_step_halvings: int,
    num_draws: int,
    block_b: int = 256,
    interpret: bool = False,
    consts: tuple = (),
    lane_width: int = 8,
    vmem_limit_bytes: int = 100 * 1024 * 1024,
):
    """``num_draws`` WALNUTS transitions per launch per tile.

    The sampling-phase hot loop: per-draw synchronisation is TILE-local
    (a straggling chain stalls only its own ``block_b`` lanes, not the
    whole batch — combine with cost-sorted chain order so tiles group
    similar-cost chains), draws land in a VMEM output block, and the
    span/stack bookkeeping never touches HBM. Momenta for all draws are
    pre-drawn outside with ``jax.random`` and streamed in per tile.

    Returns ``fn(seed, theta (C, D), logp0 (C,), grad0 (C, D),
    rho (num_draws, C, D), step (C,), inv_mass (C, D), min_micro (C,),
    max_error) -> (draws (num_draws, C, D), logps (num_draws, C),
    theta_f, grad_f, logp_f, n_grads (C,))``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = dim
    MD = max_depth
    L = lane_width
    N = num_draws

    def kernel(seed_ref, theta_ref, lp0_ref, grad0_ref, rho_ref, step_ref,
               invm_ref, minmu_ref, maxerr_ref, *rest):
        const_refs = rest[:len(consts)]
        (draws_out, logps_out, theta_out, grad_out, lp_out,
         ngrads_out) = rest[len(consts):]
        model_consts = tuple(r[...] for r in const_refs)
        B = block_b
        lane = (
            jax.lax.broadcasted_iota(jnp.uint32, (B, 1), 0)
            + jnp.uint32(B) * pl.program_id(0).astype(jnp.uint32)
        )
        seed_mix = _hash32(seed_ref[0].astype(jnp.uint32) ^ jnp.uint32(0x9E3779B9))

        step = step_ref[...]          # (B, 1)
        inv_mass = invm_ref[...]      # (B, D)
        min_micro = minmu_ref[...]    # (B, 1) int32
        max_error = maxerr_ref[0]

        def draw_uniform(ctr):
            bits = _hash32(
                seed_mix ^ _hash32(lane) ^ (ctr[:, :1] * jnp.uint32(0x27D4EB2F))
            )
            return _uniform_from_bits(bits), ctr + 1

        run = _tile_machine(batched_vg, model_consts, D, MD,
                            max_step_halvings, B, L, step, inv_mass,
                            min_micro, max_error, draw_uniform)

        min_micro_w = jnp.broadcast_to(min_micro, (B, L))
        izero = jnp.minimum(min_micro_w, 0)
        ng0 = izero

        def one_draw(i, carry):
            theta, lp, grad, ng = carry
            rho = rho_ref[i]  # (B, D) — this draw's pre-drawn momentum
            # decorrelate decision streams across draws: counter base
            # jumps by a large odd stride per draw
            ctr0 = (izero + 1).astype(jnp.uint32) + (
                jnp.uint32(0x9E3779B1) * (izero + i).astype(jnp.uint32)
            )
            fs = run(theta, rho, lp, grad, ctr0)
            theta = fs["acc_v"][:, _TS]
            grad = fs["acc_v"][:, _GS]
            lp = fs["acc_ls"][:, :1]
            # n_grads counts the transition's nominal initial evaluation
            # (+1, mirroring the XLA path) but here the starting log
            # density/gradient are cached from the previous draw — no
            # evaluation happens, so count honestly
            ng = ng + fs["n_grads"] - 1
            draws_out[i] = theta
            logps_out[i] = lp
            return theta, lp, grad, ng

        theta_f, lp_f, grad_f, ng = jax.lax.fori_loop(
            0, N, one_draw,
            (theta_ref[...], lp0_ref[...], grad0_ref[...], ng0),
        )
        theta_out[...] = theta_f
        grad_out[...] = grad_f
        lp_out[...] = lp_f
        ngrads_out[...] = ng[:, :1]

    @functools.partial(jax.jit, static_argnames=())
    def fused_sample_block(seed, theta, logp0, grad0, rho, step, inv_mass,
                           min_micro, max_error):
        c = theta.shape[0]
        pad = (-c) % block_b
        if pad:
            p2 = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
            theta, grad0, inv_mass = map(p2, (theta, grad0, inv_mass))
            rho = jnp.pad(rho, ((0, 0), (0, pad), (0, 0)))
            logp0 = jnp.pad(logp0, ((0, pad),))
            step = jnp.pad(step, ((0, pad),), constant_values=1.0)
            min_micro = jnp.pad(min_micro, ((0, pad),), constant_values=1)
        cp = theta.shape[0]
        grid = (cp // block_b,)
        vec = lambda: pl.BlockSpec((block_b, D), lambda i: (i, 0))
        scl = lambda: pl.BlockSpec((block_b, 1), lambda i: (i, 0))
        cube = lambda: pl.BlockSpec((N, block_b, D), lambda i: (0, i, 0))
        csc = lambda: pl.BlockSpec((N, block_b, 1), lambda i: (0, i, 0))
        const_specs = [
            pl.BlockSpec(c.shape, (lambda nd: (lambda i: (0,) * nd))(c.ndim))
            for c in consts
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
                vec(), scl(), vec(), cube(), scl(), vec(), scl(),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # max_error (1,)
            ] + const_specs,
            out_specs=[cube(), csc(), vec(), vec(), scl(), scl()],
            out_shape=[
                jax.ShapeDtypeStruct((N, cp, D), jnp.float32),
                jax.ShapeDtypeStruct((N, cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, D), jnp.float32),
                jax.ShapeDtypeStruct((cp, D), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.int32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            theta,
            logp0.reshape(-1, 1).astype(jnp.float32),
            grad0,
            rho,
            step.reshape(-1, 1).astype(jnp.float32),
            inv_mass,
            min_micro.reshape(-1, 1).astype(jnp.int32),
            jnp.asarray(max_error, jnp.float32).reshape(1),
            *consts,
        )
        draws_o, logps_o, theta_o, grad_o, lp_o, ng_o = outs
        return (draws_o[:, :c], logps_o[:, :c, 0], theta_o[:c], grad_o[:c],
                lp_o[:c, 0], ng_o[:c, 0])

    return fused_sample_block


__all__ = ["make_fused_sample_block", "make_fused_transition"]
