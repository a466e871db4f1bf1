"""Fused tier-2 pass: the whole orbit-bookkeeping sweep as ONE kernel.

Round-4 profile (tools/profile_pass.py, funnel(101) x 4096, v5e): XLA
compiles the batched scheduler's tier-2 pass (``core/batched.py``
``_resolve_pending`` + draw banking) into ~237 kernels per pass —
~207 us, of which 67 pure-copy kernels (~60 us) and 20 async slice
reads (~28 us) are data movement XLA materialises between fusion
boundaries. Every kernel individually runs near HBM bandwidth, but the
aggregate traffic is ~10x the ~21 MB the pass actually touches: the
pass is FRAGMENTATION-bound, not bandwidth-bound (the measurement gate
VERDICT r3 item 1 / ROADMAP "pass-only Pallas kernel" asked for).

This module hand-fuses the pass: one ``pallas_call`` over chain tiles
with every row the pass touches resident in VMEM, reading and writing
each row exactly once. The pass is embarrassingly parallel across
lanes — its only cross-lane reduction is the replay-loop BOUND, which
tightens per tile — so a 1-D grid over chain tiles needs no cross-tile
communication.

Data layout — CHAIN-MINOR, matching the while carry's physical bytes
(every rule below is a measured constraint from the round-4 spikes and
the first integrated profile):

* XLA lays the batched scheduler's carried row state chain-minor
  (``f32[4096,5,101]{0,2,1}`` — the chain axis rides the 128 vector
  lanes). A row-major (chain-leading) kernel therefore cost a ~130
  us/pass round-trip of layout copies at the call boundary (measured,
  first integration). The kernel instead takes ``(..., D, C)`` views —
  ``jnp.moveaxis(x, 0, -1)`` on a chain-minor array is a pure bitcast —
  and tiles the minor chain axis.
* Per-lane SCALARS ride as stacked ``(n_fields, C)`` packs: the
  boundary ``jnp.stack`` is a cheap lane-vector concat, in-kernel loads
  ``pack[j]`` are lane vectors, scalar math runs at full VPU width, and
  scalar->row broadcasts are free sublane broadcasts (``m[None, :]``).
  (1-D ``(C,)`` refs cannot be block-tiled on TPU — Mosaic requires
  dynamic indices be multiples of the 1024-element 1-D tile — and
  ``(C, 1)`` columns pad the minor dim to 128, a 128x bloat.)
* The feature axis lands on SUBLANES: padding is 101 -> 104 (~3%)
  instead of the chain-leading layout's 101 -> 128 lanes (~27%) — the
  kernel body is VPU-issue-bound, so row-op width is wall time.
* Mosaic cannot lower i1 minor-dim broadcasts or bool-valued selects
  (``select_n`` on i1 -> an unsupported i8->i1 truncate); bool masks
  broadcast with a leading ``[None, :]`` and bool selects are and/or
  logic.

Scope: the DEFAULT sampling configuration of
``make_batched_sample_block`` (``defer_splits=True`` and no
``adapt_full`` / ``fresh_cur`` /
``bf16_ends`` / ``adapt_step_size``); other configurations keep the XLA
pass. The kernel body restates ``_resolve_pending`` (core/batched.py)
operation-for-operation — the merge cascade and stack push use the
STATIC masked slot sweeps (bitwise-equal to the bounded forms, and the
right choice in VMEM where a sweep costs no HBM traffic).

Trajectory-entry randomness (key splits, momentum normals, direction
bernoullis, the three leaf uniforms) is derived in-kernel from raw key
data via restatements of jax's partitionable threefry — verified
BITWISE against ``jax.random`` (tests/test_prng.py), so the per-lane
RNG stream is exactly the classic sampler's.

Reference parity: this kernel implements the leaf-level bookkeeping of
``build_span``/``combine``/``transition_w`` (reference walnuts.hpp:
368-387, 464-495, 520-563) — the hot loop the reference runs
per-thread on a CPU core — as a chain-tiled VMEM-resident sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from walnuts_tpu.ops.math import log_sum_exp
from walnuts_tpu.ops.prng import _threefry2x32

Array = jax.Array

# acc_v plane / acc_s slot indices — must match core/transition.py's
# (_THETA_BK, _RHO_BK, _THETA_FW, _RHO_FW, _THETA_SEL) / (_LOGP_BK,
# _LOGP_FW, _LOGP_SEL, _LOGW); asserted in core/batched.py's hookup.
_THETA_BK, _RHO_BK, _THETA_FW, _RHO_FW, _THETA_SEL = 0, 1, 2, 3, 4
_LOGP_BK, _LOGP_FW, _LOGP_SEL, _LOGW = 0, 1, 2, 3

# float-pack rows (RW): order is the boundary-packing contract
_F_RUN_SEL_LOGP, _F_RUN_LOGW, _F_MS_JOINT, _F_DT, _F_LP_CUR = 0, 1, 2, 3, 4
_F_ACC_S = 5  # 4 rows: acc_s[:, 0..3]
KF = 9
# int-pack rows (RW)
(_I_DEPTH, _I_OUT_DEPTH, _I_LEAF_IDX, _I_N_LEAVES, _I_HALVINGS,
 _I_STEPS_DONE, _I_STEPS_TOTAL, _I_PHASE, _I_N_ENDS, _I_LEAF_END_AT,
 _I_N_DEX, _I_DRAWS_DONE) = range(12)
KI = 12
# bool-pack rows (RW)
_B_FORWARD, _B_LEAF_DONE, _B_LEAF_OK = 0, 1, 2
KB = 3
# key-pack rows (RW): key / ku raw data words
_U_KEY0, _U_KEY1, _U_KU0, _U_KU1 = 0, 1, 2, 3
KU = 4
# read-only float pack rows
_R_FWD_LOGP_POS, _R_FWD_JOINT, _R_STEP = 0, 1, 2
KR = 3


def _tf(k0, k1, j):
    """threefry2x32 at counter (0, j) on lane-vector key words."""
    zero = jnp.zeros_like(k0)
    return _threefry2x32(k0, k1, zero, zero + np.uint32(j))


def _uniform01(k0, k1, j, dtype):
    """jax.random.uniform(key, ...)[j] on lane-vector key words —
    the partitionable random-bits + mantissa-fill transform
    (ops/prng.py uniform_from_data, one lane-vector counter)."""
    x0, x1 = _tf(k0, k1, j)
    if jnp.finfo(dtype).bits == 64:
        bits = (x0.astype(jnp.uint64) << jnp.uint64(32)) | x1.astype(
            jnp.uint64
        )
        fb = (bits >> jnp.uint64(12)) | jnp.asarray(
            np.array(1.0, np.float64).view(np.uint64), jnp.uint64
        )
    else:
        bits = x0 ^ x1
        fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(fb, dtype) - jnp.asarray(1.0, dtype)


def _normal_rows(k0, k1, D, dtype):
    """jax.random.normal(key, (D,)) batched over lanes: (CT,) key words
    -> (D, CT) with the counter along the SUBLANE (feature) axis
    (ops/prng.py normal_from_data, chain-minor orientation)."""
    shape = (D, k0.shape[0])
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    zero = jnp.zeros(shape, jnp.uint32)
    x0, x1 = _threefry2x32(k0[None, :] + jnp.uint32(0),
                           k1[None, :] + jnp.uint32(0), zero, idx)
    if jnp.finfo(dtype).bits == 64:
        bits = (x0.astype(jnp.uint64) << jnp.uint64(32)) | x1.astype(
            jnp.uint64
        )
        fb = (bits >> jnp.uint64(12)) | jnp.asarray(
            np.array(1.0, np.float64).view(np.uint64), jnp.uint64
        )
    else:
        bits = x0 ^ x1
        fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    u01 = jax.lax.bitcast_convert_type(fb, dtype) - jnp.asarray(1.0, dtype)
    lo = np.nextafter(np.array(-1.0, dtype), np.array(0.0, dtype),
                      dtype=np.dtype(dtype))
    hi = np.array(1.0, dtype)
    u = u01 * jnp.asarray(hi - lo, dtype) + jnp.asarray(lo, dtype)
    u = jnp.maximum(jnp.asarray(lo, dtype), u)
    return jnp.asarray(np.sqrt(2), dtype) * jax.lax.erf_inv(u)


def _ctz(x):
    """count_trailing_zeros via the float-exponent trick (exact for the
    power-of-two low bit, x < 2^24): Mosaic-safe replacement for
    lax.population_count. Identical integers to ops.math's version.
    Mosaic lacks the u32->f32 cast; the isolated low bit is tiny
    (leaf_idx + 1 <= 2^(max_depth-1)), so route through int32."""
    x = x.astype(jnp.uint32)
    low = x & (~x + jnp.uint32(1))
    f = low.astype(jnp.int32).astype(jnp.float32)
    expo = (jax.lax.bitcast_convert_type(f, jnp.uint32)
            >> jnp.uint32(23)).astype(jnp.int32) - 127
    return expo


def _make_kernel(max_depth: int, n_slots: int, B: int, R: int):
    def kernel(fp_r, ip_r, bp_r, up_r,
               acc_v_r, agb_r, ags_r, agf_r, stack_r, run_sel_r, rsg_r,
               ms_r, cur_r, bt_r, bl_r, bd_r,
               fwd_r, im_r, rof_r, mm_r, cap_r,
               fp_o, ip_o, bp_o, up_o,
               acc_v_o, agb_o, ags_o, agf_o, stack_o, run_sel_o, rsg_o,
               ms_o, cur_o, bt_o, bl_o, bd_o):
        dtype = fp_r.dtype
        run_sel_logp = fp_r[_F_RUN_SEL_LOGP]
        run_logw = fp_r[_F_RUN_LOGW]
        ms_joint = fp_r[_F_MS_JOINT]
        dt_v = fp_r[_F_DT]
        lp_cur = fp_r[_F_LP_CUR]
        acc_s = [fp_r[_F_ACC_S + j] for j in range(4)]
        depth = ip_r[_I_DEPTH]
        out_depth = ip_r[_I_OUT_DEPTH]
        leaf_idx = ip_r[_I_LEAF_IDX]
        n_leaves = ip_r[_I_N_LEAVES]
        halvings = ip_r[_I_HALVINGS]
        steps_done = ip_r[_I_STEPS_DONE]
        steps_total = ip_r[_I_STEPS_TOTAL]
        phase = ip_r[_I_PHASE]
        n_ends = ip_r[_I_N_ENDS]
        leaf_end_at = ip_r[_I_LEAF_END_AT]
        n_dex = ip_r[_I_N_DEX]
        draws_done = ip_r[_I_DRAWS_DONE]
        forward = bp_r[_B_FORWARD]
        leaf_done = bp_r[_B_LEAF_DONE]
        leaf_ok_in = bp_r[_B_LEAF_OK]
        k0, k1 = up_r[_U_KEY0], up_r[_U_KEY1]
        ku0, ku1 = up_r[_U_KU0], up_r[_U_KU1]
        fwd_logp_pos = rof_r[_R_FWD_LOGP_POS]
        fwd_joint = rof_r[_R_FWD_JOINT]
        step = rof_r[_R_STEP]
        min_micro = mm_r[0]
        cap = cap_r[0, 0]
        inv_mass = im_r[:]      # (D, ct)

        active = draws_done < cap

        # ---- _resolve_pending, op for op (core/batched.py:743-1343,
        # base configuration); rows are (D, ct), lane vectors (ct,) ----
        pend = active & leaf_done
        leaf_ok = pend & leaf_ok_in
        leaf_fail = pend & ~leaf_ok_in
        end1 = leaf_end_at

        leaf_th, leaf_rho = fwd_r[0], fwd_r[1]
        sgn = jnp.where(forward, jnp.asarray(1.0, dtype),
                        jnp.asarray(-1.0, dtype))

        def uturn_end(old_th, old_rho):
            delta = sgn[None, :] * inv_mass * (leaf_th - old_th)
            return (jnp.sum(leaf_rho * delta, axis=0) < 0) | (
                jnp.sum(old_rho * delta, axis=0) < 0
            )

        n_merges = _ctz(leaf_idx + 1)
        # merge cascade — static masked sweep over the VMEM-resident
        # slot rows
        cur_end_th, cur_end_rho = fwd_r[0], fwd_r[1]
        ok = jnp.ones_like(leaf_ok)
        for j in range(n_slots):
            do = leaf_ok & (j < n_merges) & ok
            sth, srho = stack_r[j, 0], stack_r[j, 1]
            ut = uturn_end(sth, srho)
            cur_end_th = jnp.where(do[None, :], sth, cur_end_th)
            cur_end_rho = jnp.where(do[None, :], srho, cur_end_rho)
            ok = ok & ~(do & ut)
        sub_uturn = leaf_ok & ~ok
        leaf_ok = leaf_ok & ok

        # deferred-key-split replay (tile-local bound; ops/prng.py
        # _replay_kernel arithmetic)
        def replay_body(j, c):
            rk0, rk1, rku0, rku1 = c
            s00, s01 = _tf(rk0, rk1, 0)
            s10, s11 = _tf(rk0, rk1, 1)
            adv = j < n_ends
            hit = adv & (end1 == j + 1)
            return (jnp.where(adv, s00, rk0), jnp.where(adv, s01, rk1),
                    jnp.where(hit, s10, rku0), jnp.where(hit, s11, rku1))

        k0, k1, ku0, ku1 = jax.lax.fori_loop(
            0, jnp.max(n_ends), replay_body, (k0, k1, ku0, ku1)
        )

        # the three leaf uniforms from the resolving leaf's subkey
        u_res = _uniform01(ku0, ku1, 0, dtype)
        u_met = _uniform01(ku0, ku1, 1, dtype)
        u_dir = _uniform01(ku0, ku1, 2, dtype)

        new_leaf_idx = leaf_idx + 1
        subtree_done = leaf_ok & (new_leaf_idx >= n_leaves)
        push = leaf_ok & ~subtree_done

        # reservoir (streaming Barker)
        run_logw_new = log_sum_exp(run_logw, fwd_joint)
        take_leaf = jnp.log(u_res) < fwd_joint - run_logw_new
        upd = leaf_ok & take_leaf

        # top-level Metropolis + combined U-turn on subtree completion
        fw1 = forward[None, :]
        acc_old_th = jnp.where(fw1, acc_v_r[_THETA_BK], acc_v_r[_THETA_FW])
        acc_old_rho = jnp.where(fw1, acc_v_r[_RHO_BK], acc_v_r[_RHO_FW])
        ut_top = uturn_end(acc_old_th, acc_old_rho)
        take_new = jnp.log(u_met) < run_logw_new - acc_s[_LOGW]
        upd_fw = subtree_done & forward
        upd_bk = subtree_done & ~forward
        take = subtree_done & take_new
        end_uturn = subtree_done & ut_top
        new_depth = depth + 1
        deeper = subtree_done & ~ut_top & (new_depth <= max_depth)
        exhausted = subtree_done & ~ut_top & (new_depth > max_depth)

        fail = leaf_fail | sub_uturn
        complete = fail | end_uturn | exhausted
        out_depth_v = jnp.where(
            fail | end_uturn, depth,
            jnp.where(exhausted, jnp.int32(max_depth + 1), out_depth),
        )

        u1 = upd[None, :]
        run_sel_v = jnp.where(u1, fwd_r[0], run_sel_r[:])
        run_sel_logp_v = jnp.where(upd, fwd_logp_pos, run_sel_logp)
        run_sel_grad_v = jnp.where(u1, fwd_r[2], rsg_r[:])

        t1 = take[None, :]
        sel_theta = jnp.where(t1, run_sel_v, acc_v_r[_THETA_SEL])
        sel_logp = jnp.where(take, run_sel_logp_v, acc_s[_LOGP_SEL])
        sel_grad = jnp.where(t1, run_sel_grad_v, ags_r[:])

        new_draws_done = draws_done + complete.astype(jnp.int32)
        restart = complete & (new_draws_done < R)
        r1 = restart[None, :]

        # ---- _fresh_trajectory (core/batched.py:403-420) on raw key
        # data: a 3-way split, momentum ~ N(0, M), direction bernoulli
        D = inv_mass.shape[0]
        kn0, kn1 = _tf(k0, k1, 0)
        ks1_0, ks1_1 = _tf(k0, k1, 1)
        ks2_0, ks2_1 = _tf(k0, k1, 2)
        z = _normal_rows(ks1_0, ks1_1, D, dtype)
        rho0 = z / jnp.sqrt(inv_mass)
        joint0 = sel_logp + (
            -0.5 * jnp.sum(inv_mass * jnp.square(rho0), axis=0)
        )
        # bernoulli's default p = 0.5 is a Python float: the comparison
        # uniform's width follows the canonical float dtype (f64 under
        # x64 — the CPU test configuration — f32 on TPU)
        bdt = jnp.result_type(0.5)
        forward0 = _uniform01(ks2_0, ks2_1, 0, bdt) < jnp.asarray(0.5, bdt)
        dt0 = jnp.where(forward0, step, -step)

        cont_m = pend & ~complete

        # ---- single-pass merged field writes ----
        # boolean selects as logic ops: select_n on i1 values lowers to
        # an i8->i1 truncate Mosaic rejects (measured round 4)
        dir_deep = (deeper & (u_dir < jnp.asarray(0.5, dtype))) | (
            ~deeper & forward
        )
        new_dir = (restart & forward0) | (~restart & dir_deep)
        nd1 = new_dir[None, :]
        ufw1 = upd_fw[None, :]
        ubk1 = upd_bk[None, :]
        acc_grad_fw = jnp.where(r1, sel_grad,
                                jnp.where(ufw1, fwd_r[2], agf_r[:]))
        acc_grad_bk = jnp.where(r1, sel_grad,
                                jnp.where(ubk1, fwd_r[2], agb_r[:]))
        acc_grad_sel = jnp.where(r1, sel_grad,
                                 jnp.where(t1, sel_grad, ags_r[:]))
        acc_v_bk_th = jnp.where(r1, sel_theta,
                                jnp.where(ubk1, fwd_r[0],
                                          acc_v_r[_THETA_BK]))
        acc_v_bk_rho = jnp.where(r1, rho0,
                                 jnp.where(ubk1, fwd_r[1],
                                           acc_v_r[_RHO_BK]))
        acc_v_fw_th = jnp.where(r1, sel_theta,
                                jnp.where(ufw1, fwd_r[0],
                                          acc_v_r[_THETA_FW]))
        acc_v_fw_rho = jnp.where(r1, rho0,
                                 jnp.where(ufw1, fwd_r[1],
                                           acc_v_r[_RHO_FW]))
        acc_v_sel = jnp.where(r1, sel_theta,
                              jnp.where(t1, sel_theta,
                                        acc_v_r[_THETA_SEL]))
        acc_s_bk = jnp.where(restart, joint0,
                             jnp.where(upd_bk, fwd_joint, acc_s[_LOGP_BK]))
        acc_s_fw = jnp.where(restart, joint0,
                             jnp.where(upd_fw, fwd_joint, acc_s[_LOGP_FW]))
        acc_s_sel = jnp.where(restart, sel_logp,
                              jnp.where(take, sel_logp, acc_s[_LOGP_SEL]))
        acc_s_lw = jnp.where(restart, joint0,
                             jnp.where(subtree_done,
                                       log_sum_exp(acc_s[_LOGW],
                                                   run_logw_new),
                                       acc_s[_LOGW]))

        acc_end_th = jnp.where(nd1, acc_v_fw_th, acc_v_bk_th)
        acc_end_rho = jnp.where(nd1, acc_v_fw_rho, acc_v_bk_rho)
        acc_end_grad = jnp.where(nd1, acc_grad_fw, acc_grad_bk)
        acc_end_joint = jnp.where(new_dir, acc_s_fw, acc_s_bk)

        d2 = deeper[None, :]
        p2 = push[None, :]
        ms_th = jnp.where(r1, sel_theta,
                          jnp.where(d2, acc_end_th,
                                    jnp.where(p2, fwd_r[0], ms_r[0])))
        ms_rho = jnp.where(r1, rho0,
                           jnp.where(d2, acc_end_rho,
                                     jnp.where(p2, fwd_r[1], ms_r[1])))
        ms_grad = jnp.where(r1, sel_grad,
                            jnp.where(d2, acc_end_grad,
                                      jnp.where(p2, fwd_r[2], ms_r[2])))
        ms_joint_v = jnp.where(restart, joint0,
                               jnp.where(deeper, acc_end_joint,
                                         jnp.where(push, fwd_joint,
                                                   ms_joint)))
        rc = restart | cont_m
        rc1 = rc[None, :]

        # ---- write tile ----
        fp_o[_F_RUN_SEL_LOGP] = jnp.where(restart, sel_logp,
                                          run_sel_logp_v)
        fp_o[_F_RUN_LOGW] = jnp.where(
            restart | deeper, jnp.asarray(-jnp.inf, dtype),
            jnp.where(leaf_ok, run_logw_new, run_logw),
        )
        fp_o[_F_MS_JOINT] = ms_joint_v
        fp_o[_F_DT] = jnp.where(restart, dt0,
                                jnp.where(cont_m,
                                          jnp.where(new_dir, step, -step),
                                          dt_v))
        fp_o[_F_LP_CUR] = jnp.where(restart, sel_logp, lp_cur)
        fp_o[_F_ACC_S + _LOGP_BK] = acc_s_bk
        fp_o[_F_ACC_S + _LOGP_FW] = acc_s_fw
        fp_o[_F_ACC_S + _LOGP_SEL] = acc_s_sel
        fp_o[_F_ACC_S + _LOGW] = acc_s_lw
        ip_o[_I_DEPTH] = jnp.where(restart, jnp.int32(1),
                                   jnp.where(deeper, new_depth, depth))
        ip_o[_I_OUT_DEPTH] = jnp.where(restart, jnp.int32(max_depth + 1),
                                       out_depth_v)
        ip_o[_I_LEAF_IDX] = jnp.where(restart | deeper, jnp.int32(0),
                                      jnp.where(leaf_ok, new_leaf_idx,
                                                leaf_idx))
        ip_o[_I_N_LEAVES] = jnp.where(
            restart, jnp.int32(1),
            jnp.where(deeper, jnp.int32(1) << (new_depth - 1), n_leaves),
        )
        ip_o[_I_HALVINGS] = jnp.where(rc, jnp.int32(0), halvings)
        ip_o[_I_STEPS_DONE] = jnp.where(rc, jnp.int32(0), steps_done)
        ip_o[_I_STEPS_TOTAL] = jnp.where(restart, min_micro,
                                         jnp.where(cont_m, min_micro,
                                                   steps_total))
        ip_o[_I_PHASE] = jnp.where(rc, jnp.int32(0), phase)
        ip_o[_I_N_ENDS] = jnp.zeros_like(n_ends)
        ip_o[_I_LEAF_END_AT] = jnp.zeros_like(leaf_end_at)
        ip_o[_I_N_DEX] = n_dex + exhausted.astype(jnp.int32)
        ip_o[_I_DRAWS_DONE] = new_draws_done
        bp_o[_B_FORWARD] = new_dir
        bp_o[_B_LEAF_DONE] = leaf_done & ~pend
        bp_o[_B_LEAF_OK] = leaf_ok_in & ~pend
        up_o[_U_KEY0] = jnp.where(restart, kn0, k0)
        up_o[_U_KEY1] = jnp.where(restart, kn1, k1)
        up_o[_U_KU0] = ku0
        up_o[_U_KU1] = ku1
        acc_v_o[_THETA_BK] = acc_v_bk_th
        acc_v_o[_RHO_BK] = acc_v_bk_rho
        acc_v_o[_THETA_FW] = acc_v_fw_th
        acc_v_o[_RHO_FW] = acc_v_fw_rho
        acc_v_o[_THETA_SEL] = acc_v_sel
        agb_o[:] = acc_grad_bk
        ags_o[:] = acc_grad_sel
        agf_o[:] = acc_grad_fw
        # stack push — static masked sweep
        for j in range(n_slots):
            wm = (push & (n_merges == j))[None, :]
            stack_o[j, 0] = jnp.where(wm, cur_end_th, stack_r[j, 0])
            stack_o[j, 1] = jnp.where(wm, cur_end_rho, stack_r[j, 1])
        run_sel_o[:] = jnp.where(r1, sel_theta, run_sel_v)
        rsg_o[:] = jnp.where(r1, sel_grad, run_sel_grad_v)
        ms_o[0] = ms_th
        ms_o[1] = ms_rho
        ms_o[2] = ms_grad
        cur_o[0] = jnp.where(rc1, ms_th, cur_r[0])
        cur_o[1] = jnp.where(rc1, ms_rho, cur_r[1])
        cur_o[2] = jnp.where(rc1, ms_grad, cur_r[2])

        # ---- draw banking (sample_block outer_body) — static masked
        # sweep over the B buffer rows ----
        bank_idx = new_draws_done - 1
        slot = bank_idx % B
        for j in range(B):
            mj = complete & (slot == j)
            bt_o[j] = jnp.where(mj[None, :], sel_theta, bt_r[j])
            bl_o[j] = jnp.where(mj, sel_logp, bl_r[j])
            bd_o[j] = jnp.where(mj, out_depth_v, bd_r[j])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "n_slots", "B", "R", "ct", "interpret"),
)
def fused_pass_call(fp, ip, bp, up, acc_v, agb, ags, agf, stack_e,
                    run_sel, rsg, ms, cur, bt, bl, bd,
                    fwd, inv_mass, rof, mm, cap, *,
                    max_depth: int, n_slots: int, B: int, R: int,
                    ct: int, interpret: bool = False):
    """One fused tier-2 pass over every chain tile.

    Packs: ``fp`` (KF, C) float, ``ip`` (KI, C) i32, ``bp`` (KB, C)
    bool, ``up`` (KU, C) u32, ``rof`` (KR, C) float read-only, ``mm``
    (1, C) i32 read-only, ``cap`` (1, 1) i32. Row state arrives
    CHAIN-MINOR — ``(..., D, C)`` views of the LaneState arrays (pure
    bitcasts of their carried layout). Returns the 16 read-write arrays
    updated, aliased in-place.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = fp.shape[-1]
    if C % ct:
        raise ValueError(f"chain tile {ct} must divide the batch {C}")
    grid = (C // ct,)

    def cm_spec(x):
        # chain-minor: tile the LAST axis, carry the rest whole
        return pl.BlockSpec(x.shape[:-1] + (ct,),
                            lambda i, nd=x.ndim: (0,) * (nd - 1) + (i,),
                            memory_space=pltpu.VMEM)

    rw_inputs = (fp, ip, bp, up, acc_v, agb, ags, agf, stack_e,
                 run_sel, rsg, ms, cur, bt, bl, bd)
    rw_specs = [cm_spec(x) for x in rw_inputs]
    in_specs = rw_specs + [
        cm_spec(fwd), cm_spec(inv_mass), cm_spec(rof), cm_spec(mm),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in rw_inputs]

    kernel = _make_kernel(max_depth, n_slots, B, R)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=rw_specs,
        out_shape=out_shape,
        input_output_aliases={j: j for j in range(len(rw_inputs))},
        interpret=interpret,
    )(fp, ip, bp, up, acc_v, agb, ags, agf, stack_e, run_sel, rsg,
      ms, cur, bt, bl, bd, fwd, inv_mass, rof, mm, cap)


__all__ = ["fused_pass_call", "KF", "KI", "KB", "KU", "KR"]
