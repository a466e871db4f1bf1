"""Quantify mesh-scaling overhead on the virtual CPU device mesh.

Real multi-chip hardware is not available in this environment, so this
probe produces the strongest obtainable evidence for the chips-scaling
story (docs/BENCHMARKS.md "Mesh scaling"): chains communicate ONLY in
the between-block convergence reductions (the geomean/max-rel warmup
test, adapt.hpp:203-225 analog, and the log-density R-hat,
sampler.hpp:142-145 analog), so per-chip throughput should be flat in
the device count up to those reductions' cost.

On a single-core host every virtual device executes serially, so
absolute walls measure TOTAL work; what the mesh-size sweep isolates is
the OVERHEAD the sharded program adds on top — partitioning, the
cross-device collectives in the reductions, and any resharding XLA
inserts. Measured quantities, at a fixed total chain count:

  * sampling-block wall time at mesh sizes 1/2/4 (same total work:
    flat curve = no sharding overhead);
  * the between-block reduction wall alone (the only cross-chip
    communication; on hardware this rides ICI once per block, i.e.
    every `block_size` draws).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
     python examples/mesh_scaling_probe.py

(The block is kept small: on this 1-core host the virtual devices
execute serially, and XLA:CPU's 40-s collective rendezvous timeout
aborts 8-participant all-reduces if one serialized device is still
integrating a long block when the others arrive.)
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.sampler import (
    freeze_params,
    init_sample_state,
    init_warmup_state,
    make_sample_step,
)
from walnuts_tpu.models import funnel
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import (
    _sampling_rhat,
    run_warmup,
    shard_chains,
)

C, D_FUNNEL, WARM, BLOCK, REPS = 256, 101, 100, 10, 8


def main() -> int:
    logp, dim = funnel(D_FUNNEL)
    lg = make_logp_grad(logp)
    wcfg = WarmupConfig(min_iter=WARM, max_iter=WARM, block_size=50)
    scfg = SamplingConfig(min_iter=BLOCK, max_iter=BLOCK, block_size=BLOCK,
                          max_step_halvings=8)
    base = jax.random.key(9)
    keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
    theta0 = 2.0 * jax.random.normal(jax.random.fold_in(base, 1), (C, dim))
    g0 = jax.vmap(lambda t: lg(t)[1])(theta0)
    im0 = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5)))(g0)
    step0 = jax.jit(jax.vmap(
        lambda k, t, m: adapt_step_size(k, lg, t, m, jnp.asarray(1.0))
    ))(keys, theta0, im0)
    ws = jax.vmap(
        lambda k, t, m, s: init_warmup_state(k, t, m, s, wcfg, scfg)
    )(keys, theta0, im0, step0)
    ws, _, _, _ = run_warmup(lg, ws, wcfg, scfg)
    params0 = jax.vmap(freeze_params)(ws)
    ss0 = jax.vmap(init_sample_state)(ws)

    sstep = make_sample_step(lg, scfg)
    vstep = jax.vmap(sstep)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def block(s, p, n):
        def body(s, _):
            s, res = vstep(s, p)
            return s, res.logp

        return jax.lax.scan(body, s, None, length=n)

    rhat = jax.jit(_sampling_rhat)

    devices = jax.devices()
    rows = []
    # default sweep tops out at 4: the 8-participant all-reduce trips
    # XLA:CPU's hard 40-s rendezvous abort on this 1-core host even at
    # tiny blocks (8-device CORRECTNESS is covered by
    # tests/test_sharding.py; this probe quantifies overhead).
    max_dev = int(os.environ.get("MESH_PROBE_MAX_DEV", 4))
    for ndev in (1, 2, 4, 8):
        if ndev > len(devices) or ndev > max_dev:
            break
        mesh = Mesh(np.array(devices[:ndev]), ("chains",))
        s = shard_chains(jax.tree.map(jnp.array, ss0), mesh)
        p = shard_chains(jax.tree.map(jnp.array, params0), mesh)
        s, lp = block(s, p, BLOCK)  # compile + settle
        jax.block_until_ready(lp)
        t0 = time.time()
        for _ in range(REPS):
            s, lp = block(s, p, BLOCK)
        jax.block_until_ready(lp)
        t_block = (time.time() - t0) / REPS
        r = rhat(s)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(50):
            r = rhat(s)
        jax.block_until_ready(r)
        t_red = (time.time() - t0) / 50
        rows.append((ndev, t_block, t_red))
        print(
            f"devices={ndev}: block({BLOCK} draws x {C} chains) "
            f"{t_block * 1e3:8.1f} ms   r-hat reduction {t_red * 1e6:7.1f} us "
            f"({t_red / t_block * 100:.3f}% of block)",
            flush=True,
        )

    # the batched-native scheduler over the same meshes: its per-trip
    # liveness tests (jnp.any/jnp.max over the sharded chain axis) are
    # collectives, i.e. much chattier than the classic path's per-draw
    # conds — this sweep quantifies that extra cost (on hardware each is
    # one small ICI all-reduce per trip)
    from walnuts_tpu.core.batched import make_batched_sample_block

    start_blk, sample_blk = make_batched_sample_block(
        lg, scfg.max_trajectory_doublings, scfg.max_step_halvings
    )
    me = jnp.asarray(scfg.max_hamiltonian_error, theta0.dtype)

    @functools.partial(jax.jit, static_argnums=2)
    def bblock(s, p, n):
        st = start_blk(
            s.key, s.theta, s.n_grads, s.fails,
            p.step_size, p.inv_mass, p.min_micro,
        )
        res = sample_blk(
            st, p.step_size, p.inv_mass, p.min_micro, me, n
        )
        return s._replace(key=res.key, theta=res.draws[-1]), res.logps

    rows_b = []
    for ndev in (1, 2, 4, 8):
        if ndev > len(devices) or ndev > max_dev:
            break
        mesh = Mesh(np.array(devices[:ndev]), ("chains",))
        s = shard_chains(jax.tree.map(jnp.array, ss0), mesh)
        p = shard_chains(jax.tree.map(jnp.array, params0), mesh)
        s, lp = bblock(s, p, BLOCK)
        jax.block_until_ready(lp)
        t0 = time.time()
        for _ in range(REPS):
            s, lp = bblock(s, p, BLOCK)
        jax.block_until_ready(lp)
        t_block = (time.time() - t0) / REPS
        rows_b.append((ndev, t_block))
        print(
            f"devices={ndev}: BATCHED block({BLOCK} draws x {C} chains) "
            f"{t_block * 1e3:8.1f} ms",
            flush=True,
        )

    base_t = rows[0][1]
    worst = max(t for _, t, _ in rows) / base_t
    worst_b = max(t for _, t in rows_b) / rows_b[0][1]
    print(
        f"\nsharding overhead (same total work, 1 -> {rows[-1][0]} devices): "
        f"classic {(worst - 1) * 100:.1f}% worst-case, batched "
        f"{(worst_b - 1) * 100:.1f}%; reduction cost per block "
        f"<= {max(tr for _, _, tr in rows) * 1e6:.0f} us",
        flush=True,
    )
    # On hardware the block compute splits across chips while the
    # reduction stays one ICI collective per block: with reduction cost
    # r and block cost b/n per chip, projected scaling efficiency at n
    # chips is (b/n) / (b/n + r) — print the projection from measured r/b.
    b, r = rows[-1][1], rows[-1][2]
    for n in (2, 4, 8, 16, 64):
        eff = (b / n) / (b / n + r)
        print(f"projected {n}-chip efficiency (reduction-bound): {eff * 100:.2f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
