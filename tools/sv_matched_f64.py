import json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
for k, v in [("jax_compilation_cache_dir", "/tmp/jax_tpu_cache"),
             ("jax_persistent_cache_min_entry_size_bytes", -1),
             ("jax_persistent_cache_min_compile_time_secs", 0.0)]:
    try: jax.config.update(k, v)
    except Exception: pass
from walnuts_tpu.config import SamplingConfig, WarmupConfig
from walnuts_tpu.core.adapt import nutpie_init_mass
from walnuts_tpu.core.sampler import freeze_params, init_sample_state, init_warmup_state
from walnuts_tpu.ops.math import adapt_step_size, make_logp_grad
from walnuts_tpu.parallel.runtime import run_sampling, run_warmup
from walnuts_tpu.models import stochastic_volatility

logp, dim = stochastic_volatility()
logp_grad = make_logp_grad(logp)
C, dtype = 1024, jnp.float64
wc = WarmupConfig(min_iter=200, max_iter=200, block_size=50)
sc = SamplingConfig(min_iter=200, max_iter=200, block_size=50, max_step_halvings=8)
base = jax.random.key(2027)
keys = jax.vmap(lambda c: jax.random.fold_in(base, c))(jnp.arange(C))
with open("/tmp/native_inits.bin", "rb") as f:
    hdr = np.fromfile(f, np.int32, 2)
    theta0_host = np.fromfile(f, np.float64, int(hdr[0]) * int(hdr[1])).reshape(int(hdr[0]), int(hdr[1]))
theta0 = jnp.asarray(theta0_host, dtype)
grads = jax.vmap(lambda t: logp_grad(t)[1])(theta0)
im = jax.vmap(lambda g: nutpie_init_mass(g, jnp.asarray(1e-5, dtype)))(grads)
sk = jax.vmap(lambda c: jax.random.fold_in(base, c + C))(jnp.arange(C))
s0 = jax.jit(jax.vmap(lambda k, t, m: adapt_step_size(k, logp_grad, t, m, jnp.asarray(1.0, dtype))))(sk, theta0, im)
ws = jax.vmap(lambda k, t, m, s: init_warmup_state(k, t, m, s, wc, sc))(keys, theta0, im, s0)
import time
t0 = time.time()
ws, _, _, info = run_warmup(logp_grad, ws, wc, sc, batched=True, runahead=8)
jax.block_until_ready(ws.theta)
tw = time.time() - t0
params = jax.vmap(freeze_params)(ws)
wg = np.asarray(ws.n_grads).astype(np.float64)
step = np.asarray(params.step_size, np.float64)
mm = np.asarray(params.min_micro)
ss = jax.vmap(init_sample_state)(ws)
t0 = time.time()
ss, dr, _, _ = run_sampling(logp_grad, ss, params, sc, info=info,
                            device_draws=True, batched=True, runahead=8, tier2_every=12)
jax.block_until_ready(ss.theta)
print("tpu-matched-f64 wall: warmup %.2f s, sampling %.2f s" % (tw, time.time() - t0))
sg = np.asarray(ss.n_grads).astype(np.float64) - wg
d0 = np.asarray(jax.device_get(dr[:, :, 0]))
mv = (np.abs(np.diff(d0, axis=0)) > 0).sum(axis=0)
np.savez("/tmp/sv_tpu_chainstats_matched_f64.npz", step=step, min_micro=mm, sg=sg, mv=mv, wg=wg)
live = mv > 0
q = lambda x, ps=(0.1,0.25,0.5,0.75,0.9): np.quantile(x, ps).round(4).tolist()
print("tpu-matched-f64 live n:", int(live.sum()))
print("tpu-matched-f64 live step q:", q(step[live]))
print("tpu-matched-f64 live samp_grads q:", q(sg[live]), "mean", round(sg[live].mean(),1))
print("tpu-matched-f64 live min_micro hist:", dict(zip(*[list(map(int,u)) for u in np.unique(mm[live], return_counts=True)])))
print("tpu-matched-f64 live moves q:", q(mv[live].astype(float)))
print("tpu-matched-f64 live grads/draw q:", q(sg[live]/200))
print("tpu-matched-f64 stuck sg uniq:", np.unique(sg[~live])[:5])
