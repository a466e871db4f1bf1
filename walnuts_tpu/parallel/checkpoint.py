"""Mid-run checkpoint / resume for multi-chain runs (orbax-backed).

The reference has no mid-run checkpointing — it only *warm-starts*: the
adapted step size and inverse metric are exported per chain
(handlers.hpp:91-100, pyfunc.py:275-279) and can seed a fresh run
(``init_inv_metric``, stan.py:233-236), losing the chain positions and
any draws already collected. For production TPU runs (large chain
counts, preemptible hardware) this module adds true crash-resume at
block granularity, a strict superset of the reference capability:

- the full chain-batched sampler state (``WarmupState`` during warmup,
  ``SampleState`` + ``FrozenParams`` during sampling), the RunInfo
  counters, and every collected draw block are persisted after every
  ``every``-th jitted block;
- ``walnuts(..., checkpoint_dir=...)`` resumes automatically from the
  latest checkpoint: a run killed mid-warmup re-enters warmup at the
  checkpointed iteration; a run killed mid-sampling skips warmup
  entirely and produces the identical remaining draws (the sampler state
  includes the PRNG keys, so the resumed run is bitwise-deterministic).

Layout under ``directory`` (two alternating state slots so a crash
mid-save never corrupts the latest durable checkpoint; ``meta.json`` is
written last via atomic rename and names the live slot):

    meta.json                 phase, iteration, live slot, counters
    state_a/ | state_b/       orbax checkpoints of the state pytrees
    blocks/<phase>_<it>.npz   per-block draws + log densities
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_key(x) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _to_savable(tree):
    """Typed PRNG key arrays -> raw uint32 key data (orbax-storable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _from_savable(restored, template):
    """Rebuild typed keys from raw data using the template's key impl."""
    def f(t, x):
        if _is_key(t):
            return jax.random.wrap_key_data(
                jnp.asarray(x), impl=jax.random.key_impl(t)
            )
        return jnp.asarray(x)

    leaves_r = jax.tree.leaves(restored)
    treedef = jax.tree.structure(template)
    return jax.tree.map(f, template, jax.tree.unflatten(treedef, leaves_r))


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


class BlockCheckpointer:
    """Persists run state between jitted blocks; see the module docstring.

    ``every`` counts blocks: 1 checkpoints after every block, 4 after
    every fourth. Draw blocks produced since the last state save are
    buffered in memory and flushed with it, so a resumed run never has
    draws newer than its state (it regenerates them deterministically).
    """

    def __init__(self, directory: str, every: int = 1):
        if every < 1:
            raise ValueError(f"checkpoint every must be >= 1; got {every}")
        self.directory = os.path.abspath(directory)
        self.every = every
        self._blocks_since_save = 0
        self._pending: List[Tuple[str, int, np.ndarray, np.ndarray]] = []
        os.makedirs(os.path.join(self.directory, "blocks"), exist_ok=True)

    def reset(self) -> None:
        """Delete any existing checkpoint state (start the run over)."""
        for name in ("meta.json", "state_a", "state_b", "blocks"):
            path = os.path.join(self.directory, name)
            if os.path.isdir(path):
                shutil.rmtree(path)
            elif os.path.exists(path):
                os.remove(path)
        os.makedirs(os.path.join(self.directory, "blocks"), exist_ok=True)
        self._pending.clear()
        self._blocks_since_save = 0

    # -- write path ------------------------------------------------------

    def block(
        self,
        phase: str,
        it: int,
        state,
        info,
        block_start: int,
        theta: Optional[Any] = None,
        logp: Optional[Any] = None,
        params=None,
    ) -> None:
        """Record one finished block; checkpoint state every ``every``."""
        if theta is not None:
            self._pending.append(
                (phase, block_start, np.asarray(theta), np.asarray(logp))
            )
        self._blocks_since_save += 1
        if self._blocks_since_save >= self.every:
            self.save(phase, it, state, info, params=params)

    def save(self, phase: str, it: int, state, info, params=None) -> None:
        """Write a durable checkpoint: draw blocks, state slot, meta."""
        for ph, start, theta, logp in self._pending:
            np.savez(
                os.path.join(
                    self.directory, "blocks", f"{ph}_{start:08d}.npz"
                ),
                theta=theta,
                logp=logp,
            )
        self._pending.clear()
        self._blocks_since_save = 0

        meta = self._read_meta()
        slot = "state_b" if meta and meta.get("slot") == "state_a" else "state_a"
        slot_path = os.path.join(self.directory, slot)
        if os.path.exists(slot_path):
            shutil.rmtree(slot_path)
        payload = {"state": _to_savable(state)}
        if params is not None:
            payload["params"] = _to_savable(params)
        ck = _checkpointer()
        ck.save(slot_path, payload)
        ck.wait_until_finished()

        new_meta = {
            "phase": phase,
            "it": int(it),
            "slot": slot,
            "has_params": params is not None,
            "info": _info_to_dict(info),
        }
        tmp = os.path.join(self.directory, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
        os.replace(tmp, os.path.join(self.directory, "meta.json"))

    # -- read path -------------------------------------------------------

    def _read_meta(self) -> Optional[dict]:
        path = os.path.join(self.directory, "meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest(self) -> Optional[dict]:
        """Metadata of the latest durable checkpoint, or None."""
        return self._read_meta()

    def restore(self, state_template, params_template=None):
        """Restore ``(state, params, info)`` into the given templates."""
        meta = self._read_meta()
        if meta is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        payload_t = {"state": _to_savable(state_template)}
        if meta["has_params"]:
            if params_template is None:
                raise ValueError("checkpoint has params; template required")
            payload_t["params"] = _to_savable(params_template)
        ck = _checkpointer()
        restored = ck.restore(
            os.path.join(self.directory, meta["slot"]), payload_t
        )
        state = _from_savable(restored["state"], state_template)
        params = (
            _from_savable(restored["params"], params_template)
            if meta["has_params"]
            else None
        )
        return state, params, _info_from_dict(meta["info"])

    def saved_blocks(
        self, phase: str, upto_it: int
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """Concatenated ``(draws, logps)`` for saved blocks of ``phase``
        with start iteration < ``upto_it`` (the checkpointed position)."""
        bdir = os.path.join(self.directory, "blocks")
        names = sorted(
            n
            for n in os.listdir(bdir)
            if n.startswith(f"{phase}_") and n.endswith(".npz")
        )
        thetas, logps = [], []
        for n in names:
            start = int(n[len(phase) + 1 : -4])
            if start >= upto_it:
                continue
            with np.load(os.path.join(bdir, n)) as z:
                thetas.append(z["theta"])
                logps.append(z["logp"])
        if not thetas:
            return None, None
        return np.concatenate(thetas, axis=0), np.concatenate(logps, axis=0)


def _info_to_dict(info) -> dict:
    d = {
        "warmup_iters": info.warmup_iters,
        "sampling_iters": info.sampling_iters,
        "rhat_trace": [float(r) for r in info.rhat_trace],
        "converged_warmup": bool(info.converged_warmup),
        "converged_sampling": bool(info.converged_sampling),
    }
    for k in ("n_grads", "n_halve_fail", "n_nonfinite", "n_depth_exhausted"):
        v = getattr(info, k)
        d[k] = np.asarray(v).tolist() if v is not None else None
    return d


def _info_from_dict(d: dict):
    from walnuts_tpu.parallel.runtime import RunInfo

    info = RunInfo(
        warmup_iters=d["warmup_iters"],
        sampling_iters=d["sampling_iters"],
        rhat_trace=list(d["rhat_trace"]),
        converged_warmup=d["converged_warmup"],
        converged_sampling=d["converged_sampling"],
    )
    for k in ("n_grads", "n_halve_fail", "n_nonfinite", "n_depth_exhausted"):
        if d.get(k) is not None:
            setattr(info, k, np.asarray(d[k]))
    return info


__all__ = ["BlockCheckpointer"]
