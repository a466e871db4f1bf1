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
    Buffered blocks stay device arrays with an async device->host copy in
    flight until :meth:`save` materializes them, so with ``every > 1`` the
    device never idles on the transfer (with ``every == 1`` every block
    still saves synchronously — raise ``every`` to pipeline).

    ``keep_last_n`` bounds the block-file count per phase: when more than
    ``keep_last_n`` files exist, the older ones are COMPACTED into a
    single consolidated ``.npz`` (no data is dropped — resumed runs still
    reassemble every draw). Compaction is crash-safe: the consolidated
    file atomically replaces the oldest merged file first, and
    :meth:`saved_blocks` skips any leftover merged file whose iteration
    range the consolidated file already covers.

    ``fingerprint`` (any JSON-serializable value) records the run
    configuration; :meth:`latest` refuses to resume — returns ``None``
    with a warning, so the caller starts over — when the stored
    fingerprint differs (e.g. the seed or iteration counts changed but
    ``resume=True`` was left set).
    """

    def __init__(
        self,
        directory: str,
        every: int = 1,
        keep_last_n: Optional[int] = None,
        fingerprint=None,
    ):
        if every < 1:
            raise ValueError(f"checkpoint every must be >= 1; got {every}")
        if keep_last_n is not None and keep_last_n < 1:
            raise ValueError(
                f"checkpoint keep_last_n must be >= 1; got {keep_last_n}"
            )
        self.directory = os.path.abspath(directory)
        self.every = every
        self.keep_last_n = keep_last_n
        self.fingerprint = fingerprint
        self._blocks_since_save = 0
        self._pending: List[Tuple[str, int, int, Any, Any]] = []
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
            # keep the device arrays and start the host copy in the
            # background; np.asarray here would stall the device on every
            # block (materialized in save() instead)
            for x in (theta, logp):
                try:
                    x.copy_to_host_async()
                except AttributeError:
                    pass  # plain numpy / backends without async copy
            self._pending.append((phase, block_start, it, theta, logp))
        self._blocks_since_save += 1
        if self._blocks_since_save >= self.every:
            self.save(phase, it, state, info, params=params)

    def save(self, phase: str, it: int, state, info, params=None) -> None:
        """Write a durable checkpoint: draw blocks, state slot, meta."""
        touched_phases = set()
        for ph, start, end, theta, logp in self._pending:
            np.savez(
                os.path.join(
                    self.directory, "blocks", f"{ph}_{start:08d}.npz"
                ),
                theta=np.asarray(theta),
                logp=np.asarray(logp),
                end=np.asarray(end),
            )
            touched_phases.add(ph)
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
        if self.fingerprint is not None:
            new_meta["fingerprint"] = self.fingerprint
        tmp = os.path.join(self.directory, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
        os.replace(tmp, os.path.join(self.directory, "meta.json"))

        # Compaction runs strictly AFTER the meta write: a consolidated
        # file must never span past the durable checkpoint iteration, or
        # a crash mid-compaction would make resume double-count draws.
        if self.keep_last_n is not None:
            for ph in touched_phases:
                self._compact(ph)

    def update_info(self, phase: str, it: int, info) -> None:
        """Rewrite the RunInfo in meta.json for an existing checkpoint.

        The convergence flags are decided AFTER the block whose save wrote
        the meta (the controller check runs on the finished block), so the
        runtime calls this when a phase ends to persist the final flags —
        a resumed early-stopped run must see ``converged=True`` and stay
        stopped. A no-op unless the durable checkpoint is exactly at
        ``(phase, it)`` (otherwise resume re-runs the tail
        deterministically and recomputes the same flags).
        """
        meta = self._read_meta()
        if meta is None or meta["phase"] != phase or meta["it"] != int(it):
            return
        meta["info"] = _info_to_dict(info)
        tmp = os.path.join(self.directory, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.directory, "meta.json"))

    def _block_files(self, phase: str) -> List[Tuple[int, str]]:
        """Sorted ``(start_iter, filename)`` of this phase's block files."""
        bdir = os.path.join(self.directory, "blocks")
        out = []
        for n in os.listdir(bdir):
            if n.startswith(f"{phase}_") and n.endswith(".npz"):
                out.append((int(n[len(phase) + 1 : -4]), n))
        return sorted(out)

    def _compact(self, phase: str) -> None:
        """Merge all but the last ``keep_last_n`` block files into one.

        Crash-safe ordering: the consolidated file atomically REPLACES the
        oldest merged file (same name, now covering the whole merged
        iteration range via its stored ``end``), then the remaining merged
        files are unlinked. A crash in between leaves files whose range
        the consolidated one covers; ``saved_blocks`` skips those.
        """
        files = self._block_files(phase)
        if len(files) <= self.keep_last_n:
            return
        merge = files[: len(files) - self.keep_last_n + 1]
        if len(merge) < 2:
            return
        bdir = os.path.join(self.directory, "blocks")
        thetas, logps, end = [], [], merge[0][0]
        for start, name in merge:
            if start < end and thetas:
                continue  # leftover of a crashed compaction, already covered
            with np.load(os.path.join(bdir, name)) as z:
                thetas.append(z["theta"])
                logps.append(z["logp"])
                end = int(z["end"]) if "end" in z else start + z["theta"].shape[0]
        tmp = os.path.join(bdir, ".compact.tmp.npz")
        np.savez(
            tmp,
            theta=np.concatenate(thetas, axis=0),
            logp=np.concatenate(logps, axis=0),
            end=np.asarray(end),
        )
        os.replace(tmp, os.path.join(bdir, merge[0][1]))
        for _, name in merge[1:]:
            os.remove(os.path.join(bdir, name))

    # -- read path -------------------------------------------------------

    def _read_meta(self) -> Optional[dict]:
        path = os.path.join(self.directory, "meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest(self) -> Optional[dict]:
        """Metadata of the latest durable checkpoint, or None.

        Returns ``None`` (with a warning) when the stored run fingerprint
        differs from this checkpointer's — resuming a checkpoint written
        under different run arguments would silently replay the old run.
        """
        meta = self._read_meta()
        if (
            meta is not None
            and self.fingerprint is not None
            and meta.get("fingerprint") is not None
            and meta["fingerprint"] != self.fingerprint
        ):
            import warnings

            warnings.warn(
                "checkpoint in "
                f"{self.directory} was written with different run "
                "arguments (stored fingerprint "
                f"{meta['fingerprint']!r} != {self.fingerprint!r}); "
                "ignoring it and starting over",
                stacklevel=3,
            )
            return None
        return meta

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
        with start iteration < ``upto_it`` (the checkpointed position).

        Skips any file whose start a previously read (consolidated) file
        already covers — the leftover state of a crash mid-compaction.
        """
        bdir = os.path.join(self.directory, "blocks")
        thetas, logps = [], []
        covered_end = -1
        for start, n in self._block_files(phase):
            if start >= upto_it or start < covered_end:
                continue
            with np.load(os.path.join(bdir, n)) as z:
                theta, logp = z["theta"], z["logp"]
                end = int(z["end"]) if "end" in z else start + 1
                if end > upto_it:
                    # a consolidated file can span past the resume point
                    # (compaction on the resumed run merges freely); take
                    # only the rows for iterations < upto_it. Rows map
                    # linearly onto [start, end) (uniform thinning).
                    k = theta.shape[0] * (upto_it - start) // (end - start)
                    theta, logp = theta[:k], logp[:k]
                thetas.append(theta)
                logps.append(logp)
                covered_end = end
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
