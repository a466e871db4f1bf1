"""Checkpoint/resume tests: a resumed run must reproduce the exact draws
an uninterrupted run produces (the state includes the PRNG keys), and
checkpointing must not perturb the run that writes it.

The reference has no mid-run checkpointing (it only warm-starts,
handlers.hpp:91-100); this subsystem is a TPU-native extension, so the
oracle is the framework's own uninterrupted run.
"""

import numpy as np
import pytest

import walnuts_tpu.api as api_mod
from walnuts_tpu import walnuts
from walnuts_tpu.models import std_normal

LOGP, DIM = std_normal(3)


def run(tmp=None, **kwargs):
    defaults = dict(
        num_params=DIM,
        num_chains=3,
        seed=77,
        min_warmup_iter=12,
        max_warmup_iter=12,
        min_sampling_iter=12,
        max_sampling_iter=12,
        block_size=4,
        save_warmup=True,
        save_inv_metric=True,
    )
    defaults.update(kwargs)
    if tmp is not None:
        defaults["checkpoint_dir"] = str(tmp)
    return walnuts(LOGP, **defaults)


class TestCheckpoint:
    def test_checkpointing_does_not_perturb_the_run(self, tmp_path):
        plain = run()
        ck = run(tmp_path / "ck")
        for a, b in zip(plain, ck):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(
                a.warmup.warmup_draws, b.warmup.warmup_draws
            )

    def test_completed_run_resumes_to_identical_output(self, tmp_path):
        first = run(tmp_path / "ck")
        # second call finds the completed checkpoint: warmup is skipped,
        # all sampling blocks come from the store
        second = run(tmp_path / "ck")
        for a, b in zip(first, second):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.warmup.stepsize == b.warmup.stepsize
            np.testing.assert_array_equal(
                a.warmup.inv_metric, b.warmup.inv_metric
            )

    @pytest.mark.parametrize("every", [1, 2])
    def test_crash_mid_sampling_resumes_bitwise(
        self, tmp_path, monkeypatch, every
    ):
        plain = run()

        real_run_sampling = api_mod.run_sampling
        calls = {"n": 0}

        def crashing_run_sampling(*args, **kwargs):
            calls["n"] += 1
            # let the run finish two blocks (8 of 12 iterations), then die
            cfg = args[3]
            short = cfg.__class__(
                **{**cfg.__dict__, "min_iter": 8, "max_iter": 8}
            )
            real_run_sampling(*(args[:3] + (short,)), **kwargs)
            raise RuntimeError("simulated preemption")

        monkeypatch.setattr(api_mod, "run_sampling", crashing_run_sampling)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            run(tmp_path / "ck", checkpoint_every=every)
        monkeypatch.setattr(api_mod, "run_sampling", real_run_sampling)

        resumed = run(tmp_path / "ck", checkpoint_every=every)
        assert calls["n"] == 1
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(
                a.warmup.warmup_draws, b.warmup.warmup_draws
            )

    def test_crash_mid_warmup_resumes_bitwise(self, tmp_path, monkeypatch):
        plain = run()

        real_run_warmup = api_mod.run_warmup

        def crashing_run_warmup(logp_grad, state, warmup_cfg, *args, **kwargs):
            short = warmup_cfg.__class__(
                **{**warmup_cfg.__dict__, "min_iter": 8, "max_iter": 8}
            )
            real_run_warmup(logp_grad, state, short, *args, **kwargs)
            raise RuntimeError("simulated preemption")

        monkeypatch.setattr(api_mod, "run_warmup", crashing_run_warmup)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            run(tmp_path / "ck")
        monkeypatch.setattr(api_mod, "run_warmup", real_run_warmup)

        resumed = run(tmp_path / "ck")
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(
                a.warmup.warmup_draws, b.warmup.warmup_draws
            )

    def test_early_stopped_sampling_does_not_extend_on_rerun(self, tmp_path):
        """A run that early-stopped on R-hat at K < max_iter must return
        the SAME K draws when re-invoked with the same checkpoint_dir —
        not resume at K and keep sampling (the restored converged flag)."""
        kwargs = dict(
            min_sampling_iter=4, max_sampling_iter=12, rhat_converge_tol=1e6
        )
        first = run(tmp_path / "ck", **kwargs)
        assert np.asarray(first[0]).shape[0] == 4  # early-stopped
        second = run(tmp_path / "ck", **kwargs)
        for a, b in zip(first, second):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_crash_after_converged_warmup_does_not_keep_adapting(
        self, tmp_path, monkeypatch
    ):
        """A crash between the final converged warmup checkpoint and the
        sampling phase-transition save must resume with warmup already
        converged (frozen params unchanged), not adapt further."""
        kwargs = dict(
            min_warmup_iter=4, max_warmup_iter=12,
            mass_converge_tol=1e6, step_size_converge_tol=1e6,
        )
        plain = run(**kwargs)
        assert plain[0].warmup.warmup_draws.shape[0] == 4  # converged early

        real_run_warmup = api_mod.run_warmup

        def crashing_run_warmup(*args, **kw):
            real_run_warmup(*args, **kw)
            raise RuntimeError("simulated preemption")

        monkeypatch.setattr(api_mod, "run_warmup", crashing_run_warmup)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            run(tmp_path / "ck", **kwargs)
        monkeypatch.setattr(api_mod, "run_warmup", real_run_warmup)

        resumed = run(tmp_path / "ck", **kwargs)
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.warmup.stepsize == b.warmup.stepsize

    def test_changed_seed_refuses_resume(self, tmp_path):
        """resume=True with changed run arguments must NOT replay the old
        checkpoint (the meta fingerprint mismatch starts the run over)."""
        run(tmp_path / "ck", seed=77)
        with pytest.warns(UserWarning, match="different run arguments"):
            fresh = run(tmp_path / "ck", seed=78)
        oracle = run(seed=78)
        for a, b in zip(oracle, fresh):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("crash_mid_compaction", [False, True])
    def test_keep_last_n_compaction(
        self, tmp_path, monkeypatch, crash_mid_compaction
    ):
        """keep_last_n bounds the block-file count without dropping draws;
        a crash that leaves both the consolidated file and a not-yet-
        deleted merged file still resumes to the exact draws."""
        import os

        plain = run()
        ckdir = tmp_path / "ck"
        if crash_mid_compaction:
            from walnuts_tpu.parallel import checkpoint as ck_mod

            real_remove = os.remove
            state = {"crashed": False}

            def failing_remove(path):
                # die before deleting the first merged leftover, once
                if "blocks" in str(path) and not state["crashed"]:
                    state["crashed"] = True
                    raise RuntimeError("simulated crash mid-compaction")
                real_remove(path)

            monkeypatch.setattr(ck_mod.os, "remove", failing_remove)
            with pytest.raises(RuntimeError, match="mid-compaction"):
                run(ckdir, checkpoint_keep_last_n=1)
            monkeypatch.setattr(ck_mod.os, "remove", real_remove)
            # the leftover merged file overlaps the consolidated one
            resumed = run(ckdir, checkpoint_keep_last_n=1)
        else:
            run(ckdir, checkpoint_keep_last_n=2)
            blocks = os.listdir(ckdir / "blocks")
            for phase in ("warmup", "sampling"):
                n = sum(1 for b in blocks if b.startswith(phase))
                assert n <= 2, f"{phase}: {n} block files survived compaction"
            resumed = run(ckdir, checkpoint_keep_last_n=2)
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(
                a.warmup.warmup_draws, b.warmup.warmup_draws
            )

    def test_batched_scheduler_crash_resumes_bitwise(
        self, tmp_path, monkeypatch
    ):
        """The batched-native scheduler composes with checkpointing: its
        carried SampleState is block-boundary interchangeable with the
        classic path's, so a crashed batched run resumes to the exact
        draws of an uninterrupted one."""
        kwargs = dict(batched=True, batched_groups=1, runahead=4,
                      tier2_every=3)
        plain = run(**kwargs)

        real_run_sampling = api_mod.run_sampling

        def crashing_run_sampling(*args, **kw):
            cfg = args[3]
            short = cfg.__class__(
                **{**cfg.__dict__, "min_iter": 8, "max_iter": 8}
            )
            real_run_sampling(*(args[:3] + (short,)), **kw)
            raise RuntimeError("simulated preemption")

        monkeypatch.setattr(api_mod, "run_sampling", crashing_run_sampling)
        with pytest.raises(RuntimeError, match="simulated preemption"):
            run(tmp_path / "ck", **kwargs)
        monkeypatch.setattr(api_mod, "run_sampling", real_run_sampling)

        resumed = run(tmp_path / "ck", **kwargs)
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_false_starts_over(self, tmp_path):
        first = run(tmp_path / "ck")
        fresh = run(tmp_path / "ck", resume=False, seed=78)
        # different seed: must NOT replay the stored run
        assert not np.array_equal(np.asarray(first[0]), np.asarray(fresh[0]))

    def test_checkpoint_incompatible_with_chain_groups(self, tmp_path):
        with pytest.raises(ValueError):
            run(tmp_path / "ck", num_chains=4, chain_groups=2)

    def test_mesh_run_checkpoints_and_resumes(self, tmp_path, monkeypatch):
        """Sharded state round-trips through orbax: a mesh run with
        checkpointing matches a plain mesh run, and a crashed mesh run
        resumes bitwise."""
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]), ("chains",))
        plain = run(num_chains=8, mesh=mesh)
        ck = run(tmp_path / "ck", num_chains=8, mesh=mesh)
        for a, b in zip(plain, ck):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        real_run_sampling = api_mod.run_sampling

        def crashing_run_sampling(*args, **kwargs):
            cfg = args[3]
            short = cfg.__class__(
                **{**cfg.__dict__, "min_iter": 8, "max_iter": 8}
            )
            real_run_sampling(*(args[:3] + (short,)), **kwargs)
            raise RuntimeError("simulated preemption")

        monkeypatch.setattr(api_mod, "run_sampling", crashing_run_sampling)
        with pytest.raises(RuntimeError):
            run(tmp_path / "ck2", num_chains=8, mesh=mesh)
        monkeypatch.setattr(api_mod, "run_sampling", real_run_sampling)
        resumed = run(tmp_path / "ck2", num_chains=8, mesh=mesh)
        for a, b in zip(plain, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
