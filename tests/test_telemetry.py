"""Per-chain failure telemetry (``RunInfo`` counters).

The JAX-native analog of the reference's ``on_logp_exception``
notification (concepts.hpp:193-200, util.hpp:336-346): pathologies are
counted in the carried transition state and surfaced per chain via
``RunInfo`` instead of a host callback.
"""

import jax.numpy as jnp
import numpy as np

from walnuts_tpu.api import walnuts


def _run(logp, dim, **kw):
    kw.setdefault("num_chains", 2)
    kw.setdefault("seed", 1234)
    kw.setdefault("min_warmup_iter", 20)
    kw.setdefault("max_warmup_iter", 20)
    kw.setdefault("min_sampling_iter", 20)
    kw.setdefault("max_sampling_iter", 20)
    return walnuts(logp, num_params=dim, return_info=True, **kw)


class TestFailureCounters:
    def test_nan_model_counts_nonfinite_and_completes(self):
        """A model with a NaN region must complete with finite draws AND
        report non-finite evaluations per chain (the NoExceptLogpGrad trap
        firing, util.hpp:336-346)."""

        def bad_logp(theta):
            lp = -0.5 * jnp.sum(theta * theta)
            return jnp.where(theta[0] > 0.5, jnp.nan, lp)

        outs, info = _run(bad_logp, 3)
        draws = np.stack([np.asarray(c) for c in outs])
        assert np.isfinite(draws).all()
        assert info.n_nonfinite.shape == (2,)
        assert int(info.n_nonfinite.sum()) > 0

    def test_clean_model_counts_stay_zero(self):
        def logp(theta):
            return -0.5 * jnp.sum(theta * theta)

        _, info = _run(logp, 3)
        assert int(info.n_nonfinite.sum()) == 0
        # a well-conditioned normal never exhausts the halving budget
        assert int(info.n_halve_fail.sum()) == 0

    def test_halving_exhaustion_counted(self):
        """An impossible Hamiltonian tolerance burns every halving on every
        macro step (leaf failure at walnuts.hpp:322-343)."""

        def logp(theta):
            return -0.5 * jnp.sum(theta * theta)

        _, info = _run(
            logp, 3,
            max_hamiltonian_error=1e-12,
            max_step_halvings=2,
        )
        assert int(info.n_halve_fail.sum()) > 0

    def test_depth_exhaustion_counted(self):
        """A tolerance so loose the orbit never fails, with a 1-doubling
        budget, exhausts max_depth whenever no U-turn occurs
        (depth = max_depth + 1, walnuts.hpp:536)."""

        def logp(theta):
            return -0.5 * jnp.sum(theta * theta)

        _, info = _run(
            logp, 3,
            max_hamiltonian_error=1e6,
            max_trajectory_doublings=1,
        )
        assert int(info.n_depth_exhausted.sum()) > 0
