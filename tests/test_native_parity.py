"""Draw-level distributional parity against the NATIVE C++ sampler.

The moments-within-MCSE tests elsewhere could miss a biased
reversibility rule or a broken Barker-inside/Metropolis-outside
selection asymmetry that only shifts tail mass. Here the oracle is the
native C++ WALNUTS implementation itself (``csrc/baseline_bench.cpp``,
a fresh reimplementation of the reference algorithm): its draws for the
funnel and eight schools — 16 chains x 4000 draws, warmup 400,
max_step_halvings=8, seed 77 — are committed as fixtures
(``tests/data/native_*_draws.npz``, regenerate with
``BASELINE_MAX_HALVINGS=8 ./csrc/baseline_bench eight_schools 16 400
4000 77 out.bin`` etc.), and the JAX sampler's pooled marginals are
compared with two-sample Kolmogorov-Smirnov statistics using
autocorrelation-adjusted effective sample sizes, plus tail-quantile
checks calibrated against the native run's own half-vs-half noise.

Sensitivity (verified by planting bugs, round 3): replacing the
within-subtree Barker rule by Metropolis (``transition.py``:
``take_leaf`` denominator ``run_logw_new`` -> ``s.run_logw`` — the
walnuts.hpp:368-387 vs :547 asymmetry) fails FOUR of these tests
(funnel |x1| KS, funnel v tail quantiles, eight-schools log_tau KS,
eight-schools effect tails); disabling the reversibility check
(forcing ``r_within = False`` in the REV phase) fails the funnel |x1|
KS and the eight-schools log_tau KS. Both plants were reverted after
confirming the failures.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from walnuts_tpu import walnuts
from walnuts_tpu.models import eight_schools, funnel
from walnuts_tpu.summary import effective_sample_size

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

# KS threshold: D* = c(alpha) * sqrt(1/ne1 + 1/ne2) with alpha = 1e-3
_KS_C = float(np.sqrt(-np.log(0.0005) / 2.0))  # ~1.95


def _pooled_neff(draws_cnd: np.ndarray, dim: int) -> float:
    """Effective size of the pooled marginal of one dimension."""
    ess = effective_sample_size(
        [draws_cnd[c, :, dim:dim + 1] for c in range(draws_cnd.shape[0])]
    )
    return float(ess[0])


def _ks(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.sort(a), np.sort(b)
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / a.size
    cb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.max(np.abs(ca - cb)))


def _run_jax(model, dim, num_draws, seed, num_chains=16, num_warmup=400):
    logp, D = model
    outs = walnuts(
        logp, num_params=D, num_chains=num_chains, seed=seed,
        min_warmup_iter=num_warmup, max_warmup_iter=num_warmup,
        min_sampling_iter=num_draws, max_sampling_iter=num_draws,
        block_size=100, max_step_halvings=8, dtype=jnp.float64,
        keep_dims=tuple(range(dim)) if dim < D else None,
    )
    return np.stack([np.asarray(o) for o in outs])  # (C, n, dim)


@pytest.fixture(scope="module")
def funnel_pair():
    fix = np.load(os.path.join(DATA, "native_funnel_draws.npz"))
    native = fix["draws"].astype(np.float64)  # (16, 4000, 2): [v, x1]
    # EQUAL chain lengths: the funnel's deep-neck visits are rare events,
    # so tail coverage grows with chain length — a 2000-draw run against
    # a 4000-draw fixture reads as a 1.5-unit q01 shift that is pure
    # chain-length artifact (measured; both samplers under-cover the
    # exact N(0,9) v-marginal equally at matched lengths)
    ours = _run_jax(funnel(101), 2, 4000, seed=123)[:, :, :2]
    return native, ours


@pytest.fixture(scope="module")
def es_pair():
    fix = np.load(os.path.join(DATA, "native_eight_schools_draws.npz"))
    native = fix["draws"].astype(np.float64)  # (16, 4000, 10)
    ours = _run_jax(eight_schools(), 10, 2000, seed=321)
    return native, ours


def _ks_check(native, ours, dim, label):
    ne_n = _pooled_neff(native, dim)
    ne_o = _pooled_neff(ours, dim)
    d = _ks(native[:, :, dim].ravel(), ours[:, :, dim].ravel())
    thresh = _KS_C * np.sqrt(1.0 / ne_n + 1.0 / ne_o)
    assert d < thresh, (
        f"{label}: KS={d:.4f} >= {thresh:.4f} "
        f"(n_eff native={ne_n:.0f}, ours={ne_o:.0f})"
    )


class TestFunnelParity:
    def test_v_marginal_ks(self, funnel_pair):
        """The funnel's v-marginal is exactly N(0, 3^2); a selection or
        reversibility bias shows up here first."""
        native, ours = funnel_pair
        _ks_check(native, ours, 0, "funnel v")

    def test_abs_theta_ks(self, funnel_pair):
        native, ours = funnel_pair
        na = np.abs(native[:, :, 1].ravel())
        ou = np.abs(ours[:, :, 1].ravel())
        ne_n = _pooled_neff(native, 1)
        ne_o = _pooled_neff(ours, 1)
        d = _ks(na, ou)
        thresh = _KS_C * np.sqrt(1.0 / ne_n + 1.0 / ne_o)
        assert d < thresh, f"funnel |x1|: KS={d:.4f} >= {thresh:.4f}"

    def test_v_tail_quantiles(self, funnel_pair):
        """Tail quantiles of v within a proper quantile MCSE: sd(q_p) ~
        sqrt(p(1-p)(1/ne1 + 1/ne2)) / f(q_p), with the density estimated
        by a finite difference of the combined sample's quantiles. The
        funnel v mixes slowly (pooled n_eff ~ 35 per side at this size),
        so the tolerance is honest rather than tight — the sharp tests
        are |x1| and the eight-schools marginals (n_eff in the
        thousands)."""
        native, ours = funnel_pair
        v_n = native[:, :, 0].ravel()
        v_o = ours[:, :, 0].ravel()
        ne_n = _pooled_neff(native, 0)
        ne_o = _pooled_neff(ours, 0)
        both = np.concatenate([v_n, v_o])
        for p in (0.05, 0.25, 0.75, 0.95):
            dq = np.quantile(both, min(p + 0.02, 0.999)) - np.quantile(
                both, max(p - 0.02, 0.001)
            )
            dens = 0.04 / max(dq, 1e-6)
            mcse = np.sqrt(p * (1 - p) * (1.0 / ne_n + 1.0 / ne_o)) / dens
            diff = abs(np.quantile(v_n, p) - np.quantile(v_o, p))
            assert diff < 4.0 * mcse + 0.05, (
                f"funnel v q{p}: |diff|={diff:.3f} vs 4*MCSE={4 * mcse:.3f}"
            )


@pytest.fixture(scope="module")
def logreg_pair():
    from walnuts_tpu.models import logistic_regression

    fix = np.load(os.path.join(DATA, "native_logreg_draws.npz"))
    native = fix["draws"].astype(np.float64)  # (16, 4000, 3)
    ours = _run_jax(logistic_regression(), 3, 4000, seed=456)
    return native, ours


@pytest.fixture(scope="module")
def sv_pair():
    from walnuts_tpu.models import stochastic_volatility

    fix = np.load(os.path.join(DATA, "native_sv_draws.npz"))
    native = fix["draws"].astype(np.float64)  # (64, 2000, 3)
    ours = _run_jax(stochastic_volatility(), 3, 2000, seed=654,
                    num_chains=32, num_warmup=200)
    # Radius-2 inits leave ~half the SV chains stuck from birth in BOTH
    # implementations (docs/BENCHMARKS.md "SV stuck-chain discovery") —
    # a stuck chain is a delta mass at its own random init, so pooled
    # marginals can never match across different init draws. Condition
    # both sides on the same observable criterion (the chain moved),
    # which selects the non-degenerate basin identically; the KS
    # thresholds below use the LIVE cohorts' effective sizes.
    def live(d):
        moved = np.any(np.diff(d[:, :, 0], axis=1) != 0.0, axis=1)
        return d[moved]

    return live(native), live(ours)


class TestLogRegParity:
    """Draw-level parity on the log-concave benchmark posterior — the
    model family (matmul likelihood) the funnel/eight-schools fixtures
    don't cover (VERDICT r4 item 8). Fixture:
    ``BASELINE_MAX_HALVINGS=8 BASELINE_KEEP_DIMS=3 ./csrc/baseline_bench
    logreg 16 400 4000 77 out.bin csrc/logreg_data.bin`` — the same
    deterministic dataset ``logistic_regression()`` builds."""

    @pytest.mark.parametrize("dim,label",
                             [(0, "intercept"), (1, "beta1"), (2, "beta2")])
    def test_coefficient_ks(self, logreg_pair, dim, label):
        native, ours = logreg_pair
        _ks_check(native, ours, dim, f"logreg {label}")

    def test_posterior_sd_ratio(self, logreg_pair):
        """Pooled posterior sds agree within the cross-side MCSE band
        (a biased step-size/mass adaptation would widen or narrow
        these; n_eff is in the thousands, so the band is tight)."""
        native, ours = logreg_pair
        for dim in range(3):
            ne = min(_pooled_neff(native, dim), _pooled_neff(ours, dim))
            sd_n = native[:, :, dim].std()
            sd_o = ours[:, :, dim].std()
            tol = 5.0 * sd_n * np.sqrt(0.5 / max(ne, 1.0)) * np.sqrt(2.0)
            assert abs(sd_n - sd_o) < tol, (
                f"logreg dim {dim}: sd {sd_n:.4f} vs {sd_o:.4f} "
                f"(tol {tol:.4f}, n_eff {ne:.0f})"
            )


class TestStochVolParity:
    """Draw-level parity on the SV hyperparameters (mu, phi_raw,
    log_sigma) over the live cohort — the contested-parity model
    (VERDICT r4 item 8). Fixture: ``BASELINE_MAX_HALVINGS=8
    BASELINE_KEEP_DIMS=3 ./csrc/baseline_bench sv 64 200 2000 5000
    out.bin csrc/sv_data.bin`` — the same deterministic returns
    ``stochastic_volatility()`` builds. (Seed 5000 family: the native
    Rng's seed-77 init stream is a weak-seeding outlier — 13/48 live
    vs the expected ~50%; measured round 5.)"""

    @pytest.mark.parametrize("dim,label",
                             [(0, "mu"), (1, "phi_raw"), (2, "log_sigma")])
    def test_hyperparameter_ks(self, sv_pair, dim, label):
        native, ours = sv_pair
        assert native.shape[0] >= 4 and ours.shape[0] >= 4, (
            "too few live chains to compare"
        )
        _ks_check(native, ours, dim, f"sv {label}")


class TestEightSchoolsParity:
    @pytest.mark.parametrize("dim,label", [(0, "mu"), (1, "log_tau")])
    def test_hyperparameter_ks(self, es_pair, dim, label):
        native, ours = es_pair
        _ks_check(native, ours, dim, f"eight_schools {label}")

    def test_effect_tails(self, es_pair):
        """School-1 effect mu + tau*z1 (the largest observed effect):
        upper-tail quantiles within calibrated noise."""
        native, ours = es_pair

        def effect(d):
            return d[:, :, 0] + np.exp(d[:, :, 1]) * d[:, :, 2]

        e_n, e_o = effect(native), effect(ours)
        h1, h2 = e_n[:8].ravel(), e_n[8:].ravel()
        for p in (0.05, 0.5, 0.95):
            noise = max(abs(np.quantile(h1, p) - np.quantile(h2, p)), 0.05)
            diff = abs(np.quantile(e_n.ravel(), p) - np.quantile(e_o.ravel(), p))
            assert diff < 3.0 * noise + 0.15, (
                f"effect q{p}: |diff|={diff:.3f} vs noise {noise:.3f}"
            )
