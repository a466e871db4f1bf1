"""Oracle tests for the tight-parity statistics (tools/parity_tight.py).

The tight protocol backs the round-4 funnel parity certification
(ratio 1.008 +/- 0.002, docs/parity_tight_r4.json), so its estimators
get the same NumPy-oracle treatment as the shipped summary statistics:
synthetic AR(1) chains with KNOWN lag-k autocorrelation phi^k and known
stationary ESS fraction (1-phi)/(1+phi), a constant-chain live-mask
case (the SV stuck-from-birth cohort), and the native CHAINSTAT
stderr-line parser.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tools"))
import parity_tight  # noqa: E402


def _ar1_chains(C, N, phi, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty((C, N))
    scale = np.sqrt(1.0 - phi * phi)
    x[:, 0] = rng.standard_normal(C)
    for t in range(1, N):
        x[:, t] = phi * x[:, t - 1] + scale * rng.standard_normal(C)
    return x[:, :, None]  # (C, N, 1)


def test_chain_stats_recovers_ar1_autocorrelation():
    phi = 0.6
    C, N = 512, 4096
    rho, live, x = parity_tight._chain_stats(_ar1_chains(C, N, phi))
    assert live.all() and rho.shape == (C, parity_tight.LAGS)
    rb = rho.mean(axis=0)
    ks = np.arange(1, parity_tight.LAGS + 1)
    # per-chain rho_k is biased ~ -(1+2*sum rho)/N (standard ACF bias);
    # at N=4096 that is ~1e-3 — test to 3x that
    np.testing.assert_allclose(rb, phi**ks, atol=3.5e-3)


def test_ess_frac_matches_ar1_closed_form():
    phi = 0.4
    C, N = 512, 4096
    rho, _, x = parity_tight._chain_stats(_ar1_chains(C, N, phi, seed=1))
    s = parity_tight._summ(rho, x, sg_per_chain_draw=2.0)
    # fixed window K=24 at phi=0.4: sum phi^k is within 4e-10 of the
    # full tail, so the window ESS fraction ~= (1-phi)/(1+phi)
    expect = (1.0 - phi) / (1.0 + phi)
    assert abs(s["ess_frac"] - expect) < 6 * s["ess_frac_se"] + 3e-3
    assert s["ess_per_grad_tight"] == pytest.approx(s["ess_frac"] / 2.0)
    assert s["ess_per_grad_tight_se"] == pytest.approx(s["ess_frac_se"] / 2.0)
    # the delta-method SE must reflect the cross-chain spread: an
    # independent-chains AR(1) batch has ess_frac SE ~ O(1/sqrt(C*N))
    assert 0 < s["ess_frac_se"] < 0.01
    # marginal oracle: stationary N(0, 1)
    assert abs(s["dim0_mean"]) < 6 * s["dim0_mean_se"]
    assert s["dim0_var"] == pytest.approx(1.0, abs=0.02)


def test_live_mask_excludes_constant_chains():
    draws = _ar1_chains(64, 256, 0.5, seed=2)
    draws[10:20] = 3.14  # stuck-from-birth: zero variance
    rho, live, x = parity_tight._chain_stats(draws)
    assert live.sum() == 54 and not live[10:20].any()
    assert rho.shape[0] == 54 and x.shape[0] == 54
    assert np.isfinite(rho).all()


def test_native_chainstat_parser(tmp_path):
    p = tmp_path / "stats.chainstats"
    p.write_text(
        "chain 0: something else\n"
        "CHAINSTAT 0 step 0.106 min_micro 1 samp_grads 5123 moves 180\n"
        "CHAINSTAT 1 step 4.6e-10 min_micro 34 samp_grads 51200 moves 0\n"
        "CHAINSTAT 2 step 0.09 min_micro 2 samp_grads 6001 moves 150\n"
    )
    sg = parity_tight._native_chainstat_grads(str(p))
    np.testing.assert_array_equal(sg, [5123, 51200, 6001])


def test_ratio_error_propagation():
    sides = {
        "native": {"ess_per_grad_tight": 2.0, "ess_per_grad_tight_se": 0.02},
        "tpu": {"ess_per_grad_tight": 2.2, "ess_per_grad_tight_se": 0.044},
    }
    r, se = parity_tight._ratio(sides, "tpu")
    assert r == pytest.approx(1.1)
    assert se == pytest.approx(1.1 * np.hypot(0.01, 0.02))
