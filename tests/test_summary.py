"""Summary-statistics tests with the reference's oracle strategy
(summary_test.cpp): hand calculations, NumPy cross-checks, and the
hard-coded deterministic ESS anchor."""

import numpy as np
import pytest

from walnuts_tpu.summary import (
    Summarizer,
    autocovariance,
    effective_sample_size,
    fft_next_good_size,
    mcse,
    mean,
    monte_carlo_standard_error,
    quantiles,
    r_hat,
    standard_deviation,
    variance,
)


def make_ar1_chain(n, phi, seed):
    """The deterministic AR(1) fixture from summary_test.cpp:969-980."""
    rng = np.random.default_rng(seed)
    iid = rng.standard_normal((n, 1))
    ar1 = np.zeros((n, 1))
    ar1[0] = rng.standard_normal()
    for t in range(1, n):
        ar1[t] = phi * ar1[t - 1] + np.sqrt(1 - phi**2) * rng.standard_normal()
    return np.hstack([iid, ar1])


class TestFftNextGoodSize:
    def test_values(self):
        assert fft_next_good_size(1) == 2
        assert fft_next_good_size(2) == 2
        assert fft_next_good_size(3) == 3
        assert fft_next_good_size(7) == 8
        assert fft_next_good_size(11) == 12
        assert fft_next_good_size(121) == 125


class TestAutocovariance:
    def test_matches_direct_quadratic(self):
        """FFT autocovariance equals the direct O(N^2) sum with biased 1/N
        normalization (summary_test.cpp:584-678)."""
        rng = np.random.default_rng(5)
        chain = rng.standard_normal((37, 3))
        got = autocovariance([chain])
        n = chain.shape[0]
        centered = chain - chain.mean(0)
        for lag in range(n):
            direct = (centered[: n - lag] * centered[lag:]).sum(0) / n
            np.testing.assert_allclose(got[lag], direct, atol=1e-10)

    def test_lag_zero_is_biased_variance(self):
        rng = np.random.default_rng(6)
        chain = rng.standard_normal((25, 2))
        got = autocovariance([chain])
        np.testing.assert_allclose(got[0], chain.var(0), atol=1e-12)

    def test_ragged_chains_stack(self):
        rng = np.random.default_rng(7)
        c1, c2 = rng.standard_normal((10, 2)), rng.standard_normal((15, 2))
        got = autocovariance([c1, c2])
        assert got.shape == (25, 2)
        np.testing.assert_allclose(got[:10], autocovariance([c1]))
        np.testing.assert_allclose(got[10:], autocovariance([c2]))


class TestBasicStats:
    def test_mean_variance_pooled(self):
        c1 = np.array([[1.0, 2.0], [3.0, 4.0]])
        c2 = np.array([[5.0, 6.0], [7.0, 8.0], [9.0, 10.0]])
        stacked = np.vstack([c1, c2])
        np.testing.assert_allclose(mean([c1, c2]), stacked.mean(0))
        np.testing.assert_allclose(variance([c1, c2]), stacked.var(0, ddof=1))
        np.testing.assert_allclose(
            standard_deviation([c1, c2]), stacked.std(0, ddof=1)
        )

    def test_quantile_doc_example(self):
        """The worked example from summary.hpp:454-467: p=0.6 of
        (9, 11, 5, 3) is 8.2."""
        col = np.array([[9.0], [11.0], [5.0], [3.0]])
        assert quantiles([col], [0.6])[0, 0] == pytest.approx(8.2)

    def test_quantiles_match_numpy_linear(self):
        rng = np.random.default_rng(8)
        chain = rng.standard_normal((101, 4))
        probs = [0.0, 0.05, 0.25, 0.5, 0.9, 1.0]
        np.testing.assert_allclose(
            quantiles([chain], probs),
            np.quantile(chain, probs, axis=0, method="linear"),
            atol=1e-12,
        )

    def test_quantiles_reject_bad_probs(self):
        chain = np.zeros((5, 1))
        with pytest.raises(ValueError):
            quantiles([chain], [1.5])
        with pytest.raises(ValueError):
            quantiles([chain], [-0.1])
        with pytest.raises(ValueError):
            quantiles([chain], [np.nan])


class TestRHat:
    def test_equal_within_chain_variance_gives_sqrt_ten(self):
        """If var(chain means) = 9 * mean(within-chain vars), R-hat is
        sqrt(1 + 9) = sqrt(10) (the hand-calculation strategy of
        summary_test.cpp:846)."""
        base = np.array([-1.0, 0.0, 1.0])  # within var (ddof=1) = 1
        means = np.array([0.0, 2.0, 4.0, 6.0])
        chains = [np.tile((base + m)[:, None], (1, 2)) for m in means]
        # var of means (ddof=1) over {0,2,4,6} = 20/3; within var = 1
        expected = np.sqrt(1.0 + 20.0 / 3.0)
        np.testing.assert_allclose(r_hat(chains), [expected, expected], rtol=1e-12)

    def test_identical_chains_give_one(self):
        rng = np.random.default_rng(9)
        c = rng.standard_normal((30, 2))
        np.testing.assert_allclose(r_hat([c, c.copy()]), [1.0, 1.0])

    def test_requires_two_chains(self):
        with pytest.raises(ValueError):
            r_hat([np.zeros((10, 1))])

    def test_requires_three_draws(self):
        with pytest.raises(ValueError):
            r_hat([np.zeros((2, 1)), np.zeros((10, 1))])


class TestEffectiveSampleSize:
    def test_reference_anchor(self):
        """The deterministic ESS anchor from summary_test.cpp:993-994:
        ESS([iid, AR1(0.9)]) = [96.2568, 7.3150] on 3 chains x 20 draws."""
        chains = [make_ar1_chain(20, 0.9, seed) for seed in [1, 2, 3]]
        got = effective_sample_size(chains)
        np.testing.assert_allclose(got, [96.2568, 7.3150], atol=5e-4)

    def test_iid_ess_near_total(self):
        rng = np.random.default_rng(10)
        chains = [rng.standard_normal((500, 1)) for _ in range(4)]
        ess_val = effective_sample_size(chains)[0]
        assert 1200 < ess_val  # iid: ESS close to (or above) N_total

    def test_high_autocorrelation_reduces_ess(self):
        chains = [make_ar1_chain(200, 0.95, s) for s in range(4)]
        got = effective_sample_size(chains)
        assert got[1] < got[0] / 4

    def test_requires_three_draws(self):
        with pytest.raises(ValueError):
            effective_sample_size([np.zeros((1, 1)), np.zeros((1, 1))])

    def test_ragged_chains(self):
        rng = np.random.default_rng(11)
        chains = [rng.standard_normal((n, 2)) for n in (50, 80, 65)]
        got = effective_sample_size(chains)
        assert got.shape == (2,)
        assert np.all(got > 0)


class TestMcse:
    def test_is_sd_over_sqrt_ess(self):
        chains = [make_ar1_chain(50, 0.8, s) for s in (1, 2)]
        expected = standard_deviation(chains) / np.sqrt(
            effective_sample_size(chains)
        )
        np.testing.assert_allclose(monte_carlo_standard_error(chains), expected)
        np.testing.assert_allclose(mcse(chains), expected)


class TestSummarizer:
    def test_matches_free_functions(self):
        chains = [make_ar1_chain(40, 0.7, s) for s in (3, 4, 5)]
        s = Summarizer(chains)
        np.testing.assert_allclose(s.mean(), mean(chains))
        np.testing.assert_allclose(s.variance(), variance(chains))
        np.testing.assert_allclose(s.standard_deviation(), standard_deviation(chains))
        np.testing.assert_allclose(s.ess(), effective_sample_size(chains))
        np.testing.assert_allclose(s.r_hat(), r_hat(chains))
        np.testing.assert_allclose(s.mcse(), mcse(chains))
        assert s.num_chains == 3
        assert s.num_draws == 120
        assert s.num_params == 2

    def test_accepts_stacked_array(self):
        rng = np.random.default_rng(12)
        arr = rng.standard_normal((3, 30, 2))
        s = Summarizer(arr)
        np.testing.assert_allclose(s.mean(), arr.reshape(-1, 2).mean(0))

    def test_rejects_empty(self):
        with pytest.raises(ValueError):
            Summarizer([])

    def test_rejects_mismatched_dims(self):
        with pytest.raises(ValueError):
            Summarizer([np.zeros((5, 2)), np.zeros((5, 3))])
