"""Model zoo of differentiable target log densities.

The reference treats models as opaque ``logp_grad`` callbacks (C++ lambdas
in ``examples/examples.cpp:13-49`` or BridgeStan shared objects loaded via
``load_stan.hpp``). Here each target is a plain JAX function
``theta -> scalar logp``; gradients come from autodiff and XLA fuses the
model into the leapfrog integrator. Targets are chosen to cover the
reference's examples and the benchmark configs in ``BASELINE.json``:

  - standard normal                     (examples/examples.cpp:13-17)
  - ill-conditioned normal, sigma_d = d (examples/examples.cpp:20-31)
  - condition-number Gaussian (kappa)   (BASELINE.json configs[1])
  - AR(1) / RW1 correlated normal       (examples/examples.cpp:34-49)
  - Neal's funnel                       (BASELINE.json configs[1])
  - eight schools (non-centered)        (BASELINE.json configs[2])
  - logistic regression, German-credit  (BASELINE.json configs[2])
    shaped synthetic data
  - stochastic volatility               (BASELINE.json configs[4])

Each constructor returns ``(logp_fn, dim)`` so callers can size buffers.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Target = Tuple[Callable[[Array], Array], int]


def std_normal(dim: int) -> Target:
    """Isotropic standard normal in ``dim`` dimensions."""

    def logp(theta: Array) -> Array:
        return -0.5 * jnp.sum(jnp.square(theta))

    return logp, dim


def ill_conditioned_normal(dim: int) -> Target:
    """Independent normal with linearly growing scales sigma_d = d.

    The reference example's stress target for mass-matrix adaptation
    (examples/examples.cpp:20-31).
    """
    sigma = np.arange(1, dim + 1, dtype=np.float64)
    inv_var = jnp.asarray(1.0 / sigma**2)

    def logp(theta: Array) -> Array:
        return -0.5 * jnp.sum(inv_var.astype(theta.dtype) * jnp.square(theta))

    return logp, dim


def condition_gaussian(dim: int, kappa: float = 1e4) -> Target:
    """Diagonal Gaussian with geometrically spaced variances, cond = kappa."""
    log_var = np.linspace(0.0, math.log(kappa), dim)
    inv_var = jnp.asarray(np.exp(-log_var))

    def logp(theta: Array) -> Array:
        return -0.5 * jnp.sum(inv_var.astype(theta.dtype) * jnp.square(theta))

    return logp, dim


def ar1_normal(dim: int, rho: float = 0.99) -> Target:
    """AR(1)-correlated Gaussian (examples/examples.cpp:34-49).

    Log density of a stationary AR(1) process with coefficient ``rho``:
    the first coordinate is standard normal and each subsequent increment
    ``theta[d] - rho * theta[d-1]`` is normal with variance ``1 - rho^2``.
    """
    inv_var = 1.0 / (1.0 - rho**2)

    def logp(theta: Array) -> Array:
        innov = theta[1:] - rho * theta[:-1]
        return -0.5 * (jnp.square(theta[0]) + inv_var * jnp.sum(jnp.square(innov)))

    return logp, dim


def funnel(dim: int = 10, scale: float = 3.0) -> Target:
    """Neal's funnel: v ~ N(0, scale^2), x_i | v ~ N(0, exp(v)).

    ``theta[0]`` is the log-scale ``v`` and ``theta[1:]`` the latent ``x``.
    The within-orbit step-size adaptation stress target (BASELINE.json
    configs[1]).
    """

    def logp(theta: Array) -> Array:
        v = theta[0]
        x = theta[1:]
        d = x.shape[0]
        lp_v = -0.5 * jnp.square(v) / (scale**2)
        lp_x = -0.5 * jnp.sum(jnp.square(x)) * jnp.exp(-v) - 0.5 * d * v
        return lp_v + lp_x

    return logp, dim


_EIGHT_SCHOOLS_Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
_EIGHT_SCHOOLS_SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools() -> Target:
    """Non-centered eight-schools hierarchical model (Rubin 1981 data).

    Parameters: ``theta = [mu, log_tau, z_1..z_8]`` (dim 10). The school
    effects are ``mu + tau * z`` with ``tau = exp(log_tau)``; the Jacobian
    of the log transform is included.
    """
    y = jnp.asarray(_EIGHT_SCHOOLS_Y)
    sigma = jnp.asarray(_EIGHT_SCHOOLS_SIGMA)

    def logp(theta: Array) -> Array:
        mu, log_tau = theta[0], theta[1]
        z = theta[2:]
        tau = jnp.exp(log_tau)
        effects = mu + tau * z
        lp_lik = -0.5 * jnp.sum(jnp.square((y.astype(theta.dtype) - effects)
                                           / sigma.astype(theta.dtype)))
        lp_z = -0.5 * jnp.sum(jnp.square(z))
        lp_mu = -0.5 * jnp.square(mu) / 25.0
        lp_tau = -0.5 * jnp.square(log_tau) / 4.0 + log_tau  # half-normal-ish + Jacobian
        return lp_lik + lp_z + lp_mu + lp_tau

    return logp, 10


def logistic_regression_data(
    num_data: int = 1000, dim: int = 25, seed: int = 20260816
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic logistic-regression dataset.

    Returns ``(design, y_sign)`` with an intercept column, standardized
    covariates, and labels in {-1, +1}. Shared with the native baseline
    benchmark (csrc/run_baseline.py) so both samplers target the same
    posterior.
    """
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((num_data, dim - 1))
    x = (x - x.mean(axis=0)) / x.std(axis=0)
    design = np.concatenate([np.ones((num_data, 1)), x], axis=1)
    beta_true = rng.standard_normal(dim) * 0.5
    logits = design @ beta_true
    labels = (rng.random(num_data) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float64)
    return design, 2.0 * labels - 1.0


def logistic_regression(
    num_data: int = 1000,
    dim: int = 25,
    seed: int = 20260816,
) -> Target:
    """Bayesian logistic regression on fixed synthetic data.

    Shaped like the German-credit benchmark (1000 observations, 25
    covariates including intercept; BASELINE.json configs[2]). The public
    dataset is not bundled, so a deterministic synthetic design matrix with
    standardized covariates stands in; the posterior geometry (log-concave,
    mild correlation) matches the benchmark's role. Standard normal prior
    on the coefficients. The gradient is one matvec each way, which XLA
    maps onto the MXU when chains are batched.
    """
    design, y_sign_np = logistic_regression_data(num_data, dim, seed)
    design_j = jnp.asarray(design)
    # y in {-1, +1} lets logp be a single log_sigmoid over y * logits.
    y_sign = jnp.asarray(y_sign_np)

    def logp(theta: Array) -> Array:
        # HIGHEST matmul precision: the TPU MXU's default bf16 passes put
        # O(0.1-1) noise on a 1000-term log likelihood, which breaks the
        # sampler's |dH| <= max_error test; full f32 passes restore it.
        logits = jnp.dot(
            design_j.astype(theta.dtype), theta,
            precision=jax.lax.Precision.HIGHEST,
        )
        lp_lik = jnp.sum(jax.nn.log_sigmoid(y_sign.astype(theta.dtype) * logits))
        lp_prior = -0.5 * jnp.sum(jnp.square(theta))
        return lp_lik + lp_prior

    return logp, dim


def stochastic_volatility_data(
    num_times: int = 1000, seed: int = 20260816
) -> np.ndarray:
    """Synthetic returns series for the stochastic-volatility posterior.

    Exposed separately so the native baseline (csrc/baseline_bench.cpp)
    can sample the exact same posterior (csrc/run_baseline.py exports this
    series for it, like the logistic-regression dataset)."""
    rng = np.random.default_rng(seed)
    phi_true, sigma_true, mu_true = 0.97, 0.25, -1.0
    h = np.empty(num_times)
    h[0] = mu_true + sigma_true / math.sqrt(1 - phi_true**2) * rng.standard_normal()
    for t in range(1, num_times):
        h[t] = mu_true + phi_true * (h[t - 1] - mu_true) + sigma_true * rng.standard_normal()
    return np.exp(h / 2) * rng.standard_normal(num_times)


@jax.custom_vjp
def _ar1_filter(z: Array, phi: Array) -> Array:
    """Causal AR(1) filter ``u_t = phi * u_{t-1} + z_t`` (u_{-1} = 0).

    Computed as ceil(log2(T)) Hillis-Steele FMA passes over a SINGLE
    array with per-level SCALAR coefficients phi^(2^l) — the coefficient
    sequence of the recurrence is analytic, so the generic
    ``lax.associative_scan`` over (coeff, value) TUPLES (which reads and
    writes twice the rows and whose autodiff doubles everything again)
    is wasted traffic. The backward pass is the analytic adjoint: the
    REVERSE filter of the cotangent (same passes, mirrored shift), plus
    ``dphi = sum_t a_t u_{t-1}``. On the 1003-dim SV flagship this
    halves the dominant per-gradient HBM traffic (measured — see
    docs/BENCHMARKS.md round 4 "SV filter rewrite").

    Zero-padding via ``jnp.pad`` keeps shapes static; the passes unroll
    at trace time (T is static).
    """
    u = z
    c = phi
    k = 1
    while k < z.shape[-1]:
        u = u + c * jnp.pad(u[..., :-k], [(0, 0)] * (u.ndim - 1) + [(k, 0)])
        c = c * c
        k *= 2
    return u


def _ar1_filter_fwd(z, phi):
    u = _ar1_filter(z, phi)
    return u, (u, phi)


def _ar1_filter_bwd(res, du):
    u, phi = res
    # adjoint recursion a_t = du_t + phi * a_{t+1}: the time-reversed filter
    a = du
    c = phi
    k = 1
    while k < du.shape[-1]:
        a = a + c * jnp.pad(a[..., k:], [(0, 0)] * (a.ndim - 1) + [(0, k)])
        c = c * c
        k *= 2
    dphi = jnp.sum(a[..., 1:] * u[..., :-1], axis=-1)
    return a, dphi


_ar1_filter.defvjp(_ar1_filter_fwd, _ar1_filter_bwd)


def stochastic_volatility(
    num_times: int = 1000,
    seed: int = 20260816,
    scan_impl: str | None = None,
) -> Target:
    """Stochastic volatility model with a non-centered latent AR(1).

    Parameters: ``theta = [mu, logit_phi_raw, log_sigma, z_1..z_T]``
    (dim ``T + 3``). Latent log volatility follows
    ``h_1 = mu + sigma/sqrt(1-phi^2) * z_1``,
    ``h_t = mu + phi*(h_{t-1} - mu) + sigma * z_t``,
    with returns ``r_t ~ N(0, exp(h_t))``. Synthetic returns are generated
    deterministically. This is the 1k+ dim benchmark posterior
    (BASELINE.json configs[4]); the latent scan is expressed with
    ``jnp.cumsum``-free ``lax.scan``-compatible arithmetic via an
    associative scan so the gradient stays fused.
    """
    # scan_impl: "fma" (default) = the scalar-coefficient log-pass filter
    # (_ar1_filter, custom-adjoint); "assoc" = the round-3 tuple
    # associative scan, kept for A/B harnesses (SV_SCAN_IMPL env
    # overrides when the arg is None).
    if scan_impl is None:
        import os

        scan_impl = os.environ.get("SV_SCAN_IMPL", "fma")
    returns = stochastic_volatility_data(num_times, seed)
    # log r_t^2 precomputed in f64: the likelihood term r^2 exp(-h) is
    # evaluated as exp(log r^2 - h) so the INTERMEDIATE never overflows
    # f32 while the term value is representable. With the naive form a
    # warmup chain at h ~ -90 sees exp(-h) = inf even when r^2 exp(-h)
    # ~ 1e36 is a perfectly finite f32 — the resulting -inf logp / NaN
    # gradient permanently sticks the lane (measured: 197/1024 stuck
    # lanes at the flagship radius-2 init vs 37 truly lost in f64).
    # The native f64 baseline (csrc/baseline_bench.cpp) never hit this,
    # so the stable form is also what makes the f32-vs-f64 ESS
    # comparison apples-to-apples.
    log_r2 = np.log(np.square(returns))

    def logp(theta: Array) -> Array:
        mu, phi_raw, log_sigma = theta[0], theta[1], theta[2]
        z = theta[3:]
        phi = jnp.tanh(phi_raw)
        sigma = jnp.exp(log_sigma)
        # Non-centered latent path: h - mu = sigma * (filtered z), where the
        # filter is the linear recursion u_t = phi*u_{t-1} + z_t with
        # u_1 = z_1 / sqrt(1-phi^2). Computed with the scalar-coefficient
        # log-pass filter (``_ar1_filter``) so it parallelizes on the VPU
        # without the tuple-scan traffic of a generic associative scan.
        scale0 = 1.0 / jnp.sqrt(1.0 - jnp.square(phi) + 1e-12)
        z0 = z.at[0].multiply(scale0)
        if scan_impl == "fma":
            u = _ar1_filter(z0, phi)
        else:

            def combine(a, b):
                ca, va = a
                cb, vb = b
                return ca * cb, cb * va + vb

            coeffs = jnp.full(z.shape, phi).at[0].set(0.0)
            _, u = jax.lax.associative_scan(combine, (coeffs, z0))
        hpath = mu + sigma * u
        lp_lik = -0.5 * jnp.sum(
            jnp.exp(jnp.asarray(log_r2, theta.dtype) - hpath) + hpath
        )
        lp_z = -0.5 * jnp.sum(jnp.square(z))
        lp_mu = -0.5 * jnp.square(mu) / 100.0
        lp_phi = -0.5 * jnp.square(phi_raw) / 4.0
        lp_sigma = -0.5 * jnp.square(log_sigma) / 4.0
        return lp_lik + lp_z + lp_mu + lp_phi + lp_sigma

    return logp, num_times + 3


__all__ = [
    "ar1_normal",
    "condition_gaussian",
    "eight_schools",
    "funnel",
    "ill_conditioned_normal",
    "logistic_regression",
    "std_normal",
    "stochastic_volatility",
    "stochastic_volatility_data",
]
