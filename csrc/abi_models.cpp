// BridgeStan-ABI model shared objects for the FFI parity sweep.
//
// The image has no Stan toolchain (stanc/Stan math are not installed), so
// the posteriordb-style sweep (BASELINE.json configs[3]) is run with
// native C++ densities compiled into BridgeStan-ABI shared objects: the
// same bs_* surface a real BridgeStan model exposes (declared in the
// reference's thirdparty/bridgestan/bridgestan.h and consumed by
// load_stan.hpp:101-228), hand-implemented for posteriors that exactly
// match the walnuts_tpu.models.targets densities. This exercises the
// whole walnuts_stan path — dlopen, batched logp/grad through the thread
// pool, error traps, constrain — on multi-model posteriors, and the
// ESS/grad parity table compares the FFI path against the JAX-autodiff
// path and the native single-core baseline on identical densities.
//
// Build (one .so per model):
//   g++ -O2 -std=c++17 -shared -fPIC -DABI_MODEL_<NAME> -o lib<name>.so abi_models.cpp
// where <NAME> in {ILL_GAUSS, EIGHT_SCHOOLS, FUNNEL}. The logistic
// regression rides through its data file: -DABI_MODEL_LOGREG, and the
// construct() data string carries the csrc/logreg_data.bin path.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FakeRng { unsigned int seed; };

char* dup_msg(const char* msg) {
  char* out = static_cast<char*>(std::malloc(std::strlen(msg) + 1));
  std::strcpy(out, msg);
  return out;
}

#if defined(ABI_MODEL_ILL_GAUSS)
// Ill-conditioned Gaussian, sigma_d = d (targets.ill_conditioned_normal).
constexpr int kDim = 24;
struct Model {
  std::string names;
  Model(const char*) {
    for (int i = 0; i < kDim; ++i)
      names += (i ? ",x" : "x") + std::to_string(i);
  }
  int dim() const { return kDim; }
  double logp_grad(const double* q, double* g) const {
    double lp = 0.0;
    for (int d = 0; d < kDim; ++d) {
      const double iv = 1.0 / double((d + 1) * (d + 1));
      g[d] = -iv * q[d];
      lp += 0.5 * g[d] * q[d];
    }
    return lp;
  }
  void constrain(const double* unc, double* con) const {
    std::memcpy(con, unc, sizeof(double) * kDim);
  }
};

#elif defined(ABI_MODEL_EIGHT_SCHOOLS)
// Non-centered eight schools (targets.eight_schools, Rubin 1981 data):
// theta = [mu, log_tau, z_1..z_8]; effects mu + tau*z reported constrained
// as (mu, tau, theta_1..theta_8).
constexpr int kDim = 10;
constexpr double kY[8] = {28, 8, -3, 7, -1, 1, 18, 12};
constexpr double kSigma[8] = {15, 10, 16, 11, 9, 11, 10, 18};
struct Model {
  std::string names = "mu,tau,theta1,theta2,theta3,theta4,theta5,theta6,theta7,theta8";
  Model(const char*) {}
  int dim() const { return kDim; }
  double logp_grad(const double* q, double* g) const {
    const double mu = q[0], log_tau = q[1];
    const double tau = std::exp(log_tau);
    double lp = -0.5 * mu * mu / 25.0 - 0.5 * log_tau * log_tau / 4.0 + log_tau;
    double gmu = -mu / 25.0;
    double gltau = -log_tau / 4.0 + 1.0;
    for (int j = 0; j < 8; ++j) {
      const double z = q[2 + j];
      const double eff = mu + tau * z;
      const double r = (kY[j] - eff) / (kSigma[j] * kSigma[j]);
      lp += -0.5 * (kY[j] - eff) * (kY[j] - eff) / (kSigma[j] * kSigma[j])
            - 0.5 * z * z;
      gmu += r;
      gltau += r * tau * z;  // d eff/d log_tau = tau*z
      g[2 + j] = r * tau - z;
    }
    g[0] = gmu;
    g[1] = gltau;
    return lp;
  }
  void constrain(const double* unc, double* con) const {
    const double tau = std::exp(unc[1]);
    con[0] = unc[0];
    con[1] = tau;
    for (int j = 0; j < 8; ++j) con[2 + j] = unc[0] + tau * unc[2 + j];
  }
};

#elif defined(ABI_MODEL_FUNNEL)
// Neal's funnel, 101 dims (targets.funnel).
constexpr int kDim = 101;
struct Model {
  std::string names;
  Model(const char*) {
    names = "v";
    for (int i = 1; i < kDim; ++i) names += ",x" + std::to_string(i);
  }
  int dim() const { return kDim; }
  double logp_grad(const double* q, double* g) const {
    const double v = q[0];
    const double inv_ev = std::exp(-v);
    const int dl = kDim - 1;
    double ssq = 0.0;
    for (int i = 1; i < kDim; ++i) ssq += q[i] * q[i];
    const double lp = -0.5 * v * v / 9.0 - 0.5 * ssq * inv_ev - 0.5 * dl * v;
    g[0] = -v / 9.0 + 0.5 * ssq * inv_ev - 0.5 * dl;
    for (int i = 1; i < kDim; ++i) g[i] = -q[i] * inv_ev;
    return lp;
  }
  void constrain(const double* unc, double* con) const {
    std::memcpy(con, unc, sizeof(double) * kDim);
  }
};

#elif defined(ABI_MODEL_LOGREG)
// German-credit-shaped logistic regression (targets.logistic_regression);
// the construct() data string is the path to csrc/logreg_data.bin
// (int32 n, p; double x[n*p]; double y[n]) written by csrc/run_baseline.py.
struct Model {
  int n_obs = 0, n_cov = 0;
  std::vector<double> x, y;
  std::string names;
  bool ok = false;
  Model(const char* data) {
    if (!data) return;
    FILE* f = std::fopen(data, "rb");
    if (!f) return;
    int32_t hdr[2];
    if (std::fread(hdr, sizeof(int32_t), 2, f) != 2) { std::fclose(f); return; }
    n_obs = hdr[0];
    n_cov = hdr[1];
    x.resize(size_t(n_obs) * n_cov);
    y.resize(n_obs);
    ok = std::fread(x.data(), sizeof(double), x.size(), f) == x.size() &&
         std::fread(y.data(), sizeof(double), y.size(), f) == y.size();
    std::fclose(f);
    for (int j = 0; j < n_cov; ++j)
      names += (j ? ",beta" : "beta") + std::to_string(j);
  }
  int dim() const { return n_cov; }
  double logp_grad(const double* q, double* g) const {
    double lp = 0.0;
    for (int j = 0; j < n_cov; ++j) {
      g[j] = -q[j];
      lp -= 0.5 * q[j] * q[j];
    }
    for (int i = 0; i < n_obs; ++i) {
      const double* xi = x.data() + size_t(i) * n_cov;
      double logit = 0.0;
      for (int j = 0; j < n_cov; ++j) logit += q[j] * xi[j];
      const double z = y[i] * logit;
      lp += z < -30 ? z : -std::log1p(std::exp(-z));
      const double s = y[i] / (1.0 + std::exp(z));
      for (int j = 0; j < n_cov; ++j) g[j] += s * xi[j];
    }
    return lp;
  }
  void constrain(const double* unc, double* con) const {
    std::memcpy(con, unc, sizeof(double) * size_t(n_cov));
  }
};

#elif defined(ABI_MODEL_MATRIX)
// Structured-parameter model: a positive scalar, a 2-vector, and a 2x3
// MATRIX, reported with BridgeStan's column-major dotted names
// (sigma, v.1, v.2, M.1.1, M.2.1, M.1.2, M.2.2, M.1.3, M.2.3). Exists to
// exercise the stanio-equivalent nested-name parsing + create_inits
// round trip (reference stan.py:108-145) on non-vector parameters; also
// implements bs_param_unconstrain_json (Stan JSON is ROW-major for
// matrices, the unconstrained vector is column-major).
constexpr int kDim = 9;
struct Model {
  std::string names = "sigma,v.1,v.2,M.1.1,M.2.1,M.1.2,M.2.2,M.1.3,M.2.3";
  Model(const char*) {}
  int dim() const { return kDim; }
  double logp_grad(const double* q, double* g) const {
    double lp = 0.0;
    for (int d = 0; d < kDim; ++d) {
      g[d] = -q[d];
      lp -= 0.5 * q[d] * q[d];
    }
    return lp;
  }
  void constrain(const double* unc, double* con) const {
    con[0] = std::exp(unc[0]);  // sigma > 0
    for (int d = 1; d < kDim; ++d) con[d] = unc[d];
  }
  // Stan-JSON inits -> unconstrained vector. Minimal parser: locate each
  // key, then read the next N numeric literals (nesting brackets carry
  // no extra information for fixed-size variables).
  static const char* read_doubles(const char* p, double* out, int n) {
    int i = 0;
    while (i < n && *p) {
      while (*p && !((*p >= '0' && *p <= '9') || *p == '-')) ++p;
      if (!*p) break;
      char* end = nullptr;
      out[i++] = std::strtod(p, &end);
      p = end;
    }
    return i == n ? p : nullptr;
  }
  int unconstrain_json(const char* json, double* unc) const {
    const char* ps = std::strstr(json, "\"sigma\"");
    const char* pv = std::strstr(json, "\"v\"");
    const char* pm = std::strstr(json, "\"M\"");
    if (!ps || !pv || !pm) return 1;
    double sigma;
    if (!read_doubles(ps + 7, &sigma, 1) || sigma <= 0.0) return 1;
    unc[0] = std::log(sigma);
    if (!read_doubles(pv + 3, unc + 1, 2)) return 1;
    double m_row_major[6];
    if (!read_doubles(pm + 3, m_row_major, 6)) return 1;
    for (int r = 0; r < 2; ++r)
      for (int c = 0; c < 3; ++c)
        unc[3 + c * 2 + r] = m_row_major[r * 3 + c];
    return 0;
  }
};
#define ABI_HAS_UNCONSTRAIN 1

#elif defined(ABI_MODEL_CONSTRAINED)
// Dimension-changing constrained parameterizations: `simplex[4] p;
// cholesky_factor_corr[3] L;` with Stan math's EXACT transforms
// (simplex_constrain / cholesky_corr_constrain and their inverses), the
// parameterizations the reference exercises through real compiled Stan
// models (load_stan.hpp:101-228). Unconstrained dim 6 != constrained
// dim 13 (bs_param_num vs bs_param_unc_num diverge), so this model
// drives the full dim-changing constrain/unconstrain path the vector
// zoo cannot. The density is standard normal on the UNCONSTRAINED
// coordinates (a proper posterior; transform fidelity, not density
// parity, is what this model tests).
constexpr int kSimplexK = 4;   // simplex size (K-1 = 3 unconstrained)
constexpr int kCorrK = 3;      // cholesky_factor_corr size (3 unconstrained)
constexpr int kUncDim = (kSimplexK - 1) + kCorrK * (kCorrK - 1) / 2;  // 6
constexpr int kConDim = kSimplexK + kCorrK * kCorrK;                  // 13
struct Model {
  std::string names;
  Model(const char*) {
    for (int i = 1; i <= kSimplexK; ++i)
      names += (i > 1 ? ",p." : "p.") + std::to_string(i);
    for (int c = 1; c <= kCorrK; ++c)       // column-major dotted names
      for (int r = 1; r <= kCorrK; ++r)
        names += ",L." + std::to_string(r) + "." + std::to_string(c);
  }
  int dim() const { return kConDim; }
  int unc_dim() const { return kUncDim; }
  double logp_grad(const double* q, double* g) const {
    double lp = 0.0;
    for (int d = 0; d < kUncDim; ++d) {
      g[d] = -q[d];
      lp -= 0.5 * q[d] * q[d];
    }
    return lp;
  }
  // Stan math simplex_constrain: stick-breaking with the
  // inv_logit(y_k - log(N - k)) centering (N = K-1, k 0-based).
  static void simplex_constrain(const double* y, double* x) {
    const int n = kSimplexK - 1;
    double stick = 1.0;
    for (int k = 0; k < n; ++k) {
      const double z = 1.0 / (1.0 + std::exp(-(y[k] - std::log(double(n - k)))));
      x[k] = stick * z;
      stick -= x[k];
    }
    x[n] = stick;
  }
  static int simplex_free(const double* x, double* y) {
    const int n = kSimplexK - 1;
    double sum = 0.0;
    for (int k = 0; k < kSimplexK; ++k) {
      if (!(x[k] > 0.0)) return 1;
      sum += x[k];
    }
    if (std::fabs(sum - 1.0) > 1e-8) return 1;
    double stick = 1.0;
    for (int k = 0; k < n; ++k) {
      const double z = x[k] / stick;
      y[k] = std::log(z / (1.0 - z)) + std::log(double(n - k));
      stick -= x[k];
    }
    return 0;
  }
  // Stan math cholesky_corr_constrain: canonical partial correlations
  // z = tanh(y) filled row-wise below the diagonal, rows normalised.
  static void chol_constrain(const double* y, double* L /*row-major KxK*/) {
    for (int i = 0; i < kCorrK * kCorrK; ++i) L[i] = 0.0;
    L[0] = 1.0;
    int k = 0;
    for (int i = 1; i < kCorrK; ++i) {
      L[i * kCorrK + 0] = std::tanh(y[k++]);
      double sum_sqs = L[i * kCorrK] * L[i * kCorrK];
      for (int j = 1; j < i; ++j) {
        L[i * kCorrK + j] = std::tanh(y[k++]) * std::sqrt(1.0 - sum_sqs);
        sum_sqs += L[i * kCorrK + j] * L[i * kCorrK + j];
      }
      L[i * kCorrK + i] = std::sqrt(1.0 - sum_sqs);
    }
  }
  static int chol_free(const double* L /*row-major*/, double* y) {
    if (std::fabs(L[0] - 1.0) > 1e-8) return 1;
    for (int i = 0; i < kCorrK; ++i)
      for (int j = i + 1; j < kCorrK; ++j)
        if (std::fabs(L[i * kCorrK + j]) > 1e-8) return 1;  // not lower-tri
    int k = 0;
    for (int i = 1; i < kCorrK; ++i) {
      if (!(L[i * kCorrK + i] > 0.0)) return 1;
      double sum_sqs = 0.0;
      for (int j = 0; j < i; ++j) {
        const double denom = std::sqrt(1.0 - sum_sqs);
        const double z = L[i * kCorrK + j] / denom;
        if (!(std::fabs(z) < 1.0)) return 1;
        y[k++] = std::atanh(z);
        sum_sqs += L[i * kCorrK + j] * L[i * kCorrK + j];
      }
      if (std::fabs(sum_sqs + L[i * kCorrK + i] * L[i * kCorrK + i] - 1.0) > 1e-8)
        return 1;  // row not unit-norm
    }
    return 0;
  }
  void constrain(const double* unc, double* con) const {
    simplex_constrain(unc, con);
    double L[kCorrK * kCorrK];
    chol_constrain(unc + (kSimplexK - 1), L);
    // flat constrained row is COLUMN-major (BridgeStan name order)
    for (int c = 0; c < kCorrK; ++c)
      for (int r = 0; r < kCorrK; ++r)
        con[kSimplexK + c * kCorrK + r] = L[r * kCorrK + c];
  }
  static const char* read_doubles(const char* p, double* out, int n) {
    int i = 0;
    while (i < n && *p) {
      while (*p && !((*p >= '0' && *p <= '9') || *p == '-')) ++p;
      if (!*p) break;
      char* end = nullptr;
      out[i++] = std::strtod(p, &end);
      p = end;
    }
    return i == n ? p : nullptr;
  }
  int unconstrain_json(const char* json, double* unc) const {
    const char* pp = std::strstr(json, "\"p\"");
    const char* pl = std::strstr(json, "\"L\"");
    if (!pp || !pl) return 1;
    double p[kSimplexK];
    if (!read_doubles(pp + 3, p, kSimplexK)) return 1;
    if (simplex_free(p, unc)) return 1;
    double L[kCorrK * kCorrK];  // Stan JSON matrices are ROW-major
    if (!read_doubles(pl + 3, L, kCorrK * kCorrK)) return 1;
    return chol_free(L, unc + (kSimplexK - 1));
  }
};
#define ABI_HAS_UNCONSTRAIN 1
#define ABI_HAS_UNC_DIM 1

#else
#error "define one of ABI_MODEL_{ILL_GAUSS,EIGHT_SCHOOLS,FUNNEL,LOGREG,MATRIX,CONSTRAINED}"
#endif

}  // namespace

extern "C" {

void* bs_model_construct(const char* data, unsigned int /*seed*/, char** err) {
  auto* m = new Model(data);
#if defined(ABI_MODEL_LOGREG)
  if (!m->ok) {
    if (err) *err = dup_msg("logreg ABI model: could not read data file");
    delete m;
    return nullptr;
  }
#else
  (void)err;
#endif
  return m;
}

void bs_model_destruct(void* m) { delete static_cast<Model*>(m); }

void bs_free_error_msg(char* msg) { std::free(msg); }

const char* bs_param_names(const void* m, bool /*tp*/, bool /*gq*/) {
  return static_cast<const Model*>(m)->names.c_str();
}

int bs_param_num(const void* m, bool /*tp*/, bool /*gq*/) {
  return static_cast<const Model*>(m)->dim();
}

int bs_param_unc_num(const void* m) {
#if defined(ABI_HAS_UNC_DIM)  // dim-changing transforms: con != unc
  return static_cast<const Model*>(m)->unc_dim();
#else
  return static_cast<const Model*>(m)->dim();
#endif
}

int bs_log_density_gradient(const void* m, bool /*propto*/, bool /*jacobian*/,
                            const double* theta, double* val, double* grad,
                            char** /*err*/) {
  *val = static_cast<const Model*>(m)->logp_grad(theta, grad);
  return 0;
}

int bs_param_constrain(const void* m, bool /*tp*/, bool /*gq*/,
                       const double* unc, double* con, void* /*rng*/,
                       char** /*err*/) {
  static_cast<const Model*>(m)->constrain(unc, con);
  return 0;
}

#if defined(ABI_HAS_UNCONSTRAIN)
int bs_param_unconstrain_json(const void* m, const char* json, double* unc,
                              char** err) {
  int rc = static_cast<const Model*>(m)->unconstrain_json(json, unc);
  if (rc && err) *err = dup_msg("unconstrain: bad inits JSON");
  return rc;
}
#endif

void* bs_rng_construct(unsigned int seed, char** /*err*/) {
  return new FakeRng{seed};
}

void bs_rng_destruct(void* rng) { delete static_cast<FakeRng*>(rng); }

}  // extern "C"
