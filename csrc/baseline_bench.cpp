// Native single-core WALNUTS baseline benchmark.
//
// The reference publishes no performance numbers (BASELINE.md), so the
// 64-core C++ comparison point has to be measured. This is a fresh,
// self-contained C++17 implementation of the WALNUTS algorithm (written
// from the algorithm: within-orbit adaptive step halving with an explicit
// reversibility check, biased-progressive tree doubling, Nutpie-style
// continuous warmup) on plain std::vector math — no Eigen, no external
// deps — used purely to measure single-core ESS/sec on the same targets
// bench.py runs on TPU. csrc/run_baseline.py drives it and stores results
// in BASELINE_MEASURED.json; bench.py extrapolates x64 for the 64-core
// baseline ratio.
//
// Build: g++ -O3 -march=native -std=c++17 -o baseline_bench baseline_bench.cpp
// Run:   ./baseline_bench <model: funnel|logreg> <chains> <warmup> <sampling> <seed> <out.bin>

#include <cassert>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <optional>
#include <random>
#include <string>
#include <vector>

using Vec = std::vector<double>;

// ---------------------------------------------------------------- targets

struct Target {
  virtual ~Target() = default;
  virtual int dim() const = 0;
  // returns logp, fills grad
  virtual double logp_grad(const Vec& q, Vec& grad) const = 0;
};

struct Funnel : Target {
  int d_latent;
  double scale;
  explicit Funnel(int dim_total, double s = 3.0) : d_latent(dim_total - 1), scale(s) {}
  int dim() const override { return d_latent + 1; }
  double logp_grad(const Vec& q, Vec& grad) const override {
    double v = q[0];
    double inv_ev = std::exp(-v);
    double ssq = 0.0;
    for (int i = 1; i <= d_latent; ++i) ssq += q[i] * q[i];
    double lp = -0.5 * v * v / (scale * scale) - 0.5 * ssq * inv_ev - 0.5 * d_latent * v;
    grad[0] = -v / (scale * scale) + 0.5 * ssq * inv_ev - 0.5 * d_latent;
    for (int i = 1; i <= d_latent; ++i) grad[i] = -q[i] * inv_ev;
    return lp;
  }
};

// Non-centered eight schools (walnuts_tpu.models.targets.eight_schools,
// Rubin 1981 data): theta = [mu, log_tau, z_1..z_8]. Used for the
// draw-level distributional parity fixtures (tests/test_native_parity.py).
struct EightSchools : Target {
  static constexpr double kY[8] = {28, 8, -3, 7, -1, 1, 18, 12};
  static constexpr double kSigma[8] = {15, 10, 16, 11, 9, 11, 10, 18};
  int dim() const override { return 10; }
  double logp_grad(const Vec& q, Vec& grad) const override {
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
      gltau += r * tau * z;
      grad[2 + j] = r * tau - z;
    }
    grad[0] = gmu;
    grad[1] = gltau;
    return lp;
  }
};

// Stochastic volatility with a non-centered latent AR(1) — the same
// posterior as walnuts_tpu.models.targets.stochastic_volatility (the
// returns series is exported by csrc/run_baseline.py so both samplers hit
// the identical density). theta = [mu, phi_raw, log_sigma, z_1..z_T].
struct StochVol : Target {
  int T;
  std::vector<double> r2;  // squared returns
  mutable std::vector<double> u, a, v;
  explicit StochVol(const char* data_path) {
    FILE* f = std::fopen(data_path, "rb");
    if (!f) { std::perror("sv data"); std::exit(1); }
    int32_t hdr;
    if (std::fread(&hdr, sizeof(int32_t), 1, f) != 1) std::exit(1);
    T = hdr;
    r2.resize(T);
    if (std::fread(r2.data(), sizeof(double), r2.size(), f) != r2.size()) std::exit(1);
    std::fclose(f);
    for (auto& x : r2) x *= x;
    u.resize(T); a.resize(T); v.resize(T + 1);
  }
  int dim() const override { return T + 3; }
  double logp_grad(const Vec& q, Vec& grad) const override {
    const double mu = q[0], phi_raw = q[1], log_sigma = q[2];
    const double* z = q.data() + 3;
    const double phi = std::tanh(phi_raw);
    const double sigma = std::exp(log_sigma);
    const double omp2 = 1.0 - phi * phi + 1e-12;
    const double scale0 = 1.0 / std::sqrt(omp2);
    // forward filter u_t = phi*u_{t-1} + z_t, u_1 = z_1*scale0
    u[0] = z[0] * scale0;
    for (int t = 1; t < T; ++t) u[t] = phi * u[t - 1] + z[t];
    double lp = 0.0, sum_a = 0.0, sum_au = 0.0, sum_z2 = 0.0;
    for (int t = 0; t < T; ++t) {
      const double h = mu + sigma * u[t];
      const double e = std::exp(-h);
      lp += -0.5 * (r2[t] * e + h);
      a[t] = 0.5 * (r2[t] * e - 1.0);  // dlp/dh_t
      sum_a += a[t];
      sum_au += a[t] * u[t];
      sum_z2 += z[t] * z[t];
    }
    lp += -0.5 * sum_z2 - 0.5 * mu * mu / 100.0
        - 0.5 * phi_raw * phi_raw / 4.0 - 0.5 * log_sigma * log_sigma / 4.0;
    // backward adjoint v_t = dlp/du_t = sigma*a_t + phi*v_{t+1}
    v[T] = 0.0;
    for (int t = T - 1; t >= 0; --t) v[t] = sigma * a[t] + phi * v[t + 1];
    grad[0] = sum_a - mu / 100.0;
    grad[2] = sigma * sum_au - log_sigma / 4.0;
    grad[3] = v[0] * scale0 - z[0];
    for (int t = 1; t < T; ++t) grad[3 + t] = v[t] - z[t];
    // dlp/dphi: recursion term + the scale0(phi) term of u_1
    double dphi = 0.0;
    for (int t = 1; t < T; ++t) dphi += v[t] * u[t - 1];
    dphi += v[0] * z[0] * phi / (omp2 * std::sqrt(omp2));
    grad[1] = dphi * (1.0 - phi * phi) - phi_raw / 4.0;
    return lp;
  }
};

struct LogReg : Target {
  int n_obs, n_cov;
  std::vector<double> x;   // row-major n_obs x n_cov, with intercept column
  std::vector<double> y;   // +/- 1
  // Load the exact dataset the Python model uses (written by
  // csrc/run_baseline.py) so ESS-per-gradient is compared on the same
  // posterior. Format: int32 n, p; double x[n*p]; double y[n].
  explicit LogReg(const char* data_path) {
    FILE* f = std::fopen(data_path, "rb");
    if (!f) { std::perror("logreg data"); std::exit(1); }
    int32_t hdr[2];
    if (std::fread(hdr, sizeof(int32_t), 2, f) != 2) std::exit(1);
    n_obs = hdr[0];
    n_cov = hdr[1];
    x.resize(static_cast<size_t>(n_obs) * n_cov);
    y.resize(n_obs);
    if (std::fread(x.data(), sizeof(double), x.size(), f) != x.size()) std::exit(1);
    if (std::fread(y.data(), sizeof(double), y.size(), f) != y.size()) std::exit(1);
    std::fclose(f);
  }
  LogReg(int n, int p, uint64_t seed) : n_obs(n), n_cov(p), x(n * p), y(n) {
    std::mt19937_64 rng(seed);
    std::normal_distribution<double> nd(0.0, 1.0);
    std::uniform_real_distribution<double> ud(0.0, 1.0);
    for (int i = 0; i < n_obs; ++i) {
      x[i * n_cov] = 1.0;
      for (int j = 1; j < n_cov; ++j) x[i * n_cov + j] = nd(rng);
    }
    // standardize non-intercept columns
    for (int j = 1; j < n_cov; ++j) {
      double m = 0, s = 0;
      for (int i = 0; i < n_obs; ++i) m += x[i * n_cov + j];
      m /= n_obs;
      for (int i = 0; i < n_obs; ++i) s += (x[i * n_cov + j] - m) * (x[i * n_cov + j] - m);
      s = std::sqrt(s / n_obs);
      for (int i = 0; i < n_obs; ++i) x[i * n_cov + j] = (x[i * n_cov + j] - m) / s;
    }
    Vec beta(n_cov);
    for (int j = 0; j < n_cov; ++j) beta[j] = 0.5 * nd(rng);
    for (int i = 0; i < n_obs; ++i) {
      double eta = 0;
      for (int j = 0; j < n_cov; ++j) eta += x[i * n_cov + j] * beta[j];
      double p1 = 1.0 / (1.0 + std::exp(-eta));
      y[i] = (ud(rng) < p1) ? 1.0 : -1.0;
    }
  }
  int dim() const override { return n_cov; }
  double logp_grad(const Vec& q, Vec& grad) const override {
    double lp = 0.0;
    for (int j = 0; j < n_cov; ++j) {
      grad[j] = -q[j];            // prior gradient
      lp -= 0.5 * q[j] * q[j];    // prior
    }
    for (int i = 0; i < n_obs; ++i) {
      double eta = 0;
      const double* row = &x[i * n_cov];
      for (int j = 0; j < n_cov; ++j) eta += row[j] * q[j];
      double z = y[i] * eta;
      // log sigmoid(z), stable
      double ls = z > 0 ? -std::log1p(std::exp(-z)) : z - std::log1p(std::exp(z));
      lp += ls;
      double sig = 1.0 / (1.0 + std::exp(z));  // 1 - sigmoid(z)
      double c = y[i] * sig;
      for (int j = 0; j < n_cov; ++j) grad[j] += c * row[j];
    }
    return lp;
  }
};

// ----------------------------------------------------------- sampler core

struct Rng {
  std::mt19937_64 gen;
  std::normal_distribution<double> nd{0.0, 1.0};
  std::uniform_real_distribution<double> ud{0.0, 1.0};
  explicit Rng(uint64_t seed) : gen(seed) {}
  double normal() { return nd(gen); }
  double uniform() { return ud(gen); }
  bool coin() { return ud(gen) < 0.5; }
};

static double kinetic(const Vec& p, const Vec& inv_mass) {
  double k = 0.0;
  for (size_t i = 0; i < p.size(); ++i) k += inv_mass[i] * p[i] * p[i];
  return -0.5 * k;
}

static double lse(double a, double b) {
  double m = std::fmax(a, b);
  if (std::isinf(m)) return m;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct Orbit {
  Vec q_lo, p_lo, g_lo;   // backward end
  Vec q_hi, p_hi, g_hi;   // forward end
  double h_lo, h_hi;      // joint log densities at the ends
  Vec q_pick, g_pick;     // progressively selected state
  double lp_pick;         // position log density of the selection
  double lw;              // logsumexp of joint densities over the orbit
};

struct Counters {
  long grads = 0;
};

struct Tuning {
  double step;
  int min_micro;
  double max_err;
  int max_depth;
  int max_halvings;
};

// integrate n micro steps of size h from (q,p,g); returns final position
// logp; updates in place
static double integrate(const Target& tgt, const Vec& inv_mass, double h, int n,
                        Vec& q, Vec& p, Vec& g, Counters& cnt) {
  const int d = static_cast<int>(q.size());
  double lp = 0.0;
  for (int s = 0; s < n; ++s) {
    for (int i = 0; i < d; ++i) p[i] += 0.5 * h * g[i];
    for (int i = 0; i < d; ++i) q[i] += h * inv_mass[i] * p[i];
    lp = tgt.logp_grad(q, g);
    ++cnt.grads;
    for (int i = 0; i < d; ++i) p[i] += 0.5 * h * g[i];
  }
  return lp;
}

// one macro step in direction sign(h0) from state (q0,p0,g0) with joint h_start.
// Returns nullopt on failure; otherwise the new single-point orbit.
template <typename Adapt>
static std::optional<Orbit> macro_step(const Target& tgt, const Vec& inv_mass,
                                       const Tuning& tun, double h0,
                                       const Vec& q0, const Vec& p0, const Vec& g0,
                                       double h_start, Counters& cnt, Adapt&& adapt) {
  Vec q, p, g;
  double h = h0;
  int n = tun.min_micro;
  for (int halve = 0; halve < tun.max_halvings; ++halve, n *= 2, h *= 0.5) {
    q = q0; p = p0; g = g0;
    double lp = integrate(tgt, inv_mass, h, n, q, p, g, cnt);
    double joint = lp + kinetic(p, inv_mass);
    double err = std::fabs(h_start - joint);
    if (n == tun.min_micro) adapt(std::isnan(err) ? 0.0 : std::exp(-err));
    if (err <= tun.max_err) {
      // reversibility: any coarser level passing from the flipped endpoint
      // breaks detailed balance
      int rn = n;
      double rh = h;
      Vec rq(q.size()), rp(q.size()), rg(q.size());
      bool ok = true;
      while (rn >= 2 * tun.min_micro) {
        rn /= 2;
        rh *= 2;
        rq = q;
        rg = g;
        for (size_t i = 0; i < p.size(); ++i) rp[i] = -p[i];
        double rlp = integrate(tgt, inv_mass, rh, rn, rq, rp, rg, cnt);
        double rjoint = rlp + kinetic(rp, inv_mass);
        if (std::fabs(rjoint - joint) <= tun.max_err) { ok = false; break; }
      }
      if (!ok) return std::nullopt;
      Orbit o{q, p, g, q, p, g, joint, joint, q, g, lp, joint};
      return o;
    }
  }
  return std::nullopt;
}

static bool uturn(const Orbit& older, const Orbit& newer, bool fwd, const Vec& inv_mass) {
  const Orbit& lo = fwd ? older : newer;
  const Orbit& hi = fwd ? newer : older;
  double dot_hi = 0, dot_lo = 0;
  for (size_t i = 0; i < inv_mass.size(); ++i) {
    double delta = inv_mass[i] * (hi.q_hi[i] - lo.q_lo[i]);
    dot_hi += hi.p_hi[i] * delta;
    dot_lo += lo.p_lo[i] * delta;
  }
  return dot_hi < 0 || dot_lo < 0;
}

// merge: barker=true uses proportional selection, else Metropolis
static Orbit merge(Rng& rng, Orbit&& older, Orbit&& newer, bool fwd, bool barker) {
  double lw = lse(older.lw, newer.lw);
  double denom = barker ? lw : older.lw;
  bool take_new = std::log(rng.uniform()) < newer.lw - denom;
  Orbit out;
  Orbit& lo = fwd ? older : newer;
  Orbit& hi = fwd ? newer : older;
  out.q_lo = std::move(lo.q_lo); out.p_lo = std::move(lo.p_lo);
  out.g_lo = std::move(lo.g_lo); out.h_lo = lo.h_lo;
  out.q_hi = std::move(hi.q_hi); out.p_hi = std::move(hi.p_hi);
  out.g_hi = std::move(hi.g_hi); out.h_hi = hi.h_hi;
  Orbit& pick = take_new ? newer : older;
  out.q_pick = std::move(pick.q_pick);
  out.g_pick = std::move(pick.g_pick);
  out.lp_pick = pick.lp_pick;
  out.lw = lw;
  return out;
}

// build a balanced subtree of `leaves` macro steps extending `frontier`
template <typename Adapt>
static std::optional<Orbit> grow(const Target& tgt, const Vec& inv_mass,
                                 const Tuning& tun, Rng& rng, bool fwd, int depth,
                                 const Orbit& frontier, Counters& cnt, Adapt&& adapt) {
  if (depth == 0) {
    double h0 = fwd ? tun.step : -tun.step;
    const Vec& q = fwd ? frontier.q_hi : frontier.q_lo;
    const Vec& p = fwd ? frontier.p_hi : frontier.p_lo;
    const Vec& g = fwd ? frontier.g_hi : frontier.g_lo;
    double hj = fwd ? frontier.h_hi : frontier.h_lo;
    return macro_step(tgt, inv_mass, tun, h0, q, p, g, hj, cnt, adapt);
  }
  auto first = grow(tgt, inv_mass, tun, rng, fwd, depth - 1, frontier, cnt, adapt);
  if (!first) return std::nullopt;
  auto second = grow(tgt, inv_mass, tun, rng, fwd, depth - 1, *first, cnt, adapt);
  if (!second) return std::nullopt;
  if (uturn(*first, *second, fwd, inv_mass)) return std::nullopt;
  return merge(rng, std::move(*first), std::move(*second), fwd, /*barker=*/true);
}

// one WALNUTS draw; q is updated in place; returns (position logp, depth)
template <typename Adapt>
static std::pair<double, int> draw(const Target& tgt, const Vec& inv_mass,
                                   const Tuning& tun, Rng& rng, Vec& q, Vec& g_out,
                                   Counters& cnt, Adapt&& adapt) {
  const int d = tgt.dim();
  Vec p(d);
  for (int i = 0; i < d; ++i) p[i] = rng.normal() / std::sqrt(inv_mass[i]);
  Vec g(d);
  double lp = tgt.logp_grad(q, g);
  ++cnt.grads;
  double joint = lp + kinetic(p, inv_mass);
  Orbit orbit{q, p, g, q, p, g, joint, joint, q, g, lp, joint};
  int depth = 1;
  for (; depth <= tun.max_depth; ++depth) {
    bool fwd = rng.coin();
    auto sub = grow(tgt, inv_mass, tun, rng, fwd, depth - 1, orbit, cnt, adapt);
    if (!sub) break;
    bool turned = uturn(orbit, *sub, fwd, inv_mass);
    orbit = merge(rng, std::move(orbit), std::move(*sub), fwd, /*barker=*/false);
    if (turned) break;
  }
  q = orbit.q_pick;
  g_out = orbit.g_pick;
  return {orbit.lp_pick, depth};
}

// ------------------------------------------------------------- adaptation

struct Adam {
  double logeps, m = 0, v = 0;
  double t = 0, b1p = 1, b2p = 1;
  double target = 0.8, lr = 0.05, b1 = 0.8, b2 = 0.9, eps = 1e-4, decay = 0.5;
  explicit Adam(double step0) : logeps(std::log(step0)) {}
  void observe(double accept) {
    t += 1; b1p *= b1; b2p *= b2;
    double grad = target - accept;
    m = b1 * m + (1 - b1) * grad;
    v = b2 * v + (1 - b2) * grad * grad;
    double mh = m / (1 - b1p), vh = v / (1 - b2p);
    logeps -= lr / std::pow(t, decay) * mh / (std::sqrt(vh) + eps);
  }
  double step() const { return std::exp(logeps); }
};

struct DiscountedMoments {
  double w;
  Vec mean, ssd;
  DiscountedMoments(double w0, const Vec& var0) : w(w0), mean(var0.size(), 0.0), ssd(var0.size()) {
    for (size_t i = 0; i < var0.size(); ++i) ssd[i] = w0 * var0[i];
  }
  void observe(double df, const Vec& y) {
    w = df * w + 1.0;
    for (size_t i = 0; i < y.size(); ++i) {
      double delta = y[i] - mean[i];
      mean[i] += delta / w;
      ssd[i] = df * ssd[i] + delta * (y[i] - mean[i]);
    }
  }
  void variance(Vec& out) const {
    for (size_t i = 0; i < ssd.size(); ++i) out[i] = w > 0 ? ssd[i] / w : 1.0;
  }
};

// --------------------------------------------------------------- benchmark

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <funnel|logreg> <chains> <warmup> <sampling> <seed> <out.bin>\n",
                 argv[0]);
    return 1;
  }
  std::string model = argv[1];
  int n_chains = std::atoi(argv[2]);
  int n_warm = std::atoi(argv[3]);
  int n_samp = std::atoi(argv[4]);
  uint64_t seed = std::strtoull(argv[5], nullptr, 10);
  const char* out_path = argv[6];
  // optional: max step halvings via env (default 5, the reference default)
  int max_halvings = 5;
  if (const char* mh = std::getenv("BASELINE_MAX_HALVINGS")) {
    max_halvings = std::atoi(mh);
  }

  std::unique_ptr<Target> tgt;
  if (model == "funnel") tgt = std::make_unique<Funnel>(101);
  else if (model == "eight_schools") tgt = std::make_unique<EightSchools>();
  else if (model == "sv") {
    if (argc <= 7) { std::fprintf(stderr, "sv needs a data file\n"); return 1; }
    tgt = std::make_unique<StochVol>(argv[7]);
  }
  else if (argc > 7) tgt = std::make_unique<LogReg>(argv[7]);
  else tgt = std::make_unique<LogReg>(1000, 25, 20260816ULL);
  const int d = tgt->dim();
  // all dims by default so the ESS estimator matches the TPU bench's
  // all-dims protocol exactly; BASELINE_KEEP_DIMS caps it for memory
  int keep_dims = d;
  if (const char* kd = std::getenv("BASELINE_KEEP_DIMS")) {
    keep_dims = std::min(d, std::atoi(kd));
  }

  std::vector<double> draws;  // chain-major: [chain][iter][keep_dims]
  draws.reserve(static_cast<size_t>(n_chains) * n_samp * keep_dims);

  Counters cnt;
  long sampling_grads = 0;  // phase split for the ESS/grad parity root-cause
  auto t0 = std::chrono::steady_clock::now();
  double warm_seconds = 0.0;

  FILE* init_dump = nullptr;
  if (const char* ip = std::getenv("BASELINE_DUMP_INITS")) {
    init_dump = std::fopen(ip, "wb");
    int32_t h[2] = {n_chains, d};
    std::fwrite(h, sizeof(int32_t), 2, init_dump);
  }
  for (int c = 0; c < n_chains; ++c) {
    Rng rng(seed + 1000003ULL * c);
    Vec q(d);
    for (int i = 0; i < d; ++i) q[i] = 2.0 * rng.normal();
    if (init_dump) std::fwrite(q.data(), sizeof(double), d, init_dump);
    Vec grad(d);
    double lp0 = tgt->logp_grad(q, grad);
    (void)lp0;
    ++cnt.grads;
    // Nutpie-style gradient mass init
    Vec mass(d);
    for (int i = 0; i < d; ++i) mass[i] = 0.99999 * std::fabs(grad[i]) + 1e-5;
    Vec inv_mass_init(d);
    for (int i = 0; i < d; ++i) inv_mass_init[i] = 1.0 / mass[i];

    // coarse initial step search: double while one-step accept > 0.9,
    // then shrink by sqrt(1/2) until accept > 0.6
    double step0 = 1.0;
    {
      Vec p0(d), qq(d), pp(d), gg(d);
      for (int i = 0; i < d; ++i) p0[i] = rng.normal() * std::sqrt(mass[i]);
      auto one_step_err = [&](double h) {
        qq = q;
        pp = p0;
        gg = grad;
        double lp_here = lp0 + kinetic(p0, inv_mass_init);
        double lp_new = integrate(*tgt, inv_mass_init, h, 1, qq, pp, gg, cnt);
        return lp_new + kinetic(pp, inv_mass_init) - lp_here;
      };
      int guard = 0;
      while (one_step_err(step0) > std::log(0.9) && guard++ < 64) step0 *= 2.0;
      guard = 0;
      while (one_step_err(step0) < std::log(0.6) && guard++ < 64) step0 *= std::sqrt(0.5);
    }

    Adam adam(step0);
    DiscountedMoments draws_mom(4.0, inv_mass_init);
    DiscountedMoments score_mom(4.0, mass);
    double total_macro = 2.0, macro_count = 1.0;

    Tuning tun{adam.step(), 1, 0.5, 5, max_halvings};
    Vec inv_mass(d), vd(d), vs(d), g_sel(d);

    auto tw0 = std::chrono::steady_clock::now();
    for (int it = 0; it < n_warm; ++it) {
      draws_mom.variance(vd);
      score_mom.variance(vs);
      for (int i = 0; i < d; ++i) inv_mass[i] = std::sqrt(vd[i] / vs[i]);
      tun.step = adam.step();
      double mean_macro = total_macro / macro_count;
      tun.min_micro = std::max(1, (int)std::lround(mean_macro / 15.0));
      auto [lp, depth] = draw(*tgt, inv_mass, tun, rng, q, g_sel, cnt,
                              [&](double a) { adam.observe(a); });
      (void)lp;
      double df = 1.0 - 1.0 / (4.0 + it);
      draws_mom.observe(df, q);
      score_mom.observe(df, g_sel);
      total_macro += (double)(1 << depth);
      macro_count += 1.0;
    }
    warm_seconds += std::chrono::duration<double>(std::chrono::steady_clock::now() - tw0).count();

    draws_mom.variance(vd);
    score_mom.variance(vs);
    for (int i = 0; i < d; ++i) inv_mass[i] = std::sqrt(vd[i] / vs[i]);
    tun.step = adam.step();
    double mean_macro = total_macro / macro_count;
    tun.min_micro = std::max(1, (int)std::lround(mean_macro / 15.0));
    if (std::getenv("BASELINE_DEBUG")) {
      std::fprintf(stderr,
                   "chain %d: step0 %.4f frozen step %.5f min_micro %d inv_mass[0] %.4g q[0] %.3f\n",
                   c, step0, tun.step, tun.min_micro, inv_mass[0], q[0]);
    }

    long gs0 = cnt.grads;
    int moves = 0;
    double q0_prev = q[0];
    for (int it = 0; it < n_samp; ++it) {
      auto res = draw(*tgt, inv_mass, tun, rng, q, g_sel, cnt, [](double) {});
      if (q[0] != q0_prev) ++moves;
      q0_prev = q[0];
      if (std::getenv("BASELINE_DEBUG2") && it < 10) {
        std::fprintf(stderr, "chain %d it %d lp %.3f depth %d q0 %.4f\n",
                     c, it, res.first, res.second, q[0]);
      }
      (void)res;
      for (int k = 0; k < keep_dims; ++k) draws.push_back(q[k]);
    }
    sampling_grads += cnt.grads - gs0;
    if (std::getenv("BASELINE_CHAIN_STATS")) {
      std::fprintf(stderr,
                   "CHAINSTAT %d step %.6g min_micro %d samp_grads %ld moves %d\n",
                   c, tun.step, tun.min_micro, cnt.grads - gs0, moves);
    }
  }

  if (init_dump) std::fclose(init_dump);
  double total_seconds =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();

  FILE* f = std::fopen(out_path, "wb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", out_path); return 1; }
  int32_t header[3] = {n_chains, n_samp, keep_dims};
  std::fwrite(header, sizeof(int32_t), 3, f);
  std::fwrite(draws.data(), sizeof(double), draws.size(), f);
  std::fclose(f);

  std::printf(
      "{\"model\": \"%s\", \"chains\": %d, \"warmup\": %d, \"sampling\": %d, "
      "\"total_seconds\": %.6f, \"warmup_seconds\": %.6f, \"grad_evals\": %ld, "
      "\"sampling_grad_evals\": %ld}\n",
      model.c_str(), n_chains, n_warm, n_samp, total_seconds, warm_seconds,
      cnt.grads, sampling_grads);
  return 0;
}
