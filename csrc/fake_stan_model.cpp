// A fake BridgeStan model shared object for testing the native bridge.
//
// Implements the public bs_* C ABI for a small analytic model so
// csrc/stan_bridge.cpp and walnuts_tpu/models/stan.py can be exercised
// end-to-end without a Stan toolchain (the reference tests the same
// surface with a compiled simple.stan, python/tests/test_stan.py).
//
// Model: unconstrained parameters (mu, log_sigma, z); log density
//   N(mu | 0,1) + N(log_sigma | 0,1) + N(z | 0,1)
// Constrained parameters: (mu, sigma = exp(log_sigma), z).
// If a data JSON of the form {"bad_region": true} is given, evaluations
// with mu > 2 fail (to test the -inf error path).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC -o libfake_stan_model.so fake_stan_model.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {
struct Model {
  bool bad_region = false;
};
struct FakeRng {
  unsigned int seed;
};
const char* NAMES = "mu,sigma,z";
char* dup_msg(const char* msg) {
  char* out = static_cast<char*>(std::malloc(std::strlen(msg) + 1));
  std::strcpy(out, msg);
  return out;
}
}  // namespace

extern "C" {

void* bs_model_construct(const char* data, unsigned int /*seed*/, char** /*err*/) {
  auto* m = new Model();
  if (data && std::string(data).find("bad_region") != std::string::npos) {
    m->bad_region = true;
  }
  return m;
}

void bs_model_destruct(void* m) { delete static_cast<Model*>(m); }

void bs_free_error_msg(char* msg) { std::free(msg); }

const char* bs_param_names(const void* /*m*/, bool /*tp*/, bool /*gq*/) {
  return NAMES;
}

int bs_param_num(const void* /*m*/, bool /*tp*/, bool /*gq*/) { return 3; }

int bs_param_unc_num(const void* /*m*/) { return 3; }

int bs_log_density_gradient(const void* m, bool /*propto*/, bool /*jacobian*/,
                            const double* theta, double* val, double* grad,
                            char** err) {
  const auto* model = static_cast<const Model*>(m);
  if (model->bad_region && theta[0] > 2.0) {
    if (err) *err = dup_msg("mu entered the bad region");
    return 1;
  }
  *val = -0.5 * (theta[0] * theta[0] + theta[1] * theta[1] + theta[2] * theta[2]);
  grad[0] = -theta[0];
  grad[1] = -theta[1];
  grad[2] = -theta[2];
  return 0;
}

int bs_param_constrain(const void* /*m*/, bool /*tp*/, bool /*gq*/,
                       const double* unc, double* con, void* /*rng*/,
                       char** /*err*/) {
  con[0] = unc[0];
  con[1] = std::exp(unc[1]);
  con[2] = unc[2];
  return 0;
}

int bs_param_unconstrain_json(const void* /*m*/, const char* /*json*/,
                              double* unc, char** /*err*/) {
  unc[0] = unc[1] = unc[2] = 0.0;
  return 0;
}

void* bs_rng_construct(unsigned int seed, char** /*err*/) {
  return new FakeRng{seed};
}

void bs_rng_destruct(void* rng) { delete static_cast<FakeRng*>(rng); }

}  // extern "C"
