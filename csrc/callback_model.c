#include <stddef.h>
int logp_cb(size_t n, const double* theta, double* grad,
            double* lp, void* data) {
  double iv = data ? *(double*)data : 1.0;
  double acc = 0.0;
  for (size_t i = 0; i < n; ++i) {
    grad[i] = -iv * theta[i];
    acc += theta[i] * theta[i];
  }
  *lp = -0.5 * iv * acc;
  return 0;
}
int logp_fail(size_t n, const double* theta, double* grad,
              double* lp, void* data) {
  (void)n; (void)theta; (void)grad; (void)lp; (void)data;
  return 1;
}
