from walnuts_tpu.ops.math import (
    adapt_step_size,
    count_trailing_zeros,
    leapfrog_error,
    leapfrog_step,
    log_sum_exp,
    log_sum_exp_vec,
    logp_momentum,
    make_logp_grad,
    sanitize_logp_grad,
)

__all__ = [
    "adapt_step_size",
    "count_trailing_zeros",
    "leapfrog_error",
    "leapfrog_step",
    "log_sum_exp",
    "log_sum_exp_vec",
    "logp_momentum",
    "make_logp_grad",
    "sanitize_logp_grad",
]
