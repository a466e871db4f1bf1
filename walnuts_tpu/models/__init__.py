from walnuts_tpu.models.targets import (
    ar1_normal,
    condition_gaussian,
    eight_schools,
    funnel,
    ill_conditioned_normal,
    logistic_regression,
    std_normal,
    stochastic_volatility,
)

__all__ = [
    "ar1_normal",
    "condition_gaussian",
    "eight_schools",
    "funnel",
    "ill_conditioned_normal",
    "logistic_regression",
    "std_normal",
    "stochastic_volatility",
]
