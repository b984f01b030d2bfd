from .kalman import KalmanFilter, KalmanFilterWithSites, KalmanFilterWithSparseSites
from .pskf import (
    FilterResult,
    SmootherResult,
    filter_smoother_with_sites,
    parallel_filter,
    parallel_smoother,
    posterior_ssm_from_smoothed,
    site_log_normalizer,
)

__all__ = [
    "FilterResult",
    "KalmanFilter",
    "KalmanFilterWithSites",
    "KalmanFilterWithSparseSites",
    "SmootherResult",
    "filter_smoother_with_sites",
    "parallel_filter",
    "parallel_smoother",
    "posterior_ssm_from_smoothed",
    "site_log_normalizer",
]
