"""Calibration layer (L5): CS historical/implied, HW1F, PCA, GBM FX."""
from .statistics import calc_statistics, force_positive_shift
from .cs import (
    black_european_option_price,
    bootstrap_from_json,
    calibrate_historical,
    calibrate_implied,
    cs_variance,
    get_day_count_accrual,
)
from .hw1f import calibrate_hw1f_interest_rate, compare_hw1f_params, extract_hw1f_params
from .pca import (
    CalibrationInfo,
    calibrate_pca_interest_rate,
    compare_pca_params,
    compute_curve_statistics,
    extract_pca_params,
    pca,
)
from .gbm_fx import (
    bootstrap_fx_from_json,
    build_parser,
    compare_gbm_fx_params,
    correct_declining_variance,
    export_gbm_fx_results,
    extract_atm_vols,
    extract_gbm_fx_params,
    read_vol_surface,
    run_gbm_fx_calibration,
)

__all__ = [
    "calc_statistics",
    "force_positive_shift",
    "black_european_option_price",
    "bootstrap_from_json",
    "calibrate_historical",
    "calibrate_implied",
    "cs_variance",
    "get_day_count_accrual",
    "calibrate_hw1f_interest_rate",
    "compare_hw1f_params",
    "extract_hw1f_params",
    "CalibrationInfo",
    "calibrate_pca_interest_rate",
    "compare_pca_params",
    "compute_curve_statistics",
    "extract_pca_params",
    "pca",
    "bootstrap_fx_from_json",
    "build_parser",
    "compare_gbm_fx_params",
    "correct_declining_variance",
    "export_gbm_fx_results",
    "extract_atm_vols",
    "extract_gbm_fx_params",
    "read_vol_surface",
    "run_gbm_fx_calibration",
]
