"""RiskFlow-style scenario generation (TPU-native).

Capability parity with the reference's ``cs_simulation.py`` (the RiskFlow
scenario-generation replica): time-grid-string parsing, CVAMarketData JSON
loading, Clewlow-Strickland precalculate/generate, correlation Cholesky with
eigenvalue healing, batch simulation drivers, RiskFlow scenario DataFrame
round-trip, and a scenario-output comparator.

Host/device split: JSON + dates + grid parsing + (tiny) vol/drift tensor
precompute stay on host; the (n_factors, n_steps, n_tenors, n_scenarios)
path generation is one fused jit on device, sharded over the scenario axis.
"""
from .time_grid import (
    DAYS_IN_YEAR,
    EXCEL_OFFSET,
    excel_days_to_date,
    date_to_excel_days,
    parse_offset,
    parse_time_grid,
)
from .market_data import (
    load_market_data,
    extract_forward_curve,
    extract_model_params,
    extract_correlations,
)
from .simulation import (
    build_cholesky,
    generate_random_numbers,
    generate_paths,
    precalculate,
    run_simulation_from_json,
    run_multi_factor_simulation_from_json,
)
from .joint_cube import (
    GBMScalarFactor,
    HW1FCurveFactor,
    simulate_joint_cube,
)
from .diagnostics import (
    correlation_recovery,
    cs_log_variance,
    cs_theoretical_log_moments,
    cs_theoretical_price_moments,
    martingale_test,
    moment_matching,
    parameter_recovery,
    run_full_diagnostics,
    tail_analysis,
)
from .riskflow_io import (
    to_riskflow_dataframe,
    from_riskflow_dataframe,
    export_scenarios_csv,
    load_riskflow_scenarios,
    load_scenarios_csv,
    compare_scenario_outputs,
)

__all__ = [
    "DAYS_IN_YEAR",
    "EXCEL_OFFSET",
    "excel_days_to_date",
    "date_to_excel_days",
    "parse_offset",
    "parse_time_grid",
    "load_market_data",
    "extract_forward_curve",
    "extract_model_params",
    "extract_correlations",
    "build_cholesky",
    "generate_random_numbers",
    "generate_paths",
    "precalculate",
    "run_simulation_from_json",
    "run_multi_factor_simulation_from_json",
    "to_riskflow_dataframe",
    "from_riskflow_dataframe",
    "export_scenarios_csv",
    "load_riskflow_scenarios",
    "load_scenarios_csv",
    "compare_scenario_outputs",
    "correlation_recovery",
    "cs_log_variance",
    "cs_theoretical_log_moments",
    "cs_theoretical_price_moments",
    "martingale_test",
    "moment_matching",
    "parameter_recovery",
    "run_full_diagnostics",
    "tail_analysis",
    "GBMScalarFactor",
    "HW1FCurveFactor",
    "simulate_joint_cube",
]
