"""Market-data layer: risk-factor slices, scenario cubes, pathwise curves.

Reconstructions of the reference dump's missing ``market_data.*`` modules
(SURVEY §2.9) from their call sites in exposure_engine.py / ir_swap.py /
equity_trs.py / test_1.py.
"""
from .risk_factor import CurveSlice, RiskFactorSlice, ScalarSlice, SurfaceSlice
from .scenario_cube import ScenarioCube, StaticMarketData
from .yield_curve import YieldCurve, hermite_rt_interp, linear_interp
from .cpi import BondHistoricalCPI, CPIPublication, HistoricalCPI, besa_bracket, first_of_month, shift_months
from .cpi_term_structure import CPITermStructure

__all__ = [
    "CurveSlice",
    "RiskFactorSlice",
    "ScalarSlice",
    "SurfaceSlice",
    "ScenarioCube",
    "StaticMarketData",
    "YieldCurve",
    "hermite_rt_interp",
    "linear_interp",
    "BondHistoricalCPI",
    "CPIPublication",
    "HistoricalCPI",
    "besa_bracket",
    "first_of_month",
    "shift_months",
    "CPITermStructure",
]
