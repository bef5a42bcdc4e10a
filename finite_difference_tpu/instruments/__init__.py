"""Instruments priced against scenario cubes (L4).

The ``Instrument`` contract mirrors the reference's instrument.py:15-147;
concrete instruments (IRSwap, EquityTRS, IndexLinkedSwap, commodity
forwards) price pathwise against ScenarioCube slices.
"""
from .instrument import Instrument
from .schedule import (
    ScheduleConfig,
    WeekendCalendar,
    add_months,
    adjust,
    build_overnight_tenors,
    generate_sub_periods,
    get_calendar,
)
from .cashflow import CashflowLeg, LegType, SwapLeg, leg_pv
from .ir_swap import IRSwap

__all__ = [
    "Instrument",
    "ScheduleConfig",
    "WeekendCalendar",
    "add_months",
    "adjust",
    "build_overnight_tenors",
    "generate_sub_periods",
    "get_calendar",
    "CashflowLeg",
    "LegType",
    "SwapLeg",
    "leg_pv",
    "IRSwap",
]
