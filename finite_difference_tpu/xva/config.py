"""Simulation / counterparty / discounting configuration.

Capability parity with the reference's ``config.py:8-65`` (xva_engine
package): frozen dataclasses carrying the RiskFlow-like simulation controls.
"""
from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Optional


class SamplingConvention(str, Enum):
    DAILY = "daily"
    BULLET = "bullet"
    WEEKLY = "weekly"
    MONTHLY = "monthly"


@dataclass(frozen=True)
class SimulationConfig:
    """Core simulation controls (config.py:15-32)."""

    num_sims: int = 50_000
    seed: int = 1
    fast_forward: int = 0
    dt_days: int = 1
    horizon_days: int = 365
    days_in_year: float = 365.0


@dataclass(frozen=True)
class CounterpartyConfig:
    """Flat hazard-rate credit curve; LGD = 1 - recovery (config.py:35-43)."""

    hazard_rate: float
    recovery: float = 0.4


@dataclass(frozen=True)
class DiscountingConfig:
    """Flat continuously-compounded discount rate (config.py:46-51)."""

    rate: float
    collateral_rate: Optional[float] = None
