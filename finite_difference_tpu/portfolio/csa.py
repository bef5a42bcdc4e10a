"""CSA (credit support annex) terms.

Reconstruction of the absent ``portfolio/csa.py`` from
exposure_engine.py:573-648: MPOR lookback, VM thresholds in both
directions, IM methods (NONE / FIXED supported; SCHEDULE / SIMM declared),
close-out method with optional risky-curve substitution (a single name or a
per-currency dict).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, Optional, Union


class CloseOutMethod(Enum):
    STANDARD = "standard"
    FORWARD = "forward"


class InitialMarginMethod(Enum):
    NONE = "none"
    FIXED = "fixed"
    SCHEDULE = "schedule"
    SIMM = "simm"


@dataclass(frozen=True)
class CSA:
    mpor_days: int = 10
    vm_threshold: float = 0.0
    vm_threshold_post: float = 0.0
    im_method: InitialMarginMethod = InitialMarginMethod.NONE
    im_amount: float = 0.0
    close_out_method: CloseOutMethod = CloseOutMethod.STANDARD
    risky_curve_name: Optional[Union[str, Dict[str, str]]] = None
