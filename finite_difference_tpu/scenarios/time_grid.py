"""RiskFlow time-grid conventions: Excel serial dates and grid strings.

Capability parity with the reference's grid/date utilities
(cs_simulation.py:54-216), which mirror riskflow's config.parse_grid and
utils.TimeGrid.set_base_date conventions:

- all dates are Excel serial day numbers (days since 1899-12-30);
- year fractions use DAYS_IN_YEAR = 365.25;
- a grid string like ``'0d 2d 1w(1w) 1m(1m) 3m(3m)'`` expands to a sorted
  set of day offsets from the run date, where ``start(repeat)`` segments
  tick until the next segment's start (or max_date).
"""
from __future__ import annotations

import re
from typing import Optional, Union

import numpy as np
import pandas as pd

DAYS_IN_YEAR = 365.25
EXCEL_OFFSET = pd.Timestamp("1899-12-30 00:00:00")
_OFFSET_LOOKUP = {"M": "months", "D": "days", "Y": "years", "W": "weeks"}

DateInput = Union[str, pd.Timestamp]


def _ts(d: DateInput) -> pd.Timestamp:
    return d if isinstance(d, pd.Timestamp) else pd.Timestamp(d)


def date_to_excel_days(ts: DateInput) -> int:
    """Excel serial day number of a date (cs_simulation.py:67-89)."""
    return (_ts(ts) - EXCEL_OFFSET).days


def excel_days_to_date(excel_days: float) -> pd.Timestamp:
    """Inverse of :func:`date_to_excel_days`."""
    return EXCEL_OFFSET + pd.Timedelta(days=int(excel_days))


def parse_offset(s: str) -> pd.DateOffset:
    """Parse '2d' / '1m' / '1y3m' into a DateOffset (cs_simulation.py:196-215).

    Compound offsets accumulate unit-value pairs, so '1y3m' is 1 year plus
    3 months.
    """
    pairs = re.findall(r"(\d+)([dDmMwWyY])", s)
    if not pairs:
        raise ValueError(f"Cannot parse offset: {s!r}")
    kwargs: dict = {}
    for value, unit in pairs:
        key = _OFFSET_LOOKUP[unit.upper()]
        kwargs[key] = kwargs.get(key, 0) + int(value)
    return pd.DateOffset(**kwargs)


def parse_time_grid(
    run_date: DateInput, max_date: DateInput, grid_string: str
) -> np.ndarray:
    """Expand a RiskFlow grid string into sorted day offsets from run_date.

    Mirrors cs_simulation.py:103-194 (itself riskflow config.parse_grid +
    TimeGrid.set_base_date): each ``start(repeat)`` segment generates dates
    from ``run_date + start`` stepping by ``repeat`` until it passes the next
    segment's start date or ``max_date``. Bare offsets contribute a single
    date. Returns ``np.ndarray[int]`` — the scen_time_grid.

    RiskFlow quirk kept for parity: a repeating segment that steps past
    ``max_date`` sets ``finish`` and stops the WHOLE parse, silently
    dropping later segments even when their start dates are inside the
    horizon (so e.g. ``'1w(1w) 2y 1m'`` — non-ascending — loses the
    ``1m`` point). Grid strings are ascending in every RiskFlow config;
    keep yours ascending too.
    """
    run_date, max_date = _ts(run_date), _ts(max_date)
    parsed = []
    for seg in grid_string.strip().split():
        if "(" in seg:
            start_str, repeat_str = seg.split("(")
            parsed.append((parse_offset(start_str), parse_offset(repeat_str.rstrip(")"))))
        else:
            parsed.append((parse_offset(seg), None))

    fixed = [(run_date + start, repeat) for start, repeat in parsed]
    fixed.append((pd.Timestamp.max, None))

    dates = set()
    finish = False
    for (date_rule, repeat), (next_start, _) in zip(fixed[:-1], fixed[1:]):
        next_date = date_rule
        if next_date > max_date:
            break
        dates.add(next_date)
        if repeat:
            while True:
                next_date = next_date + repeat
                if next_date > max_date:
                    finish = True
                    break
                if next_date > next_start:
                    break
                dates.add(next_date)
        if finish:
            break

    return np.array(sorted((d - run_date).days for d in dates))
