import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.utils import (
    DailyNacaCurve,
    SouthAfricaCalendar,
    discount_factor,
    flat_naca_dataframe,
    naca_to_nacc,
    nacc_to_naca,
    year_fraction,
)
from finite_difference_tpu.utils.calendars import build_monitoring_dates, easter_sunday
from finite_difference_tpu.utils.curves import flat_curve


class TestRates:
    def test_roundtrip(self):
        for r in [0.0, 0.05, 0.12, -0.01]:
            assert naca_to_nacc(nacc_to_naca(r)) == pytest.approx(r, abs=1e-14)

    def test_reference_values(self):
        # reference utils.py docstring examples
        assert nacc_to_naca(0.05) == pytest.approx(0.05127109637602412, abs=1e-15)
        assert naca_to_nacc(0.05) == pytest.approx(0.04879016416943204, abs=1e-15)

    def test_discount_methods(self):
        assert discount_factor(0.05, 2.0, "continuous") == pytest.approx(np.exp(-0.1))
        assert discount_factor(0.05, 2.0, "simple") == pytest.approx(1 / 1.1)
        assert discount_factor(0.05, 2.0, "compounded", 2) == pytest.approx(1.025 ** -4)
        assert discount_factor(0.05, 2.0, "discount") == pytest.approx(0.9)


class TestDayCount:
    def test_act365(self):
        d0, d1 = dt.date(2025, 1, 1), dt.date(2025, 12, 31)
        assert year_fraction(d0, d1, "ACT/365") == pytest.approx(364 / 365)

    def test_act360(self):
        d0, d1 = dt.date(2025, 1, 1), dt.date(2025, 7, 1)
        assert year_fraction(d0, d1, "ACT/360") == pytest.approx(181 / 360)

    def test_30_360(self):
        assert year_fraction(dt.date(2025, 1, 31), dt.date(2025, 7, 31), "30/360") == (
            pytest.approx(180 / 360)
        )

    def test_negative_is_zero(self):
        assert year_fraction(dt.date(2025, 2, 1), dt.date(2025, 1, 1)) == 0.0


class TestCalendar:
    def setup_method(self):
        self.cal = SouthAfricaCalendar()

    def test_easter(self):
        assert easter_sunday(2025) == dt.date(2025, 4, 20)
        assert easter_sunday(2026) == dt.date(2026, 4, 5)

    def test_known_holidays_2025(self):
        assert not self.cal.is_working_day(dt.date(2025, 4, 18))  # Good Friday
        assert not self.cal.is_working_day(dt.date(2025, 4, 21))  # Family Day
        assert not self.cal.is_working_day(dt.date(2025, 1, 1))
        assert not self.cal.is_working_day(dt.date(2025, 12, 25))
        assert not self.cal.is_working_day(dt.date(2025, 8, 9))  # Saturday, still hol
        assert self.cal.is_working_day(dt.date(2025, 8, 8))

    def test_sunday_observance(self):
        # 2026-03-21 Human Rights Day is a Saturday -> no Monday observance
        assert self.cal.is_working_day(dt.date(2026, 3, 23))
        # 2025-06-16 Youth day is a Monday
        assert not self.cal.is_working_day(dt.date(2025, 6, 16))
        # 2027-12-26 is a Sunday -> Monday 2027-12-27 observed
        assert not self.cal.is_working_day(dt.date(2027, 12, 27))

    def test_add_working_days(self):
        # Friday + 1 bd = Monday (no holidays that weekend)
        assert self.cal.add_working_days(dt.date(2025, 8, 1), 1) == dt.date(2025, 8, 4)
        # zero offset returns input unchanged (workalendar semantics)
        assert self.cal.add_working_days(dt.date(2025, 8, 2), 0) == dt.date(2025, 8, 2)
        # crossing Good Friday/Family Day 2025
        assert self.cal.add_working_days(dt.date(2025, 4, 17), 1) == dt.date(2025, 4, 22)

    def test_monitoring_dates_daily(self):
        out = build_monitoring_dates(dt.date(2025, 8, 1), dt.date(2025, 8, 11), "daily")
        assert out == [
            dt.date(2025, 8, 4),
            dt.date(2025, 8, 5),
            dt.date(2025, 8, 6),
            dt.date(2025, 8, 7),
            dt.date(2025, 8, 8),
            dt.date(2025, 8, 11),
        ]


class TestCurves:
    def test_flat_df_and_forward(self):
        val = dt.date(2025, 7, 28)
        df_frame = flat_naca_dataframe(0.05)
        curve = DailyNacaCurve(df_frame, val)
        d = dt.date(2026, 7, 28)
        tau = 365 / 365
        assert curve.get_discount_factor(d) == pytest.approx(1.05 ** -tau)
        # forward NACC of a flat NACA curve == ln(1 + naca)
        fwd = curve.get_forward_nacc_rate(dt.date(2025, 8, 28), dt.date(2026, 2, 28))
        assert fwd == pytest.approx(np.log(1.05), rel=1e-12)

    def test_out_of_range_raises(self):
        curve = flat_curve(0.05, dt.date(2025, 7, 28))
        with pytest.raises(ValueError):
            curve.get_discount_factor(dt.date(1999, 1, 1))

    def test_vectorized_matches_scalar(self):
        curve = flat_curve(0.07, dt.date(2025, 7, 28))
        dates = [dt.date(2025, 9, 1), dt.date(2026, 3, 15), dt.date(2027, 1, 4)]
        dfs = curve.discount_factors(dates)
        for d, v in zip(dates, dfs):
            assert curve.get_discount_factor(d) == pytest.approx(float(v), rel=1e-15)
