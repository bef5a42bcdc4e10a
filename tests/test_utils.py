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


class TestZeroCurve:
    def test_df_and_zero_rate(self):
        import datetime as dt
        import math
        from finite_difference_tpu.utils import ZeroCurve

        val = dt.date(2025, 7, 28)
        curve = ZeroCurve(
            [0.05, 0.06, 0.07],
            [dt.date(2026, 7, 28), dt.date(2027, 7, 28), dt.date(2030, 7, 28)],
            val,
        )
        t1 = (dt.date(2026, 7, 28) - val).days / 365.0
        assert curve.get_discount_factor(dt.date(2026, 7, 28)) == pytest.approx(
            math.exp(-0.05 * t1), rel=1e-12
        )
        assert curve.get_zero_rate(dt.date(2027, 7, 28)) == pytest.approx(0.06)
        # on/before value date -> DF 1
        assert curve.get_discount_factor(val) == 1.0
        # flat extrapolation beyond last node
        far = curve.get_zero_rate(dt.date(2040, 1, 1))
        assert far == pytest.approx(0.07)

    def test_simple_forward(self):
        import datetime as dt
        from finite_difference_tpu.utils import ZeroCurve

        val = dt.date(2025, 7, 28)
        curve = ZeroCurve([0.06, 0.06], [dt.date(2026, 7, 28), dt.date(2030, 7, 28)], val)
        f = curve.forward_rate(dt.date(2026, 7, 28), dt.date(2027, 7, 28))
        # flat 6% NACC -> simple forward = (e^{0.06*tau} - 1)/tau
        import math
        tau = 365.0 / 365.0
        assert f == pytest.approx((math.exp(0.06 * tau) - 1.0) / tau, rel=1e-9)

    def test_discount_factor_methods(self):
        import datetime as dt
        import math
        from finite_difference_tpu.utils import discount_factor_methods as dfm

        d0, d1 = dt.date(2025, 7, 28), dt.date(2026, 7, 28)
        t = 365.0 / 365.0
        assert dfm(0.05, d0, d1, "continuous") == pytest.approx(math.exp(-0.05 * t))
        assert dfm(0.05, d0, d1, "simple") == pytest.approx(1 / (1 + 0.05 * t))
        assert dfm(0.05, d0, d1, "compounded", compounding_frequency=2) == pytest.approx(
            1 / (1 + 0.025) ** 2
        )
        assert dfm(0.05, d0, d1, "discount") == pytest.approx(1 - 0.05 * t)
        with pytest.raises(ValueError):
            dfm(0.05, d0, d1, "bogus")


class TestCPITermStructure:
    def test_history_and_projection(self):
        import datetime as dt
        from finite_difference_tpu.market_data import CPITermStructure, shift_months

        val = dt.date(2025, 7, 28)
        hist = {shift_months(dt.date(2025, 7, 1), -k): 100.0 + k for k in range(0, 10)}
        ts = CPITermStructure(
            historical_cpi=hist,
            inflation_zero_rates=[(dt.date(2026, 7, 28), 5.0), (dt.date(2030, 7, 28), 5.5)],
            value_date=val,
        )
        # past date resolves through BESA history
        past = ts.cpi(dt.date(2025, 7, 1))
        assert past == hist[dt.date(2025, 3, 1)]
        # one year out, CPI grows by ~ (1.05)
        base = ts.cpi(val)
        fut = ts.cpi(dt.date(2026, 7, 28))
        assert fut / base == pytest.approx(1.05, rel=1e-3)
        assert ts.index_ratio(dt.date(2026, 7, 28), val) == pytest.approx(
            fut / base
        )


class TestProfiling:
    def test_throughput_harness(self):
        import jax.numpy as jnp

        from finite_difference_tpu.utils.profiling import throughput

        res = throughput(lambda: jnp.ones(16) * 2.0, items_per_call=16,
                         iters=3, warmup=1)
        assert res["seconds_per_call"] > 0
        assert res["items_per_sec"] > 0

    def test_trace_context(self, tmp_path):
        import jax.numpy as jnp

        from finite_difference_tpu.utils.profiling import trace

        logdir = str(tmp_path / "trace")
        with trace(logdir) as d:
            (jnp.arange(8) * 2).sum().block_until_ready()
        assert d == logdir
        import os
        assert os.path.isdir(logdir) and os.listdir(logdir)
