"""The test_1.py IRSwap FA workflow on synthetic curves (goldens pinned).

The reference's FA golden PVs (334439.05 pay / -27800.25 total,
/root/reference/test_1.py:65-80) are unreproducible — its market-data CSVs
and `instruments/ir_swap/pricer.py` are absent from the dump — so the
workflow shape (hermite-RT curves -> pay/receive leg PV -> FA diff table)
is pinned here on synthetic curves instead (PARITY.md: "workflow parity,
goldens synthetic").
"""
import datetime as dt

import numpy as np
import pytest

from finite_difference_tpu.runners.irswap_fa import (
    IRSwapFAPricer,
    run_irswap_fa_check,
    synthetic_zar_curves,
)

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2030, 7, 28)


def _swap(**kw):
    discount, receive = synthetic_zar_curves(VAL)
    base = dict(
        effective_date=VAL, maturity_date=MAT, notional=1_000_000,
        value_date=VAL, receive_curve=receive, discount_curve=discount,
    )
    base.update(kw)
    return IRSwapFAPricer(**base)


class TestIRSwapFAWorkflow:
    def test_synthetic_goldens(self):
        """Pinned synthetic-curve PVs for the full pay/receive/net table."""
        swap = _swap()
        assert swap.pay_leg_pv() == pytest.approx(327214.7213617418, rel=1e-12)
        assert swap.receive_leg_pv() == pytest.approx(316727.46266538475, rel=1e-12)
        assert swap.net_pv() == pytest.approx(-10487.258696357021, rel=1e-10)

    def test_fa_diff_table(self, capsys):
        out = run_irswap_fa_check(334439.05, -27800.25)
        printed = capsys.readouterr().out
        assert "Relative difference in Pay Leg PV" in printed
        assert "FA Total PV: -27,800.25" in printed
        assert out["rel_diff_pay"] == pytest.approx(
            (out["pay_pv"] - 334439.05) / 334439.05
        )
        # synthetic curves land in the FA neighbourhood for the legs
        assert abs(out["rel_diff_pay"]) < 0.05
        assert abs(out["rel_diff_receive"]) < 0.05

    def test_pay_leg_is_fixed_annuity(self):
        """Pay PV == fixed_rate * sum(DF(pay) * accrual) * notional."""
        swap = _swap()
        annuity = 0.0
        for p_start, p_end, pay_date, accrual in swap.pay_schedule:
            t = swap.sc.curve_year_fraction(VAL, pay_date)
            annuity += float(swap.discount_curve.discount_factor([t])[0, 0]) * accrual
        assert swap.pay_leg_pv() == pytest.approx(0.08 * annuity * 1e6, rel=1e-12)

    def test_receive_leg_decreases_with_spread(self):
        lo = _swap(receive_spread=0.0).receive_leg_pv()
        hi = _swap(receive_spread=0.02).receive_leg_pv()
        # spread PV == spread * float-leg annuity
        swap = _swap()
        annuity = sum(
            float(swap.discount_curve.discount_factor(
                [swap.sc.curve_year_fraction(VAL, pay)])[0, 0]) * acc
            for _, _, pay, acc in swap.receive_schedule
        )
        assert hi - lo == pytest.approx(0.02 * annuity * 1e6, rel=1e-10)

    def test_quarterly_modfollowing_schedule(self):
        swap = _swap()
        assert len(swap.pay_schedule) == 20  # 5y quarterly
        for start, end, pay, accrual in swap.pay_schedule:
            assert swap.sc.cal.is_working_day(start)
            assert swap.sc.cal.is_working_day(end)
            assert 0.2 < accrual < 0.3

    def test_forward_fixing_tenor_used(self):
        """3m-JIBAR forwards (fixing_tenor_months=3, Following) differ from
        plain period forwards when the period end is adjusted differently."""
        with_tenor = _swap(fixing_tenor_months=3).receive_leg_pv()
        without = _swap(fixing_tenor_months=None).receive_leg_pv()
        assert with_tenor != without
        assert with_tenor == pytest.approx(without, rel=1e-3)
