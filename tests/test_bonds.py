import datetime as dt
import math

import numpy as np
import pytest

from finite_difference_tpu.bonds import (
    FixedRateBond,
    FixedRateBondPricer,
    ForwardInflationBondPricer,
    ForwardRateAgreement,
    ForwardRateAgreementPricer,
    InflationLinkedBondPricer,
    InflationLinkedSwap,
    InflationLinkedSwapPricer,
    ZeroCouponBond,
    ZeroCouponBondPricer,
)
from finite_difference_tpu.market_data import HistoricalCPI
from finite_difference_tpu.utils.curves import flat_curve

VAL = dt.date(2025, 7, 28)


def _curve(naca=0.07):
    return flat_curve(naca, VAL)


class TestZeroCoupon:
    def test_pv(self):
        curve = _curve(np.exp(0.06) - 1.0)  # 6% NACC
        bond = ZeroCouponBond(1_000_000, dt.date(2027, 7, 28))
        pv = ZeroCouponBondPricer(bond, curve).present_value()
        t = curve.year_fraction(VAL, bond.maturity_date)
        assert pv == pytest.approx(1_000_000 * math.exp(-0.06 * t), rel=1e-9)

    def test_pv01_sign_and_magnitude(self):
        curve = _curve()
        bond = ZeroCouponBond(1_000_000, dt.date(2030, 7, 28))
        p = ZeroCouponBondPricer(bond, curve)
        pv01 = p.pv01()
        # ~5y duration: PV01 ~ T * PV * 1bp
        t = curve.year_fraction(VAL, bond.maturity_date)
        assert pv01 == pytest.approx(t * p.present_value() * 1e-4, rel=1e-3)

    def test_validation(self):
        with pytest.raises(ValueError):
            ZeroCouponBond(-1, dt.date(2026, 1, 1))
        with pytest.raises(TypeError):
            ZeroCouponBond(100, "2026-01-01")


def _frb(coupon=0.08):
    return FixedRateBond(
        notional=100.0,
        issue_date=dt.date(2020, 1, 28),
        value_date=VAL,
        last_coupon_date=dt.date(2025, 7, 15),
        next_coupon_date=dt.date(2026, 1, 15),
        maturity_date=dt.date(2030, 1, 15),
        coupon_rate=coupon,
    )


class TestFixedRateBond:
    def test_schedule_semiannual(self):
        b = _frb()
        assert b.schedule[0] == dt.date(2026, 1, 15)
        assert b.schedule[-1] == dt.date(2030, 1, 15)
        assert len(b.schedule) == 9

    def test_dirty_clean_accrued(self):
        pr = FixedRateBondPricer(_frb(), _curve())
        dirty = pr.dirty_price()
        accrued = pr.accrued_amount()
        assert dirty > 0
        # cum-interest: settle well before book close, accrued from LCD
        days = (VAL - dt.date(2025, 7, 15)).days
        assert accrued == pytest.approx(days * 0.08 * 100 / 365)
        assert pr.clean_price() == pytest.approx(dirty - accrued)

    def test_ytm_round_trip(self):
        pr = FixedRateBondPricer(_frb(), _curve())
        ytm = pr.yield_to_maturity()
        assert pr._dirty_from_yield(ytm) == pytest.approx(pr.dirty_price(), abs=1e-8)
        # flat 7% NACA curve -> ytm in a sane band
        assert 0.03 < ytm < 0.12

    def test_val01_gamma_signs(self):
        pr = FixedRateBondPricer(_frb(), _curve())
        # reference convention: val01 = -(dP/dy)*bump > 0 for a long bond
        assert pr.val01() > 0
        assert pr.gamma() > 0  # convexity

    def test_ex_coupon_accrued_negative(self):
        """Settling inside the ex period accrues negatively from NCD."""
        b = FixedRateBond(
            notional=100.0,
            issue_date=dt.date(2020, 1, 28),
            value_date=dt.date(2026, 1, 10),  # within 10 bd of NCD
            last_coupon_date=dt.date(2025, 7, 15),
            next_coupon_date=dt.date(2026, 1, 15),
            maturity_date=dt.date(2030, 1, 15),
            coupon_rate=0.08,
        )
        pr = FixedRateBondPricer(b, flat_curve(0.07, b.value_date))
        assert pr.accrued_amount() < 0


class TestFRA:
    def test_forward_matches_curve(self):
        curve = _curve(np.exp(0.06) - 1.0)
        fra = ForwardRateAgreement(
            settle_date=dt.date(2025, 10, 28),
            maturity_date=dt.date(2026, 1, 28),
            position="long", strike_rate=0.05, notional=1_000_000,
        )
        pr = ForwardRateAgreementPricer(fra, curve)
        tau = curve.year_fraction(fra.settle_date, fra.maturity_date)
        expected_fwd = (math.exp(0.06 * tau) - 1.0) / tau
        assert pr.forward_rate() == pytest.approx(expected_fwd, rel=1e-9)

    def test_npv_zero_at_fair_strike(self):
        curve = _curve()
        fra = ForwardRateAgreement(
            settle_date=dt.date(2025, 10, 28),
            maturity_date=dt.date(2026, 1, 28),
            position="long", strike_rate=0.05, notional=1_000_000,
        )
        pr = ForwardRateAgreementPricer(fra, curve)
        fair = pr.forward_rate()
        fra2 = ForwardRateAgreement(
            settle_date=fra.settle_date, maturity_date=fra.maturity_date,
            position="long", strike_rate=fair, notional=1_000_000,
        )
        assert ForwardRateAgreementPricer(fra2, curve).npv() == pytest.approx(0.0, abs=1e-9)

    def test_long_short_antisymmetry(self):
        curve = _curve()
        common = dict(
            settle_date=dt.date(2025, 10, 28), maturity_date=dt.date(2026, 1, 28),
            strike_rate=0.05, notional=1_000_000,
        )
        long_npv = ForwardRateAgreementPricer(
            ForwardRateAgreement(position="long", **common), curve
        ).npv()
        short_npv = ForwardRateAgreementPricer(
            ForwardRateAgreement(position="short", **common), curve
        ).npv()
        assert long_npv == pytest.approx(-short_npv)
        assert long_npv > 0  # fwd (~7%) above 5% strike


def _cpi(infl=0.05):
    df = lambda d: math.exp(-infl * (d - VAL).days / 365.0)
    hist = {dt.date(2025, m, 1): 100.0 * math.exp(infl * (m - 6) / 12) for m in range(1, 8)}
    return HistoricalCPI(VAL, hist, discount_factor_fn=df, extend_cpi=120)


class TestInflationBond:
    def _bond(self, **kw):
        return InflationLinkedBondPricer(
            issue_date=dt.date(2020, 1, 15),
            maturity_date=dt.date(2030, 1, 15),
            notional=1_000_000,
            coupon_rate=0.025,
            value_date=VAL,
            discount_curve=_curve(),
            historical_cpi=_cpi(),
            base_cpi=80.0,
            **kw,
        )

    def test_prices_and_accrued(self):
        b = self._bond()
        dirty = b.dirty_price()
        clean = b.clean_price()
        accrued = b.accrued_interest()
        assert dirty > clean and accrued > 0
        assert b.index_ratio() > 1.0
        assert b.pv() == pytest.approx(dirty / 100 * 1_000_000)

    def test_higher_inflation_raises_price(self):
        lo = InflationLinkedBondPricer(
            issue_date=dt.date(2020, 1, 15), maturity_date=dt.date(2030, 1, 15),
            notional=1e6, coupon_rate=0.025, value_date=VAL,
            discount_curve=_curve(), historical_cpi=_cpi(0.02), base_cpi=80.0,
        ).dirty_price()
        hi = InflationLinkedBondPricer(
            issue_date=dt.date(2020, 1, 15), maturity_date=dt.date(2030, 1, 15),
            notional=1e6, coupon_rate=0.025, value_date=VAL,
            discount_curve=_curve(), historical_cpi=_cpi(0.08), base_cpi=80.0,
        ).dirty_price()
        assert hi > lo

    def test_forward_pricer(self):
        bond = self._bond()
        fwd = ForwardInflationBondPricer(
            underlying_bond=bond, forward_date=dt.date(2026, 7, 28)
        )
        s = fwd.summary()
        assert s["forward_dirty_price"] > 0
        assert s["forward_dirty_price"] == pytest.approx(
            s["forward_clean_price"] + s["forward_accrued"]
        )
        # strike defaulted to forward clean -> NPV 0
        assert s["npv"] == pytest.approx(0.0, abs=1e-9)

    def test_forward_npv_long_short(self):
        bond = self._bond()
        long = ForwardInflationBondPricer(
            underlying_bond=bond, forward_date=dt.date(2026, 7, 28),
            strike_price=50.0, position="long",
        ).npv()
        short = ForwardInflationBondPricer(
            underlying_bond=bond, forward_date=dt.date(2026, 7, 28),
            strike_price=50.0, position="short",
        ).npv()
        assert long == pytest.approx(-short) and long > 0

    def test_forward_date_validation(self):
        with pytest.raises(ValueError):
            ForwardInflationBondPricer(
                underlying_bond=self._bond(), forward_date=VAL
            )


class TestInflationSwap:
    def _swap(self, fixed=0.05, pay_fixed=True):
        return InflationLinkedSwap(
            issue_date=dt.date(2025, 1, 28),
            maturity_date=dt.date(2030, 7, 28),
            notional=1_000_000,
            fixed_rate=fixed,
            historical_cpi=_cpi(),
            yield_curve=_curve(),
            value_date=VAL,
            pay_fixed_leg=pay_fixed,
        )

    def test_fair_rate_zeroes_npv(self):
        pr = InflationLinkedSwapPricer(self._swap())
        fair = pr.fair_fixed_rate()
        pr2 = InflationLinkedSwapPricer(self._swap(fixed=fair))
        assert pr2.npv() == pytest.approx(0.0, abs=1e-6)

    def test_pay_receive_antisymmetry(self):
        a = InflationLinkedSwapPricer(self._swap(pay_fixed=True)).npv()
        b = InflationLinkedSwapPricer(self._swap(pay_fixed=False)).npv()
        assert a == pytest.approx(-b)
