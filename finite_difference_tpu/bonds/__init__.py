"""Bond / rates / inflation pricers (L4b).

QuantLib-free reimplementations with capability parity to the reference's
zero_coupon package: zero-coupon bonds, fixed-rate bonds (BESA accrued,
YTM, val01, gamma), FRAs, inflation-linked bonds (spot and forward), and
the fixed-vs-CPI inflation swap.
"""
from .zero_coupon import ZeroCouponBond, ZeroCouponBondPricer
from .fixed_rate import FixedRateBond, FixedRateBondPricer
from .fra import ForwardRateAgreement, ForwardRateAgreementPricer
from .inflation_bond import ForwardInflationBondPricer, InflationLinkedBondPricer
from .inflation_swap import InflationLinkedSwap, InflationLinkedSwapPricer

__all__ = [
    "ZeroCouponBond",
    "ZeroCouponBondPricer",
    "FixedRateBond",
    "FixedRateBondPricer",
    "ForwardRateAgreement",
    "ForwardRateAgreementPricer",
    "ForwardInflationBondPricer",
    "InflationLinkedBondPricer",
    "InflationLinkedSwap",
    "InflationLinkedSwapPricer",
]
