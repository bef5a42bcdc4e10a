from .stepper import CNDynamics, CNGrid, CNSchedule, BarrierSpec, cn_solve
from .american import AmericanFDMPricer
from .american_black76 import AmericanFwdFDMPricer
from .barrier import DiscreteBarrierFDMPricer
from .cn_log import DiscreteBarrierCrankNicolsonLog
from .hybrid import DiscreteBarrierFDMPricerAnalytic
from .crosscheck import MarketParams, QLDiscreteBarrierPricer, fis_time_steps
from .fis_stencil import DiscreteBarrierFDMPricer2
from .vanilla_fis import VanillaOptionPricerFIS
from .risk import front_arena_style_spot_curve, risk_reprice_spot, risk_spot_scenario
from .order_accuracy import (
    compute_empirical_order,
    diagnose_order_of_accuracy,
    greek_order_of_accuracy,
    predict_truncation_error,
)
from .spectral import spectral_solve

__all__ = [
    "spectral_solve",
    "CNDynamics",
    "CNGrid",
    "CNSchedule",
    "BarrierSpec",
    "cn_solve",
    "AmericanFDMPricer",
    "AmericanFwdFDMPricer",
    "DiscreteBarrierFDMPricer",
    "DiscreteBarrierCrankNicolsonLog",
    "DiscreteBarrierFDMPricerAnalytic",
    "MarketParams",
    "QLDiscreteBarrierPricer",
    "fis_time_steps",
    "DiscreteBarrierFDMPricer2",
    "VanillaOptionPricerFIS",
    "front_arena_style_spot_curve",
    "risk_reprice_spot",
    "risk_spot_scenario",
    "compute_empirical_order",
    "diagnose_order_of_accuracy",
    "greek_order_of_accuracy",
    "predict_truncation_error",
]
