"""XVA / exposure layer (L4).

The commodity CVA stack (config -> time grid -> reference price -> forward
MTM -> EE/PFE/CVA) with capability parity to the reference's xva_engine
package, plus the netting-set exposure engine and instruments.
"""
from .config import (
    CounterpartyConfig,
    DiscountingConfig,
    SamplingConvention,
    SimulationConfig,
)
from .time_grid import TimeGrid
from .reference_price import FixingSchedule, ReferencePrice
from .commodity_forward import CommodityForward
from .cva import ExposureProfile, XvaCalculator
from .engine import CommodityXvaEngine, RunResult
from .exposure_engine import ExposureEngine, ExposureProfile as NettingExposureProfile
from .device_exposure import DeviceExposureEngine, hw1f_cva_pipeline

__all__ = [
    "CounterpartyConfig",
    "DiscountingConfig",
    "SamplingConvention",
    "SimulationConfig",
    "TimeGrid",
    "FixingSchedule",
    "ReferencePrice",
    "CommodityForward",
    "ExposureProfile",
    "XvaCalculator",
    "CommodityXvaEngine",
    "RunResult",
    "ExposureEngine",
    "DeviceExposureEngine",
    "hw1f_cva_pipeline",
    "NettingExposureProfile",
]
