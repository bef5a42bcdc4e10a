from .stepper import CNDynamics, CNGrid, CNSchedule, BarrierSpec, cn_solve
from .american import AmericanFDMPricer
from .barrier import DiscreteBarrierFDMPricer
from .vanilla_fis import VanillaOptionPricerFIS

__all__ = [
    "CNDynamics",
    "CNGrid",
    "CNSchedule",
    "BarrierSpec",
    "cn_solve",
    "AmericanFDMPricer",
    "DiscreteBarrierFDMPricer",
    "VanillaOptionPricerFIS",
]
