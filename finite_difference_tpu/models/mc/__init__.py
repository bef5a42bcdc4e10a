from .rng import SobolNormalRng, threefry_normals, norm_icdf
from .gbm import GBMParams, GBMSimulator
from .clewlow_strickland import CSParams, CSForwardCurveSimulator
from .discrete_barrier import MCConfig, price_discrete_barrier_mc

__all__ = [
    "SobolNormalRng",
    "threefry_normals",
    "norm_icdf",
    "GBMParams",
    "GBMSimulator",
    "CSParams",
    "CSForwardCurveSimulator",
    "MCConfig",
    "price_discrete_barrier_mc",
]
