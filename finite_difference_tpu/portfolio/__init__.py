"""Portfolio layer: netting sets, trades, CSA terms.

Reconstructions of the reference dump's missing ``portfolio.*`` modules
(SURVEY §2.9) from call sites in exposure_engine.py:113-130,552-648.
"""
from .csa import CSA, CloseOutMethod, InitialMarginMethod
from .netting_set import NettingSet, Trade
from .simm import SimmConfig, SimmParams, simm_im

__all__ = [
    "CSA",
    "CloseOutMethod",
    "InitialMarginMethod",
    "NettingSet",
    "Trade",
    "SimmConfig",
    "SimmParams",
    "simm_im",
]
