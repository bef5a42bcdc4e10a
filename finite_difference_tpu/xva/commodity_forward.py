"""Commodity forward product.

Capability parity with the reference's ``commodity_forward.py:12-53``:
MTM(t, path) = DF(t -> cashflow day) * notional * (reference - strike),
with the maturity day being the CASHFLOW/SETTLEMENT day. The TPU version
values every scenario date at once (``mtm_all``); the reference's per-date
``mtm`` remains as a thin slice for API parity.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .config import DiscountingConfig
from .reference_price import ReferencePrice


@dataclass(frozen=True)
class CommodityForward:
    maturity_day: int
    strike: float
    notional: float
    reference_price: ReferencePrice
    discounting: DiscountingConfig

    @staticmethod
    def discount_factor(t_day, T_day: float, days_in_year: float, r: float):
        tau = jnp.maximum((T_day - t_day) / float(days_in_year), 0.0)
        return jnp.exp(-r * tau)

    def mtm_all(
        self,
        scen_days: np.ndarray,
        curves: jnp.ndarray,  # (n_steps, n_tenors, n_sims)
        tenor_days: np.ndarray,
        days_in_year: float,
    ) -> jnp.ndarray:
        """MTM paths for all scenario dates: (n_steps, n_sims)."""
        ref = self.reference_price.compute_all(scen_days, curves, tenor_days)
        df = self.discount_factor(
            jnp.asarray(scen_days, jnp.float64),
            float(self.maturity_day),
            float(days_in_year),
            float(self.discounting.rate),
        )
        return df[:, None] * float(self.notional) * (ref - float(self.strike))

    def mtm(
        self,
        scen_index: int,
        scen_day: float,
        scen_curve: jnp.ndarray,  # (n_tenors, n_sims)
        tenor_days: np.ndarray,
        days_in_year: float,
    ) -> jnp.ndarray:
        """Single-date API mirror (commodity_forward.py:31-53)."""
        return self.mtm_all(
            np.array([float(scen_day)]),
            jnp.asarray(scen_curve)[None, :, :],
            tenor_days,
            days_in_year,
        )[0]
