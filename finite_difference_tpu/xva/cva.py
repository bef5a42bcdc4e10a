"""Exposure profiles and CVA.

Capability parity with the reference's ``cva.py:10-82``:
- EE = mean positive exposure per date (optionally deflated to t=0);
- PFE = q-quantile of positive exposure;
- CVA = sum LGD * 0.5*(EE_{i-1}+EE_i) * (S_{i-1}-S_i) with flat-hazard
  survival S(t) = exp(-h t).
Reductions run on device (the (n_steps, n_sims) exposure tensor never
returns to host until the profile is built).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .config import CounterpartyConfig


@dataclass(frozen=True)
class ExposureProfile:
    times_days: np.ndarray
    ee: np.ndarray
    pfe: np.ndarray


class XvaCalculator:
    def __init__(
        self,
        counterparty: CounterpartyConfig,
        days_in_year: float,
        pfe_quantile: float = 0.95,
        discount_to_zero: bool = True,
        flat_discount_rate: float = 0.0,
    ) -> None:
        self.cp = counterparty
        self.days_in_year = float(days_in_year)
        self.q = float(pfe_quantile)
        self.discount_to_zero = bool(discount_to_zero)
        self.flat_discount_rate = float(flat_discount_rate)

    def _survival(self, t_years: np.ndarray) -> np.ndarray:
        return np.exp(-float(self.cp.hazard_rate) * t_years)

    def _df0(self, t_years: np.ndarray) -> np.ndarray:
        return np.exp(-float(self.flat_discount_rate) * t_years)

    def build_exposure_profile(self, times_days, mtm_paths) -> ExposureProfile:
        times_days = np.asarray(times_days, dtype=float)
        mtm = jnp.asarray(mtm_paths)
        if mtm.ndim != 2 or mtm.shape[0] != times_days.size:
            raise ValueError("mtm_paths must be (n_steps, n_sims) aligned to times_days.")

        t_years = times_days / self.days_in_year
        exposure = jnp.maximum(mtm, 0.0)
        if self.discount_to_zero:
            exposure = exposure * jnp.asarray(self._df0(t_years))[:, None]

        ee = np.asarray(exposure.mean(axis=1))
        pfe = np.asarray(jnp.quantile(exposure, self.q, axis=1))
        return ExposureProfile(times_days=times_days, ee=ee, pfe=pfe)

    def cva_from_ee(self, times_days, ee_star) -> float:
        times_days = np.asarray(times_days, dtype=float)
        ee_star = np.asarray(ee_star, dtype=float)
        if times_days.size != ee_star.size:
            raise ValueError("times_days and ee_star must have same length.")
        S = self._survival(times_days / self.days_in_year)
        lgd = 1.0 - float(self.cp.recovery)
        avg_ee = 0.5 * (ee_star[:-1] + ee_star[1:])
        dp = S[:-1] - S[1:]
        return float(np.sum(lgd * avg_ee * dp))
