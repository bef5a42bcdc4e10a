"""Exposure profiles and CVA — functional core, thin class wrapper.

Capability parity with the reference's ``cva.py:10-82``:

- EE   = mean positive exposure per scenario date (optionally deflated
         to t=0 with a flat discount factor);
- PFE  = q-quantile of positive exposure per date;
- CVA  = LGD * sum_i 0.5*(EE*_{i-1}+EE*_i) * (S_{i-1}-S_i) with
         flat-hazard survival S(t)=exp(-h t).

The per-date reductions run in one jit-compiled kernel on device; the
(n_steps, n_sims) exposure tensor never round-trips to host. The default
path in/out of :class:`XvaCalculator` mirrors the reference signatures so
the engine and tests read the same either way.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import CounterpartyConfig


@dataclass(frozen=True)
class ExposureProfile:
    times_days: np.ndarray
    ee: np.ndarray
    pfe: np.ndarray


@jax.jit
def _ee_pfe_kernel(mtm: jnp.ndarray, df0: jnp.ndarray, q: jnp.ndarray):
    """Deflated positive-exposure mean and quantile over the sim axis."""
    exposure = jnp.maximum(mtm, 0.0) * df0[:, None]
    return exposure.mean(axis=1), jnp.quantile(exposure, q, axis=1)


def exposure_profile(
    times_days,
    mtm_paths,
    *,
    pfe_quantile: float = 0.95,
    df0=None,
) -> ExposureProfile:
    """EE/PFE profile from an (n_steps, n_sims) mark-to-market tensor.

    ``df0`` (per-date deflators to t=0) defaults to 1 — undiscounted
    exposure, the convention the reference uses for PFE reporting.
    """
    times_days = np.asarray(times_days, dtype=float)
    mtm = jnp.asarray(mtm_paths)
    if mtm.ndim != 2 or mtm.shape[0] != times_days.size:
        raise ValueError("mtm_paths must be (n_steps, n_sims) aligned to times_days.")
    deflator = jnp.ones(times_days.size) if df0 is None else jnp.asarray(df0)
    ee, pfe = _ee_pfe_kernel(mtm, deflator, jnp.asarray(pfe_quantile))
    return ExposureProfile(
        times_days=times_days, ee=np.asarray(ee), pfe=np.asarray(pfe)
    )


def cva_trapezoid(ee_star: np.ndarray, survival: np.ndarray, lgd: float) -> float:
    """Unilateral CVA: LGD-weighted trapezoid of EE* against default mass."""
    ee_star = np.asarray(ee_star, dtype=float)
    survival = np.asarray(survival, dtype=float)
    mid_ee = 0.5 * (ee_star[1:] + ee_star[:-1])
    default_mass = -np.diff(survival)
    return float(lgd * np.dot(mid_ee, default_mass))


class XvaCalculator:
    """Reference-shaped facade over the functional pieces (cva.py:22-82)."""

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

    def build_exposure_profile(self, times_days, mtm_paths) -> ExposureProfile:
        t_years = np.asarray(times_days, dtype=float) / self.days_in_year
        df0 = (
            np.exp(-self.flat_discount_rate * t_years)
            if self.discount_to_zero
            else None
        )
        return exposure_profile(
            times_days, mtm_paths, pfe_quantile=self.q, df0=df0
        )

    def cva_from_ee(self, times_days, ee_star) -> float:
        times_days = np.asarray(times_days, dtype=float)
        ee_star = np.asarray(ee_star, dtype=float)
        if times_days.size != ee_star.size:
            raise ValueError("times_days and ee_star must have same length.")
        S = self.cp.survival(times_days / self.days_in_year)
        return cva_trapezoid(ee_star, S, self.cp.lgd)
