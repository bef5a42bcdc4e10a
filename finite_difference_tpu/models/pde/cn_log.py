"""Year-fraction CN discrete-barrier pricer (dataclass API).

Capability parity with the reference's ``discrete_barrier_fdm_pricer_cn.py``
(DiscreteBarrierCrankNicolsonLog, :26-537): the date-free engine taking
T / sigma / r / b directly with the auto grid-chooser —

- space: log grid covering spot/strike/barriers / 4x margins,
  dx = sigma sqrt(T) / 12 (>= 300 nodes);
- time: lambda = 0.5 sigma^2 dt/dx^2 ~= 0.4 target, >= N_space steps, and
  >= 10 steps per monitor interval (configure_grid, :59-118);
- KO projection at monitor steps; KI by parity against the closed-form BS
  vanilla (:359-428, 472-537); PDE or closed-form greeks.

The solve itself is the framework's jitted ``cn_solve``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ...ops.special import norm_cdf, norm_pdf
from .grid import uniform_schedule
from .stepper import BarrierSpec, CNDynamics, CNGrid, CNSchedule, cn_solve


@dataclass
class DiscreteBarrierCrankNicolsonLog:
    S0: float
    K: float
    T: float
    sigma: float
    r_disc: float
    b_carry: float
    option_type: str = "call"
    barrier_type: str = "none"
    lower_barrier: Optional[float] = None
    upper_barrier: Optional[float] = None
    rebate: float = 0.0
    rebate_at_hit: bool = False
    monitor_times: Optional[List[float]] = None
    N_space: Optional[int] = None
    N_time: Optional[int] = None
    rannacher_steps: int = 2

    _S_min: float = field(init=False, default=0.0)
    _S_max: float = field(init=False, default=0.0)

    # ------------------------------------------------------------------

    def configure_grid(self) -> None:
        """Auto space/time sizing (discrete_barrier_fdm_pricer_cn.py:59-118)."""
        if self.T <= 0.0:
            raise ValueError("T must be positive")
        if self.sigma <= 0.0:
            raise ValueError("sigma must be positive")
        if self.S0 <= 0.0:
            raise ValueError("S0 must be positive")

        candidates = [self.S0, self.K]
        if self.lower_barrier is not None and self.lower_barrier > 0:
            candidates.append(self.lower_barrier)
        if self.upper_barrier is not None and self.upper_barrier > 0:
            candidates.append(self.upper_barrier)
        S_min = max(1e-8, min(candidates) / 4.0)
        S_max = max(candidates) * 4.0
        if S_min >= S_max:
            S_min, S_max = self.S0 / 5.0, self.S0 * 5.0
        self._S_min, self._S_max = S_min, S_max

        x_range = math.log(S_max) - math.log(S_min)
        dx_target = self.sigma * math.sqrt(self.T) / 12.0
        if dx_target <= 0.0:
            dx_target = x_range / 300.0
        if self.N_space is None:
            self.N_space = max(int(math.ceil(x_range / dx_target)), 300)

        if self.N_time is None:
            dx = x_range / self.N_space
            lambda_target = 0.4
            n_opt = int(
                math.ceil(0.5 * self.sigma**2 * self.T / (lambda_target * dx * dx))
            )
            valid_mon = [t for t in (self.monitor_times or []) if 0.0 < t < self.T]
            self.N_time = max(n_opt, self.N_space, 10 * (len(valid_mon) + 1))

    # ------------------------------------------------------------------
    # closed-form vanilla (discrete_barrier_fdm_pricer_cn.py:359-428)
    # ------------------------------------------------------------------

    def _vanilla_bs_price_and_greeks(self) -> Dict[str, float]:
        S, K, T, sig = self.S0, self.K, self.T, self.sigma
        r, b = self.r_disc, self.b_carry
        sqrtT = math.sqrt(T)
        d1 = (math.log(S / K) + (b + 0.5 * sig**2) * T) / (sig * sqrtT)
        d2 = d1 - sig * sqrtT
        df_r = math.exp(-r * T)
        growth = math.exp((b - r) * T)
        is_call = self.option_type == "call"
        N = lambda x: float(norm_cdf(jnp.float64(x)))
        n = lambda x: float(norm_pdf(jnp.float64(x)))
        if is_call:
            price = S * growth * N(d1) - K * df_r * N(d2)
            delta = growth * N(d1)
        else:
            price = K * df_r * N(-d2) - S * growth * N(-d1)
            delta = -growth * N(-d1)
        gamma = growth * n(d1) / (S * sig * sqrtT)
        vega = S * growth * n(d1) * sqrtT
        theta_term = -(S * growth * n(d1) * sig) / (2 * sqrtT)
        if is_call:
            theta = (
                theta_term
                - (b - r) * S * growth * N(d1)
                - r * K * df_r * N(d2)
            )
        else:
            theta = (
                theta_term
                + (b - r) * S * growth * N(-d1)
                + r * K * df_r * N(-d2)
            )
        return {
            "price": price, "delta": delta, "gamma": gamma,
            "vega": vega, "theta": theta,
        }

    # ------------------------------------------------------------------
    # PDE solve
    # ------------------------------------------------------------------

    def _solve(
        self, apply_ko: bool, sigma: Optional[float] = None, spot: Optional[float] = None
    ) -> float:
        self.configure_grid()
        sig = sigma if sigma is not None else self.sigma
        s_eval = spot if spot is not None else self.S0
        x_min = math.log(self._S_min)
        dx = (math.log(self._S_max) - x_min) / self.N_space
        monitor = [t for t in (self.monitor_times or []) if 0.0 < t <= self.T]
        sch = uniform_schedule(
            self.T, self.N_time, self.rannacher_steps, monitor if apply_ko else []
        )
        ko_type = self.barrier_type.replace("in", "out")
        has_lower = apply_ko and "down" in ko_type and self.lower_barrier is not None
        has_upper = apply_ko and "up" in ko_type and self.upper_barrier is not None
        if apply_ko and "double" in ko_type:
            has_lower = self.lower_barrier is not None
            has_upper = self.upper_barrier is not None
        barrier = None
        if has_lower or has_upper:
            barrier = BarrierSpec(
                lower=jnp.float64(self.lower_barrier or 0.0),
                upper=jnp.float64(self.upper_barrier or 0.0),
                has_lower=jnp.asarray(bool(has_lower)),
                has_upper=jnp.asarray(bool(has_upper)),
                rebate=jnp.float64(self.rebate),
                rebate_at_hit=jnp.asarray(self.rebate_at_hit),
                rebate_rate=jnp.float64(self.r_disc),
            )
        dyn = CNDynamics(
            strike=jnp.float64(self.K),
            is_call=jnp.asarray(self.option_type == "call"),
            sigma=jnp.float64(sig),
            r=jnp.float64(self.r_disc),
            b=jnp.float64(self.b_carry),
            q=jnp.float64(0.0),
        )
        schedule = CNSchedule(
            dt=jnp.asarray(sch.dt),
            theta=jnp.asarray(sch.theta),
            tau_next=jnp.asarray(sch.tau_next),
            monitor=jnp.asarray(sch.monitor),
            div_amount=jnp.asarray(sch.div_amount),
            reset_lambda=jnp.asarray(sch.reset_lambda),
        )
        v, _ = cn_solve(
            CNGrid(jnp.float64(x_min), jnp.float64(dx)),
            dyn,
            schedule,
            n_nodes=self.N_space + 1,
            barrier=barrier,
        )
        s_grid = np.exp(x_min + dx * np.arange(self.N_space + 1))
        return float(np.interp(s_eval, s_grid, np.asarray(v)))

    def _pde_price_and_greeks(self, dv_sigma: float = 1e-4) -> Dict[str, float]:
        """Bump-based PDE greeks (discrete_barrier_fdm_pricer_cn.py:429-470)."""
        base = self._solve(apply_ko=True)
        ds = self.S0 * 1e-4
        up = self._solve(apply_ko=True, spot=self.S0 + ds)
        dn = self._solve(apply_ko=True, spot=self.S0 - ds)
        vega = (
            self._solve(apply_ko=True, sigma=self.sigma + dv_sigma) - base
        ) / dv_sigma
        return {
            "price": base,
            "delta": (up - dn) / (2 * ds),
            "gamma": (up - 2 * base + dn) / ds**2,
            "vega": vega,
        }

    # ------------------------------------------------------------------
    # public API (discrete_barrier_fdm_pricer_cn.py:472-537)
    # ------------------------------------------------------------------

    def price(self) -> float:
        if self.barrier_type == "none":
            return self._solve(apply_ko=False)
        if "in" in self.barrier_type:
            vanilla = self._vanilla_bs_price_and_greeks()["price"]
            return vanilla - self._solve(apply_ko=True)
        return self._solve(apply_ko=True)

    def greeks(self, dv_sigma: float = 1e-4) -> Dict[str, float]:
        if self.barrier_type == "none":
            return self._vanilla_bs_price_and_greeks()
        ko = self._pde_price_and_greeks(dv_sigma)
        if "in" in self.barrier_type:
            van = self._vanilla_bs_price_and_greeks()
            return {
                "price": van["price"] - ko["price"],
                "delta": van["delta"] - ko["delta"],
                "gamma": van["gamma"] - ko["gamma"],
                "vega": van["vega"] - ko["vega"],
            }
        return ko
