"""Interest-rate swap priced against a ScenarioCube.

Capability parity with the reference's ``ir_swap.py:23-279``: schedules
generated once at construction; per simulation date a pathwise yield curve
is built from the scenario curve factor, forwards resolved fixing-or-
forward, and both legs discounted; reset tuples (reset_date, curve_name,
p_start, p_end, is_overnight) feed the ExposureEngine's fixing caches; OIS
legs expose one-step compound factors that telescope to DF ratios.
"""
from __future__ import annotations

import datetime as dt
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..market_data.risk_factor import CurveSlice
from ..market_data.yield_curve import YieldCurve
from .cashflow import LegType, SwapLeg, leg_pv
from .instrument import Instrument
from .schedule import ScheduleConfig, build_overnight_tenors, generate_sub_periods


class IRSwap(Instrument):
    def __init__(
        self,
        name: str,
        effective_date: dt.date,
        maturity_date: dt.date,
        notional: float,
        receive_leg: SwapLeg,
        pay_leg: SwapLeg,
        discount_curve_name: str,
        schedule_config: Optional[ScheduleConfig] = None,
        calendar: str = "ZAR",
        business_convention: str = "ModifiedFollowing",
        termination_business_convention: str = "ModifiedFollowing",
        date_generation: str = "Backward",
        day_count: str = "ACT/365",
        curve_day_count: str = "ACT/365",
        include_sim_date_cashflows: bool = False,
        ois_initial_cfs: Optional[Dict[Tuple[str, dt.date], float]] = None,
    ):
        super().__init__(name)
        self._ois_initial_cfs = ois_initial_cfs or {}
        self.effective_date = effective_date
        self.maturity_date = maturity_date
        self.notional = notional
        self.receive_leg = receive_leg
        self.pay_leg = pay_leg
        self.discount_curve_name = discount_curve_name
        self.include_sim_date_cashflows = include_sim_date_cashflows

        self.schedule_config = schedule_config or ScheduleConfig(
            calendar=calendar,
            business_convention=business_convention,
            termination_business_convention=termination_business_convention,
            date_generation=date_generation,
            day_count=day_count,
            curve_day_count=curve_day_count,
        )
        self._generate_schedules()

    def _generate_schedules(self) -> None:
        self.receive_schedule = self.schedule_config.build(
            self.effective_date, self.maturity_date, self.receive_leg.frequency
        )
        self.pay_schedule = self.schedule_config.build(
            self.effective_date, self.maturity_date, self.pay_leg.frequency
        )
        self._effective_maturity: dt.date = max(
            max(p for _, _, p, _ in self.receive_schedule),
            max(p for _, _, p, _ in self.pay_schedule),
        )

    # ------------------------------------------------------------------
    # reset / fixing interface (ir_swap.py:100-129)
    # ------------------------------------------------------------------

    def get_reset_dates(self) -> List[Tuple[dt.date, str, dt.date, dt.date, bool]]:
        resets: List[Tuple[dt.date, str, dt.date, dt.date, bool]] = []
        sc = self.schedule_config
        for schedule, leg in (
            (self.receive_schedule, self.receive_leg),
            (self.pay_schedule, self.pay_leg),
        ):
            if leg.leg_type != LegType.FLOATING:
                continue
            if leg.reset_frequency_months > 0:
                for pay_start, pay_end, _, _ in schedule:
                    for sub_start, sub_end, _ in generate_sub_periods(
                        pay_start, pay_end, leg.reset_frequency_months,
                        sc.cal, sc.business_convention, sc.day_count,
                        direction="Backward",
                    ):
                        resets.append(
                            (sub_start, leg.curve_name, sub_start, sub_end, False)
                        )
            else:
                for start, end, _, _ in schedule:
                    resets.append(
                        (start, leg.curve_name, start, end, leg.overnight_compounding)
                    )
        return resets

    def compute_cf_increment(
        self,
        curve_name: str,
        t_from: dt.date,
        t_to: dt.date,
        time_slice: Dict[str, object],
    ) -> np.ndarray:
        """One-step OIS compound factor over [t_from, t_to] (ir_swap.py:131-176).

        Telescoping product of DF ratios over the business-day grid equals
        1/DF(t_to) on the curve seen at t_from.
        """
        sc = self.schedule_config
        fwd_slice: CurveSlice = time_slice[curve_name]
        fwd_curve = YieldCurve(year_fracs=fwd_slice.tenors, rates=fwd_slice.values)
        t_sched = build_overnight_tenors(
            t_from, t_to, val_date=t_from, calendar=sc.cal,
            curve_day_count=sc.curve_day_count,
        )
        dfs = fwd_curve.discount_factor(t_sched)  # (n_paths, n_bdays+1)
        return np.prod(dfs[:, :-1] / dfs[:, 1:], axis=1)

    def compute_fixings(
        self,
        resets: List[Tuple[dt.date, str, dt.date, dt.date]],
        time_slice: Dict[str, object],
        scenario_date: dt.date,
    ) -> Dict[Tuple[str, dt.date], np.ndarray]:
        """Forward rates for resets from an earlier scenario's curve
        (ir_swap.py:179-233)."""
        fixings: Dict[Tuple[str, dt.date], np.ndarray] = {}
        sc = self.schedule_config
        leg_by_curve = {
            leg.curve_name: leg
            for leg in (self.receive_leg, self.pay_leg)
            if leg.leg_type == LegType.FLOATING and leg.curve_name
        }
        from .schedule import add_months, adjust

        for _reset_date, curve_name, p_start, p_end in resets:
            fwd_slice: CurveSlice = time_slice[curve_name]
            fwd_curve = YieldCurve(
                year_fracs=fwd_slice.tenors, rates=fwd_slice.values
            )
            t_start = sc.curve_year_fraction(scenario_date, p_start)
            leg = leg_by_curve.get(curve_name)
            if leg is not None and leg.fixing_tenor_months is not None:
                fix_end = adjust(
                    add_months(p_start, leg.fixing_tenor_months),
                    sc.cal,
                    leg.forward_business_convention or "ModifiedFollowing",
                )
                t_end = sc.curve_year_fraction(scenario_date, fix_end)
                fwd_tau = sc.year_fraction(p_start, fix_end)
                rate = fwd_curve.forward_rate(t_start, t_end, tau=fwd_tau)
            else:
                t_end = sc.curve_year_fraction(scenario_date, p_end)
                rate = fwd_curve.forward_rate(t_start, t_end)
            fixings[(curve_name, p_start)] = rate
        return fixings

    # ------------------------------------------------------------------
    # pricing (ir_swap.py:236-279)
    # ------------------------------------------------------------------

    def scenario_npvs(
        self,
        val_date: dt.date,
        market_state: Dict[str, object],
        fixings: Optional[Dict[Tuple[str, dt.date], np.ndarray]] = None,
        rng=None,
    ) -> np.ndarray:
        disc_slice: CurveSlice = market_state[self.discount_curve_name]
        n_paths = disc_slice.values.shape[0]

        if val_date > self._effective_maturity:
            return np.zeros(n_paths)

        discount_curve = YieldCurve(
            year_fracs=disc_slice.tenors, rates=disc_slice.values
        )
        include_on_date = (
            self.include_sim_date_cashflows or val_date == self._effective_maturity
        )
        common = dict(
            notional=self.notional,
            val_date=val_date,
            market_state=market_state,
            discount_curve=discount_curve,
            n_paths=n_paths,
            schedule_config=self.schedule_config,
            fixings=fixings,
            include_on_val_date=include_on_date,
        )
        rec_pv = leg_pv(self.receive_schedule, self.receive_leg, **common)
        pay_pv = leg_pv(self.pay_schedule, self.pay_leg, **common)
        return rec_pv - pay_pv
