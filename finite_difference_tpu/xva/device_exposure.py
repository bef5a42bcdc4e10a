"""Device-resident exposure fast path.

The generic :class:`~finite_difference_tpu.xva.exposure_engine.ExposureEngine`
is host-orchestrated per date x trade (faithful to the reference's
exposure_engine.py:166-201). For instruments whose pricing is a pure
function of the curve cube — IRSwap-style fixed/float legs — the whole
dates x paths x periods computation is ONE dense contraction:

    zero rates at every (date, query) = einsum('tpn,tnm->tpm', cube, W)

where W is the (n_times, n_tenors, m) HermiteRT weight tensor built on
host from the tenor grid and the schedule alone (interpolation is linear
in the node values — see market_data/yield_curve.py). Forward fixings
frozen at reset follow the engine's convention exactly: the curve
snapshot is the nearest-prior scenario row (gathered on device), with
year-fractions measured from the reset date.

This runs under ``jax.jit`` on whatever backend holds the cube — the
intended production shape is scenario generation (scenarios/, models.mc)
and exposure in one device program, with only the EE/PFE profile
returned to host. Validated against ExposureEngine bit-for-bit-level
(1e-10) in tests/test_device_exposure.py.
"""
from __future__ import annotations

import datetime as dt
from bisect import bisect_right
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..instruments.cashflow import LegType, SwapLeg
from ..instruments.ir_swap import IRSwap
from ..instruments.schedule import ScheduleConfig, add_months, adjust
from ..market_data.yield_curve import _hermite_rt_weights, _tangent_matrix
from .exposure_engine import ExposureProfile


@dataclass
class DeviceLegTensors:
    """Host-precomputed fixed-shape tensors for one swap leg."""

    curve_name: str                     # projection curve ("" for fixed legs)
    discount_name: str
    sign: float                         # +receive / -pay
    notional: float
    spread: float
    fixed_rate: float
    is_fixed: bool
    accrual: np.ndarray                 # (m,)
    live: np.ndarray                    # (n_times, m) bool
    W_disc: np.ndarray                  # (n_times, n_tenors, m)
    t_pay: np.ndarray                   # (n_times, m)
    # floating only (None for fixed legs):
    W_f0: Optional[np.ndarray] = None   # (n_times, n_tenors, m) fwd-start
    W_f1: Optional[np.ndarray] = None   # fwd-end
    t_f0: Optional[np.ndarray] = None   # (n_times, m)
    t_f1: Optional[np.ndarray] = None
    tau_fwd: Optional[np.ndarray] = None        # (m,)
    fixed_mask: Optional[np.ndarray] = None     # (n_times, m) bool
    fix_row: Optional[np.ndarray] = None        # (m,) int
    Wfz0: Optional[np.ndarray] = None   # (n_tenors, m) frozen-fixing weights
    Wfz1: Optional[np.ndarray] = None
    tfz0: Optional[np.ndarray] = None   # (m,)
    tfz1: Optional[np.ndarray] = None
    tau_frozen: Optional[np.ndarray] = None  # (m,)


def _weights_for(tenors: np.ndarray, tq: np.ndarray, Tm) -> np.ndarray:
    """HermiteRT weight matrix (n_tenors, m) for one query row."""
    return _hermite_rt_weights(tenors, tq, tangent_mat=Tm)


def build_irswap_leg_tensors(
    swap: IRSwap,
    schedule,
    leg: SwapLeg,
    sign: float,
    scenario_dates: Sequence[dt.date],
    tenors: np.ndarray,
) -> DeviceLegTensors:
    """Precompute the leg's schedule/interpolation tensors (host)."""
    if leg.overnight_compounding or leg.reset_frequency_months > 0:
        raise NotImplementedError(
            "device exposure path supports fixed and simple-forward floating "
            "legs; OIS/compounded legs use the generic ExposureEngine"
        )
    sc: ScheduleConfig = swap.schedule_config
    dates = list(scenario_dates)
    n_times = len(dates)
    m = len(schedule)
    Tm = _tangent_matrix(tenors) if tenors.size > 1 else None

    accrual = np.array([acc for _, _, _, acc in schedule])
    live = np.zeros((n_times, m), dtype=bool)
    t_pay = np.zeros((n_times, m))
    is_float = leg.leg_type == LegType.FLOATING

    # fixing windows (floating)
    if is_float:
        f_end = []
        for p_start, p_end, _, _ in schedule:
            if leg.fixing_tenor_months is not None:
                fe = adjust(
                    add_months(p_start, leg.fixing_tenor_months), sc.cal,
                    leg.forward_business_convention or "ModifiedFollowing",
                )
            else:
                fe = p_end
            f_end.append(fe)
        tau_fwd = np.array(
            [
                sc.year_fraction(p_start, fe)
                if leg.fixing_tenor_months is not None
                else sc.curve_year_fraction(dates[0], fe)  # placeholder
                for (p_start, _, _, _), fe in zip(schedule, f_end)
            ]
        )
        t_f0 = np.zeros((n_times, m))
        t_f1 = np.zeros((n_times, m))
        fixed_mask = np.zeros((n_times, m), dtype=bool)
        fix_row = np.zeros(m, dtype=np.int64)

    for t_idx, d in enumerate(dates):
        include = swap.include_sim_date_cashflows or d == swap._effective_maturity
        for i, (p_start, p_end, pay, acc) in enumerate(schedule):
            live[t_idx, i] = pay > d or (pay == d and include)
            t_pay[t_idx, i] = max(0.0, sc.curve_year_fraction(d, pay))
            if is_float:
                t_f0[t_idx, i] = sc.curve_year_fraction(d, max(p_start, d))
                t_f1[t_idx, i] = sc.curve_year_fraction(d, f_end[i])
                # the engine stamps the fixing once reset_date (= p_start)
                # <= sim date; leg_pv then uses it for p_start <= val_date
                fixed_mask[t_idx, i] = p_start <= d

    W_disc = np.stack([_weights_for(tenors, t_pay[t], Tm) for t in range(n_times)])

    kw: Dict = {}
    if is_float:
        # per-period tau when the accrual period itself is the window:
        # leg_pv uses t_end - t_start as seen from the sim date, which for
        # p_start >= d equals cyf(p_start, p_end)-ish only under ACT
        # conventions — replicate leg_pv exactly: tau = t1 - t0 per date
        # unless an explicit fixing tenor sets a fixed tau.
        if leg.fixing_tenor_months is None:
            tau_fwd = None  # computed per (t, i) on device as t1 - t0
        W_f0 = np.stack([_weights_for(tenors, t_f0[t], Tm) for t in range(n_times)])
        W_f1 = np.stack([_weights_for(tenors, t_f1[t], Tm) for t in range(n_times)])
        # frozen fixings: curve snapshot at nearest-prior row to the reset
        # (p_start), year-fractions measured from the reset date itself
        tfz0 = np.zeros(m)
        tfz1 = np.zeros(m)
        tauz = np.zeros(m)
        for i, (p_start, p_end, _, _) in enumerate(schedule):
            fix_row[i] = max(0, bisect_right(dates, p_start) - 1)
            tfz0[i] = sc.curve_year_fraction(p_start, p_start)  # 0.0
            tfz1[i] = sc.curve_year_fraction(p_start, f_end[i])
            tauz[i] = (
                sc.year_fraction(p_start, f_end[i])
                if leg.fixing_tenor_months is not None
                else tfz1[i] - tfz0[i]
            )
        kw = dict(
            W_f0=W_f0, W_f1=W_f1, t_f0=t_f0, t_f1=t_f1,
            tau_fwd=tau_fwd, fixed_mask=fixed_mask, fix_row=fix_row,
            Wfz0=_weights_for(tenors, tfz0, Tm),
            Wfz1=_weights_for(tenors, tfz1, Tm),
            tfz0=tfz0, tfz1=tfz1, tau_frozen=tauz,
        )

    return DeviceLegTensors(
        curve_name=leg.curve_name or "",
        discount_name=swap.discount_curve_name,
        sign=sign,
        notional=float(swap.notional),
        spread=float(leg.spread),
        fixed_rate=float(leg.fixed_rate),
        is_fixed=leg.leg_type == LegType.FIXED,
        accrual=accrual,
        live=live,
        W_disc=W_disc,
        t_pay=t_pay,
        **kw,
    )


def build_irswap_tensors(
    swap: IRSwap, scenario_dates: Sequence[dt.date], tenors: np.ndarray
) -> List[DeviceLegTensors]:
    return [
        build_irswap_leg_tensors(
            swap, swap.receive_schedule, swap.receive_leg, +1.0,
            scenario_dates, tenors,
        ),
        build_irswap_leg_tensors(
            swap, swap.pay_schedule, swap.pay_leg, -1.0, scenario_dates, tenors
        ),
    ]


def _leg_mtm(leg: DeviceLegTensors, curves: Dict[str, "jnp.ndarray"]):
    """(n_times, n_paths) MTM of one leg; pure jnp, jit-able."""
    import jax.numpy as jnp

    disc = curves[leg.discount_name]  # (n_times, n_paths, n_tenors)
    r_pay = jnp.einsum("tpn,tnm->tpm", disc, jnp.asarray(leg.W_disc))
    df_pay = jnp.exp(-r_pay * jnp.asarray(leg.t_pay)[:, None, :])

    if leg.is_fixed:
        rate = jnp.asarray(leg.fixed_rate)
        rate = jnp.broadcast_to(rate, df_pay.shape)
    else:
        fwd_cube = curves[leg.curve_name]
        r0 = jnp.einsum("tpn,tnm->tpm", fwd_cube, jnp.asarray(leg.W_f0))
        r1 = jnp.einsum("tpn,tnm->tpm", fwd_cube, jnp.asarray(leg.W_f1))
        t0 = jnp.asarray(leg.t_f0)[:, None, :]
        t1 = jnp.asarray(leg.t_f1)[:, None, :]
        df0 = jnp.exp(-r0 * jnp.maximum(t0, 0.0))
        df1 = jnp.exp(-r1 * jnp.maximum(t1, 0.0))
        if leg.tau_fwd is not None:
            tau = jnp.asarray(leg.tau_fwd)[None, None, :]
        else:
            tau = t1 - t0
        tau_safe = jnp.where(tau <= 0.0, 1.0, tau)
        live_fwd = jnp.where(tau <= 0.0, 0.0, (df0 / df1 - 1.0) / tau_safe)

        # frozen fixings: gather the reset-row curve snapshot per period
        snap = fwd_cube[jnp.asarray(leg.fix_row)]  # (m, n_paths, n_tenors)
        rz0 = jnp.einsum("mpn,nm->pm", snap, jnp.asarray(leg.Wfz0))
        rz1 = jnp.einsum("mpn,nm->pm", snap, jnp.asarray(leg.Wfz1))
        dfz0 = jnp.exp(-rz0 * jnp.maximum(jnp.asarray(leg.tfz0), 0.0)[None, :])
        dfz1 = jnp.exp(-rz1 * jnp.maximum(jnp.asarray(leg.tfz1), 0.0)[None, :])
        tauz = jnp.asarray(leg.tau_frozen)[None, :]
        tauz_safe = jnp.where(tauz <= 0.0, 1.0, tauz)
        frozen = jnp.where(tauz <= 0.0, 0.0, (dfz0 / dfz1 - 1.0) / tauz_safe)

        rate = jnp.where(
            jnp.asarray(leg.fixed_mask)[:, None, :], frozen[None, :, :], live_fwd
        )

    live = jnp.asarray(leg.live)[:, None, :]
    return (
        jnp.einsum(
            "tpm,tpm,m->tp",
            df_pay,
            (rate + leg.spread) * live,
            jnp.asarray(leg.accrual),
        )
        * (leg.sign * leg.notional)
    )


_prepend_today_jit = None


def _prepend_today(rates, today_row):
    """Fused t=0-slice prepend (one dispatch, jit cached)."""
    global _prepend_today_jit
    if _prepend_today_jit is None:
        import jax
        import jax.numpy as jnp

        def k(r, row):
            today = jnp.broadcast_to(
                row[None, None, :], (1, r.shape[1], row.shape[0])
            )
            return jnp.concatenate([today, r], axis=0)

        _prepend_today_jit = jax.jit(k)
    return _prepend_today_jit(rates, today_row)


def hw1f_cva_pipeline(
    simulator,
    base_date: dt.date,
    scen_days: Sequence[int],
    tenors: np.ndarray,
    n_paths: int,
    instruments: Sequence[IRSwap],
    *,
    curve_name: str = "ZAR-SWAP",
    hazard_rate: float = 0.02,
    recovery: float = 0.4,
    flat_discount_rate: float = 0.0,
    pfe_quantile: float = 0.95,
    seed: int = 42,
    notional_scales=None,
    days_in_year: float = 365.25,
) -> Dict:
    """Scenario generation -> exposure -> CVA with the cube device-resident.

    The production shape (BASELINE.json config 5 closed fully on device):
    an exact HW1F yield-curve simulation (models.mc.hw1f) feeds the
    device exposure kernel directly as a jax array — the
    (n_times, n_paths, n_tenors) cube never leaves HBM; only the EE/PFE
    profile (n_times-sized) and the CVA scalar come back to host.
    """
    import jax.numpy as jnp

    from .cva import cva_trapezoid, exposure_profile

    scen_days = np.asarray(sorted(scen_days), dtype=np.int64)
    if scen_days.size == 0 or scen_days[0] <= 0:
        raise ValueError("scen_days must be strictly positive (t=0 implicit).")
    t_years = scen_days / float(days_in_year)
    tau = np.asarray(tenors, dtype=np.float64)

    rates = simulator.simulate(t_years, tau, n_paths, seed=seed, as_jax=True)
    cube = _prepend_today(rates, jnp.asarray(simulator._zero_rate0(tau)))
    dates = [base_date] + [
        base_date + dt.timedelta(days=int(d)) for d in scen_days
    ]

    engine = DeviceExposureEngine(dates, {curve_name: cube}, tau)
    mtm = engine.mtm(instruments, notional_scales)  # device (n_paths, n_times)

    times_days = np.concatenate([[0], scen_days]).astype(float)
    df0 = np.exp(-flat_discount_rate * times_days / days_in_year)
    prof = exposure_profile(
        times_days, mtm.T, pfe_quantile=pfe_quantile, df0=df0
    )
    survival = np.exp(-hazard_rate * times_days / days_in_year)
    cva = cva_trapezoid(prof.ee, survival, lgd=1.0 - recovery)
    return {
        "profile": prof,
        "cva": cva,
        "mtm": mtm,  # still device-resident; np.asarray(...) to pull
        "dates": dates,
    }


# DeviceLegTensors as a pytree: arrays are leaves (so the jitted netting
# kernel takes them as ARGUMENTS — no giant baked-in constants, no
# retrace per call), names/flags are static aux data.
_LEG_AUX = ("curve_name", "discount_name", "is_fixed")
_LEG_LEAVES = tuple(
    f for f in DeviceLegTensors.__dataclass_fields__ if f not in _LEG_AUX
)


def _leg_flatten(leg: DeviceLegTensors):
    return (
        tuple(getattr(leg, f) for f in _LEG_LEAVES),
        tuple(getattr(leg, f) for f in _LEG_AUX),
    )


def _leg_unflatten(aux, children):
    kw = dict(zip(_LEG_LEAVES, children))
    kw.update(dict(zip(_LEG_AUX, aux)))
    return DeviceLegTensors(**kw)


def _register_leg_pytree():
    import jax

    jax.tree_util.register_pytree_node(
        DeviceLegTensors, _leg_flatten, _leg_unflatten
    )


_register_leg_pytree()


def _netting_mtm_kernel(curves, legs, scales):
    total = None
    for leg_t, scale in zip(legs, scales):
        piece = _leg_mtm(leg_t, curves) * scale
        total = piece if total is None else total + piece
    return total.T  # (n_paths, n_times)


_netting_mtm_jit = None


def _netting_mtm(curves, legs, scales):
    global _netting_mtm_jit
    if _netting_mtm_jit is None:
        import jax

        _netting_mtm_jit = jax.jit(_netting_mtm_kernel)
    return _netting_mtm_jit(curves, legs, scales)


# leg tensors are pure functions of (instrument, dates, tenors): cache them
# so steady-state pipeline calls skip the host schedule/weight rebuild.
_LEG_CACHE: Dict[tuple, tuple] = {}


def _legs_for(instruments, dates, tenors):
    key = (
        tuple(id(i) for i in instruments),
        tuple(dates),
        np.asarray(tenors).tobytes(),
    )
    hit = _LEG_CACHE.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[0], instruments)):
        return hit[1]
    legs = tuple(
        leg_t
        for inst in instruments
        for leg_t in build_irswap_tensors(inst, list(dates), np.asarray(tenors))
    )
    _LEG_CACHE[key] = (tuple(instruments), legs)
    if len(_LEG_CACHE) > 64:
        _LEG_CACHE.pop(next(iter(_LEG_CACHE)))
    return legs


class DeviceExposureEngine:
    """All-dates exposure for device-expressible netting sets.

    ``curves``: dict name -> (n_times, n_paths, n_tenors) cube array (numpy
    or jax; stays wherever it lives). ``tenors``: shared tenor grid.
    """

    def __init__(
        self,
        scenario_dates: Sequence[dt.date],
        curves: Dict[str, np.ndarray],
        tenors: np.ndarray,
    ) -> None:
        self.dates = list(scenario_dates)
        self.curves = curves
        self.tenors = np.asarray(tenors, dtype=np.float64)

    def mtm(self, instruments: Sequence[IRSwap], notional_scales=None):
        """(n_paths, n_times) netting-set MTM as one jitted program.

        Leg tensors are cached per (instruments, dates, tenors) and passed
        to one module-level jitted kernel as pytree arguments, so repeated
        calls (a pricing service, the CVA pipeline) pay host cost once.
        """
        import jax.numpy as jnp

        legs = _legs_for(tuple(instruments), self.dates, self.tenors)
        notional_scales = notional_scales or [1.0] * len(instruments)
        scales = jnp.asarray(
            [float(s) for s, inst in zip(notional_scales, instruments)
             for _ in range(2)]
        )
        curve_dev = {k: jnp.asarray(v) for k, v in self.curves.items()}
        return _netting_mtm(curve_dev, legs, scales)

    def compute(
        self, instruments: Sequence[IRSwap], netting_set_id: str = "NS",
        currency: str = "ZAR", notional_scales=None,
    ) -> ExposureProfile:
        mtm = np.asarray(self.mtm(instruments, notional_scales))
        net = mtm
        return ExposureProfile(
            netting_set_id=netting_set_id,
            dates=tuple(self.dates),
            mtm=mtm,
            collateral=np.zeros_like(mtm),
            exposure=np.maximum(net, 0.0),
            neg_exposure=np.minimum(net, 0.0),
            currency=currency,
        )
