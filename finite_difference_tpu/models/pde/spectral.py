"""Spectral (sine-basis) propagator for the discretely-monitored CN solve.

The batched CN stepper (`stepper.cn_solve`) marches n_steps sequential
tridiagonal solves; on TPU that time axis is the binding constraint
(docs/PERF_NOTES.md: the kernel sits at the sequential-step bound, and the
"residual headroom is algorithmic — fewer sequential steps"). For the
production discrete-barrier pricer (discrete_barrier_fdm_pricer.py:442-547
semantics: uniform dt, Rannacher at the start, KO projection at monitor
steps ONLY, escrowed dividends so no jumps inside the solve) the operator
between monitor dates is LINEAR with CONSTANT coefficients — so the whole
march collapses to a handful of MXU matmuls:

* The interior CN operator ``L = tri(a, b, c)`` on the uniform log-grid is
  similar to a symmetric Toeplitz tridiagonal via ``D = diag(g^i)``,
  ``g = sqrt(a/c)``; its eigenvectors are the discrete sine modes
  ``phi_k(i) = sin(pi k i / (M+1))`` with eigenvalues
  ``lambda_k = b + 2 sqrt(ac) cos(pi k/(M+1))`` — independent of the data.
* One theta-step ``(I - th dt L) v' = (I + (1-th) dt L) v + boundary`` is,
  per sine mode, the scalar affine recursion ``w' = rho_k w + f_k`` with
  ``rho_k = (1 + (1-th) dt l_k)/(1 - th dt l_k)``.
* The Dirichlet boundary forcing is a sum of two exponentials in tau
  (``e^{-r tau}`` and ``e^{(b-q-r) tau}``, stepper._boundary_values). Each
  exponential channel is pinned to a DISCRETE eigen-profile
  ``u_i = kp zeta_+^{i-(n-1)} + km zeta_-^i`` (roots of
  ``c z^2 + (b - omega) z + a = 0``) that the theta-step maps to exactly
  ``q`` times itself, boundary forcing included. Subtracting the channels
  before a stage and adding them back after makes the mode recursion
  purely homogeneous: ``w(m) = rho^m (w(0) - sum_ch e_ch u_ch) + ...`` —
  no geometric boundary sums, and the transformed amplitudes shrink to
  the residual (time-value) scale, which is what keeps f32 accurate.
* A KO projection overwrites grid values (including the edge nodes) in
  real space; the step immediately after therefore sees ACTUAL boundary
  values that differ from the asymptotics. That enters the closed form as
  one extra rank-2 term ``rho^{m-1} (1-th) [P (v_lo - v_min(tau_s)) + Q
  (v_hi - v_max(tau_s))] / (1 - th dt l)`` — kept exactly.

Per monitor interval the work is: elementwise closed-form update of the
(M,) mode vector, one inverse DST (an (B, M) x (M, M) matmul on the MXU),
the masked projection, and one forward DST. 512 sequential steps become
~n_monitors+1 matmul rounds. In exact arithmetic this path IS cn_solve;
tests pin f64 agreement at ~1e-9 across barrier types/rebates/Rannacher.

f32 notes (hard-won, see the stable helpers below): alpha ~ sigma^2/dx^2
reaches 1e5 while the eigenvalues lambda_k and the channel discriminants
are O(1) — every difference of O(alpha)-sized terms (lambda, ln g, the
root residual zeta_+ - 1, rho - 1) must be formed in cancellation-free
positive/residual form, and the DST matmuls must run at
``Precision.HIGHEST`` (TPU default bf16 passes destroy the transform).

Applicability (enforced by the driver): non-American, no discrete dividend
jumps inside the solve (the barrier pricer's escrowed-dividend model), the
uniform_schedule layout, a bounded symmetrizer exponent
``M |ln g| = M |mu_x| dx / sigma^2`` (`symmetrizer_exponent`), and
non-degenerate channel root pairs (`channel_conditioning`); otherwise
fall back to the scan. Reference: discrete_barrier_fdm_pricer.py uses the
same uniform-dt + monitor-projection structure this exploits.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .stepper import BarrierSpec, CNDynamics, CNGrid, _boundary_values, _payoff

# True-f32 matmuls for the DST transforms: the TPU default (bf16 passes)
# has ~3 decimal digits and destroys the sine reconstruction.
_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


# --------------------------------------------------------------------------- #
# Host-side: interval structure from the monitor layout                        #
# --------------------------------------------------------------------------- #
def spectral_intervals(monitor: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(k_end, apply_proj) arrays, shape (B, M_iv), from (B, n_steps) flags.

    ``monitor[b, k-1]`` means the KO projection fires after tau index k
    (grid.uniform_schedule). Intervals end at each monitor index and at
    n_steps; padding repeats k_end = n_steps with apply_proj = False
    (a zero-length no-op interval in the closed form).
    """
    monitor = np.asarray(monitor, dtype=bool)
    if monitor.ndim == 1:
        monitor = monitor[None, :]
    B, n = monitor.shape
    ends = [np.flatnonzero(m) + 1 for m in monitor]
    n_iv = max((len(e) + (0 if len(e) and e[-1] == n else 1)) for e in ends)
    k_end = np.full((B, n_iv), n, dtype=np.int32)
    apply_proj = np.zeros((B, n_iv), dtype=bool)
    for b, e in enumerate(ends):
        k_end[b, : len(e)] = e
        apply_proj[b, : len(e)] = True
        # the final interval (to n) is already padded in; if the last
        # monitor IS at n its apply flag stays True and the pad is a no-op
    return k_end, apply_proj


def symmetrizer_exponent(
    sigma: np.ndarray, b: np.ndarray, q: np.ndarray, dx: np.ndarray, n_nodes: int
) -> np.ndarray:
    """max_i |i ln g| per trade — the f32/f64 overflow guard for D = g^i."""
    sig2 = np.asarray(sigma, dtype=float) ** 2
    mu_x = (np.asarray(b, float) - np.asarray(q, float)) - 0.5 * sig2
    # ln g = 0.5 ln(a/c), a = alpha - beta, c = alpha + beta,
    # alpha = sig2/(2 dx^2), beta = mu_x/(2 dx)
    ratio = np.asarray(dx, float) * mu_x / sig2  # = beta/alpha
    ratio = np.clip(ratio, -0.999999, 0.999999)
    ln_g = 0.5 * (np.log1p(-ratio) - np.log1p(ratio))
    return np.abs(ln_g) * (n_nodes - 2)


# --------------------------------------------------------------------------- #
# Device-side closed-form pieces                                               #
# --------------------------------------------------------------------------- #
# The CN amplification rho = (1 + (1-th) z)/(1 - th z), z = dt*lambda, and
# the boundary ratio q = e^{lq} both sit within one ulp of 1 for the low
# (physically dominant) modes — in f32 the textbook (rho^m - q^m)/(rho - q)
# loses EVERYTHING to cancellation there. All powers and geometric kernels
# are therefore computed from the cancellation-free residuals
#   rho - 1 = z/denom,   rho - q = (z((1-th) + th q) - expm1(lq))/denom
# via expm1/log1p, falling back to direct powers only when rho <= 0.5
# (where the denominators are O(1) and nothing cancels).


def _log_rho(z, theta):
    """(log|rho|, rho_negative) for rho = (1 + (1-theta) z)/(1 - theta z).

    The log is interval-INVARIANT (z and theta are), so the interval scan
    precomputes it once and each stage pays a single exp — on the f64 rung
    the x64-emulated transcendentals are a large share of the solve.
    """
    denom = 1.0 - theta * z
    ratio = z / denom  # rho - 1, exact form
    rho = 1.0 + ratio
    near = rho > 0.5
    log_mag = jnp.where(
        near,
        jnp.log1p(jnp.where(near, ratio, 0.0)),
        jnp.log(jnp.maximum(jnp.abs(jnp.where(near, -1.0, rho)), 1e-300)),
    )
    return log_mag, (~near) & (rho < 0.0)


def _pow_from_log(log_mag, negative, m):
    """rho^m from the precomputed (log|rho|, sign) pair, m >= 0 integer."""
    mf = m.astype(log_mag.dtype)
    mag = jnp.exp(mf * log_mag)
    odd = jnp.mod(mf, 2.0) > 0.5
    out = jnp.where(negative & odd, -mag, mag)
    return jnp.where(m > 0.5, out, jnp.ones_like(out))


def _stage_switch_fns(rho_cache, P, Q, ud_bar, alphas):
    """(stage, switch) closures shared by the uniform-dt and
    per-interval-dt propagator branches — identical math, different
    closed-over per-(interval|schedule) constants.

    ``stage(w, m, theta, d_lo, d_hi)``: m homogeneous theta-steps on a
    channel-residual state; (d_lo, d_hi) are the j=0 deviations of the
    actual previous-boundary values from the asymptotics (nonzero right
    after a projection).
    ``switch(w, tau, sign)``: re-base the residual between CN and
    implicit channel profiles (+1 = CN-residual -> implicit-residual,
    -1 = back)."""

    def stage(w, m, theta, d_lo, d_hi):
        log_mag, neg, denom = rho_cache[theta]
        w_new = _pow_from_log(log_mag, neg, m) * w
        corr = (1.0 - theta) * (P * d_lo + Q * d_hi) / denom
        return w_new + _pow_from_log(
            log_mag, neg, jnp.maximum(m - 1, 0)
        ) * jnp.where(m > 0.5, corr, jnp.zeros_like(corr))

    def switch(w, tau, sign):
        for a_r, ud in zip(alphas, ud_bar):
            w = w + sign * jnp.exp(a_r * tau) * ud
        return w

    return stage, switch


def channel_conditioning(
    sigma, b, q, r, dx, dt, n_nodes: int
) -> np.ndarray:
    """min |det| of the boundary-channel 2x2 edge solves per trade (host).

    The spectral path pins each boundary exponential to a discrete
    eigen-profile u_i = kp zeta_+^{i-(n-1)} + km zeta_-^i; when the two
    roots (nearly) coincide the edge solve degenerates (det -> 0) and the
    driver must fall back to the scan. Also returns 0 where the root
    discriminant is non-positive (complex roots)."""
    sigma = np.asarray(sigma, float)
    bb = np.asarray(b, float)
    qq = np.asarray(q, float)
    rr = np.asarray(r, float)
    dx = np.asarray(dx, float)
    dt = np.asarray(dt, float)
    sig2 = sigma**2
    mu_x = bb - qq - 0.5 * sig2
    alpha = 0.5 * sig2 / (dx * dx)
    beta = mu_x / (2.0 * dx)
    a_c, c_c = alpha - beta, alpha + beta
    b_c = -2.0 * alpha - rr
    gam = bb - qq - rr
    out = np.full(sigma.shape, np.inf)
    for a_rate in (-rr, gam):
        for th in (1.0, 0.5):
            q1 = np.expm1(a_rate * dt)
            omega = q1 / (dt * (th * np.exp(a_rate * dt) + 1.0 - th))
            bw = b_c - omega
            disc = bw * bw - 4.0 * a_c * c_c
            bad = disc <= 0.0
            sq = np.sqrt(np.maximum(disc, 0.0))
            zp = (-bw + sq) / (2.0 * c_c)
            zm = a_c / (c_c * zp)
            nn = n_nodes - 1
            with np.errstate(over="ignore", divide="ignore"):
                det = np.abs(
                    np.exp(-nn * np.log(zp) + nn * np.log(zm)) - 1.0
                )
            det = np.where(bad | ~np.isfinite(det), 0.0, det)
            out = np.minimum(out, det)
    return out


def spectral_solve(
    grid: CNGrid,
    dyn: CNDynamics,
    dt: jnp.ndarray,
    k_end: jnp.ndarray,
    apply_proj: jnp.ndarray,
    n_nodes: int,
    rannacher_steps: int,
    barrier: Optional[BarrierSpec] = None,
    euro_put_lower_boundary: bool = True,
    dst: Optional[jnp.ndarray] = None,
    mm_dtype=None,
):
    """March one trade via the sine-basis propagator; mirrors ``cn_solve``.

    Per-trade scalars/vectors — batch with ``jax.vmap`` (the DST matrix is
    built once and closes over the vmap). ``k_end``/``apply_proj`` come
    from :func:`spectral_intervals`. Returns ``(V, s_nodes)``.

    ``mm_dtype``: run the DST matmuls at this dtype (state stays in the
    working dtype). ``jnp.float64`` with x64 enabled rescues the f32 path
    on TPUs whose f32 accumulators are noisy (docs/PERF_NOTES.md) — the
    emulated-f64 contraction is exact at f32 scale.
    """
    dtype = jnp.result_type(grid.x_min, grid.dx, dyn.sigma)
    M = n_nodes - 2
    i = lax.iota(dtype, n_nodes)
    x = grid.x_min + i * grid.dx
    s = jnp.exp(x)
    s_min, s_max = s[0], s[-1]

    if dst is None:
        dst = dst_matrix(n_nodes, mm_dtype or dtype)
    if mm_dtype is not None:
        def _mm_local(a, b):
            return _mm(a.astype(mm_dtype), b).astype(dtype)
    else:
        _mm_local = _mm

    payoff = _payoff(s, dyn.strike, dyn.is_call)

    sig2 = dyn.sigma * dyn.sigma
    mu_x = (dyn.b - dyn.q) - 0.5 * sig2
    alpha = 0.5 * sig2 / (grid.dx * grid.dx)
    beta_adv = mu_x / (2.0 * grid.dx)
    a_coef = alpha - beta_adv
    c_coef = alpha + beta_adv
    b_coef = -2.0 * alpha - dyn.r

    # ln g and the eigenvalues in cancellation-free forms: alpha ~ 1e5 in
    # f32 while lam ~ 1, so b + 2 sqrt(ac) cos and log(a) - log(c) both
    # cancel catastrophically if formed directly. Use
    #   lam_k = -(r + 2 beta^2/(alpha + sqrt(ac)) + 4 sqrt(ac) sin^2(t/2))
    # (all-positive terms) and ln g = 0.5 log1p(-2 beta / c).
    ln_g = 0.5 * jnp.log1p(-2.0 * beta_adv / c_coef)
    ii = lax.iota(dtype, M) + 1.0  # interior node index 1..M
    d_vec = jnp.exp(ii * ln_g)  # D = diag(g^i)
    off = jnp.sqrt(a_coef * c_coef)
    k = lax.iota(dtype, M) + 1.0
    half_t = 0.5 * jnp.pi * k / (M + 1.0)
    lam = -(
        dyn.r
        + 2.0 * beta_adv * beta_adv / (alpha + off)
        + 4.0 * off * jnp.sin(half_t) ** 2
    )

    # forcing projections: S row values at interior positions 1 and M
    s_k1 = dst[:, 0].astype(dtype)
    s_kM = dst[:, M - 1].astype(dtype)

    # boundary asymptotics as A e^{-r tau} + B e^{gamma tau} per edge
    gam = dyn.b - dyn.q - dyn.r
    zero = jnp.zeros((), dtype)
    A_lo = jnp.where(dyn.is_call, zero, dyn.strike)
    B_lo = jnp.where(
        dyn.is_call, zero, -s_min if euro_put_lower_boundary else zero
    )
    A_hi = jnp.where(dyn.is_call, -dyn.strike, zero)
    B_hi = jnp.where(dyn.is_call, s_max, zero)

    if barrier is not None:
        out_mask = (barrier.has_lower & (s <= barrier.lower)) | (
            barrier.has_upper & (s >= barrier.upper)
        )

    # ---- discrete boundary-channel profiles --------------------------------
    # For each boundary exponential q = e^{alpha dt} and each stage theta,
    # the grid sequence E^j_i = e^{alpha tau_j} u_i with (L u)_i = omega u_i,
    # omega = (q-1)/(dt (theta q + 1-theta)), and u pinned to the channel's
    # edge amplitudes satisfies the theta-step EXACTLY (boundary forcing
    # included). Subtracting E before a stage and adding it back after makes
    # the mode recursion purely homogeneous (w <- rho^m w) — no geometric
    # boundary sums, and the transformed amplitudes shrink to the residual's
    # (time-value) scale, which is what keeps the f32 path accurate.
    # u_i = kp zeta_+^{i-(n-1)} + km zeta_-^i (both factors <= O(1)).
    def channel_profile(alpha_rate, lo_amp, hi_amp, theta, dt_=None):
        # root pair of c z^2 + (b - omega) z + a = 0 in stable residual
        # form: with s = r + omega, disc = 4 alpha s + s^2 + 4 beta^2
        # (NOT bw^2 - 4ac, which cancels at the 1e5^2 scale in f32), and
        # zp - 1 = (s + (sqrt(disc) - 2 beta))/(2c) with the sqrt
        # difference rationalized when beta > 0.
        dt_ = dt if dt_ is None else dt_
        q1 = jnp.expm1(alpha_rate * dt_)
        omega = q1 / (dt_ * (theta * jnp.exp(alpha_rate * dt_) + 1.0 - theta))
        s_ch = dyn.r + omega
        disc = 4.0 * alpha * s_ch + s_ch * s_ch + 4.0 * beta_adv * beta_adv
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        sq_m2b = jnp.where(
            beta_adv > 0.0,
            (4.0 * alpha * s_ch + s_ch * s_ch)
            / jnp.maximum(sq + 2.0 * beta_adv, 1e-300),
            sq - 2.0 * beta_adv,
        )
        zp_m1 = (s_ch + sq_m2b) / (2.0 * c_coef)  # zeta_+ - 1
        ln_p = jnp.log1p(zp_m1)
        ln_m = 2.0 * ln_g - ln_p  # zeta_- = (a/c)/zeta_+
        nn = jnp.asarray(n_nodes - 1, dtype)
        ep = jnp.exp(-nn * ln_p)  # phi_+(0)
        em = jnp.exp(nn * ln_m)   # phi_-(n-1)
        det = ep * em - 1.0
        kp = (lo_amp * em - hi_amp) / det
        km = (hi_amp * ep - lo_amp) / det
        u_int = kp * jnp.exp((ii - nn) * ln_p) + km * jnp.exp(ii * ln_m)
        return u_int

    channels = ((-dyn.r, A_lo, A_hi), (gam, B_lo, B_hi))
    alphas = tuple(a for a, _, _ in channels)

    def E_channels(profiles, tau):
        """Real-space interior channel sum at time-to-maturity tau."""
        tot = jnp.zeros((M,), dtype)
        for a_r, u in zip(alphas, profiles):
            tot = tot + jnp.exp(a_r * tau) * u
        return tot

    R = rannacher_steps  # python int or traced per-trade scalar

    if jnp.ndim(dt) > 0:
        # ---- per-interval dt (monitor-aligned schedule layouts) --------
        # The closed form only needs rho_k, the channel profiles, and the
        # forcing projections PER INTERVAL, so dt may change across
        # monitor intervals (the reference CN auto-grid's ">= k steps per
        # monitor interval" layouts, discrete_barrier_fdm_pricer_cn.py:
        # 92-118). The residual basis (channel profiles) changes with dt
        # at every interval boundary, so this branch carries the
        # REAL-SPACE interior vector and re-projects per interval — two
        # DSTs per interval, the same count the uniform path already pays
        # at monitors; the rho/channel transcendentals just lose the
        # interval-invariant hoist.
        # ``dt`` aligns elementwise with ``k_end``/``apply_proj``.
        def interval_nu(carry, iv):
            v_int_c, k_start, tau_s, v_lo_act, v_hi_act = carry
            ke, do_proj, dt_iv = iv
            m = (ke - k_start).astype(jnp.int32)
            u_cn_iv = [
                channel_profile(a, lo, hi, 0.5, dt_iv)
                for a, lo, hi in channels
            ]
            u_imp_iv = [
                channel_profile(a, lo, hi, 1.0, dt_iv)
                for a, lo, hi in channels
            ]
            ud_bar_iv = [
                _mm_local((uc - ui) / d_vec, dst)
                for uc, ui in zip(u_cn_iv, u_imp_iv)
            ]
            P_iv = dt_iv * a_coef * jnp.exp(-ln_g) * s_k1
            Q_iv = dt_iv * c_coef * jnp.exp(-(M) * ln_g) * s_kM
            z = dt_iv * lam
            rho_c = {
                th: (*_log_rho(z, th), 1.0 - th * z) for th in (1.0, 0.5)
            }

            stage, switch = _stage_switch_fns(
                rho_c, P_iv, Q_iv, ud_bar_iv, alphas
            )

            v_lo_asym, v_hi_asym = _boundary_values(
                tau_s, s_min, s_max, dyn, euro_put_lower_boundary
            )
            d_lo = v_lo_act - v_lo_asym
            d_hi = v_hi_act - v_hi_asym
            E_s = E_channels(u_cn_iv, tau_s)
            w = _mm_local((v_int_c - E_s) / d_vec, dst)
            n_imp = jnp.clip(R - k_start, 0, m).astype(jnp.int32)
            n_cn = m - n_imp
            tau_mid = tau_s + n_imp.astype(dtype) * dt_iv
            w1 = stage(switch(w, tau_s, +1.0), n_imp, 1.0, d_lo, d_hi)
            # the correction belongs to the stage that executes step j=0
            d_lo2 = jnp.where(n_imp > 0, 0.0, d_lo)
            d_hi2 = jnp.where(n_imp > 0, 0.0, d_hi)
            w2 = stage(switch(w1, tau_mid, -1.0), n_cn, 0.5, d_lo2, d_hi2)

            tau_e = tau_s + m.astype(dtype) * dt_iv
            v_lo_e, v_hi_e = _boundary_values(
                tau_e, s_min, s_max, dyn, euro_put_lower_boundary
            )
            E_e = E_channels(u_cn_iv, tau_e)
            v_int = _mm_local(w2, dst) * d_vec + E_e
            v_full = jnp.concatenate([v_lo_e[None], v_int, v_hi_e[None]])
            if barrier is not None:
                rebate_pv = jnp.where(
                    barrier.rebate_at_hit,
                    barrier.rebate,
                    barrier.rebate * jnp.exp(-barrier.rebate_rate * tau_e),
                )
                v_proj = jnp.where(do_proj & out_mask, rebate_pv, v_full)
            else:
                v_proj = v_full
            return (
                v_proj[1:-1], ke.astype(jnp.int32), tau_e,
                v_proj[0], v_proj[-1],
            ), None

        init_nu = (
            payoff[1:-1], jnp.zeros((), jnp.int32), jnp.zeros((), dtype),
            payoff[0], payoff[-1],
        )
        (v_fin, _kf, _tf, v_lo_fin, v_hi_fin), _ = lax.scan(
            interval_nu, init_nu,
            (k_end.astype(jnp.int32), apply_proj, dt.astype(dtype)),
        )
        return jnp.concatenate([v_lo_fin[None], v_fin, v_hi_fin[None]]), s

    # ---- uniform dt: interval-invariant quantities hoisted -----------------
    P = dt * a_coef * jnp.exp(-ln_g) * s_k1        # lower-edge channel
    Q = dt * c_coef * jnp.exp(-(M) * ln_g) * s_kM  # upper-edge channel
    u_cn = [channel_profile(a, lo, hi, 0.5) for a, lo, hi in channels]
    u_imp = [channel_profile(a, lo, hi, 1.0) for a, lo, hi in channels]
    # transformed CN-vs-implicit profile differences (small operands, so
    # the one-off DSTs here are benign)
    ud_bar = [_mm_local((uc - ui) / d_vec, dst) for uc, ui in zip(u_cn, u_imp)]

    # The CARRIED state is the sine transform of the RESIDUAL v - E (E =
    # CN-profile channel sum). The channels are evaluated in closed form in
    # real space at reconstruction, so the matmul operands stay at the
    # residual scale — this is what bounds the f32 absolute noise (matmul
    # rounding is relative to the operand norm, and the full value surface
    # is ~two orders larger than the residual for far-field grids).
    # The scan's carried v0 is the raw payoff, so the actual edge values at
    # tau=0 are payoff[0]/payoff[-1] (they match the asymptotics except for
    # the American-convention put lower boundary, which the j=0 deviation
    # correction absorbs exactly).
    w0 = _mm_local(
        (payoff[1:-1] - E_channels(u_cn, jnp.zeros((), dtype))) / d_vec, dst
    )
    v_lo0, v_hi0 = payoff[0], payoff[-1]

    # interval-invariant per-theta quantities, hoisted out of the scan
    z_modes = dt * lam
    rho_cache = {
        th: (*_log_rho(z_modes, th), 1.0 - th * z_modes) for th in (1.0, 0.5)
    }

    stage_h, switch_profiles = _stage_switch_fns(
        rho_cache, P, Q, ud_bar, alphas
    )

    def interval(carry, iv):
        w, k_start, v_lo_act, v_hi_act = carry  # w: residual wrt CN profiles
        ke, do_proj = iv
        m = (ke - k_start).astype(jnp.int32)
        tau_s = k_start.astype(dtype) * dt
        v_lo_asym, v_hi_asym = _boundary_values(
            tau_s, s_min, s_max, dyn, euro_put_lower_boundary
        )
        d_lo = v_lo_act - v_lo_asym
        d_hi = v_hi_act - v_hi_asym
        n_imp = jnp.clip(R - k_start, 0, m).astype(jnp.int32)
        n_cn = m - n_imp
        tau_mid = (k_start + n_imp).astype(dtype) * dt
        w1 = stage_h(switch_profiles(w, tau_s, +1.0), n_imp, 1.0, d_lo, d_hi)
        # the correction belongs to the stage that executes step j=0
        d_lo2 = jnp.where(n_imp > 0, 0.0, d_lo)
        d_hi2 = jnp.where(n_imp > 0, 0.0, d_hi)
        w2 = stage_h(
            switch_profiles(w1, tau_mid, -1.0), n_cn, 0.5, d_lo2, d_hi2
        )

        tau_e = ke.astype(dtype) * dt
        v_lo_e, v_hi_e = _boundary_values(
            tau_e, s_min, s_max, dyn, euro_put_lower_boundary
        )
        E_e = E_channels(u_cn, tau_e)
        v_int = _mm_local(w2, dst) * d_vec + E_e
        v_full = jnp.concatenate([v_lo_e[None], v_int, v_hi_e[None]])
        if barrier is not None:
            rebate_pv = jnp.where(
                barrier.rebate_at_hit,
                barrier.rebate,
                barrier.rebate * jnp.exp(-barrier.rebate_rate * tau_e),
            )
            v_proj = jnp.where(do_proj & out_mask, rebate_pv, v_full)
        else:
            v_proj = v_full
        w_proj = _mm_local((v_proj[1:-1] - E_e) / d_vec, dst)
        w_next = jnp.where(do_proj, w_proj, w2)
        v_lo_next = jnp.where(do_proj, v_proj[0], v_lo_e)
        v_hi_next = jnp.where(do_proj, v_proj[-1], v_hi_e)
        return (w_next, ke.astype(jnp.int32), v_lo_next, v_hi_next), None

    init = (w0, jnp.zeros((), jnp.int32), v_lo0, v_hi0)
    (w_fin, k_fin, v_lo_fin, v_hi_fin), _ = lax.scan(
        interval, init, (k_end.astype(jnp.int32), apply_proj)
    )
    tau_fin = k_fin.astype(dtype) * dt
    v_final = jnp.concatenate(
        [
            v_lo_fin[None],
            _mm_local(w_fin, dst) * d_vec + E_channels(u_cn, tau_fin),
            v_hi_fin[None],
        ]
    )
    return v_final, s


def dst_matrix(n_nodes: int, dtype) -> jnp.ndarray:
    """Orthonormal DST-I matrix over the M = n_nodes-2 interior nodes."""
    M = n_nodes - 2
    idx = np.arange(1, M + 1, dtype=np.float64)
    S = np.sqrt(2.0 / (M + 1)) * np.sin(
        np.pi * np.outer(idx, idx) / (M + 1)
    )
    return jnp.asarray(S, dtype)


def spectral_solve_mixed(
    grid: CNGrid,
    dyn: CNDynamics,
    dt: jnp.ndarray,
    k_end: jnp.ndarray,
    apply_proj: jnp.ndarray,
    n_nodes: int,
    rannacher_steps: int,
    barrier: Optional[BarrierSpec] = None,
    euro_put_lower_boundary: bool = True,
    dst: Optional[jnp.ndarray] = None,
):
    """Mixed-precision spectral march: f64 transcendentals, f32 state.

    The TPU f32-accuracy ladder (docs/PERF_NOTES.md "Precision ladder"):
    plain f32 spectral fails on the v5e because f32 MATMUL accumulation is
    ~30x noisier than CPU f32; ``spectral_x64dst`` fixed the matmuls
    (emulated-f64 DST contractions) but still measured 1.3e-2 on chip
    because the v5e's f32 TRANSCENDENTALS (exp ~4.4e-6 rel) get amplified
    by the symmetrizer range. This variant closes that hole: every
    exp/log/expm1-family evaluation — the coefficient prep chain, the
    mode-power exponentials, the channel/boundary exponentials — runs in
    emulated f64 with results CAST to f32, while the carried state, the
    elementwise stage arithmetic, and the projection stay f32 and the DST
    matmuls stay emulated-f64 (as x64dst). The remaining error floor is
    f32 rounding of exact quantities (~6e-8 per op) plus the E-channel
    subtraction at the value scale — ~1e-6 by construction.

    Requires x64 enabled; uniform dt only (the hoisted layout). Mirrors
    :func:`spectral_solve`'s uniform path structurally.
    """
    f32 = jnp.float32
    f64 = jnp.float64
    hx = lambda v: jnp.asarray(v).astype(f64)
    sc = lambda v: v.astype(f32)

    M = n_nodes - 2
    i64 = lax.iota(f64, n_nodes)
    x64 = hx(grid.x_min) + i64 * hx(grid.dx)
    s64 = jnp.exp(x64)
    s = sc(s64)
    s_min, s_max = s64[0], s64[-1]

    if dst is None:
        dst = dst_matrix(n_nodes, f64)

    def mm64(a, b):
        return _mm(a.astype(f64), b)

    payoff = sc(_payoff(s64, hx(dyn.strike), dyn.is_call))

    # ---- PREP: the whole coefficient chain in f64 --------------------------
    dt64 = hx(dt)
    sig = hx(dyn.sigma)
    sig2 = sig * sig
    r64, b64, q64 = hx(dyn.r), hx(dyn.b), hx(dyn.q)
    dx64 = hx(grid.dx)
    mu_x = (b64 - q64) - 0.5 * sig2
    alpha = 0.5 * sig2 / (dx64 * dx64)
    beta_adv = mu_x / (2.0 * dx64)
    a_coef = alpha - beta_adv
    c_coef = alpha + beta_adv

    ln_g = 0.5 * jnp.log1p(-2.0 * beta_adv / c_coef)
    ii = lax.iota(f64, M) + 1.0
    d_vec = jnp.exp(ii * ln_g)          # f64; cast at use sites
    d_vec_s = sc(d_vec)
    off = jnp.sqrt(a_coef * c_coef)
    k = lax.iota(f64, M) + 1.0
    half_t = 0.5 * jnp.pi * k / (M + 1.0)
    lam = -(
        r64
        + 2.0 * beta_adv * beta_adv / (alpha + off)
        + 4.0 * off * jnp.sin(half_t) ** 2
    )

    s_k1 = dst[:, 0]
    s_kM = dst[:, M - 1]
    P = sc(dt64 * a_coef * jnp.exp(-ln_g) * s_k1)
    Q = sc(dt64 * c_coef * jnp.exp(-(M) * ln_g) * s_kM)

    gam = b64 - q64 - r64
    zero = jnp.zeros((), f64)
    strike64 = hx(dyn.strike)
    A_lo = jnp.where(dyn.is_call, zero, strike64)
    B_lo = jnp.where(
        dyn.is_call, zero, -s_min if euro_put_lower_boundary else zero
    )
    A_hi = jnp.where(dyn.is_call, -strike64, zero)
    B_hi = jnp.where(dyn.is_call, s_max, zero)

    if barrier is not None:
        out_mask = (barrier.has_lower & (s <= sc(hx(barrier.lower)))) | (
            barrier.has_upper & (s >= sc(hx(barrier.upper)))
        )

    def channel_profile(alpha_rate, lo_amp, hi_amp, theta):
        q1 = jnp.expm1(alpha_rate * dt64)
        omega = q1 / (dt64 * (theta * jnp.exp(alpha_rate * dt64) + 1.0 - theta))
        s_ch = r64 + omega
        disc = 4.0 * alpha * s_ch + s_ch * s_ch + 4.0 * beta_adv * beta_adv
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        sq_m2b = jnp.where(
            beta_adv > 0.0,
            (4.0 * alpha * s_ch + s_ch * s_ch)
            / jnp.maximum(sq + 2.0 * beta_adv, 1e-300),
            sq - 2.0 * beta_adv,
        )
        zp_m1 = (s_ch + sq_m2b) / (2.0 * c_coef)
        ln_p = jnp.log1p(zp_m1)
        ln_m = 2.0 * ln_g - ln_p
        nn = jnp.asarray(n_nodes - 1, f64)
        ep = jnp.exp(-nn * ln_p)
        em = jnp.exp(nn * ln_m)
        det = ep * em - 1.0
        kp = (lo_amp * em - hi_amp) / det
        km = (hi_amp * ep - lo_amp) / det
        return kp * jnp.exp((ii - nn) * ln_p) + km * jnp.exp(ii * ln_m)

    channels = ((-r64, A_lo, A_hi), (gam, B_lo, B_hi))
    alphas = tuple(a for a, _, _ in channels)
    u_cn = [channel_profile(a, lo, hi, 0.5) for a, lo, hi in channels]
    u_imp = [channel_profile(a, lo, hi, 1.0) for a, lo, hi in channels]
    u_cn_s = [sc(u) for u in u_cn]
    ud_bar_s = [
        sc(mm64((uc - ui) / d_vec, dst)) for uc, ui in zip(u_cn, u_imp)
    ]

    def exp_rate(a_r, tau):
        """e^{a_r tau} evaluated in f64, returned f32 (the chip's f32 exp
        is the measured 4.4e-6 hole this variant closes)."""
        return sc(jnp.exp(a_r * hx(tau)))

    def E_channels_s(tau):
        tot = jnp.zeros((M,), f32)
        for a_r, u_s in zip(alphas, u_cn_s):
            tot = tot + exp_rate(a_r, tau) * u_s
        return tot

    def boundary_s(tau):
        """(v_lo, v_hi) asymptotics at tau — the channel amplitudes give
        exactly _boundary_values' A e^{-r tau} + B e^{gamma tau} form."""
        e_r = exp_rate(-r64, tau)
        e_g = exp_rate(gam, tau)
        v_lo = sc(A_lo) * e_r + sc(B_lo) * e_g
        v_hi = sc(A_hi) * e_r + sc(B_hi) * e_g
        return v_lo, v_hi

    # state transform: w = DST((v - E)/d) with the x64 matmul
    w0 = sc(mm64((payoff[1:-1] - E_channels_s(jnp.zeros((), f32))) / d_vec_s, dst))
    v_lo0, v_hi0 = payoff[0], payoff[-1]

    # interval-invariant per-theta mode logs, f64 (exponent accuracy);
    # the per-stage exp runs in f64 and casts down
    z64 = dt64 * lam
    rho_cache = {
        th: (*_log_rho(z64, th), sc(1.0 - th * z64)) for th in (1.0, 0.5)
    }

    def pow_s(log_mag64, neg, m):
        mf = m.astype(f64)
        mag = sc(jnp.exp(mf * log_mag64))
        odd = jnp.mod(mf, 2.0) > 0.5
        out = jnp.where(neg & odd, -mag, mag)
        return jnp.where(m > 0.5, out, jnp.ones_like(out))

    def stage_h(w, m, theta, d_lo, d_hi):
        log_mag, neg, denom_s = rho_cache[theta]
        w_new = pow_s(log_mag, neg, m) * w
        corr = jnp.float32(1.0 - theta) * (P * d_lo + Q * d_hi) / denom_s
        w_new = w_new + pow_s(log_mag, neg, jnp.maximum(m - 1, 0)) * jnp.where(
            m > 0.5, corr, jnp.zeros_like(corr)
        )
        return w_new

    def switch_profiles(w, tau, sign):
        for a_r, ud_s in zip(alphas, ud_bar_s):
            w = w + jnp.float32(sign) * exp_rate(a_r, tau) * ud_s
        return w

    R = rannacher_steps

    def interval(carry, iv):
        w, k_start, v_lo_act, v_hi_act = carry
        ke, do_proj = iv
        m = (ke - k_start).astype(jnp.int32)
        tau_s = sc(k_start.astype(f64) * dt64)
        v_lo_asym, v_hi_asym = boundary_s(tau_s)
        d_lo = v_lo_act - v_lo_asym
        d_hi = v_hi_act - v_hi_asym
        n_imp = jnp.clip(R - k_start, 0, m).astype(jnp.int32)
        n_cn = m - n_imp
        tau_mid = sc((k_start + n_imp).astype(f64) * dt64)
        w1 = stage_h(switch_profiles(w, tau_s, +1.0), n_imp, 1.0, d_lo, d_hi)
        d_lo2 = jnp.where(n_imp > 0, jnp.float32(0.0), d_lo)
        d_hi2 = jnp.where(n_imp > 0, jnp.float32(0.0), d_hi)
        w2 = stage_h(
            switch_profiles(w1, tau_mid, -1.0), n_cn, 0.5, d_lo2, d_hi2
        )

        tau_e = sc(ke.astype(f64) * dt64)
        v_lo_e, v_hi_e = boundary_s(tau_e)
        E_e = E_channels_s(tau_e)
        v_int = sc(mm64(w2, dst)) * d_vec_s + E_e
        v_full = jnp.concatenate([v_lo_e[None], v_int, v_hi_e[None]])
        if barrier is not None:
            rebate_pv = jnp.where(
                barrier.rebate_at_hit,
                sc(hx(barrier.rebate)),
                sc(hx(barrier.rebate)) * exp_rate(-hx(barrier.rebate_rate), tau_e),
            )
            v_proj = jnp.where(do_proj & out_mask, rebate_pv, v_full)
        else:
            v_proj = v_full
        w_proj = sc(mm64((v_proj[1:-1] - E_e) / d_vec_s, dst))
        w_next = jnp.where(do_proj, w_proj, w2)
        v_lo_next = jnp.where(do_proj, v_proj[0], v_lo_e)
        v_hi_next = jnp.where(do_proj, v_proj[-1], v_hi_e)
        return (w_next, ke.astype(jnp.int32), v_lo_next, v_hi_next), None

    init = (w0, jnp.zeros((), jnp.int32), v_lo0, v_hi0)
    (w_fin, k_fin, v_lo_fin, v_hi_fin), _ = lax.scan(
        interval, init, (k_end.astype(jnp.int32), apply_proj)
    )
    tau_fin = sc(k_fin.astype(f64) * dt64)
    v_final = jnp.concatenate(
        [
            v_lo_fin[None],
            sc(mm64(w_fin, dst)) * d_vec_s + E_channels_s(tau_fin),
            v_hi_fin[None],
        ]
    )
    return v_final, s
