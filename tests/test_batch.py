import datetime as dt

import numpy as np
import pytest
import jax

from finite_difference_tpu.models.pde import DiscreteBarrierFDMPricer
from finite_difference_tpu.models.pde.batch import (
    build_trade_batch,
    price_barrier_batch,
)
from finite_difference_tpu.parallel import make_mesh
from finite_difference_tpu.utils.calendars import build_monitoring_dates
from finite_difference_tpu.utils.curves import flat_naca_dataframe
from finite_difference_tpu.utils.daycount import year_fraction

VAL = dt.date(2025, 7, 28)
MAT = dt.date(2025, 8, 28)


def _reference_single(spot, strike, sigma, H, n_time):
    monitors = build_monitoring_dates(VAL, MAT, "daily")
    pr = DiscreteBarrierFDMPricer(
        spot=spot, strike=strike, valuation_date=VAL, maturity_date=MAT,
        sigma=sigma, option_type="call", barrier_type="up-and-out",
        upper_barrier=H, monitor_dates=monitors,
        discount_curve=flat_naca_dataframe(0.073085649282),
        underlying_spot_days=0, num_time_steps=n_time,
    )
    return pr


def _batch_from_pricers(pricers, n_time, num_space_nodes):
    return build_trade_batch(
        spots=[p.spot for p in pricers],
        strikes=[p.strike for p in pricers],
        sigmas=[p.sigma for p in pricers],
        t_expiry=[p.time_to_expiry for p in pricers],
        r=[p.discount_rate_nacc for p in pricers],
        b=[p.carry_rate_nacc for p in pricers],
        is_call=[True] * len(pricers),
        n_time_steps=n_time,
        monitor_times=[p.monitor_times for p in pricers],
        upper=[p.upper_barrier for p in pricers],
        num_space_nodes=num_space_nodes,
    )


class TestBatchedBarrier:
    def test_matches_single_trade_pricers(self):
        n_time = 200
        specs = [
            (229.74, 190.0, 0.28790, 260.0),
            (229.74, 190.0, 0.28790, 420.0),
            (229.74, 260.0, 0.23488, 280.0),
            (200.00, 210.0, 0.30000, 240.0),
        ]
        pricers = [_reference_single(*s, n_time) for s in specs]
        n_nodes_each = {p.grid.n_nodes for p in pricers}
        # the production rule gives the same node count for all trades
        assert len(n_nodes_each) == 1
        n_sp = pricers[0].num_space_nodes

        batch = _batch_from_pricers(pricers, n_time, n_sp)
        out = price_barrier_batch(batch, n_nodes=n_sp + 1)

        for i, p in enumerate(pricers):
            g = p.greeks_log2()
            assert out["price"][i] == pytest.approx(g["price"], rel=1e-10), i
            assert out["delta"][i] == pytest.approx(g["delta"], rel=1e-8), i
            assert out["gamma"][i] == pytest.approx(g["gamma"], rel=1e-8, abs=1e-10), i
            assert out["vega"][i] == pytest.approx(g["vega"], rel=1e-6, abs=1e-8), i
            assert out["theta"][i] == pytest.approx(g["theta"], rel=1e-8), i

    def test_sharded_over_mesh(self):
        assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
        mesh = make_mesh(8)
        n_time = 100
        B = 16
        rng = np.random.default_rng(0)
        spots = rng.uniform(180, 260, B)
        t = year_fraction(VAL, MAT)
        batch = build_trade_batch(
            spots=spots,
            strikes=[190.0] * B,
            sigmas=[0.25] * B,
            t_expiry=[t] * B,
            r=[0.07] * B,
            b=[0.07] * B,
            is_call=[True] * B,
            n_time_steps=n_time,
            monitor_times=[[t * (k + 1) / 24 for k in range(24)]] * B,
            upper=[300.0] * B,
            num_space_nodes=427,
        )
        out_sharded = price_barrier_batch(batch, n_nodes=428, mesh=mesh)
        out_local = price_barrier_batch(batch, n_nodes=428)
        np.testing.assert_allclose(out_sharded["price"], out_local["price"], rtol=1e-12)
        # KO call price should decrease as spot approaches the barrier region
        # (just sanity: all finite, positive where ITM)
        assert np.isfinite(out_sharded["price"]).all()


class TestAmericanBatch:
    def test_matches_scalar_pricer(self):
        """The batched American sweep must match AmericanFDMPricer per trade."""
        import datetime as dt

        from finite_difference_tpu.models.pde import AmericanFDMPricer
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
        )
        from finite_difference_tpu.utils.curves import flat_curve

        VAL, MAT = dt.date(2025, 7, 28), dt.date(2026, 1, 28)
        curve = flat_curve(0.07, VAL)
        spots = [90.0, 100.0, 110.0, 120.0]
        scalar_prices = []
        t_exp = None
        rs = []
        for s0 in spots:
            pr = AmericanFDMPricer(
                spot=s0, strike=100.0, valuation_date=VAL, maturity_date=MAT,
                sigma=0.3, option_type="put", discount_curve=curve,
                num_space_nodes=200, num_time_steps=200,
                snap_spot_to_grid=False, snap_strike_to_grid=False,
            )
            scalar_prices.append(pr.price_log())
            t_exp = pr.time_to_expiry
            rs.append(pr.discount_rate_nacc)

        tb = build_american_batch(
            spots=spots, strikes=[100.0] * 4, sigmas=[0.3] * 4,
            t_expiry=[t_exp] * 4, r=rs, b=rs, is_call=[False] * 4,
            n_time_steps=200, num_space_nodes=200,
        )
        out = price_american_batch(tb, n_nodes=201, with_greeks=True)
        np.testing.assert_allclose(out["price"], scalar_prices, rtol=1e-9)
        # greeks MAGNITUDE check, not just sign/finiteness (a 2.5x-scale
        # stencil error — the FIS-bug class — would keep delta finite and
        # negative): the batch's grid-stencil delta must match a central
        # spot-bump of the batch's own prices
        h = 0.25
        up = price_american_batch(
            build_american_batch(
                spots=[s + h for s in spots], strikes=[100.0] * 4,
                sigmas=[0.3] * 4, t_expiry=[t_exp] * 4, r=rs, b=rs,
                is_call=[False] * 4, n_time_steps=200, num_space_nodes=200,
            ), n_nodes=201, with_greeks=False,
        )["price"]
        dn = price_american_batch(
            build_american_batch(
                spots=[s - h for s in spots], strikes=[100.0] * 4,
                sigmas=[0.3] * 4, t_expiry=[t_exp] * 4, r=rs, b=rs,
                is_call=[False] * 4, n_time_steps=200, num_space_nodes=200,
            ), n_nodes=201, with_greeks=False,
        )["price"]
        fd_delta = (np.asarray(up) - np.asarray(dn)) / (2 * h)
        np.testing.assert_allclose(out["delta"], fd_delta, rtol=0.05, atol=2e-3)
        assert (out["delta"] < 0).all()

    def test_dividend_jump_batched(self):
        import datetime as dt

        from finite_difference_tpu.models.pde import AmericanFDMPricer
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
        )
        from finite_difference_tpu.utils.curves import flat_curve

        VAL, MAT = dt.date(2025, 7, 28), dt.date(2026, 1, 28)
        div_date = dt.date(2025, 10, 15)
        curve = flat_curve(0.07, VAL)
        pr = AmericanFDMPricer(
            spot=100.0, strike=100.0, valuation_date=VAL, maturity_date=MAT,
            sigma=0.3, option_type="put", discount_curve=curve,
            dividend_schedule=[(div_date, 4.0)],
            num_space_nodes=200, num_time_steps=200,
            snap_spot_to_grid=False, snap_strike_to_grid=False,
        )
        want = pr.price_log()
        divs_tau = pr._div_times_tau()
        tb = build_american_batch(
            spots=[100.0], strikes=[100.0], sigmas=[0.3],
            t_expiry=[pr.time_to_expiry], r=[pr.discount_rate_nacc],
            b=[pr.carry_rate_nacc], is_call=[False], n_time_steps=200,
            dividends_tau=[divs_tau], num_space_nodes=200,
        )
        out = price_american_batch(tb, n_nodes=201, with_greeks=False)
        np.testing.assert_allclose(out["price"][0], want, rtol=1e-9)


class TestChunkedDriver:
    """Chunked execution (working-set cliff mitigation) is bit-identical."""

    def test_chunked_equals_single_launch(self):
        rng = np.random.default_rng(1)
        B = 37  # deliberately not divisible by the chunk size
        t = 31.0 / 365.0
        tb = build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=64,
            monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B,
            num_space_nodes=255,
        )
        # the scan path is bit-identical under chunking; the spectral path
        # only agrees to FP tolerance (matmul row results vary with the
        # batch tiling), so pin both properties
        whole = price_barrier_batch(tb, n_nodes=256, max_chunk=None,
                                    solver="scan")
        chunked = price_barrier_batch(tb, n_nodes=256, max_chunk=16,
                                      solver="scan")
        for k in whole:
            np.testing.assert_array_equal(whole[k], chunked[k], err_msg=k)
        whole_sp = price_barrier_batch(tb, n_nodes=256, max_chunk=None)
        chunked_sp = price_barrier_batch(tb, n_nodes=256, max_chunk=16)
        for k in whole_sp:
            np.testing.assert_allclose(
                whole_sp[k], chunked_sp[k], rtol=1e-9, atol=1e-10, err_msg=k
            )

    def test_american_chunked_equals_single_launch(self):
        from finite_difference_tpu.models.pde.batch import price_american_batch

        rng = np.random.default_rng(2)
        B = 20
        t = 0.25
        tb = build_trade_batch(
            spots=list(rng.uniform(150.0, 200.0, B)),
            strikes=[170.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[False] * B,
            n_time_steps=64,
            monitor_times=[[]] * B,
            num_space_nodes=255,
        )
        whole = price_american_batch(tb, n_nodes=256, max_chunk=None)
        chunked = price_american_batch(tb, n_nodes=256, max_chunk=8)
        for k in whole:
            np.testing.assert_array_equal(whole[k], chunked[k], err_msg=k)

    def test_dtype_ladder(self):
        """driver dtype= selects the precision rung; f64 equals default
        x64 path, f32 tracks it to f32 accumulation error."""
        rng = np.random.default_rng(3)
        B = 8
        t = 31.0 / 365.0
        tb = build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=64,
            monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B,
            num_space_nodes=255,
        )
        base = price_barrier_batch(tb, n_nodes=256, with_greeks=False)
        p64 = price_barrier_batch(tb, n_nodes=256, with_greeks=False, dtype="float64")
        p32 = price_barrier_batch(tb, n_nodes=256, with_greeks=False, dtype="float32")
        np.testing.assert_allclose(p64["price"], base["price"], rtol=1e-14)
        assert p32["price"].dtype == np.float32
        np.testing.assert_allclose(
            p32["price"].astype(np.float64), p64["price"], rtol=5e-4
        )


class TestPackedTransfers:
    """The packed-transfer launch path (round 5 serving optimization):
    batch packed into <=4 device transfers, unpacked inside the jit,
    outputs stacked for ONE fetch — must match the generic per-leaf
    path on every solver lane it serves."""

    def _batch(self, B=12, monitors=4, n_time=32, nodes=127, **kw):
        rng = np.random.default_rng(7)
        t = 31.0 / 365.0
        args = dict(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=n_time,
            monitor_times=[
                [t * (k + 1) / monitors for k in range(monitors)]
            ] * B,
            upper=[260.0] * B,
            num_space_nodes=nodes,
        )
        args.update(kw)
        return build_trade_batch(**args)

    def _packed_vs_plain(self, monkeypatch, tb, n_nodes, **kw):
        from finite_difference_tpu.models.pde import batch as M

        monkeypatch.setenv("FD_PACK_TRANSFERS", "0")
        plain = price_barrier_batch(tb, n_nodes=n_nodes, **kw)
        monkeypatch.setenv("FD_PACK_TRANSFERS", "1")
        packed = price_barrier_batch(tb, n_nodes=n_nodes, **kw)
        return plain, packed

    def test_scan_packed_matches_plain(self, monkeypatch):
        tb = self._batch()
        plain, packed = self._packed_vs_plain(
            monkeypatch, tb, 128, solver="scan"
        )
        for k in plain:
            np.testing.assert_allclose(
                packed[k], plain[k], rtol=1e-12, atol=1e-13, err_msg=k
            )

    def test_spectral_packed_matches_plain(self, monkeypatch):
        tb = self._batch()
        plain, packed = self._packed_vs_plain(monkeypatch, tb, 128)
        assert set(plain) == {"price", "vega", "delta", "gamma", "theta"}
        for k in plain:
            np.testing.assert_allclose(
                packed[k], plain[k], rtol=1e-9, atol=1e-10, err_msg=k
            )

    def test_spike_interpret_packed_matches_plain(self, monkeypatch):
        tb = self._batch()
        plain, packed = self._packed_vs_plain(
            monkeypatch, tb, 128, solver="spike_interpret"
        )
        for k in plain:
            np.testing.assert_allclose(
                packed[k], plain[k], rtol=1e-12, atol=1e-13, err_msg=k
            )

    def test_american_dividends_packed_matches_plain(self, monkeypatch):
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch, price_american_batch,
        )

        rng = np.random.default_rng(8)
        B = 8
        tb = build_american_batch(
            spots=list(rng.uniform(80.0, 120.0, B)),
            strikes=[100.0] * B,
            sigmas=list(rng.uniform(0.15, 0.3, B)),
            t_expiry=[1.0] * B, r=[0.06] * B, b=[0.06] * B,
            is_call=[False] * B, n_time_steps=32, num_space_nodes=127,
            dividends_tau=[[(0.1, 1.5)]] * B,
        )
        monkeypatch.setenv("FD_PACK_TRANSFERS", "0")
        plain = price_american_batch(tb, n_nodes=128)
        monkeypatch.setenv("FD_PACK_TRANSFERS", "1")
        packed = price_american_batch(tb, n_nodes=128)
        for k in plain:
            np.testing.assert_allclose(
                packed[k], plain[k], rtol=1e-12, atol=1e-13, err_msg=k
            )

    def test_device_resident_batch_falls_back(self, monkeypatch):
        """A device-resident batch must take the generic path (packing
        would round-trip the data through the host)."""
        import jax
        import jax.numpy as jnp

        from finite_difference_tpu.models.pde import batch as M

        tb = self._batch(B=4, n_time=8, nodes=63)
        dev_tb = jax.tree.map(jnp.asarray, tb)
        monkeypatch.setenv("FD_PACK_TRANSFERS", "1")
        assert M._run_packed(
            M.price_batch_kernel, dev_tb,
            dict(n_nodes=64, dv_sigma=None, with_greeks=False,
                 greeks_mode="bump", solver="scan"), 4,
        ) is None
        out = price_barrier_batch(dev_tb, n_nodes=64, solver="scan",
                                  with_greeks=False)
        assert np.isfinite(out["price"]).all()


class TestBatchedDoubleBarrier:
    def test_double_and_lower_match_scalar_pricer(self):
        """down-and-out and double-out batched trades reproduce the scalar
        production pricer (same grid)."""
        n_time = 200
        monitors = build_monitoring_dates(VAL, MAT, "daily")
        curve = flat_naca_dataframe(0.073085649282)
        cases = [
            dict(barrier_type="down-and-out", lower_barrier=180.0),
            dict(barrier_type="double-out", lower_barrier=180.0,
                 upper_barrier=300.0),
        ]
        pricers = [
            DiscreteBarrierFDMPricer(
                spot=229.74, strike=190.0, valuation_date=VAL,
                maturity_date=MAT, sigma=0.2879, option_type="call",
                monitor_dates=monitors, discount_curve=curve,
                underlying_spot_days=0, num_time_steps=n_time, **c,
            )
            for c in cases
        ]
        n_sp = pricers[0].num_space_nodes
        tb = build_trade_batch(
            spots=[p.spot for p in pricers],
            strikes=[p.strike for p in pricers],
            sigmas=[p.sigma for p in pricers],
            t_expiry=[p.time_to_expiry for p in pricers],
            r=[p.discount_rate_nacc for p in pricers],
            b=[p.carry_rate_nacc for p in pricers],
            is_call=[True] * 2,
            n_time_steps=n_time,
            monitor_times=[p.monitor_times for p in pricers],
            lower=[p.lower_barrier for p in pricers],
            upper=[getattr(p, "upper_barrier", None) for p in pricers],
            num_space_nodes=n_sp,
        )
        out = price_barrier_batch(tb, n_nodes=n_sp + 1, with_greeks=False)
        for i, p in enumerate(pricers):
            assert out["price"][i] == pytest.approx(p.price_log2(), rel=1e-9), i


class TestAmericanRichardson:
    def test_matches_scalar_price_log2(self):
        """Batched Richardson = scalar price_log2 when the step convention
        matches (fine = 2*num_space_nodes, the reference quirk)."""
        from finite_difference_tpu.models.pde import AmericanFDMPricer
        from finite_difference_tpu.models.pde.batch import (
            price_american_batch_richardson,
        )
        from finite_difference_tpu.utils.curves import flat_curve

        VAL, MAT = dt.date(2025, 7, 28), dt.date(2025, 8, 28)
        curve = flat_curve(0.070538, VAL)
        pr = AmericanFDMPricer(
            spot=176.39, strike=170.0, valuation_date=VAL, maturity_date=MAT,
            sigma=0.296783, option_type="put", discount_curve=curve,
            num_space_nodes=200, num_time_steps=200,
            snap_spot_to_grid=False, snap_strike_to_grid=False,
        )
        want = pr.price_log2()  # Richardson at (200, 2*200 nodes quirk)
        out = price_american_batch_richardson(
            n_nodes=201,
            n_time_steps=200,
            n_time_steps_fine=2 * 200,  # quirk: 2*num_space_nodes = 400
            with_greeks=False,
            spots=[176.39], strikes=[170.0], sigmas=[0.296783],
            t_expiry=[pr.time_to_expiry], r=[pr.discount_rate_nacc],
            b=[pr.carry_rate_nacc], is_call=[False], num_space_nodes=200,
        )
        np.testing.assert_allclose(out["price"][0], want, rtol=1e-9)

    def test_richardson_beats_flat_at_same_cost(self):
        """(64,128) Richardson is closer to a 2048-step truth than a flat
        192-step run of equal sequential cost."""
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
            price_american_batch_richardson,
        )

        kw = dict(spots=[100.0], strikes=[100.0], sigmas=[0.3],
                  t_expiry=[0.25], r=[0.05], b=[0.05], is_call=[False],
                  num_space_nodes=300)
        truth = price_american_batch(
            build_american_batch(n_time_steps=2048, **kw), n_nodes=301,
            with_greeks=False,
        )["price"][0]
        rich = price_american_batch_richardson(
            n_nodes=301, n_time_steps=64, with_greeks=False, **kw
        )["price"][0]
        flat = price_american_batch(
            build_american_batch(n_time_steps=192, **kw), n_nodes=301,
            with_greeks=False,
        )["price"][0]
        assert abs(rich - truth) < abs(flat - truth)


class TestRandomizedConsistency:
    def test_random_trades_match_scalar(self):
        """Seeded fuzz: random barrier configs (type, level, rebate, monitor
        count) priced batched vs scalar — must agree to 1e-8 on the same
        grid."""
        rng = np.random.default_rng(20260816)
        curve = flat_naca_dataframe(0.0731)
        n_time = 120
        pricers, rebates, at_hits = [], [], []
        for _ in range(10):
            sigma = float(rng.uniform(0.15, 0.45))
            spot = float(rng.uniform(150.0, 260.0))
            strike = float(rng.uniform(150.0, 260.0))
            kind = rng.choice(["up-and-out", "down-and-out", "double-out"])
            upper = float(rng.uniform(spot * 1.05, spot * 1.6)) if kind != "down-and-out" else None
            low = float(rng.uniform(spot * 0.6, spot * 0.95)) if kind != "up-and-out" else None
            rebate = float(rng.choice([0.0, 2.5]))
            at_hit = bool(rng.integers(0, 2)) if rebate else False
            opt = str(rng.choice(["call", "put"]))
            n_mon = int(rng.integers(4, 24))
            monitors = build_monitoring_dates(VAL, MAT, "daily")[::max(1, 24 // n_mon)]
            if monitors[-1] != MAT:
                monitors = monitors + [MAT]
            pricers.append(DiscreteBarrierFDMPricer(
                spot=spot, strike=strike, valuation_date=VAL,
                maturity_date=MAT, sigma=sigma, option_type=opt,
                barrier_type=kind, lower_barrier=low, upper_barrier=upper,
                monitor_dates=monitors, rebate_amount=rebate,
                rebate_at_hit=at_hit, discount_curve=curve,
                underlying_spot_days=0, num_time_steps=n_time,
                fixed_num_space_nodes=511,
            ))
            rebates.append(rebate)
            at_hits.append(at_hit)

        tb = build_trade_batch(
            spots=[p.spot for p in pricers],
            strikes=[p.strike for p in pricers],
            sigmas=[p.sigma for p in pricers],
            t_expiry=[p.time_to_expiry for p in pricers],
            r=[p.discount_rate_nacc for p in pricers],
            b=[p.carry_rate_nacc for p in pricers],
            is_call=[p.option_type == "call" for p in pricers],
            n_time_steps=n_time,
            monitor_times=[p.monitor_times for p in pricers],
            lower=[p.lower_barrier for p in pricers],
            upper=[p.upper_barrier for p in pricers],
            rebate=rebates,
            rebate_at_hit=at_hits,
            num_space_nodes=511,
        )
        out = price_barrier_batch(tb, n_nodes=512, with_greeks=False)
        for i, p in enumerate(pricers):
            np.testing.assert_allclose(
                out["price"][i], p.price_log2(), rtol=1e-8, atol=1e-10,
                err_msg=f"trade {i}: {p.barrier_type} rebate={rebates[i]} at_hit={at_hits[i]}",
            )


class TestRandomizedAmericanConsistency:
    def test_random_american_trades_match_scalar(self):
        """Seeded fuzz: random American puts/calls with 0-2 discrete
        dividends, batched vs scalar price_log on the same grid."""
        from finite_difference_tpu.models.pde import AmericanFDMPricer
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch,
            price_american_batch,
        )
        from finite_difference_tpu.utils.curves import flat_curve

        rng = np.random.default_rng(77)
        VAL, MAT = dt.date(2025, 7, 28), dt.date(2026, 1, 28)
        curve = flat_curve(0.07, VAL)
        n_time = 150
        pricers = []
        for _ in range(8):
            n_div = int(rng.integers(0, 3))
            divs = [
                (VAL + dt.timedelta(days=int(rng.integers(30, 170))),
                 float(rng.uniform(1.0, 5.0)))
                for _ in range(n_div)
            ]
            divs.sort()
            pricers.append(AmericanFDMPricer(
                spot=float(rng.uniform(80.0, 130.0)),
                strike=float(rng.uniform(80.0, 130.0)),
                valuation_date=VAL, maturity_date=MAT,
                sigma=float(rng.uniform(0.15, 0.45)),
                option_type=str(rng.choice(["put", "call"])),
                discount_curve=curve, dividend_schedule=divs,
                num_space_nodes=250, num_time_steps=n_time,
                snap_spot_to_grid=False, snap_strike_to_grid=False,
            ))
        tb = build_american_batch(
            spots=[p.spot for p in pricers],
            strikes=[p.strike for p in pricers],
            sigmas=[p.sigma for p in pricers],
            t_expiry=[p.time_to_expiry for p in pricers],
            r=[p.discount_rate_nacc for p in pricers],
            b=[p.carry_rate_nacc for p in pricers],
            is_call=[p.option_type == "call" for p in pricers],
            n_time_steps=n_time,
            dividends_tau=[p._div_times_tau() for p in pricers],
            num_space_nodes=250,
        )
        out = price_american_batch(tb, n_nodes=251, with_greeks=False)
        for i, p in enumerate(pricers):
            np.testing.assert_allclose(
                out["price"][i], p.price_log(), rtol=1e-8,
                err_msg=f"trade {i}: {p.option_type} divs={len(p.dividend_schedule)}",
            )


class TestMeshChunking:
    def test_mesh_chunked_equals_mesh_single(self):
        """With a mesh, chunking keeps each device shard under max_chunk and
        is bit-identical to a single sharded launch."""
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        B = 48  # 6 trades/device; chunk at 2/device -> 3 chunks of 16
        t = 31.0 / 365.0
        rng = np.random.default_rng(5)
        tb = build_trade_batch(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B,
            r=[0.0705] * B,
            b=[0.0705] * B,
            is_call=[True] * B,
            n_time_steps=32,
            monitor_times=[[t * (k + 1) / 4.0 for k in range(4)]] * B,
            upper=[260.0] * B,
            num_space_nodes=127,
        )
        whole = price_barrier_batch(
            tb, n_nodes=128, mesh=mesh, max_chunk=None, solver="scan"
        )
        chunked = price_barrier_batch(
            tb, n_nodes=128, mesh=mesh, max_chunk=2, solver="scan"
        )
        for k in whole:
            np.testing.assert_array_equal(whole[k], chunked[k], err_msg=k)
        # spectral: chunked == single to FP tolerance over the mesh too
        whole_sp = price_barrier_batch(tb, n_nodes=128, mesh=mesh, max_chunk=None)
        chunked_sp = price_barrier_batch(tb, n_nodes=128, mesh=mesh, max_chunk=2)
        for k in whole_sp:
            np.testing.assert_allclose(
                whole_sp[k], chunked_sp[k], rtol=1e-9, atol=1e-10, err_msg=k
            )


class TestADGreeks:
    """greeks_mode='ad': jvp vega through the CN scan vs bump and truth."""

    def _kw(self, B=8, rng_seed=0):
        t = 31.0 / 365.0
        rng = np.random.default_rng(rng_seed)
        return dict(
            spots=list(rng.uniform(180.0, 250.0, B)),
            strikes=[190.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[t] * B, r=[0.0705] * B, b=[0.0705] * B,
            is_call=[True] * B, n_time_steps=64,
            monitor_times=[[t * (k + 1) / 8.0 for k in range(8)]] * B,
            upper=[260.0] * B, num_space_nodes=127,
        )

    def test_barrier_ad_vega_is_exact_derivative(self):
        """AD vega == central difference with tiny h (grids pinned so only
        the dynamics see the bump — the same convention the bump path
        uses); and it beats the production 1e-4 one-sided bump's error."""
        import dataclasses

        kw = self._kw()
        tb = build_trade_batch(**kw)
        ad = price_barrier_batch(tb, n_nodes=128, greeks_mode="ad")
        h = 1e-6
        up = dataclasses.replace(
            build_trade_batch(**{**kw, "sigmas": [s + h for s in kw["sigmas"]]}),
            x_min=tb.x_min, dx=tb.dx,
        )
        dn = dataclasses.replace(
            build_trade_batch(**{**kw, "sigmas": [s - h for s in kw["sigmas"]]}),
            x_min=tb.x_min, dx=tb.dx,
        )
        p_up = price_barrier_batch(up, n_nodes=128, with_greeks=False)["price"]
        p_dn = price_barrier_batch(dn, n_nodes=128, with_greeks=False)["price"]
        truth = (p_up - p_dn) / (2.0 * h) / 100.0
        np.testing.assert_allclose(ad["vega"], truth, rtol=1e-6, atol=1e-10)

        bump = price_barrier_batch(tb, n_nodes=128)["vega"]
        err_ad = np.abs(np.asarray(ad["vega"]) - truth)
        err_bump = np.abs(np.asarray(bump) - truth)
        assert np.all(err_ad <= err_bump + 1e-12)

    def test_barrier_ad_price_delta_gamma_match_bump_path(self):
        tb = build_trade_batch(**self._kw())
        ad = price_barrier_batch(tb, n_nodes=128, greeks_mode="ad")
        bump = price_barrier_batch(tb, n_nodes=128, greeks_mode="bump")
        for k in ("price", "delta", "gamma", "theta"):
            np.testing.assert_allclose(ad[k], bump[k], rtol=1e-12, err_msg=k)

    def test_american_ad_vega(self):
        """jvp through the Ikonen-Toivanen projection: matches tiny-h
        central difference away from the exercise-boundary kinks."""
        from finite_difference_tpu.models.pde.batch import (
            build_american_batch, price_american_batch,
        )

        B = 8
        rng = np.random.default_rng(3)
        kw = dict(
            spots=list(rng.uniform(150.0, 200.0, B)),
            strikes=[170.0] * B,
            sigmas=list(rng.uniform(0.2, 0.35, B)),
            t_expiry=[0.25] * B, r=[0.0705] * B, b=[0.0705] * B,
            is_call=[False] * B, n_time_steps=64, num_space_nodes=128,
        )
        tb = build_american_batch(**kw)
        ad = price_american_batch(tb, n_nodes=129, greeks_mode="ad")
        import dataclasses

        h = 1e-6
        up = dataclasses.replace(
            build_american_batch(**{**kw, "sigmas": [s + h for s in kw["sigmas"]]}),
            x_min=tb.x_min, dx=tb.dx,
        )
        dn = dataclasses.replace(
            build_american_batch(**{**kw, "sigmas": [s - h for s in kw["sigmas"]]}),
            x_min=tb.x_min, dx=tb.dx,
        )
        p_up = price_american_batch(up, n_nodes=129, with_greeks=False)["price"]
        p_dn = price_american_batch(dn, n_nodes=129, with_greeks=False)["price"]
        truth = (p_up - p_dn) / (2.0 * h) / 100.0
        np.testing.assert_allclose(ad["vega"], truth, rtol=5e-5, atol=1e-8)
        assert np.all(np.asarray(ad["vega"]) > 0)  # puts: positive vega
