"""Multi-asset commodity forward CVA run.

The framework equivalent of the reference's `xva_commodity_forward_main.py`
(:202-356): per asset, simulate the Clewlow-Strickland forward curve,
value the averaging forward on every scenario date (one fused device op),
and report EE/PFE/CVA.

Run:  python examples/xva_commodity_forward.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# f64 validation pipeline: CPU is the default backend (x64 on the TPU is
# emulated, slower and pointless for a host-side golden comparison); pass
# --tpu to run on the device anyway. --cpu is accepted as a no-op for
# symmetry with the device-first examples. In-process jax.config is the
# only override that works — the preloaded TPU plugin ignores the
# JAX_PLATFORMS env var.
import jax

if "--tpu" in sys.argv:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from finite_difference_tpu.models.mc import CSParams
from finite_difference_tpu.runners import run_asset
from finite_difference_tpu.xva import SamplingConvention, SimulationConfig

ASSETS = {
    "BRENT": dict(
        initial_curve=np.array([78.0, 79.5, 80.2, 81.0, 81.5]),
        tenor_days=np.array([30.0, 90.0, 180.0, 270.0, 365.0]),
        cs_params=CSParams(alpha=1.1, sigma=0.35, mu=0.0),
    ),
    "GOLD": dict(
        initial_curve=np.array([2400.0, 2410.0, 2425.0, 2450.0]),
        tenor_days=np.array([90.0, 180.0, 270.0, 365.0]),
        cs_params=CSParams(alpha=0.4, sigma=0.14, mu=0.0),
    ),
}


def main():
    sim_cfg = SimulationConfig(num_sims=20_000, seed=1, dt_days=5, horizon_days=300)
    for code, spec in ASSETS.items():
        out = run_asset(
            code,
            sim_cfg=sim_cfg,
            discount_rate=0.05,
            hazard_rate=0.02,
            recovery=0.4,
            sampling=SamplingConvention.DAILY,
            rng_backend="threefry",
            **spec,
        )
        print(
            f"{code}: strike={out['strike']:.3f} maturity_day={out['maturity_day']} "
            f"peak EE={out['peak_ee']:.4f} peak PFE={out['peak_pfe']:.4f} "
            f"CVA={out['cva']:.6f}"
        )


if __name__ == "__main__":
    main()
