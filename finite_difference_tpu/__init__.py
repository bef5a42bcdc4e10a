"""finite_difference_tpu — a TPU-native derivative-pricing and XVA framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
quant-validation library ``rwx-gigaba-sonwabo/Finite_Difference``:

- Crank–Nicolson / fully-implicit finite-difference pricers for American and
  discretely-monitored barrier options (Rannacher smoothing, Ikonen–Toivanen
  early exercise, KO projection at monitor dates, discrete-dividend jumps,
  barrier-aware Greeks), batched over thousands of trades per chip.
- The analytic validation layer: Black–Scholes/Black-76, Reiner–Rubinstein
  single barrier, Douady double barrier, Bjerksund–Stensland 1993/2002,
  BGK/Hörfelt discrete-barrier approximations.
- Monte Carlo path pricers (threefry counter-based RNG, optional Sobol) and
  scenario simulators (GBM, Clewlow–Strickland, HW1F).
- A netting-set exposure / CVA engine with collateral (CSA / MPOR) simulation.
- Calibration pipelines and a scenario-CSV benchmark-diff harness.

Architecture: dates/calendars/curve bootstrapping live on the host as plain
Python/numpy; everything after "floats resolved" is a pure, jit/vmap/pjit-able
function over struct-of-arrays batches, with Pallas kernels for the hot
tridiagonal / time-stepping loops.
"""

__version__ = "0.1.0"
