// Native host-side batch builder for the CN barrier sweep path.
//
// The framework's device kernels consume fixed-shape struct-of-arrays
// batches; canonicalising a large scenario table (per-trade log grids +
// time schedules) is pure host work and the per-trade Python loop in
// models/pde/batch.build_trade_batch becomes the bottleneck for 100k+
// scenario sweeps. This C++ implementation reproduces the grid policy of
// grid.barrier_log_grid (the reference's choose_grid_parameters,
// discrete_barrier_fdm_pricer.py:270-340) and grid.uniform_schedule
// (discrete_barrier_fdm_pricer.py:442-547) bit-compatibly, writing straight
// into caller-allocated numpy buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC fd_native.cpp -o libfdnative.so
// Loaded via ctypes (finite_difference_tpu.native).

#include <cmath>
#include <cstdint>
#include <algorithm>

namespace {
constexpr double PPF_99999 = 4.264890793922602;  // Phi^{-1}(0.99999)
}

extern "C" {

// Per-trade barrier log-grid policy. Arrays length B; barriers use
// has_lower/has_upper flags (levels ignored when flag is 0).
// Outputs: x_min, dx (length B).
void barrier_log_grids(
    const double* spot_eff, const double* strike, const double* sigma,
    const double* t_expiry,
    const double* lower, const double* upper,
    const uint8_t* has_lower, const uint8_t* has_upper,
    int64_t batch, int64_t num_space_nodes,
    double* x_min_out, double* dx_out) {
  for (int64_t i = 0; i < batch; ++i) {
    double s_low = std::min(spot_eff[i], strike[i]);
    double s_high = std::max(spot_eff[i], strike[i]);
    if (has_lower[i] && lower[i] > 0.0) {
      s_low = std::min(s_low, lower[i]);
      s_high = std::max(s_high, lower[i]);
    }
    if (has_upper[i] && upper[i] > 0.0) {
      s_low = std::min(s_low, upper[i]);
      s_high = std::max(s_high, upper[i]);
    }
    const double sqrt_t = std::sqrt(std::max(t_expiry[i], 1e-12));
    const double domain_width = 2.0 * PPF_99999 * sigma[i] * sqrt_t;
    const double x_c = std::log(std::sqrt(s_low * s_high));
    double s_min = std::exp(x_c - 0.5 * domain_width);
    double s_max = std::exp(x_c + 0.5 * domain_width);
    s_min = std::max(std::min(s_min, 0.5 * s_low), 1e-12);
    s_max = std::max(s_max, 2.0 * s_high);
    const double x_min = std::log(s_min);
    const double x_max = std::log(s_max);
    x_min_out[i] = x_min;
    dx_out[i] = (x_max - x_min) / static_cast<double>(num_space_nodes);
  }
}

// Per-trade uniform time schedules (constant dt = T/n, Rannacher theta=1 on
// the first `rannacher` steps near expiry, KO monitor flags mapped with
// k = floor((T - t_mon)/dt + 1e-9) clamped to [1, n]).
//
// monitor_times is flattened ragged storage: trade i owns
// monitor_times[mon_offsets[i] .. mon_offsets[i+1]).
// Outputs are (B, n_steps) row-major: dt, theta, tau_next; monitor uint8.
void uniform_schedules(
    const double* t_expiry, int64_t batch, int64_t n_steps, int64_t rannacher,
    const double* monitor_times, const int64_t* mon_offsets,
    double* dt_out, double* theta_out, double* tau_next_out,
    uint8_t* monitor_out) {
  for (int64_t i = 0; i < batch; ++i) {
    const double T = t_expiry[i];
    const double dt = T / static_cast<double>(n_steps);
    double* dt_row = dt_out + i * n_steps;
    double* th_row = theta_out + i * n_steps;
    double* tau_row = tau_next_out + i * n_steps;
    uint8_t* mon_row = monitor_out + i * n_steps;
    for (int64_t k = 0; k < n_steps; ++k) {
      dt_row[k] = dt;
      th_row[k] = (k < rannacher) ? 1.0 : 0.5;
      tau_row[k] = dt * static_cast<double>(k + 1);
      mon_row[k] = 0;
    }
    for (int64_t m = mon_offsets[i]; m < mon_offsets[i + 1]; ++m) {
      const double t_mon = monitor_times[m];
      if (t_mon <= 0.0 || t_mon > T) continue;
      const double tau_mon = T - t_mon;
      int64_t k = static_cast<int64_t>(std::floor(tau_mon / dt + 1e-9));
      k = std::max<int64_t>(1, std::min<int64_t>(n_steps, k));
      mon_row[k - 1] = 1;
    }
  }
}

}  // extern "C"
