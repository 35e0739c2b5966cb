// Native fast path for the non-compact U(1) heatbath sweep.
//
// The heatbath update is exact-Gaussian and site-sequential (each site's
// staple reads neighbors updated earlier in the same sweep), so it cannot
// be expressed as a data-parallel XLA computation; the reference keeps it
// as a serial CPU loop (reference u1/u1_utils.h:607-757). This C++ kernel
// is the production host path; qmg_tpu/u1.py falls back to NumPy when the
// shared library has not been built.
//
// Layout: phases is a (2, Y, X) row-major array of doubles: mu-major,
// then y, then x. phases[mu][y][x] = A_mu(x, y).

#include <cmath>
#include <cstdint>
#include <random>

// ---------------------------------------------------------------------------
// StdMT19937-stream-compatible path: the same engine + Marsaglia-polar
// normal as qmg_tpu/rng.py's StdMT19937 (itself a bit-exact
// reproduction of libstdc++ std::mt19937 / std::normal_distribution,
// validated against a compiled oracle in tests/test_rng.py). The state
// lives in the CALLER's buffers, so a sweep continues the Python
// object's stream mid-flight and hands it back in sync - determinism
// parity and native speed are no longer mutually exclusive.
// ---------------------------------------------------------------------------

namespace {

struct StdMT {
  uint32_t* mt;        // 624-word state (borrowed)
  int32_t* idx;        // position in [0, 624]
  double* saved;       // Marsaglia cached value
  int32_t* has_saved;

  static constexpr int N = 624, M = 397;
  static constexpr uint32_t MATRIX_A = 0x9908B0DFu;
  static constexpr uint32_t UPPER = 0x80000000u, LOWER = 0x7FFFFFFFu;

  void refill() {
    for (int i = 0; i < N; i++) {
      uint32_t y = (mt[i] & UPPER) | (mt[(i + 1) % N] & LOWER);
      mt[i] = mt[(i + M) % N] ^ (y >> 1) ^ ((y & 1u) ? MATRIX_A : 0u);
    }
    *idx = 0;
  }

  uint32_t raw() {
    if (*idx >= N) refill();
    uint32_t y = mt[(*idx)++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9D2C5680u;
    y ^= (y << 15) & 0xEFC60000u;
    y ^= y >> 18;
    return y;
  }

  double canonical() {
    // libstdc++ generate_canonical<double, 53>: low word first.
    const double g0 = raw();
    const double g1 = raw();
    return (g0 + g1 * 4294967296.0) / 18446744073709551616.0;
  }

  double normal(double stddev) {
    if (*has_saved) {
      *has_saved = 0;
      return *saved * stddev;
    }
    double x, y, r2;
    do {
      x = 2.0 * canonical() - 1.0;
      y = 2.0 * canonical() - 1.0;
      r2 = x * x + y * y;
    } while (r2 > 1.0 || r2 == 0.0);
    const double mult = std::sqrt(-2.0 * std::log(r2) / r2);
    *saved = x * mult;
    *has_saved = 1;
    return y * mult * stddev;
  }
};

}  // namespace

extern "C" void qmg_heatbath_sweeps_std(double* phases, int ylen, int xlen,
                                        double beta, int n_update,
                                        uint32_t* mt_state, int32_t* mt_idx,
                                        double* saved_normal,
                                        int32_t* has_saved) {
  const double width = std::sqrt(0.5 / beta);
  StdMT gen{mt_state, mt_idx, saved_normal, has_saved};

  double* ax = phases;
  double* ay = phases + (size_t)ylen * xlen;
  auto AX = [&](int y, int x) -> double& { return ax[(size_t)y * xlen + x]; };
  auto AY = [&](int y, int x) -> double& { return ay[(size_t)y * xlen + x]; };

  for (int iter = 0; iter < n_update; iter++) {
    for (int x = 0; x < xlen; x++) {
      const int xp = (x + 1) % xlen;
      for (int y = 0; y < ylen; y++) {
        const int yp = (y + 1) % ylen;
        const int ym = (y - 1 + ylen) % ylen;
        const double staple = AY(y, xp) - AX(yp, x) - AY(y, x)
                            - AY(ym, xp) - AX(ym, x) + AY(ym, x);
        AX(y, x) = gen.normal(width) - 0.5 * staple;
      }
    }
    for (int x = 0; x < xlen; x++) {
      const int xp = (x + 1) % xlen;
      const int xm = (x - 1 + xlen) % xlen;
      for (int y = 0; y < ylen; y++) {
        const int yp = (y + 1) % ylen;
        const double staple = AX(yp, x) - AY(y, xp) - AX(y, x)
                            - AX(yp, xm) - AY(y, xm) + AX(y, xm);
        AY(y, x) = gen.normal(width) - 0.5 * staple;
      }
    }
  }
}

extern "C" void qmg_heatbath_sweeps(double* phases, int ylen, int xlen,
                                    double beta, int n_update,
                                    uint64_t seed) {
  const double width = std::sqrt(0.5 / beta);
  std::mt19937_64 gen(seed);
  std::normal_distribution<double> dist(0.0, width);

  double* ax = phases;                            // A_x(y, x)
  double* ay = phases + (size_t)ylen * xlen;      // A_y(y, x)
  auto AX = [&](int y, int x) -> double& { return ax[(size_t)y * xlen + x]; };
  auto AY = [&](int y, int x) -> double& { return ay[(size_t)y * xlen + x]; };

  for (int iter = 0; iter < n_update; iter++) {
    // Update x links: sweep x outer, y inner (reference order :640-651).
    for (int x = 0; x < xlen; x++) {
      const int xp = (x + 1) % xlen;
      for (int y = 0; y < ylen; y++) {
        const int yp = (y + 1) % ylen;
        const int ym = (y - 1 + ylen) % ylen;
        const double staple = AY(y, xp) - AX(yp, x) - AY(y, x)
                            - AY(ym, xp) - AX(ym, x) + AY(ym, x);
        AX(y, x) = dist(gen) - 0.5 * staple;
      }
    }
    // Update y links (reference :655-666).
    for (int x = 0; x < xlen; x++) {
      const int xp = (x + 1) % xlen;
      const int xm = (x - 1 + xlen) % xlen;
      for (int y = 0; y < ylen; y++) {
        const int yp = (y + 1) % ylen;
        const double staple = AX(yp, x) - AY(y, xp) - AX(y, x)
                            - AX(yp, xm) - AY(y, xm) + AX(y, xm);
        AY(y, x) = dist(gen) - 0.5 * staple;
      }
    }
  }
}

// Test-only export: draw n polar normals (stddev 1) continuing the
// given StdMT19937 state - used by tests/test_rng.py to pin the C++
// and Python streams against each other draw-by-draw.
extern "C" void qmg_std_normals(int n, double* out, uint32_t* mt_state,
                                int32_t* mt_idx, double* saved_normal,
                                int32_t* has_saved) {
  StdMT gen{mt_state, mt_idx, saved_normal, has_saved};
  for (int i = 0; i < n; i++) out[i] = gen.normal(1.0);
}
