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
