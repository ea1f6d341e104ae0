// Native data-layer kernels for pygpr_tpu.
//
// The TPU owns the GP math (XLA/Pallas); this library owns the
// host-side data preparation the reference delegates to slow Python
// loops: the Matérn type-I hard-core acceptance scan
// (PyGPR/sampler.py:23-48 — inherently sequential rejection sampling)
// and nearest-center assignment for grBCM expert partitioning
// (PyGPR/sampler.py:65-84, :103-119).  Exposed with a C ABI and loaded
// from Python via ctypes (pygpr_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC data_layer.cpp -o libpygpr_data.so

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Sequential hard-core acceptance over a fixed candidate buffer.
// cand: [m, dim] row-major; mask: [m] out (1 = accepted).
// Returns the number of accepted points.  A candidate is accepted iff
// its distance to every previously accepted point exceeds
// min_dist + tol (reference tolerance semantics, sampler.py:41).
int hard_core_accept(const double* cand, int m, int dim, double min_dist,
                     double tol, uint8_t* mask) {
  std::vector<double> acc;       // packed accepted points
  acc.reserve(static_cast<size_t>(m) * dim);
  int k = 0;
  const double lim = min_dist + tol;          // d > min_dist + tol
  const double lim2 = lim * lim;              // compare squared
  for (int i = 0; i < m; ++i) {
    const double* c = cand + static_cast<size_t>(i) * dim;
    bool ok = true;
    for (int a = 0; a < k; ++a) {
      const double* p = acc.data() + static_cast<size_t>(a) * dim;
      double d2 = 0.0;
      for (int t = 0; t < dim; ++t) {
        const double diff = p[t] - c[t];
        d2 += diff * diff;
      }
      if (d2 <= lim2) {
        ok = false;
        break;
      }
    }
    if (ok || k == 0) {
      for (int t = 0; t < dim; ++t) acc.push_back(c[t]);
      mask[i] = 1;
      ++k;
    } else {
      mask[i] = 0;
    }
  }
  return k;
}

// Nearest-center assignment: x [n, dim], xc [nc, dim] -> idx [n].
void nearest_center(const double* x, int n, const double* xc, int nc, int dim,
                    int32_t* idx) {
  for (int i = 0; i < n; ++i) {
    const double* xi = x + static_cast<size_t>(i) * dim;
    double best = INFINITY;
    int32_t bj = 0;
    for (int j = 0; j < nc; ++j) {
      const double* cj = xc + static_cast<size_t>(j) * dim;
      double d2 = 0.0;
      for (int t = 0; t < dim; ++t) {
        const double diff = xi[t] - cj[t];
        d2 += diff * diff;
      }
      if (d2 < best) {
        best = d2;
        bj = j;
      }
    }
    idx[i] = bj;
  }
}

// Squared-distance matrix in one pass: out[i*m + j] = ||x_i - y_j||^2.
void sq_dist_matrix(const double* x, int n, const double* y, int m, int dim,
                    double* out) {
  for (int i = 0; i < n; ++i) {
    const double* xi = x + static_cast<size_t>(i) * dim;
    double* row = out + static_cast<size_t>(i) * m;
    for (int j = 0; j < m; ++j) {
      const double* yj = y + static_cast<size_t>(j) * dim;
      double d2 = 0.0;
      for (int t = 0; t < dim; ++t) {
        const double diff = xi[t] - yj[t];
        d2 += diff * diff;
      }
      row[j] = d2;
    }
  }
}


// ---------------------------------------------------------------------
// SKI sufficient-statistics accumulation (models/ski.py direct path).
//
// The direct SKI solve needs only Z = W'W [G, G], W'y [G], y'y - plain
// sums over data points through the 4^d-tap cubic-convolution stencil
// (Keys a = -1/2, mirroring models/ski.py::_cubic_taps).  This C++
// accumulator streams CHUNKS of (x, y) so arbitrarily large datasets
// never need to fit in memory: Python hands it np.memmap slices and it
// ADDS into caller-owned f64 accumulators (higher precision than the
// f32 device scatter).  The TPU then runs the O(G^3) fit on the final
// G-sized statistics.
//
// x: [m, d] float64 chunk (row-major), y: [m] float64,
// lo/h: [d] grid origin/spacing, sizes: [d] nodes per dim (d <= 4),
// Z: [G, G] f64 accumulator, wty: [G] f64, yty: [1] f64.
// Returns 0 on success, -1 on bad arguments.

static inline void cubic_taps(double t, int gmax, long* i4, double* w4) {
  double fl = std::floor(t);
  long i0 = static_cast<long>(fl) - 1;
  double s = t - fl;
  double u = 1.0 + s;
  w4[0] = ((-0.5 * u + 2.5) * u - 4.0) * u + 2.0;
  u = s;
  w4[1] = (1.5 * u - 2.5) * u * u + 1.0;
  u = 1.0 - s;
  w4[2] = (1.5 * u - 2.5) * u * u + 1.0;
  u = 2.0 - s;
  w4[3] = ((-0.5 * u + 2.5) * u - 4.0) * u + 2.0;
  if (i0 < 0) i0 = 0;
  if (i0 > gmax - 4) i0 = gmax - 4;
  for (int k = 0; k < 4; ++k) i4[k] = i0 + k;
}

int ski_stats_accum(const double* x, const double* y, long m, int d,
                    const double* lo, const double* h, const int* sizes,
                    double* Z, double* wty, double* yty) {
  if (d < 1 || d > 4) return -1;
  long G = 1;
  long strides[4];
  for (int j = 0; j < d; ++j) G *= sizes[j];
  strides[d - 1] = 1;
  for (int j = d - 2; j >= 0; --j)
    strides[j] = strides[j + 1] * sizes[j + 1];

  int ntap = 1;
  for (int j = 0; j < d; ++j) ntap *= 4;  // <= 256

  long idx4[4][4];
  double w4[4][4];
  long flat[256];
  double wt[256];

  double yy = 0.0;
  for (long i = 0; i < m; ++i) {
    const double* xi = x + static_cast<size_t>(i) * d;
    for (int j = 0; j < d; ++j) {
      double t = (xi[j] - lo[j]) / h[j];
      cubic_taps(t, sizes[j], idx4[j], w4[j]);
    }
    // unroll the 4^d tensor-product taps
    for (int c = 0; c < ntap; ++c) {
      int cc = c;
      long f = 0;
      double w = 1.0;
      for (int j = d - 1; j >= 0; --j) {
        int tj = cc & 3;
        cc >>= 2;
        f += idx4[j][tj] * strides[j];
        w *= w4[j][tj];
      }
      flat[c] = f;
      wt[c] = w;
    }
    const double yi = y[i];
    yy += yi * yi;
    for (int a = 0; a < ntap; ++a) {
      wty[flat[a]] += wt[a] * yi;
      double* zrow = Z + static_cast<size_t>(flat[a]) * G;
      for (int b = 0; b < ntap; ++b) zrow[flat[b]] += wt[a] * wt[b];
    }
  }
  yty[0] += yy;
  return 0;
}

// Shuffled row gather from a (possibly memory-mapped) f32 matrix:
// src [n, row] -> out [m, row] taking rows idx[0..m).  The hot loop of
// the minibatch loader (utils/dataset.py); ctypes releases the GIL so
// a Python prefetch thread overlaps this with TPU compute.
void gather_rows_f32(const float* src, long n, int row, const long* idx,
                     long m, float* out) {
  (void)n;
  for (long i = 0; i < m; ++i) {
    const float* s = src + static_cast<size_t>(idx[i]) * row;
    float* o = out + static_cast<size_t>(i) * row;
    for (int j = 0; j < row; ++j) o[j] = s[j];
  }
}

}  // extern "C"
