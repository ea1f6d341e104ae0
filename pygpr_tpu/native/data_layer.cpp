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

}  // extern "C"
