// Native host-side data preprocessing for msmp_pde_tpu.
//
// The TPU compute path is JAX/XLA; this library is the *runtime* side —
// multithreaded dataset preprocessing that feeds the device:
//
//   * avg_downproject   — the 5-tap [0.2]*5 strided averaging that projects
//     super-resolution trajectories onto the base grid (reference semantics:
//     /root/reference/common/utils.py:167-219), periodic or zero padding;
//   * mean_downproject  — the ratio-wide mean kernel for the wave equation
//     (utils.py:224-230);
//   * knn_neighbors     — k-nearest-neighbor lists for unstructured grids
//     (replaces torch_cluster's CUDA knn_graph, utils.py:376-380).
//
// Exported with C linkage and called through ctypes (no pybind11 in this
// toolchain). Threading: a simple row-sharded std::thread pool — the arrays
// are embarrassingly parallel over (sample, time) rows.
//
// Build: make -C native   (produces libmsmp_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_rows(int64_t n_rows, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned n_threads = std::min<unsigned>(
      std::thread::hardware_concurrency(), 16);
  if (n_threads <= 1 || n_rows < 64) {
    fn(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n_rows);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// u: [n_rows, nx] float64; out: [n_rows, nx/ratio].
// pad_mode: 0 = periodic (left u[nx-3:nx-1], right u[1:3]), 1 = zero.
void avg_downproject(const double* u, double* out, int64_t n_rows,
                     int64_t nx, int64_t ratio, int pad_mode) {
  const int64_t n_out = nx / ratio;
  parallel_rows(n_rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const double* row = u + r * nx;
      double* orow = out + r * n_out;
      for (int64_t i = 0; i < n_out; ++i) {
        // window over padded indices [i*ratio .. i*ratio+4], pad width 2
        double acc = 0.0;
        for (int64_t j = 0; j < 5; ++j) {
          int64_t p = i * ratio + j - 2;  // index into the unpadded row
          double v;
          if (p < 0) {
            // padded left = u[nx-3:nx-1] => p=-2 -> nx-3, p=-1 -> nx-2
            v = (pad_mode == 0) ? row[nx + p - 1] : 0.0;
          } else if (p >= nx) {
            // padded right = u[1:3] => p=nx -> 1, p=nx+1 -> 2
            v = (pad_mode == 0) ? row[p - nx + 1] : 0.0;
          } else {
            v = row[p];
          }
          acc += 0.2 * v;
        }
        orow[i] = acc;
      }
    }
  });
}

// WE down-projection: ratio-wide mean, stride ratio, valid.
void mean_downproject(const double* u, double* out, int64_t n_rows,
                      int64_t nx, int64_t ratio) {
  const int64_t n_out = nx / ratio;
  parallel_rows(n_rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const double* row = u + r * nx;
      double* orow = out + r * n_out;
      for (int64_t i = 0; i < n_out; ++i) {
        double acc = 0.0;
        for (int64_t j = 0; j < ratio; ++j) acc += row[i * ratio + j];
        orow[i] = acc / static_cast<double>(ratio);
      }
    }
  });
}

// pts: [n, d]; idx out: [n, k] nearest neighbors (self excluded),
// ties broken by index order (matching a stable distance sort).
void knn_neighbors(const double* pts, int64_t n, int64_t d, int64_t k,
                   int32_t* idx) {
  parallel_rows(n, [=](int64_t lo, int64_t hi) {
    std::vector<std::pair<double, int32_t>> dist(n);
    for (int64_t i = lo; i < hi; ++i) {
      for (int64_t j = 0; j < n; ++j) {
        double acc = 0.0;
        for (int64_t c = 0; c < d; ++c) {
          double diff = pts[i * d + c] - pts[j * d + c];
          acc += diff * diff;
        }
        dist[j] = {j == i ? INFINITY : acc, static_cast<int32_t>(j)};
      }
      std::partial_sort(dist.begin(), dist.begin() + k, dist.end());
      for (int64_t m = 0; m < k; ++m) idx[i * k + m] = dist[m].second;
    }
  });
}

}  // extern "C"
