// Exact rectangular linear assignment (Jonker-Volgenant shortest augmenting
// path), C++ implementation exposed via a C ABI for ctypes.
//
// Host-side companion / oracle for the on-device solver
// (custom_d_fine_tpu/ops/lapjv.py). Same algorithm family as scipy's
// linear_sum_assignment (reference matcher.py:239-247 runs scipy per image);
// this removes the scipy dependency from the serving path and is used by the
// host tools (check_errors, validator cross-checks) and tests.
//
// Build: make -C native   (produces liblapjv.so)

#include <algorithm>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Solve min-cost assignment of nr rows to nc columns (nr <= nc).
// cost: row-major [nr, nc]. col4row: out, size nr. Returns 0 on success.
int solve_one(const float* cost, int nr, int nc, int32_t* col4row) {
  std::vector<double> u(nr, 0.0), v(nc, 0.0);
  std::vector<int32_t> row4col(nc, -1);
  std::vector<int32_t> c4r(nr, -1);
  std::vector<double> shortest(nc);
  std::vector<int32_t> path(nc);
  std::vector<char> SR(nr), SC(nc);

  for (int cur_row = 0; cur_row < nr; ++cur_row) {
    std::fill(shortest.begin(), shortest.end(), kInf);
    std::fill(path.begin(), path.end(), -1);
    std::fill(SR.begin(), SR.end(), 0);
    std::fill(SC.begin(), SC.end(), 0);

    double minVal = 0.0;
    int i = cur_row;
    int sink = -1;
    while (sink == -1) {
      SR[i] = 1;
      int index = -1;
      double lowest = kInf;
      const float* row = cost + static_cast<int64_t>(i) * nc;
      for (int j = 0; j < nc; ++j) {
        if (SC[j]) continue;
        double r = minVal + static_cast<double>(row[j]) - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          path[j] = i;
        }
        if (shortest[j] < lowest ||
            (shortest[j] == lowest && row4col[j] == -1)) {
          lowest = shortest[j];
          index = j;
        }
      }
      minVal = lowest;
      if (index == -1 || minVal == kInf) return -1;  // infeasible
      int j = index;
      if (row4col[j] == -1) {
        sink = j;
      } else {
        i = row4col[j];
      }
      SC[j] = 1;
    }

    u[cur_row] += minVal;
    for (int k = 0; k < nr; ++k) {
      if (SR[k] && k != cur_row) u[k] += minVal - shortest[c4r[k]];
    }
    for (int j = 0; j < nc; ++j) {
      if (SC[j]) v[j] -= minVal - shortest[j];
    }

    // augment
    int j = sink;
    while (true) {
      int pi = path[j];
      row4col[j] = pi;
      std::swap(c4r[pi], j);
      if (pi == cur_row) break;
    }
  }
  std::copy(c4r.begin(), c4r.end(), col4row);
  return 0;
}

}  // namespace

extern "C" {

// Batched solve: costs [n_problems, nr, nc] row-major; n_valid_rows per
// problem (rows beyond stay -1). out [n_problems, nr].
int lapjv_batch(const float* costs, int n_problems, int nr, int nc,
                const int32_t* n_valid_rows, int32_t* out) {
  for (int p = 0; p < n_problems; ++p) {
    const float* c = costs + static_cast<int64_t>(p) * nr * nc;
    int32_t* o = out + static_cast<int64_t>(p) * nr;
    std::fill(o, o + nr, -1);
    int n = n_valid_rows ? n_valid_rows[p] : nr;
    if (n <= 0) continue;
    if (n > nr) n = nr;
    int rc = solve_one(c, n, nc, o);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
