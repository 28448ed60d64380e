// Jonker-Volgenant linear assignment solver (dense, rectangular).
//
// TPU-native runtime component replacing the reference's external C
// dependency (lapsolver via motmetrics; import sites:
// mmtrack/models/mot/trackers/sort_tracker.py:4, core/evaluation/eval_mot.py:10).
// The tracking loop is host-side and sequential; this solver runs per frame
// on the CPU while the conv nets run on the TPU.
//
// Algorithm: shortest augmenting path (JV), O(n^3), operating on a row-major
// cost matrix padded to square with a large finite cost. Exposed with C
// linkage for ctypes.

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Solve min-cost assignment. cost: n_rows x n_cols row-major doubles.
// row_to_col / col_to_row: output assignments (-1 = unassigned).
// Returns total assignment cost over assigned pairs.
double lap_solve(const double* cost, int32_t n_rows, int32_t n_cols,
                 int32_t* row_to_col, int32_t* col_to_row) {
  const int n = n_rows > n_cols ? n_rows : n_cols;
  const double INF = std::numeric_limits<double>::infinity();
  // find max finite cost for padding
  double maxc = 0.0;
  for (int i = 0; i < n_rows * n_cols; ++i) {
    if (cost[i] < INF && cost[i] > maxc) maxc = cost[i];
  }
  const double PAD = maxc + 1.0;

  auto C = [&](int r, int c) -> double {
    if (r < n_rows && c < n_cols) {
      double v = cost[r * n_cols + c];
      return v < INF ? v : PAD * 2.0;
    }
    return PAD;  // padded rows/cols
  };

  // JV shortest augmenting path (see Jonker & Volgenant 1987)
  std::vector<double> u(n, 0.0), v(n, 0.0);
  std::vector<int> p(n + 1, -1);   // p[c+1] = row assigned to col c (shifted)
  std::vector<int> way(n, 0);

  for (int i = 0; i < n; ++i) {
    // augment row i
    std::vector<double> minv(n, INF);
    std::vector<char> used(n + 1, 0);
    int j0 = n;  // virtual start col
    p[n] = i;
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = INF;
      for (int j = 0; j < n; ++j) {
        if (used[j]) continue;
        double cur = C(i0, j) - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          if (j < n) { v[j] -= delta; }
        } else if (j < n) {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != -1);
    // augmenting path back-walk
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != n);
  }

  for (int r = 0; r < n_rows; ++r) row_to_col[r] = -1;
  for (int c = 0; c < n_cols; ++c) col_to_row[c] = -1;
  double total = 0.0;
  for (int c = 0; c < n; ++c) {
    int r = p[c];
    if (r >= 0 && r < n_rows && c < n_cols) {
      double v0 = cost[r * n_cols + c];
      if (v0 < std::numeric_limits<double>::infinity()) {
        row_to_col[r] = c;
        col_to_row[c] = r;
        total += v0;
      }
    }
  }
  return total;
}

// Greedy IoU matching (SORT fallback path): repeatedly take the global
// minimum. cost as above; pairs below `thr` only.
int32_t greedy_solve(const double* cost, int32_t n_rows, int32_t n_cols,
                     double thr, int32_t* row_to_col, int32_t* col_to_row) {
  std::vector<char> rused(n_rows, 0), cused(n_cols, 0);
  for (int r = 0; r < n_rows; ++r) row_to_col[r] = -1;
  for (int c = 0; c < n_cols; ++c) col_to_row[c] = -1;
  int matched = 0;
  while (true) {
    double best = thr;
    int br = -1, bc = -1;
    for (int r = 0; r < n_rows; ++r) {
      if (rused[r]) continue;
      for (int c = 0; c < n_cols; ++c) {
        if (cused[c]) continue;
        double v = cost[r * n_cols + c];
        if (v < best) { best = v; br = r; bc = c; }
      }
    }
    if (br < 0) break;
    rused[br] = 1; cused[bc] = 1;
    row_to_col[br] = bc; col_to_row[bc] = br;
    ++matched;
  }
  return matched;
}

}  // extern "C"
