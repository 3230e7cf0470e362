// neighbor_graph.cpp — host-side fixed-radius neighbor graph (grid hash).
//
// Native replacement for two reference components (SURVEY.md §2.20):
//   * the external C++ `Executables/ConnectedGraph` binary invoked by
//     segUtils/planeUtils.py:37-49 (connected-vertex graph with max_point /
//     min_dist arguments, consumed as a VIDs CSV), and
//   * the sklearn KDTree radius adjacency computed at fusion dump time
//     (fusion.py:374-375).
//
// Design: spatial grid over cells of side `radius`. Fast path (the usual
// bounded-extent cloud): a DENSE cell array over the bbox — counting sort
// assigns every point a cell-ordered slot, the point coordinates are
// REORDERED into that slot (queries stream contiguous memory, no gather),
// and each query scans 9 z-contiguous cell runs instead of 27 hash-map
// probes (cell id = ((x*ny)+y)*nz + z keeps z±1 adjacent). Degenerate
// extents (cell count > 2^24, e.g. a microscopic radius) fall back to the
// original unordered_map spatial hash. O(N) build either way,
// OpenMP-free (single core in this image) but trivially parallelizable.
// Measured on the e2e cloud (103k pts, r=0.10, k=16): dense 0.21 s vs
// hash 0.33 s (1.6x); connected_components via the same grid runs the
// whole same-label union in 0.08 s. Exposed as a C ABI for ctypes
// (fusion3dseg_tpu/io/native.py) and as a standalone CLI compatible with the
// ConnectedGraph argument order: <in.csv|ply> <out.csv> <max_point>
// <min_dist> <c> <visualize>.
//
// Build: make -C native  (produces libneighbor_graph.so + connected_graph)

#include <cstdint>
#include <cstdio>
#include <functional>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <string>
#include <unordered_map>
#include <algorithm>

namespace {

struct CellKey {
  int32_t x, y, z;
  bool operator==(const CellKey& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct CellKeyHash {
  size_t operator()(const CellKey& k) const {
    // large-prime mix; good spread for lattice coordinates
    return (size_t)k.x * 73856093u ^ (size_t)k.y * 19349663u ^ (size_t)k.z * 83492791u;
  }
};

struct Grid {
  float inv_cell;
  std::unordered_map<CellKey, std::pair<int32_t, int32_t>, CellKeyHash> ranges;  // cell -> [begin,end) in order
  std::vector<int32_t> order;  // point indices grouped by cell
};

Grid build_grid(const float* pts, int64_t n, float radius) {
  Grid g;
  g.inv_cell = 1.0f / radius;
  std::vector<CellKey> keys((size_t)n);
  std::unordered_map<CellKey, int32_t, CellKeyHash> counts;
  counts.reserve((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    CellKey k{(int32_t)std::floor(pts[3 * i + 0] * g.inv_cell),
              (int32_t)std::floor(pts[3 * i + 1] * g.inv_cell),
              (int32_t)std::floor(pts[3 * i + 2] * g.inv_cell)};
    keys[(size_t)i] = k;
    counts[k]++;
  }
  // CSR layout: assign each cell a contiguous range
  g.ranges.reserve(counts.size());
  int32_t offset = 0;
  for (auto& kv : counts) {
    g.ranges.emplace(kv.first, std::make_pair(offset, offset));
    offset += kv.second;
  }
  g.order.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    auto& r = g.ranges[keys[(size_t)i]];
    g.order[(size_t)r.second++] = (int32_t)i;
  }
  return g;
}

// Dense-grid fast path: cell array over the bbox, points counting-sorted
// AND reordered into cell order so every query streams contiguous memory.
struct DenseGrid {
  float inv_cell;
  int32_t ox, oy, oz;            // minimum cell coordinate per axis
  int32_t nx, ny, nz;            // grid dims
  std::vector<int32_t> start;    // [ncells + 1] CSR cell starts
  std::vector<int32_t> order;    // [n] original point id per sorted slot
  std::vector<float> sp;         // [n * 3] coordinates in sorted-slot order
};

constexpr int64_t kDenseMaxCells = (int64_t)1 << 24;

// Returns false (leaving g untouched) when the extent is degenerate —
// non-finite coordinates or more than kDenseMaxCells cells.
bool build_dense(const float* pts, int64_t n, float radius, DenseGrid& g) {
  float mn[3], mx[3];
  for (int d = 0; d < 3; ++d) { mn[d] = pts[d]; mx[d] = pts[d]; }
  for (int64_t i = 1; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      const float v = pts[3 * i + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  for (int d = 0; d < 3; ++d)
    if (!std::isfinite(mn[d]) || !std::isfinite(mx[d])) return false;
  const float inv = 1.0f / radius;
  int64_t cmin[3], cmax[3];
  for (int d = 0; d < 3; ++d) {
    cmin[d] = (int64_t)std::floor(mn[d] * inv);
    cmax[d] = (int64_t)std::floor(mx[d] * inv);
    if (cmax[d] - cmin[d] + 1 > kDenseMaxCells) return false;
  }
  const int64_t nx = cmax[0] - cmin[0] + 1, ny = cmax[1] - cmin[1] + 1,
                nz = cmax[2] - cmin[2] + 1;
  if (nx * ny > kDenseMaxCells / nz) return false;  // overflow-safe product cap
  const int64_t ncells = nx * ny * nz;

  g.inv_cell = inv;
  g.ox = (int32_t)cmin[0]; g.oy = (int32_t)cmin[1]; g.oz = (int32_t)cmin[2];
  g.nx = (int32_t)nx; g.ny = (int32_t)ny; g.nz = (int32_t)nz;
  std::vector<int32_t> cell((size_t)n);
  g.start.assign((size_t)ncells + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t cx = (int64_t)std::floor(pts[3 * i + 0] * inv) - cmin[0];
    const int64_t cy = (int64_t)std::floor(pts[3 * i + 1] * inv) - cmin[1];
    const int64_t cz = (int64_t)std::floor(pts[3 * i + 2] * inv) - cmin[2];
    const int64_t id = (cx * ny + cy) * nz + cz;
    cell[(size_t)i] = (int32_t)id;
    g.start[(size_t)id + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) g.start[(size_t)c + 1] += g.start[(size_t)c];
  g.order.resize((size_t)n);
  g.sp.resize((size_t)n * 3);
  std::vector<int32_t> cur(g.start.begin(), g.start.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t s = cur[(size_t)cell[(size_t)i]]++;
    g.order[(size_t)s] = (int32_t)i;
    g.sp[(size_t)s * 3 + 0] = pts[3 * i + 0];
    g.sp[(size_t)s * 3 + 1] = pts[3 * i + 1];
    g.sp[(size_t)s * 3 + 2] = pts[3 * i + 2];
  }
  return true;
}

// Visit every sorted slot within `radius`-adjacent cells of (px,py,pz):
// 9 (dx,dy) columns, each a single CONTIGUOUS z-run of up to 3 cells.
template <typename Fn>
inline void dense_scan(const DenseGrid& g, float px, float py, float pz,
                       Fn&& fn) {
  const int32_t cx = (int32_t)std::floor(px * g.inv_cell) - g.ox;
  const int32_t cy = (int32_t)std::floor(py * g.inv_cell) - g.oy;
  const int32_t cz = (int32_t)std::floor(pz * g.inv_cell) - g.oz;
  const int32_t z0 = cz > 0 ? cz - 1 : 0;
  const int32_t z1 = cz + 1 < g.nz ? cz + 1 : g.nz - 1;
  for (int32_t xx = cx - 1 < 0 ? 0 : cx - 1; xx <= (cx + 1 >= g.nx ? g.nx - 1 : cx + 1); ++xx)
    for (int32_t yy = cy - 1 < 0 ? 0 : cy - 1; yy <= (cy + 1 >= g.ny ? g.ny - 1 : cy + 1); ++yy) {
      const int64_t base = ((int64_t)xx * g.ny + yy) * g.nz;
      const int32_t s0 = g.start[(size_t)(base + z0)];
      const int32_t s1 = g.start[(size_t)(base + z1 + 1)];
      for (int32_t s = s0; s < s1; ++s) fn(s);
    }
}

}  // namespace

extern "C" {

// Fixed-degree adjacency: adj[n*k] int32, -1 padded, neighbors sorted by
// distance (self included, matching KDTree.query_radius semantics).
// Returns 0 on success.
int radius_graph(const float* pts, int64_t n, float radius, int32_t k,
                 int32_t* adj) {
  if (n <= 0 || k <= 0) return 1;
  const float r2 = radius * radius;
  std::vector<std::pair<float, int32_t>> cand;
  cand.reserve(64);

  DenseGrid dg;
  if (build_dense(pts, n, radius, dg)) {
    // iterate in CELL order (query centers share their 27-cell window with
    // the previous query), writing each result to its original row
    for (int64_t q = 0; q < n; ++q) {
      const float px = dg.sp[3 * q], py = dg.sp[3 * q + 1],
                  pz = dg.sp[3 * q + 2];
      const int32_t i = dg.order[(size_t)q];
      cand.clear();
      dense_scan(dg, px, py, pz, [&](int32_t s) {
        const float ddx = dg.sp[3 * s] - px, ddy = dg.sp[3 * s + 1] - py,
                    ddz = dg.sp[3 * s + 2] - pz;
        const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
        if (d2 <= r2) cand.emplace_back(d2, dg.order[(size_t)s]);
      });
      const int32_t kk = (int32_t)std::min<size_t>((size_t)k, cand.size());
      std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
      for (int32_t s = 0; s < kk; ++s) adj[(int64_t)i * k + s] = cand[(size_t)s].second;
      for (int32_t s = kk; s < k; ++s) adj[(int64_t)i * k + s] = -1;
    }
    return 0;
  }

  Grid g = build_grid(pts, n, radius);
  for (int64_t i = 0; i < n; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const int32_t cx = (int32_t)std::floor(px * g.inv_cell);
    const int32_t cy = (int32_t)std::floor(py * g.inv_cell);
    const int32_t cz = (int32_t)std::floor(pz * g.inv_cell);
    cand.clear();
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = g.ranges.find(CellKey{cx + dx, cy + dy, cz + dz});
          if (it == g.ranges.end()) continue;
          for (int32_t s = it->second.first; s < it->second.second; ++s) {
            const int32_t j = g.order[(size_t)s];
            const float ddx = pts[3 * j] - px, ddy = pts[3 * j + 1] - py,
                        ddz = pts[3 * j + 2] - pz;
            const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 <= r2) cand.emplace_back(d2, j);
          }
        }
    const int32_t kk = (int32_t)std::min<size_t>((size_t)k, cand.size());
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (int32_t s = 0; s < kk; ++s) adj[i * k + s] = cand[(size_t)s].second;
    for (int32_t s = kk; s < k; ++s) adj[i * k + s] = -1;
  }
  return 0;
}

// Variable-degree adjacency in CSR form (two-pass). Caller first calls with
// indices == nullptr to obtain counts in offsets[1..n] (offsets[0]=0 after
// exclusive scan done caller-side is NOT required: this fills offsets as
// prefix sums already), then allocates indices[offsets[n]] and calls again.
int radius_graph_csr(const float* pts, int64_t n, float radius,
                     int64_t* offsets, int32_t* indices) {
  if (n <= 0) return 1;
  const float r2 = radius * radius;

  DenseGrid dg;
  if (build_dense(pts, n, radius, dg)) {
    // counts are recomputed on the fill call too: the C contract only
    // promises the caller re-passes the same offsets buffer, and the
    // count scan is cheap next to the fill's writes
    std::vector<int64_t> cnt((size_t)n, 0);
    for (int64_t q = 0; q < n; ++q) {
      const float px = dg.sp[3 * q], py = dg.sp[3 * q + 1],
                  pz = dg.sp[3 * q + 2];
      int64_t c = 0;
      dense_scan(dg, px, py, pz, [&](int32_t s) {
        const float ddx = dg.sp[3 * s] - px, ddy = dg.sp[3 * s + 1] - py,
                    ddz = dg.sp[3 * s + 2] - pz;
        if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) ++c;
      });
      cnt[(size_t)dg.order[(size_t)q]] = c;
    }
    offsets[0] = 0;
    for (int64_t i = 0; i < n; ++i) offsets[i + 1] = offsets[i] + cnt[(size_t)i];
    if (indices) {
      for (int64_t q = 0; q < n; ++q) {
        const float px = dg.sp[3 * q], py = dg.sp[3 * q + 1],
                    pz = dg.sp[3 * q + 2];
        int64_t w = offsets[dg.order[(size_t)q]];
        dense_scan(dg, px, py, pz, [&](int32_t s) {
          const float ddx = dg.sp[3 * s] - px, ddy = dg.sp[3 * s + 1] - py,
                      ddz = dg.sp[3 * s + 2] - pz;
          if (ddx * ddx + ddy * ddy + ddz * ddz <= r2)
            indices[w++] = dg.order[(size_t)s];
        });
      }
    }
    return 0;
  }

  Grid g = build_grid(pts, n, radius);
  int64_t total = 0;
  offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const int32_t cx = (int32_t)std::floor(px * g.inv_cell);
    const int32_t cy = (int32_t)std::floor(py * g.inv_cell);
    const int32_t cz = (int32_t)std::floor(pz * g.inv_cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = g.ranges.find(CellKey{cx + dx, cy + dy, cz + dz});
          if (it == g.ranges.end()) continue;
          for (int32_t s = it->second.first; s < it->second.second; ++s) {
            const int32_t j = g.order[(size_t)s];
            const float ddx = pts[3 * j] - px, ddy = pts[3 * j + 1] - py,
                        ddz = pts[3 * j + 2] - pz;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
              if (indices) indices[total] = j;
              ++total;
            }
          }
        }
    offsets[i + 1] = total;
  }
  return 0;
}

// Connected components over the radius graph (union-find), optionally
// restricted to equal `labels` (pass nullptr for unrestricted) — the
// ConnectedGraph capability. out[i] = component root (min point index).
int connected_components(const float* pts, int64_t n, float radius,
                         const int32_t* labels, int32_t* out) {
  if (n <= 0) return 1;
  const float r2 = radius * radius;
  std::vector<int32_t> root((size_t)n);
  for (int64_t i = 0; i < n; ++i) root[(size_t)i] = (int32_t)i;
  std::function<int32_t(int32_t)> find = [&](int32_t a) {
    while (root[(size_t)a] != a) {
      root[(size_t)a] = root[(size_t)root[(size_t)a]];
      a = root[(size_t)a];
    }
    return a;
  };

  DenseGrid dg;
  if (build_dense(pts, n, radius, dg)) {
    for (int64_t q = 0; q < n; ++q) {
      const float px = dg.sp[3 * q], py = dg.sp[3 * q + 1],
                  pz = dg.sp[3 * q + 2];
      const int32_t i = dg.order[(size_t)q];
      dense_scan(dg, px, py, pz, [&](int32_t s) {
        const int32_t j = dg.order[(size_t)s];
        if (j <= i) return;
        if (labels && labels[i] != labels[j]) return;
        const float ddx = dg.sp[3 * s] - px, ddy = dg.sp[3 * s + 1] - py,
                    ddz = dg.sp[3 * s + 2] - pz;
        if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
          const int32_t ra = find(i), rb = find(j);
          if (ra != rb) root[(size_t)std::max(ra, rb)] = std::min(ra, rb);
        }
      });
    }
    for (int64_t i = 0; i < n; ++i) out[i] = find((int32_t)i);
    return 0;
  }

  Grid g = build_grid(pts, n, radius);
  for (int64_t i = 0; i < n; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const int32_t cx = (int32_t)std::floor(px * g.inv_cell);
    const int32_t cy = (int32_t)std::floor(py * g.inv_cell);
    const int32_t cz = (int32_t)std::floor(pz * g.inv_cell);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = g.ranges.find(CellKey{cx + dx, cy + dy, cz + dz});
          if (it == g.ranges.end()) continue;
          for (int32_t s = it->second.first; s < it->second.second; ++s) {
            const int32_t j = g.order[(size_t)s];
            if (j <= (int32_t)i) continue;
            if (labels && labels[i] != labels[j]) continue;
            const float ddx = pts[3 * j] - px, ddy = pts[3 * j + 1] - py,
                        ddz = pts[3 * j + 2] - pz;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
              int32_t ra = find((int32_t)i), rb = find(j);
              if (ra != rb) root[(size_t)std::max(ra, rb)] = std::min(ra, rb);
            }
          }
        }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = find((int32_t)i);
  return 0;
}

// Connected components over an EXISTING fixed-degree adjacency ([n, k]
// int32, -1 padded), optionally restricted to equal `labels` — the host
// fast path behind ops/components.split_into_instances (identical
// semantics to its device min-label propagation: component id = minimum
// member point index; union by smaller root keeps every set's root at its
// minimum element).
int components_from_adjacency(const int32_t* adj, int64_t n, int32_t k,
                              const int32_t* labels, int32_t* out) {
  if (n <= 0) return 1;
  std::vector<int32_t> root((size_t)n);
  for (int64_t i = 0; i < n; ++i) root[(size_t)i] = (int32_t)i;
  std::function<int32_t(int32_t)> find = [&](int32_t a) {
    while (root[(size_t)a] != a) {
      root[(size_t)a] = root[(size_t)root[(size_t)a]];
      a = root[(size_t)a];
    }
    return a;
  };
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j = 0; j < k; ++j) {
      const int32_t nb = adj[i * k + j];
      if (nb < 0 || nb >= n) continue;
      if (labels && labels[i] != labels[nb]) continue;
      const int32_t ra = find((int32_t)i), rb = find(nb);
      if (ra != rb) root[(size_t)std::max(ra, rb)] = std::min(ra, rb);
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = find((int32_t)i);
  return 0;
}

// CSR variant: neighbors of i are flat[offsets[i] .. offsets[i+1]).
// Same semantics as components_from_adjacency (weakly connected, root =
// min member index) without materializing an [n, max_degree] table — the
// stored per-point adjacency lists are ragged, and one dense row at the
// single densest point would size the whole table (pipeline/get3dseg.py).
int components_from_csr(const int32_t* offsets, const int32_t* flat,
                        int64_t n, const int32_t* labels, int32_t* out) {
  if (n <= 0) return 1;
  std::vector<int32_t> root((size_t)n);
  for (int64_t i = 0; i < n; ++i) root[(size_t)i] = (int32_t)i;
  std::function<int32_t(int32_t)> find = [&](int32_t a) {
    while (root[(size_t)a] != a) {
      root[(size_t)a] = root[(size_t)root[(size_t)a]];
      a = root[(size_t)a];
    }
    return a;
  };
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j = offsets[i]; j < offsets[i + 1]; ++j) {
      const int32_t nb = flat[j];
      if (nb < 0 || nb >= n) continue;
      if (labels && labels[i] != labels[nb]) continue;
      const int32_t ra = find((int32_t)i), rb = find(nb);
      if (ra != rb) root[(size_t)std::max(ra, rb)] = std::min(ra, rb);
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = find((int32_t)i);
  return 0;
}

}  // extern "C"

#ifdef BUILD_CLI
#include <fstream>
#include <sstream>

// CLI with the reference ConnectedGraph argument order
// (planeUtils.py:37-49): <input> <output> <max_point> <min_dist> <c> <viz>.
// Input: CSV "x,y,z" per line (header allowed). Output: the VIDs CSV format
// parsed by the reference (planeUtils.py:82-91): one line per component,
// "VIDs" header, each line "<count>,<id>,<id>,...".
int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <in.csv> <out.csv> <max_point> <min_dist> [c] [viz]\n",
                 argv[0]);
    return 2;
  }
  const char* inpath = argv[1];
  const char* outpath = argv[2];
  const int64_t max_point = std::atoll(argv[3]);
  const float min_dist = (float)std::atof(argv[4]);

  std::vector<float> pts;
  std::ifstream in(inpath);
  if (!in) { std::fprintf(stderr, "cannot open %s\n", inpath); return 1; }
  std::string line;
  while (std::getline(in, line)) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    std::string tok;
    float v[3];
    int got = 0;
    while (std::getline(ss, tok, ',') && got < 3) {
      char* end = nullptr;
      const float f = std::strtof(tok.c_str(), &end);
      if (end == tok.c_str()) { got = -1; break; }  // header line
      v[got++] = f;
    }
    if (got == 3) { pts.push_back(v[0]); pts.push_back(v[1]); pts.push_back(v[2]); }
    if (max_point > 0 && (int64_t)pts.size() / 3 >= max_point) break;
  }
  const int64_t n = (int64_t)pts.size() / 3;
  std::vector<int32_t> comp((size_t)n);
  connected_components(pts.data(), n, min_dist, nullptr, comp.data());

  // group by root
  std::unordered_map<int32_t, std::vector<int32_t>> groups;
  for (int64_t i = 0; i < n; ++i) groups[comp[(size_t)i]].push_back((int32_t)i);
  std::ofstream out(outpath);
  out << "VIDs\n";
  for (auto& kv : groups) {
    out << kv.second.size();
    for (int32_t id : kv.second) out << "," << id;
    out << "\n";
  }
  std::fprintf(stderr, "%lld points -> %zu components\n", (long long)n,
               groups.size());
  return 0;
}
#endif
