// Native host-side mesh kernels: 2:1 corner balancing of adaptive octrees.
//
// The p4est-equivalent balance (AdaptiveMesh._balance in mesh/octree.py) is
// the dominant host-side setup cost at scale; this C++ implementation
// replaces the vectorised-NumPy fallback for large meshes.  Exposed through a
// plain C ABI and loaded via ctypes (no pybind11 in the image).
//
// Algorithm (identical semantics to the Python fallback): iterate — for every
// active cell at level m >= 2 and each of its 26 same-level neighbours, find
// the finest active cell covering that neighbour from level m-1 downward; if
// it is two or more levels coarser, flag it; refine all flagged cells
// (replace by 8 children); repeat until stable.

#include <array>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline uint64_t spread3(uint64_t x) {
  x &= 0x1FFFFFULL;
  x = (x | (x << 32)) & 0x1F00000000FFFFULL;
  x = (x | (x << 16)) & 0x1F0000FF0000FFULL;
  x = (x | (x << 8)) & 0x100F00F00F00F00FULL;
  x = (x | (x << 4)) & 0x10C30C30C30C30C3ULL;
  x = (x | (x << 2)) & 0x1249249249249249ULL;
  return x;
}

inline uint64_t morton3(int64_t x, int64_t y, int64_t z) {
  return spread3((uint64_t)x) | (spread3((uint64_t)y) << 1) |
         (spread3((uint64_t)z) << 2);
}

struct Cell {
  int32_t level;
  int64_t a[3];
};

}  // namespace

extern "C" {

// Returns the number of balanced cells.  If it exceeds `cap`, nothing is
// written and the caller must retry with a larger buffer.
int64_t mgtpu_balance_2to1(const int32_t* lv, const int64_t* an, int64_t n,
                           int32_t* out_lv, int64_t* out_an, int64_t cap) {
  std::vector<Cell> cells(n);
  int max_level = 0;
  for (int64_t i = 0; i < n; ++i) {
    cells[i].level = lv[i];
    if (lv[i] > max_level) max_level = lv[i];
    for (int d = 0; d < 3; ++d) cells[i].a[d] = an[3 * i + d];
  }

  for (;;) {
    max_level = 0;
    for (auto& c : cells)
      if (c.level > max_level) max_level = c.level;
    // per-level lookup: morton(anchor) -> cell index
    std::vector<std::unordered_map<uint64_t, int64_t>> index(max_level + 1);
    for (int64_t i = 0; i < (int64_t)cells.size(); ++i)
      index[cells[i].level].emplace(
          morton3(cells[i].a[0], cells[i].a[1], cells[i].a[2]), i);

    std::vector<char> flag(cells.size(), 0);
    bool any = false;
    for (int64_t i = 0; i < (int64_t)cells.size(); ++i) {
      const int m = cells[i].level;
      if (m < 2) continue;
      const int64_t ext = (int64_t)1 << m;
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz) {
            if (!dx && !dy && !dz) continue;
            const int64_t nx = cells[i].a[0] + dx;
            const int64_t ny = cells[i].a[1] + dy;
            const int64_t nz = cells[i].a[2] + dz;
            if (nx < 0 || ny < 0 || nz < 0 || nx >= ext || ny >= ext ||
                nz >= ext)
              continue;
            // finest covering active cell from level m-1 downward
            for (int q = m - 1; q >= 0; --q) {
              const int s = m - q;
              auto it = index[q].find(morton3(nx >> s, ny >> s, nz >> s));
              if (it != index[q].end()) {
                if (q <= m - 2 && !flag[it->second]) {
                  flag[it->second] = 1;
                  any = true;
                }
                break;
              }
            }
          }
    }
    if (!any) break;

    std::vector<Cell> next;
    next.reserve(cells.size() * 2);
    for (int64_t i = 0; i < (int64_t)cells.size(); ++i) {
      if (!flag[i]) {
        next.push_back(cells[i]);
        continue;
      }
      for (int o = 0; o < 8; ++o) {
        Cell ch;
        ch.level = cells[i].level + 1;
        ch.a[0] = cells[i].a[0] * 2 + (o & 1);
        ch.a[1] = cells[i].a[1] * 2 + ((o >> 1) & 1);
        ch.a[2] = cells[i].a[2] * 2 + ((o >> 2) & 1);
        next.push_back(ch);
      }
    }
    cells.swap(next);
  }

  const int64_t m = (int64_t)cells.size();
  if (m > cap) return m;
  for (int64_t i = 0; i < m; ++i) {
    out_lv[i] = cells[i].level;
    for (int d = 0; d < 3; ++d) out_an[3 * i + d] = cells[i].a[d];
  }
  return m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Stable unique-inverse over int64 keys (the np.unique(return_index=True,
// return_inverse=True) hot path of DoF enumeration, dof.py::distribute_dofs).
// LSD radix sort of (key, index) pairs — stable, so `first` is the minimum
// original index of each group, matching np.unique exactly.
// ---------------------------------------------------------------------------

extern "C" {

// keys[n] (non-negative), outputs: inverse[n] (group id per input),
// first[<=n] (original index of first occurrence per group, group-sorted by
// key).  Returns the number of unique keys.
int64_t mgtpu_unique_inverse_i64(const int64_t* keys, int64_t n,
                                 int64_t* inverse, int64_t* first) {
  if (n == 0) return 0;
  int64_t mx = 0;
  for (int64_t i = 0; i < n; ++i)
    if (keys[i] > mx) mx = keys[i];
  int bits = 1;
  while ((mx >> bits) != 0) ++bits;
  // pair-moving LSD radix over 11-bit digits: sequential reads + 2*2048
  // cache-resident scattered write streams (the gather-based variant paid
  // one cache miss per keys[idx[i]] — see native/dofs.cc)
  std::vector<int64_t> ka(keys, keys + n), kb(n);
  std::vector<int64_t> ia(n), ib(n);
  int64_t* kcur = ka.data();
  int64_t* knxt = kb.data();
  int64_t* icur = ia.data();
  int64_t* inxt = ib.data();
  for (int64_t i = 0; i < n; ++i) icur[i] = i;
  const int DIG = 11, NB = 1 << DIG, MASKD = NB - 1;
  std::vector<int64_t> count(NB);
  const int npass = (bits + DIG - 1) / DIG;
  for (int pass = 0; pass < npass; ++pass) {
    const int shift = pass * DIG;
    for (auto& c : count) c = 0;
    for (int64_t i = 0; i < n; ++i) ++count[(uint64_t)kcur[i] >> shift & MASKD];
    bool trivial = false;
    for (int d = 0; d < NB; ++d)
      if (count[d] == n) {
        trivial = true;
        break;
      }
    if (trivial) continue;
    int64_t sum = 0;
    for (int d = 0; d < NB; ++d) {
      const int64_t c = count[d];
      count[d] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < n; ++i) {
      const int64_t pos = count[(uint64_t)kcur[i] >> shift & MASKD]++;
      knxt[pos] = kcur[i];
      inxt[pos] = icur[i];
    }
    int64_t* t = kcur; kcur = knxt; knxt = t;
    t = icur; icur = inxt; inxt = t;
  }
  int64_t g = -1;
  int64_t prev = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j = icur[i];
    if (g < 0 || kcur[i] != prev) {
      ++g;
      first[g] = j;  // stable radix: first occurrence = minimum index
      prev = kcur[i];
    }
    inverse[j] = g;
  }
  return g + 1;
}

}  // extern "C"
