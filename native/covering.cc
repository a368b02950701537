// Native host-side covering-cell queries on adaptive octrees.
//
// AdaptiveMesh.covering_cell_level (mesh/octree.py) answers "which active
// cell covers this level-q lattice coordinate from above?" for volume-sized
// query batches; the hanging-node constraint build issues ~18 such sweeps
// (6 face + 12 edge directions) per level (mesh/dof.py:221,275) and the
// hybrid-format build one more (ops/hybrid.py:1895).  The NumPy path pays
// one Morton bit-spread pass per (level probe x query batch) — measured 87%
// of a 22.6 s constraint build at quadrant r=8 (136M-DoF envelope: 361 s).
// Here: ONE Morton encode per query (truncating each coordinate by s bits
// truncates the interleaved code by 3s bits), then a binary search per
// candidate level, finest first.
//
// Exposed via plain C ABI for ctypes (no pybind11 in the image).

#include <cstdint>

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

inline bool contains(const uint64_t* lo, const uint64_t* hi, uint64_t key) {
  // branch-light lower_bound
  while (lo < hi) {
    const uint64_t* mid = lo + ((hi - lo) >> 1);
    if (*mid < key)
      lo = mid + 1;
    else
      hi = mid;
  }
  return *lo == key;  // caller guarantees a sentinel-free exact-range check
}

}  // namespace

extern "C" {

// anchors: [n, 3] int64 lattice coordinates at level `query_level`.
// codes/offs: per-level sorted Morton code tables of the ACTIVE cells,
// concatenated — level l occupies codes[offs[l] .. offs[l+1]).  offs has
// n_levels + 1 entries; levels above `top` are never probed.
// out[i] = level of the active cell covering anchors[i] from level
// min(top, n_levels-1) downward, or -1.
void mgtpu_covering_cell_level(const int64_t* anchors, int64_t n,
                               int32_t query_level, int32_t top,
                               const uint64_t* codes, const int64_t* offs,
                               int32_t n_levels, int32_t* out) {
  int32_t qtop = top < n_levels - 1 ? top : n_levels - 1;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t base =
        morton3(anchors[3 * i], anchors[3 * i + 1], anchors[3 * i + 2]);
    int32_t hit = -1;
    for (int32_t q = qtop; q >= 0; --q) {
      const int64_t lo = offs[q], hi = offs[q + 1];
      if (lo == hi) continue;
      const uint64_t key = base >> (uint64_t)(3 * (query_level - q));
      const uint64_t* p = codes + lo;
      const uint64_t* e = codes + hi - 1;
      if (key < *p || key > *e) continue;
      if (contains(p, e, key)) {
        hit = q;
        break;
      }
    }
    out[i] = hit;
  }
}

}  // extern "C"
