// Native host-side DoF enumeration for continuous Q_p spaces on 2:1-balanced
// octrees (3D).  Fused equivalent of mesh/dof.py::distribute_dofs: builds the
// packed per-(cell, node) entity keys, radix-sorts them, and emits the
// cell->dof map, per-DoF Gauss-Lobatto positions and the boundary mask in one
// pass — the NumPy pipeline makes ~15 volume-sized passes over ~1 GB of
// temporaries on the single-core host (measured 51 s at quadrant r=7 p=4;
// reference behaviour to match: DoFHandler::distribute_dofs runs in seconds,
// multigrid_throughput.cc:2262-2276).
//
// Key packing matches dof.py::_pack_rows exactly (fields, widths, order), so
// the produced DoF numbering is bit-identical to the NumPy path.

#include <cstdint>
#include <vector>

extern "C" {

// level[n], anchor[3n] (x,y,z per cell), degree p, finest level L,
// gl[p+1] Gauss-Lobatto points on [0,1], physical box [lower, upper]^3.
// Outputs (caller-allocated):
//   cell_dofs [n * (p+1)^3] i32   (x-fastest local node order)
//   points    [cap * 3] f64       (per unique DoF)
//   boundary  [cap] u8
// Returns the number of unique DoFs (<= n*(p+1)^3; caller passes cap =
// n*(p+1)^3 so a single call always suffices), or -1 if the packed key would
// overflow 63 bits (caller falls back to NumPy).
int64_t mgtpu_distribute_dofs(const int32_t* level, const int64_t* anchor,
                              int64_t n, int32_t p, int32_t L,
                              const double* gl, double lower, double upper,
                              int32_t* cell_dofs, double* points,
                              uint8_t* boundary) {
  const int n1 = p + 1;
  const int nloc = n1 * n1 * n1;
  const int64_t total = n * (int64_t)nloc;
  const int64_t pmax = (int64_t)p << L;
  int gb = 0;
  while ((pmax >> gb) != 0) ++gb;  // bit_length(p << L)
  const int keybits = 3 * gb + 3 + 6;
  if (keybits > 63) return -1;

  // per-local-node tables: multi-index (x fastest) and the 3-bit interior mask
  std::vector<int32_t> lx(nloc), ly(nloc), lz(nloc);
  std::vector<int32_t> lmask(nloc);
  for (int f = 0; f < nloc; ++f) {
    const int x = f % n1, y = (f / n1) % n1, z = f / (n1 * n1);
    lx[f] = x; ly[f] = y; lz[f] = z;
    int m = 0;
    if (x > 0 && x < p) m |= 1;
    if (y > 0 && y < p) m |= 2;
    if (z > 0 && z < p) m |= 4;
    lmask[f] = m;
  }

  // fused key build: key = ((((gx << gb | gy) << gb | gz) << 3) | mask) << 6
  //                        | ent_level     (matches _pack_rows field order)
  std::vector<int64_t> keys(total);
  {
    int64_t j = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int lvl = level[i];
      const int sh = L - lvl;
      const int64_t ax = anchor[3 * i] * p, ay = anchor[3 * i + 1] * p,
                    az = anchor[3 * i + 2] * p;
      const int64_t ent = (int64_t)lvl + 1;
      for (int f = 0; f < nloc; ++f, ++j) {
        const int64_t gx = (ax + lx[f]) << sh;
        const int64_t gy = (ay + ly[f]) << sh;
        const int64_t gz = (az + lz[f]) << sh;
        const int64_t el = lmask[f] ? ent : 0;  // vertices unify across levels
        keys[j] = ((((((gx << gb) | gy) << gb) | gz) << 3) | lmask[f]) << 6 | el;
      }
    }
  }

  // LSD radix over 11-bit digits, moving (key, index) PAIRS: sequential reads
  // + 2*2048 scattered write streams (cache-resident), instead of the
  // gather-based variant whose keys[idx[i]] random reads are one cache miss
  // per element (measured 33 s vs ~4 s at 33.7M keys).  Stable => first
  // occurrence per group is the minimum original index, matching np.unique.
  std::vector<int64_t> kcur(std::move(keys)), knxt(total);
  std::vector<int32_t> icur(total), inxt(total);
  for (int64_t i = 0; i < total; ++i) icur[i] = (int32_t)i;
  const int DIG = 11, NB = 1 << DIG, MASKD = NB - 1;
  const int npass = (keybits + DIG - 1) / DIG;
  std::vector<int64_t> count(NB);
  for (int pass = 0; pass < npass; ++pass) {
    const int shift = pass * DIG;
    for (auto& c : count) c = 0;
    for (int64_t i = 0; i < total; ++i)
      ++count[(uint64_t)kcur[i] >> shift & MASKD];
    bool trivial = false;
    for (int d = 0; d < NB; ++d)
      if (count[d] == total) { trivial = true; break; }
    if (trivial) continue;
    int64_t sum = 0;
    for (int d = 0; d < NB; ++d) {
      const int64_t c = count[d];
      count[d] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < total; ++i) {
      const int64_t pos = count[(uint64_t)kcur[i] >> shift & MASKD]++;
      knxt[pos] = kcur[i];
      inxt[pos] = icur[i];
    }
    kcur.swap(knxt);
    icur.swap(inxt);
  }

  // walk in key order: group ids, cell_dofs, and per-first-occurrence outputs
  const double ext = upper - lower;
  int64_t g = -1;
  int64_t prev = -1;
  for (int64_t i = 0; i < total; ++i) {
    const int64_t j = icur[i];
    const int64_t kj = kcur[i];
    if (g < 0 || kj != prev) {
      ++g;
      prev = kj;
      // first occurrence: position + boundary from (cell, node)
      const int64_t cell = j / nloc;
      const int f = (int)(j % nloc);
      const int lvl = level[cell];
      const double size = 1.0 / (double)((int64_t)1 << lvl);
      const double px = (anchor[3 * cell] + gl[lx[f]]) * size;
      const double py = (anchor[3 * cell + 1] + gl[ly[f]]) * size;
      const double pz = (anchor[3 * cell + 2] + gl[lz[f]]) * size;
      points[3 * g] = lower + ext * px;
      points[3 * g + 1] = lower + ext * py;
      points[3 * g + 2] = lower + ext * pz;
      const int sh = L - lvl;
      const int64_t gx = (anchor[3 * cell] * p + lx[f]) << sh;
      const int64_t gy = (anchor[3 * cell + 1] * p + ly[f]) << sh;
      const int64_t gz = (anchor[3 * cell + 2] * p + lz[f]) << sh;
      boundary[g] = (gx == 0 || gx == pmax || gy == 0 || gy == pmax ||
                     gz == 0 || gz == pmax)
                        ? 1
                        : 0;
    }
    cell_dofs[j] = (int32_t)g;
  }
  return g + 1;
}

// Stable radix argsort of non-negative int64 keys (order[i] = index of the
// i-th smallest key).  Replaces np.argsort(kind="stable") on volume-sized
// slot tables (hybrid.py format build).
void mgtpu_argsort_i64(const int64_t* keys, int64_t n, int64_t* order) {
  if (n == 0) return;
  int64_t mx = 0;
  for (int64_t i = 0; i < n; ++i)
    if (keys[i] > mx) mx = keys[i];
  int bits = 1;
  while ((mx >> bits) != 0) ++bits;
  // pair-moving LSD radix (see mgtpu_distribute_dofs for the rationale)
  std::vector<int64_t> ka(keys, keys + n), kb(n);
  std::vector<int64_t> ia(n), ib(n);
  int64_t* kcur = ka.data(); int64_t* knxt = kb.data();
  int64_t* icur = ia.data(); int64_t* inxt = ib.data();
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
      if (count[d] == n) { trivial = true; break; }
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
  for (int64_t i = 0; i < n; ++i) order[i] = icur[i];
}

}  // extern "C"
