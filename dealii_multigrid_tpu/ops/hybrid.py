"""Patch-structured hybrid execution engine (the TPU fast path).

Motivation and measurements in DESIGN.md: XLA element gathers cost ~7 ns per
row on TPU, so the reference's gather/GEMM/scatter cell loop
(include/operator.h) is volume-bound on irregular memory ops.  This engine
stores each level's vector in a hybrid slot layout:

  * patch bucket: ``[n_patches, S, S, S]`` node lattices of aligned K^3
    same-level cell blocks (S = K*degree + 1), Morton-discovered on the host.
    Patch-boundary nodes are DUPLICATED between adjacent patches.
  * singleton bucket: ``[n_singles, (p+1)^3]`` per-cell node values for cells
    not covered by complete blocks (refinement transitions).

The flat "slot" vector is the concatenation of both buckets.  A global DoF may
own many slots; primal vectors keep all slots of a DoF equal (consistency
invariant).  The operator apply is:

  1. constraint application C (small irregular slot tables),
  2. bulk compute: per-patch sum-factorized stencil with assembled 1D patch
     matrices (pure batched GEMMs, level-independent up to h^(dim-2)) +
     per-singleton dense element GEMM,
  3. assembly exchange: three sequential dimension sweeps of whole-plane
     row-gathers between same-level face-adjacent patches (handles faces,
     edges, corners), plus exact irregular group tables for every DoF the
     sweeps provably do not cover — membership decided by an exact integer
     SIMULATION of the sweeps on the host, so no geometric case analysis can
     go wrong,
  4. C^T + identity-on-constrained, mirroring the reference semantics
     (include/operator.h:152-183).

Conversions to/from the global DoF vector exist for setup and testing only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.dof import Constraints, DoFHandler, local_node_indices

# XLA TPU's DEFAULT f32 matmul precision truncates inputs to bf16; that
# destroys CG convergence (measured: 3 -> 9 iterations).  All contractions in
# the compute path request full-precision f32 (3-pass bf16 on the MXU).
HIGHEST = jax.lax.Precision.HIGHEST
from ..mesh.octree import AdaptiveMesh, morton_encode
from . import element, tensor
from .operator import split_boundary_constraints
from ..utils.device import to_device

# ---------------------------------------------------------------------------
# host-side format construction
# ---------------------------------------------------------------------------


def _assembled_1d(mat: np.ndarray, K: int, degree: int) -> np.ndarray:
    """Assemble the 1D per-cell matrix into the K-cell patch matrix (S x S)."""
    S = K * degree + 1
    out = np.zeros((S, S))
    for k in range(K):
        out[k * degree : k * degree + degree + 1, k * degree : k * degree + degree + 1] += mat
    return out


@dataclass
class HybridFormat:
    """Host-side description of the hybrid slot layout for one level.

    DEVICE-MAJOR layout (n_shards = D >= 1): patch and singleton counts are
    padded to multiples of D (dummy patches have level -1, dummy singletons
    cell id -1, and their slots carry the sentinel dof id n_dofs).  The flat
    slot vector is the concatenation of D equal spans, each holding that
    shard's patches followed by its singletons — so an even block partition
    of the flat axis over a jax device mesh puts whole patches on devices
    (the Morton-block partition = the p4est SFC partition analog).  D = 1 is
    the plain single-device layout.
    """

    dofh: DoFHandler
    K: int
    S: int
    # patch bucket
    patch_level: np.ndarray      # [NP] (-1 for padding dummies)
    patch_block: np.ndarray      # [NP, 3] block anchor (units of K cells)
    patch_cells: np.ndarray      # [NP, K^3] global cell ids (block-local x-fastest)
    patch_dof: np.ndarray        # [NP, S, S, S] global dof (axes: x, y, z)
    nbr: np.ndarray              # [6, NP] same-level face neighbour patch (or -1)
    # singleton bucket
    single_cells: np.ndarray     # [NS] (-1 for padding dummies)
    # slots
    slot_dof: np.ndarray         # [n_slots] (sentinel n_dofs on dummy slots)
    rep_slot: np.ndarray         # [n_dofs]
    owner: np.ndarray            # [n_slots] 1.0 on exactly one slot per dof
    nbr_s: np.ndarray            # [6, NS] singleton face-neighbour singleton (or -1)
    use_singleton_sweeps: bool
    # irregular exchange groups (dofs not covered by the structured sweeps)
    irr_slots: np.ndarray        # [G, Kg] slot ids (pad: n_slots)
    irr_out_slots: np.ndarray    # [W] slots to overwrite
    irr_out_group: np.ndarray    # [W] group index per overwrite target
    n_shards: int = 1
    # patch<->singleton conforming interfaces, per (geometric axis g, patch
    # face side): entry 2g+side_p is None or (pidx, b1, b2, sidx) — the
    # singleton sidx's (g, 1-side_p) face coincides with the n1 x n1 subblock
    # of patch pidx's (g, side_p) face plane at block coords (b1, b2)
    cross_faces: tuple = ()
    use_cross: bool = False

    @property
    def n_patches(self) -> int:
        return len(self.patch_level)

    @property
    def n_singles(self) -> int:
        return len(self.single_cells)

    @property
    def n_slots(self) -> int:
        return len(self.slot_dof)

    @property
    def patch_slots(self) -> int:
        return self.n_patches * self.S**3

    # ---- device-major layout geometry ----
    @property
    def patches_per_shard(self) -> int:
        return self.n_patches // self.n_shards

    @property
    def singles_per_shard(self) -> int:
        return self.n_singles // self.n_shards

    @property
    def shard_span(self) -> int:
        return (
            self.patches_per_shard * self.S**3
            + self.singles_per_shard * self.dofh.n_loc
        )

    def patch_slot_base(self, i):
        """First flat slot of patch i (vectorised)."""
        pps = max(self.patches_per_shard, 1)
        return (i // pps) * self.shard_span + (i % pps) * self.S**3

    def single_slot_base(self, j):
        """First flat slot of singleton j (vectorised)."""
        sps = max(self.singles_per_shard, 1)
        nloc = self.dofh.n_loc
        return (
            (j // sps) * self.shard_span
            + self.patches_per_shard * self.S**3
            + (j % sps) * nloc
        )

    def from_global(self, u: np.ndarray) -> np.ndarray:
        u = np.asarray(u)
        # dummy slots carry the sentinel dof id n_dofs -> read exact zero
        return np.concatenate([u, np.zeros(1, u.dtype)])[self.slot_dof]

    def to_global(self, flat: np.ndarray) -> np.ndarray:
        return flat[self.rep_slot]


def repartition_format(
    fmt: HybridFormat, n_shards: int, cell_shard: np.ndarray | None = None
) -> HybridFormat:
    """Re-lay a single-device HybridFormat into the device-major layout for
    ``n_shards`` devices (see HybridFormat docstring).

    ``cell_shard`` (optional, [n_cells] device id per active cell) applies a
    repartitioning POLICY (parallel/partition.py — the reference's
    tria.repartition(), multigrid_throughput.cc:2145-2170): patches follow
    their first cell, singletons their own cell.  Default: equal patch-count
    blocks along the Morton order (the p4est DefaultPolicy analog).  Every
    device span is padded to the maximum per-device size with dummies, so a
    weighted policy trades padding for balanced real work.  All flat SLOT ids
    are permuted; patch/singleton INDICES are renumbered shard-major and every
    patch-indexed table (neighbours) is remapped accordingly."""
    if n_shards == 1 and cell_shard is None:
        return fmt
    assert fmt.n_shards == 1, "repartition from the single-device layout"
    D = n_shards
    S, nloc = fmt.S, fmt.dofh.n_loc
    NP, NS = fmt.n_patches, fmt.n_singles

    if cell_shard is None:
        pps0 = -(-NP // D) if NP else 1
        p_shard = np.arange(NP, dtype=np.int64) // pps0
        sps0 = -(-NS // D) if NS else 1
        s_shard = np.arange(NS, dtype=np.int64) // sps0
    else:
        cell_shard = np.asarray(cell_shard, np.int64)
        assert cell_shard.max(initial=0) < D
        # a negative id (e.g. -1 for "unassigned" from a policy) would silently
        # scramble the layout via Python negative indexing
        assert cell_shard.min(initial=0) >= 0
        p_shard = (
            cell_shard[fmt.patch_cells[:, 0]] if NP else np.zeros(0, np.int64)
        )
        s_shard = cell_shard[fmt.single_cells] if NS else np.zeros(0, np.int64)

    def layout(shard, n):
        """(new index per old item, items per shard after padding)."""
        if n == 0:
            return np.zeros(0, np.int64), 0
        counts = np.bincount(shard, minlength=D)
        per = int(counts.max())
        order = np.argsort(shard, kind="stable")
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(n, dtype=np.int64) - cum[shard[order]]
        new_idx = np.empty(n, np.int64)
        new_idx[order] = shard[order] * per + within
        return new_idx, per

    new_p, pps = layout(p_shard, NP)
    new_s, sps = layout(s_shard, NS)
    NPp, NSp = D * pps, D * sps

    patch_level = np.full(NPp, -1, np.int32)
    patch_level[new_p] = fmt.patch_level
    patch_block = np.full((NPp, 3), np.iinfo(np.int64).min // 2, np.int64)
    patch_block[new_p] = fmt.patch_block
    kcells = fmt.patch_cells.shape[1] if fmt.patch_cells.ndim == 2 else 1
    patch_cells = np.full((NPp, kcells), -1, np.int64)
    patch_cells[new_p] = fmt.patch_cells
    patch_dof = np.zeros((NPp, S, S, S), np.int64)
    patch_dof[new_p] = fmt.patch_dof
    # neighbour tables: remap values through the new numbering, scatter columns
    new_p_ext = np.concatenate([new_p, np.asarray([-1], np.int64)])
    nbr = np.full((6, NPp), -1, np.int64)
    if NP:
        nbr[:, new_p] = new_p_ext[fmt.nbr]
    single_cells = np.full(NSp, -1, np.int64)
    single_cells[new_s] = fmt.single_cells
    new_s_ext = np.concatenate([new_s, np.asarray([-1], np.int64)])
    nbr_s = np.full((6, NSp), -1, np.int64)
    if NS:
        nbr_s[:, new_s] = new_s_ext[fmt.nbr_s]

    span = pps * S**3 + sps * nloc
    # perm: old flat slot id -> new flat slot id
    if NP:
        ni = np.repeat(new_p, S**3)
        t = np.tile(np.arange(S**3, dtype=np.int64), NP)
        perm_p = (ni // pps) * span + (ni % pps) * S**3 + t
    else:
        perm_p = np.zeros(0, np.int64)
    if NS:
        nj = np.repeat(new_s, nloc)
        u = np.tile(np.arange(nloc, dtype=np.int64), NS)
        perm_s = (nj // sps) * span + pps * S**3 + (nj % sps) * nloc + u
    else:
        perm_s = np.zeros(0, np.int64)
    perm = np.concatenate([perm_p, perm_s])
    n_slots_new = D * span

    sentinel = fmt.dofh.n_dofs
    slot_dof = np.full(n_slots_new, sentinel, np.int64)
    slot_dof[perm] = fmt.slot_dof
    rep_slot = perm[fmt.rep_slot]
    owner = np.zeros(n_slots_new)
    owner[perm] = fmt.owner
    perm_ext = np.concatenate([perm, np.asarray([n_slots_new], np.int64)])
    irr_slots = perm_ext[fmt.irr_slots] if fmt.irr_slots.size else fmt.irr_slots
    irr_out_slots = (
        perm[fmt.irr_out_slots] if fmt.irr_out_slots.size else fmt.irr_out_slots
    )
    cross_faces = tuple(
        None if t is None else (new_p[t[0]], t[1], t[2], new_s[t[3]])
        for t in fmt.cross_faces
    )

    return HybridFormat(
        dofh=fmt.dofh,
        K=fmt.K,
        S=S,
        patch_level=patch_level,
        patch_block=patch_block,
        patch_cells=patch_cells,
        patch_dof=patch_dof,
        nbr=nbr,
        single_cells=single_cells,
        slot_dof=slot_dof,
        rep_slot=rep_slot,
        owner=owner,
        nbr_s=nbr_s,
        use_singleton_sweeps=fmt.use_singleton_sweeps,
        irr_slots=irr_slots,
        irr_out_slots=irr_out_slots,
        irr_out_group=fmt.irr_out_group,
        n_shards=D,
        cross_faces=cross_faces,
        use_cross=fmt.use_cross,
    )


# ---------------------------------------------------------------------------
# device-side flat <-> bucket conversion (device-major layout aware)
# ---------------------------------------------------------------------------


def unpack_patches(x: jax.Array, D: int, NP: int, S: int):
    """Flat slot vector -> [NP, S, S, S] patch lattice view."""
    pp = (NP // D) * S**3
    return x.reshape(D, -1)[:, :pp].reshape(NP, S, S, S)


def unpack_singles(x: jax.Array, D: int, NP: int, S: int, NS: int, nloc: int):
    pp = (NP // D) * S**3
    return x.reshape(D, -1)[:, pp:].reshape(NS, nloc)


def with_patches(x: jax.Array, up: jax.Array, D: int, NP: int, S: int):
    pp = (NP // D) * S**3
    xa = x.reshape(D, -1)
    return xa.at[:, :pp].set(up.reshape(D, -1)).reshape(-1)


def with_singles(x: jax.Array, us: jax.Array, D: int, NP: int, S: int):
    pp = (NP // D) * S**3
    xa = x.reshape(D, -1)
    return xa.at[:, pp:].set(us.reshape(D, -1)).reshape(-1)


def pack_buckets(up, us, D: int):
    """[NP,S,S,S] (+ optional [NS,nloc]) -> flat slot vector."""
    if us is None:
        return up.reshape(-1)
    if up is None:
        return us.reshape(-1)
    return jnp.concatenate(
        [up.reshape(D, -1), us.reshape(D, -1)], axis=1
    ).reshape(-1)


@dataclass(frozen=True)
class TVec:
    """Split T-space state (round-4h): the patch bucket as a flat
    ``[NP*S^3]`` vector in patch-minor layout (slot (pi, lidx) at
    ``lidx*NP + pi``) plus the singleton tail ``[n_slots - NP*S^3]``,
    carried as TWO leaves through the whole transposed vmult pipeline.

    Why: every stage of the flat-T pipeline paid volume-sized repacks —
    ``.at[].set/add`` on the 78 MB fused vector costs a full copy
    (~0.39 ms at r=7/p=4) even when the update moves 100k elements, and
    each stage's internal split/concat pair costs two more volume
    traversals.  The census (scripts/census_rounds.py) shows EVERY
    element-priced constraint table at bench shapes lives in the 4 MB
    singleton tail, so keeping the buckets separate makes those scatters
    tail-sized and deletes the repacks.  Elementwise arithmetic is
    overloaded leafwise so the Chebyshev recurrence runs directly on the
    split state."""

    head: jax.Array
    tail: jax.Array

    def _bin(self, o, f):
        if isinstance(o, TVec):
            return TVec(f(self.head, o.head), f(self.tail, o.tail))
        return TVec(f(self.head, o), f(self.tail, o))

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __neg__(self):
        return TVec(-self.head, -self.tail)

    @property
    def dtype(self):
        return self.head.dtype if self.head.size else self.tail.dtype


jax.tree_util.register_dataclass(TVec, data_fields=["head", "tail"], meta_fields=[])


def _build_rowsf(rounds, sf_single_np, ps_raw, nloc, NS, dtype, dedup,
                 to_device):
    """Row-form singleton structured faces for the split pipeline
    (round-4i).  profile_l6: the element-priced singleton-face tables cost
    ~7.7 ns/element — apply_c_ts 1.83 ms + ct_faces_ts 1.93 ms of the
    6.9 ms L6 vmult (and the same tables price every patch level).  Block-
    row gathers cost ~4 ns/ROW, so each face moves as its cell's whole
    [nloc] row + a one-hot [nloc, n1^2] plane-selection GEMM.

    For each round, the singleton faces of its FULLY-TAIL-RESIDENT levels
    are bucketed by their (face, src) within-row offset patterns; each
    bucket becomes: src block-row gather -> plane extract GEMM -> the same
    per-row Eh interpolation einsums as the flat path -> expand GEMM ->
    block-row scatter.  dedup=True builds the apply_c (scatter-SET) form:
    a designated writer per tail slot (duplicate writers carry equal
    values, so picking one is exact) plus a per-round unique-cell blend
    (old*(1-keep) + acc).  dedup=False builds the ct (scatter-ADD) form
    with the 1/coverage ct mask folded in (adds commute).

    Returns (rounds_data, covered) — rounds_data[r] is None or a dict of
    device arrays; covered[level_index] marks levels handled here (their
    element tables are dropped from the residual sfs set).
    """
    n_lvls = len(sf_single_np)
    covered = [False] * n_lvls
    if NS == 0:
        return tuple(None for _ in rounds), covered
    n1sq = None
    ok = []
    for t in sf_single_np:
        if t is None:
            ok.append(False)
            continue
        cat_f, cat_s = t[0], t[1]
        ok.append(bool((cat_f >= ps_raw).all() and (cat_s >= ps_raw).all()))
        n1sq = cat_f.shape[1] * cat_f.shape[2]
    out = []
    for rnd in rounds:
        lv = [i for i in rnd if ok[i]]
        if not lv:
            out.append(None)
            continue
        for i in lv:
            covered[i] = True
        # bucket rows by (face pattern, src pattern)
        buckets: dict = {}
        for i in lv:
            cat_f, cat_s, cat_m, cat_pa, cat_pb = sf_single_np[i]
            fr = cat_f - ps_raw
            sr = cat_s - ps_raw
            fc, fo = fr.reshape(len(fr), -1) // nloc, fr.reshape(len(fr), -1) % nloc
            sc, so = sr.reshape(len(sr), -1) // nloc, sr.reshape(len(sr), -1) % nloc
            assert (fc == fc[:, :1]).all() and (sc == sc[:, :1]).all(), \
                "structured single face spans multiple cells"
            for k in range(len(fr)):
                key = (fo[k].tobytes(), so[k].tobytes())
                b = buckets.setdefault(key, {"fc": [], "sc": [], "pa": [],
                                             "pb": [], "m": [], "fo": fo[k],
                                             "so": so[k]})
                b["fc"].append(fc[k, 0])
                b["sc"].append(sc[k, 0])
                b["pa"].append(cat_pa[k])
                b["pb"].append(cat_pb[k])
                b["m"].append(cat_m.reshape(len(cat_m), -1)[k])
        blist = list(buckets.values())
        if dedup:
            # designated writer per tail slot across the whole round
            slots_all = np.concatenate(
                [np.asarray(b["fc"], np.int64)[:, None] * nloc + b["fo"][None, :]
                 for b in blist]
            ).reshape(-1)
            wm_all = np.zeros(len(slots_all), bool)
            _u, first = np.unique(slots_all, return_index=True)
            wm_all[first] = True
            wm_all = wm_all.reshape(-1, n1sq)
            off = 0
            uniq_cells = np.unique(np.concatenate(
                [np.asarray(b["fc"], np.int64) for b in blist]
            ))
            cmap = np.full(NS, -1, np.int64)
            cmap[uniq_cells] = np.arange(len(uniq_cells))
            keep = np.zeros((len(uniq_cells), nloc), np.float64)
        devb = []
        for b in blist:
            m = len(b["fc"])
            fx = np.zeros((nloc, n1sq))
            fx[b["fo"], np.arange(n1sq)] = 1.0
            sx = np.zeros((nloc, n1sq))
            sx[b["so"], np.arange(n1sq)] = 1.0
            ent = {
                "fc": to_device(np.asarray(b["fc"]), jnp.int32),
                "sc": to_device(np.asarray(b["sc"]), jnp.int32),
                "pa": to_device(np.asarray(b["pa"]), jnp.int32),
                "pb": to_device(np.asarray(b["pb"]), jnp.int32),
                "fx": to_device(fx, dtype),
                "sx": to_device(sx, dtype),
            }
            if dedup:
                wm = wm_all[off : off + m]
                off += m
                cells = np.asarray(b["fc"], np.int64)
                np.add.at(keep, (cmap[cells][:, None],
                                 np.broadcast_to(b["fo"][None, :], (m, n1sq))),
                          wm.astype(np.float64))
                ent["wm"] = to_device(wm.astype(np.float64), dtype)
                ent["cp"] = to_device(cmap[cells], jnp.int32)
            else:
                ent["mask"] = to_device(np.asarray(b["m"]), dtype)
            devb.append(ent)
        rd = {"b": tuple(devb)}
        if dedup:
            assert keep.max() <= 1.0 + 1e-9
            rd["uc"] = to_device(uniq_cells, jnp.int32)
            rd["keep"] = to_device(keep, dtype)
        out.append(rd)
    return tuple(out), covered


def _split_gather(sp, h: jax.Array, t: jax.Array, shape) -> jax.Array:
    """Gather a host-split slot table from the (head, tail) pieces.
    ``sp = (hidx, hpos, tidx, tpos)``: flat indices into each piece plus
    the positions they occupy in the original table (partition of
    ``range(n)``).  One-sided tables skip the reassembly buffer."""
    hidx, hpos, tidx, tpos = sp
    if hidx.shape[0] == 0:
        return t[tidx].reshape(shape)
    if tidx.shape[0] == 0:
        return h[hidx].reshape(shape)
    buf = jnp.zeros(hidx.shape[0] + tidx.shape[0], t.dtype)
    buf = buf.at[hpos].set(h[hidx]).at[tpos].set(t[tidx])
    return buf.reshape(shape)


def _split_parts(sp, vals: jax.Array):
    """(head_idx, head_vals, tail_idx, tail_vals) update lists for a
    host-split scatter table — callers combine per-side parts across
    tables and issue ONE .at per side per round."""
    hidx, hpos, tidx, tpos = sp
    v = vals.reshape(-1)
    out = []
    if hidx.shape[0]:
        out.append(("h", hidx, v[hpos] if tidx.shape[0] else v))
    if tidx.shape[0]:
        out.append(("t", tidx, v[tpos] if hidx.shape[0] else v))
    return out


def _find_patches(mesh: AdaptiveMesh, K: int):
    """Complete aligned K^3 same-level blocks; returns (level, block, cells
    [NP, K^3] x-fastest block-local order, covered_mask)."""
    k2 = K.bit_length() - 1
    assert 1 << k2 == K
    covered = np.zeros(mesh.n_cells, dtype=bool)
    p_level, p_block, p_cells = [], [], []
    for l in np.unique(mesh.level):
        if l < k2:
            continue
        sel = np.nonzero(mesh.level == l)[0]
        block = mesh.anchor[sel] >> k2
        local = mesh.anchor[sel] & (K - 1)
        lflat = local[:, 0] + K * local[:, 1] + K * K * local[:, 2]
        bcode = morton_encode(block)
        order = np.lexsort((lflat, bcode))
        sel, bcode, lflat, block = sel[order], bcode[order], lflat[order], block[order]
        # group boundaries
        uniq, start, counts = np.unique(bcode, return_index=True, return_counts=True)
        complete = counts == K**3
        starts = start[complete]
        if len(starts) == 0:
            continue
        gather = starts[:, None] + np.arange(K**3)[None, :]
        # within a complete group, entries are sorted by lflat = 0..K^3-1
        cells = sel[gather]
        p_level.append(np.full(len(starts), l, np.int32))
        p_block.append(block[starts])
        p_cells.append(cells)
        covered[cells.reshape(-1)] = True
    if p_level:
        return (
            np.concatenate(p_level),
            np.concatenate(p_block),
            np.concatenate(p_cells),
            covered,
        )
    return (
        np.zeros(0, np.int32),
        np.zeros((0, 3), np.int64),
        np.zeros((0, K**3), np.int64),
        covered,
    )


# the singleton bucket reshapes x-fastest flat data to [cell, z, y, x]:
# sweep axes 1/2/3 = z/y/x need neighbour rows (4,5)/(2,3)/(0,1)
SINGLE_SWEEP_ROWS = np.asarray([4, 5, 2, 3, 0, 1])


def _neighbour_lookup(lvl: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """[6, n] same-level face-neighbour indices (-1 = none) for items at
    integer ``coords`` [n, 3] on level ``lvl`` [n], via packed-key
    searchsorted.  Replaces the per-item Python dict loops in
    build_hybrid_format (seconds at r>=7 singleton counts on the one-core
    host)."""
    n = len(lvl)
    if n == 0:
        return np.full((6, 0), -1, np.int64)
    lvl = np.asarray(lvl, np.int64)
    c = np.asarray(coords, np.int64) + 1  # bias: the -1 face offset stays >= 0
    b = int(int(c.max()) + 2).bit_length()
    lb = int(int(lvl.max()) + 1).bit_length()
    assert 3 * b + lb <= 62, "packed neighbour key overflow"

    def pack(cc):
        return (
            (lvl << (3 * b)) | (cc[:, 0] << (2 * b)) | (cc[:, 1] << b)
            | cc[:, 2]
        )

    key = pack(c)
    from ..mesh.native import argsort_i64

    order = argsort_i64(key)
    skey = key[order]
    out = np.full((6, n), -1, np.int64)
    for d in range(3):
        for side in (0, 1):
            q = c.copy()
            q[:, d] += 1 if side else -1
            qkey = pack(q)
            pos = np.searchsorted(skey, qkey)
            posc = np.minimum(pos, n - 1)
            hit = skey[posc] == qkey
            out[2 * d + side] = np.where(hit, order[posc], -1)
    return out


def _ssweep_transfer_mats(n1: int) -> np.ndarray:
    """[6, nloc, nloc] fused face-transfer matrices for whole-row singleton
    sweeps: T[2d] maps a neighbour ROW's top face (lattice axis d) onto MY
    bottom-face entries (T[2d+1] the reverse), so one sweep term is a
    lane-dense block-row gather + [NS, nloc] @ [nloc, nloc] GEMM instead of
    ops on the 41x-tile-padded [NS, n1, n1, n1] lattice view (RESULTS.md
    round-3c).  Face pairing follows the row-major scan of the remaining
    coords — identical on both faces."""
    nloc = n1**3
    loc = np.indices((n1, n1, n1)).reshape(3, -1)  # [3, nloc], x fastest
    mats = np.zeros((6, nloc, nloc), np.float64)
    for d in range(3):
        lo = np.nonzero(loc[d] == 0)[0]
        hi = np.nonzero(loc[d] == n1 - 1)[0]
        mats[2 * d][hi, lo] = 1.0  # neighbour top -> my bottom
        mats[2 * d + 1][lo, hi] = 1.0  # neighbour bottom -> my top
    return mats


def _sface_selectors(n1: int) -> tuple[np.ndarray, np.ndarray]:
    """Face-plane extraction matrices for whole-row singleton ops.

    sel[2d+side]: [nloc, n1^2] with sel[k, a*n1+b] = 1 where local node k
    lies on face (lattice axis d, side) at remaining coords (a, b) in
    lattice order; selT enumerates the plane transposed (b, a) — the order
    `_exchange_cross` feeds to the patch-grid assembly."""
    nloc = n1**3
    loc = np.indices((n1, n1, n1)).reshape(3, -1)
    sel = np.zeros((6, nloc, n1 * n1), np.float64)
    selT = np.zeros((6, nloc, n1 * n1), np.float64)
    for d in range(3):
        rem = [a for a in range(3) if a != d]
        for side in (0, 1):
            on = loc[d] == (0 if side == 0 else n1 - 1)
            k = np.nonzero(on)[0]
            a, b = loc[rem[0], k], loc[rem[1], k]
            sel[2 * d + side][k, a * n1 + b] = 1.0
            selT[2 * d + side][k, b * n1 + a] = 1.0
    return sel, selT


def _simulate_sweeps(raw: np.ndarray, nbr: np.ndarray, S: int) -> np.ndarray:
    """Exact host mirror of the device exchange sweeps (integer arithmetic).
    Works for any same-size block bucket (K^3 patches or single cells)."""
    up = raw.copy()
    NP = up.shape[0]
    for d in range(3):
        axis = d + 1
        lo_n, hi_n = nbr[2 * d], nbr[2 * d + 1]

        def plane(arr, idx, pos):
            sl = [slice(None)] * 4
            sl[axis] = pos
            src = arr[np.maximum(idx, 0)][tuple([slice(None)] + sl[1:])]
            src = src * (idx >= 0).reshape((-1,) + (1,) * (src.ndim - 1))
            return src

        add_lo = plane(up, lo_n, S - 1)   # neighbour-below's top plane
        add_hi = plane(up, hi_n, 0)       # neighbour-above's bottom plane
        sl0 = [slice(None)] * 4
        sl0[axis] = 0
        slS = [slice(None)] * 4
        slS[axis] = S - 1
        up[tuple(sl0)] += add_lo
        up[tuple(slS)] += add_hi
    return up


def _build_cross_tables(mesh, p_cells, single_cells, K: int):
    """Patch<->singleton conforming-interface tables (see HybridFormat).

    Every singleton whose same-level face neighbour is patch-covered meets
    that patch on an n1 x n1 subblock of the patch's boundary face plane (a
    complete K^3 block has no interior cell exposed), so the interface is a
    dense block grid — the input to the structured cross exchange."""
    NP = p_cells.shape[0] if p_cells.ndim == 2 else 0
    NS = len(single_cells)
    out = [None] * 6
    if not (NP and NS):
        return tuple(out)
    n_cells = mesh.n_cells
    parr = np.full(n_cells, -1, np.int64)
    lloc3 = np.zeros((n_cells, 3), np.int16)
    flat = p_cells.reshape(-1)
    parr[flat] = np.repeat(np.arange(NP, dtype=np.int64), K**3)
    f = np.tile(np.arange(K**3, dtype=np.int64), NP)
    lloc3[flat, 0] = f % K
    lloc3[flat, 1] = (f // K) % K
    lloc3[flat, 2] = f // (K * K)
    find = _active_lookup_cache(mesh)
    A = mesh.anchor[single_cells]
    L = mesh.level[single_cells]
    acc = [[] for _ in range(6)]
    for l in np.unique(L):
        jsel = np.nonzero(L == l)[0]
        lim = 1 << int(l)
        for g in range(3):
            for sside in (0, 1):
                na = A[jsel].copy()
                na[:, g] += 1 if sside else -1
                ok = (na[:, g] >= 0) & (na[:, g] < lim)
                if not ok.any():
                    continue
                js, naq = jsel[ok], na[ok]
                cand = find(l, naq)
                hit = (
                    (mesh.level[cand] == l)
                    & (mesh.anchor[cand] == naq).all(axis=1)
                    & (parr[cand] >= 0)
                )
                if not hit.any():
                    continue
                cand, js = cand[hit], js[hit]
                side_p = 1 - sside
                oth = [e for e in range(3) if e != g]
                acc[2 * g + side_p].append(
                    (
                        parr[cand],
                        lloc3[cand, oth[0]].astype(np.int64),
                        lloc3[cand, oth[1]].astype(np.int64),
                        js.astype(np.int64),
                    )
                )
    for k in range(6):
        if acc[k]:
            out[k] = tuple(np.concatenate(cols) for cols in zip(*acc[k]))
    return tuple(out)


def _sim_sub_assemble(sp, pidx, b1, b2, NP, K, n1, p):
    """[m, n1, n1] singleton planes -> dense [NP, S, S] overlap-added patch
    face contribution (integer-exact host mirror of the device E-GEMMs)."""
    S = K * p + 1
    grid = np.zeros((NP, K, K, n1, n1), dtype=sp.dtype)
    grid[pidx, b1, b2] = sp
    Z = np.zeros((NP, S, S), dtype=sp.dtype)
    for i in range(n1):
        for j in range(n1):
            Z[:, i : i + (K - 1) * p + 1 : p, j : j + (K - 1) * p + 1 : p] += grid[
                :, :, :, i, j
            ]
    return Z


def _sim_sub_extract(ppre, pidx, b1, b2, n1, p):
    """[m, n1, n1] subblocks of patch face planes at block coords (b1, b2)."""
    ii = np.arange(n1)
    return ppre[
        pidx[:, None, None],
        b1[:, None, None] * p + ii[None, :, None],
        b2[:, None, None] * p + ii[None, None, :],
    ]


def _simulate_full(raw_p, raw_s, nbr, nbr_s, cross, S, n1, K, use_ssweep):
    """Exact host mirror of the INTERLEAVED device exchange (patch sweeps +
    singleton sweeps + patch<->singleton cross terms, one geometric axis at a
    time, all adds within an axis reading pre-axis values)."""
    up = raw_p.copy()
    us = raw_s.copy()
    NP = up.shape[0]
    p = n1 - 1

    def bplane(arr, idx, sl):
        src = arr[np.maximum(idx, 0)][(slice(None),) + sl[1:]]
        return src * (idx >= 0).reshape((-1,) + (1,) * (src.ndim - 1))

    for g in range(3):
        sax = 3 - g
        psl_lo = _face_slicer(S, g, 0)
        psl_hi = _face_slicer(S, g, 1)
        ssl_lo = [slice(None)] * 4
        ssl_lo[sax] = 0
        ssl_hi = [slice(None)] * 4
        ssl_hi[sax] = n1 - 1
        ssl_lo, ssl_hi = tuple(ssl_lo), tuple(ssl_hi)
        p_lo, p_hi = up[psl_lo], up[psl_hi]
        s_lo, s_hi = us[ssl_lo], us[ssl_hi]
        add_plo = bplane(up, nbr[2 * g], psl_hi)
        add_phi = bplane(up, nbr[2 * g + 1], psl_lo)
        if use_ssweep:
            add_slo = bplane(us, nbr_s[2 * g], ssl_hi)
            add_shi = bplane(us, nbr_s[2 * g + 1], ssl_lo)
        else:
            add_slo = np.zeros_like(s_lo)
            add_shi = np.zeros_like(s_hi)
        for side_p, ppre, spre in ((0, p_lo, s_hi), (1, p_hi, s_lo)):
            tbl = cross[2 * g + side_p]
            if tbl is None:
                continue
            pidx, b1, b2, sidx = tbl
            sp = spre[sidx].transpose(0, 2, 1)
            Z = _sim_sub_assemble(sp, pidx, b1, b2, NP, K, n1, p)
            sub = _sim_sub_extract(ppre, pidx, b1, b2, n1, p).transpose(0, 2, 1)
            if side_p == 0:
                add_plo = add_plo + Z
                np.add.at(add_shi, sidx, sub)
            else:
                add_phi = add_phi + Z
                np.add.at(add_slo, sidx, sub)
        up[psl_lo] += add_plo
        up[psl_hi] += add_phi
        us[ssl_lo] += add_slo
        us[ssl_hi] += add_shi
    return up, us


def build_hybrid_format(
    dofh: DoFHandler, K: int = 8, min_patches: int = 2
) -> HybridFormat:
    """Build the hybrid layout for one level. 3D only."""
    mesh = dofh.mesh
    assert mesh.dim == 3, "hybrid engine is 3D (2D uses the base engine)"
    p = dofh.degree
    while True:
        p_level, p_block, p_cells, covered = _find_patches(mesh, K)
        if len(p_level) >= min_patches or K == 1:
            break
        K //= 2
    if K == 1:  # no useful patches: singleton-only layout
        covered = np.zeros(mesh.n_cells, dtype=bool)
        p_level = np.zeros(0, np.int32)
        p_block = np.zeros((0, 3), np.int64)
        p_cells = np.zeros((0, 1), np.int64)
    S = K * p + 1
    NP = len(p_level)
    single_cells = np.nonzero(~covered)[0]
    NS = len(single_cells)
    nloc = dofh.n_loc

    # patch_dof lattice: cell at block-local (bx,by,bz), node (i,j,k) ->
    # lattice (bx*p+i, by*p+j, bz*p+k)
    loc = local_node_indices(3, p)                       # [nloc, 3] x fastest
    bidx = np.empty((K**3, 3), dtype=np.int64)
    f = np.arange(K**3)
    for d in range(3):
        bidx[:, d] = (f // K**d) % K
    TX = (bidx[:, None, 0] * p + loc[None, :, 0]).reshape(-1)
    TY = (bidx[:, None, 1] * p + loc[None, :, 1]).reshape(-1)
    TZ = (bidx[:, None, 2] * p + loc[None, :, 2]).reshape(-1)
    patch_dof = np.zeros((NP, S, S, S), dtype=np.int32)
    if NP:
        vals = dofh.cell_dofs[p_cells].reshape(NP, -1)   # [NP, K^3*nloc]
        patch_dof[:, TX, TY, TZ] = vals

    # neighbours (vectorized packed-key lookup; same dict semantics)
    nbr = (
        _neighbour_lookup(p_level, p_block)
        if NP
        else np.full((6, 0), -1, dtype=np.int64)
    )

    # slots — every dof id 0..n_dofs-1 occurs, so unique_inverse's group ids
    # ARE the dof ids and its stable ``first`` is each dof's minimal slot
    # (exactly the old argsort-based reduction, one native radix instead)
    slot_dof = np.concatenate(
        [patch_dof.reshape(-1), dofh.cell_dofs[single_cells].reshape(-1)]
    )
    n_slots = len(slot_dof)
    from ..mesh.native import unique_inverse as _uinv

    rep_slot, _inv = _uinv(slot_dof)
    assert len(rep_slot) == dofh.n_dofs
    rep_slot = rep_slot.astype(np.int64)
    owner = np.zeros(n_slots, np.float32)
    owner[rep_slot] = 1.0

    # singleton-singleton face neighbours (their own sweep bucket)
    nbr_s = (
        _neighbour_lookup(mesh.level[single_cells], mesh.anchor[single_cells])
        if NS
        else np.full((6, 0), -1, dtype=np.int64)
    )

    # regular/irregular classification by exact simulation.  Values stay
    # < 2^40 and per-dof slot multiplicities are small, so sums stay < 2^53
    # and np.bincount's float64 accumulation is EXACT (np.add.at /
    # np.logical_and.at are per-element C loops — measured seconds at 33M
    # slots on the one-core host).
    rng = np.random.default_rng(12345)
    raw = rng.integers(1, 1 << 40, size=n_slots).astype(np.int64)
    group_sum = np.bincount(
        slot_dof, weights=raw.astype(np.float64), minlength=dofh.n_dofs
    ).astype(np.int64)
    swept = raw.copy()
    if NP:
        up = _simulate_sweeps(raw[: NP * S**3].reshape(NP, S, S, S), nbr, S)
        swept[: NP * S**3] = up.reshape(-1)

    def classify(swept_arr):
        bad = swept_arr != group_sum[slot_dof]
        reg = np.ones(dofh.n_dofs, dtype=bool)
        reg[slot_dof[bad]] = False
        return reg

    reg_without = classify(swept)
    use_singleton_sweeps = False
    dof_regular = reg_without
    if NS:
        n1 = p + 1
        swept2 = swept.copy()
        # the singleton flat order is x-fastest, so the [NS, n1, n1, n1]
        # reshape has axes [cell, z, y, x]: sweep axis 1 must use the
        # z-neighbour rows (the patch lattice is built x-major instead)
        us = _simulate_sweeps(
            raw[NP * S**3 :].reshape(NS, n1, n1, n1),
            nbr_s[SINGLE_SWEEP_ROWS],
            n1,
        )
        swept2[NP * S**3 :] = us.reshape(-1)
        reg_with = classify(swept2)
        # enable only when the saved irregular work clearly exceeds the cost
        # of the extra six plane sweeps over the singleton bucket
        saved = int(reg_with.sum() - reg_without.sum())
        if saved * 4 > 10 * NS:
            use_singleton_sweeps = True
            dof_regular = reg_with
    # patch<->singleton cross exchange: resolves the conforming interface
    # dofs between the two buckets (the dominant irregular population at mid
    # levels) with dense per-face assembly GEMMs instead of element scatters
    use_cross = False
    cross_faces = (None,) * 6
    if NP and NS:
        cross_faces = _build_cross_tables(mesh, p_cells, single_cells, K)
        m_total = sum(len(t[0]) for t in cross_faces if t is not None)
        if m_total:
            n1 = p + 1
            up_c, us_c = _simulate_full(
                raw[: NP * S**3].reshape(NP, S, S, S),
                raw[NP * S**3 :].reshape(NS, n1, n1, n1),
                nbr,
                nbr_s,
                cross_faces,
                S,
                n1,
                K,
                True,
            )
            swept3 = raw.copy()
            swept3[: NP * S**3] = up_c.reshape(-1)
            swept3[NP * S**3 :] = us_c.reshape(-1)
            reg_c = classify(swept3)
            saved_c = int(reg_c.sum() - dof_regular.sum())
            # the cross machinery is ~4 block-row ops per interface pair;
            # each saved dof removes ~2-3 element-priced irregular slots
            if saved_c * 4 > 3 * m_total:
                use_cross = True
                use_singleton_sweeps = True
                dof_regular = reg_c
        if not use_cross:
            cross_faces = (None,) * 6
    irr_dofs = np.nonzero(~dof_regular)[0]

    # irregular groups: all slots of each irregular dof
    if len(irr_dofs):
        is_irr = np.zeros(dofh.n_dofs, dtype=bool)
        is_irr[irr_dofs] = True
        sel = is_irr[slot_dof]
        s_ids = np.nonzero(sel)[0]
        s_dofs = slot_dof[s_ids]
        o = np.argsort(s_dofs, kind="stable")
        s_ids, s_dofs = s_ids[o], s_dofs[o]
        uniq, start, counts = np.unique(s_dofs, return_index=True, return_counts=True)
        G = len(uniq)
        Kg = int(counts.max())
        irr_slots = np.full((G, Kg), n_slots, dtype=np.int64)  # pad slot
        for k in range(Kg):
            has = counts > k
            irr_slots[has, k] = s_ids[start[has] + k]
        irr_out_slots = s_ids
        irr_out_group = np.repeat(np.arange(G), counts)
    else:
        irr_slots = np.zeros((0, 1), np.int64)
        irr_out_slots = np.zeros(0, np.int64)
        irr_out_group = np.zeros(0, np.int64)

    return HybridFormat(
        dofh=dofh,
        K=K,
        S=S,
        patch_level=p_level,
        patch_block=p_block,
        patch_cells=p_cells,
        patch_dof=patch_dof,
        nbr=nbr,
        nbr_s=nbr_s,
        use_singleton_sweeps=use_singleton_sweeps,
        single_cells=single_cells,
        slot_dof=slot_dof,
        rep_slot=rep_slot,
        owner=owner,
        irr_slots=irr_slots,
        irr_out_slots=irr_out_slots,
        irr_out_group=irr_out_group,
        cross_faces=cross_faces,
        use_cross=use_cross,
    )


def slots_of(fmt: HybridFormat, dofs: np.ndarray):
    """All slots of each dof: (padded [n, Km] with pad=n_slots, flat list,
    group index per flat entry)."""
    cached = getattr(fmt, "_slot_order_cache", None)
    if cached is None:
        from ..mesh.native import argsort_i64

        order = argsort_i64(fmt.slot_dof)
        cached = (order, fmt.slot_dof[order])
        fmt._slot_order_cache = cached
    order, sd = cached
    starts = np.searchsorted(sd, dofs)
    ends = np.searchsorted(sd, dofs, side="right")
    counts = ends - starts
    Km = int(counts.max()) if len(counts) else 1
    padded = np.full((len(dofs), max(Km, 1)), fmt.n_slots, dtype=np.int64)
    for k in range(Km):
        has = counts > k
        padded[has, k] = order[starts[has] + k]
    if len(dofs):
        total = int(counts.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        flat = order[np.repeat(starts, counts) + within]
    else:
        flat = np.zeros(0, np.int64)
    grp = np.repeat(np.arange(len(dofs)), counts)
    return padded, flat, grp


@dataclass(frozen=True)
class HybridOperator:
    """Constrained Laplacian in hybrid slot layout (device side)."""

    # bulk compute
    KS: jax.Array            # [S, S] assembled 1D stiffness (unit cells)
    MS: jax.Array            # [S, S] assembled 1D mass
    elem: jax.Array          # [nloc, nloc]
    pscale: jax.Array        # [NP]
    sscale: jax.Array        # [NS]
    # exchange
    nbr: jax.Array           # i32 [6, NP] clamped
    nbr_mask: jax.Array      # f [6, NP]
    snbr: jax.Array          # i32 [6, NS] clamped (singleton sweeps)
    snbr_mask: jax.Array     # f [6, NS]
    # size-bucketed irregular groups: ((slots [G_s, s], out_slots, out_group), ...)
    irr_buckets: tuple
    # constraints — zero/set ops are elementwise masks (cheap on TPU);
    # only genuinely irregular interpolation uses index tables
    dirichlet_keep: jax.Array      # f [n_slots] 0 on Dirichlet slots
    slave_keep: jax.Array          # f [n_slots] 0 on hanging-slave slots
    constrained_keep: jax.Array    # f [n_slots] 0 on all constrained slots
    slave_master_slots: jax.Array  # i32 [n_sl, Kc] rep slots of masters
    slave_w: jax.Array             # f [n_sl, Kc]
    slave_all_slots: jax.Array     # i32 [Wsl] all slots of each slave
    slave_all_src: jax.Array      # i32 [Wsl]
    slave_rep: jax.Array           # i32 [n_sl]
    ct_target: jax.Array           # i32 [M] rep slot of master per (slave,master)
    ct_src: jax.Array              # i32 [M]
    ct_w: jax.Array                # f [M]
    refresh_slots: jax.Array       # i32 [R] non-rep slots of master dofs
    refresh_src: jax.Array         # i32 [R] their rep slots
    owner: jax.Array               # f [n_slots]
    # structured hanging faces, batched per fine level (sf_levels):
    #   sf_patch[i]:  None or (face_slots [n,S,S], src_slots [n,sub,sub],
    #                 mask [n,S,S]) — whole K-patch faces on coarse cells
    #   sf_single[i]: None or (face_slots [n,n1,n1], src_slots [n,n1,n1],
    #                 mask [n,n1,n1], pa [n], pb [n]) — singleton-cell faces,
    #                 per-face parity selecting the half-embedding
    # Orientation lives entirely in the flat slot tables, so every (d, side,
    # parity) collapses into ONE gather + GEMMs + ONE scatter per level.
    sf_patch: tuple
    sf_single: tuple
    sf_E1: jax.Array               # [S, sub] 1D h-embedding (patch faces)
    sf_slave_keep: jax.Array       # f [n_slots]: 0 on structured-slave slots
    # per-(d, side) row groups, concat order == the combined sf_patch /
    # sf_single tables: face planes are whole axis planes of the bucket
    # lattices, so ct_faces READS them via axis slice + block-row gather
    # (microbench pattern A2, ~free).  WRITES stay on the flat element
    # tables as ONE combined scatter per level: restructuring them into
    # per-(axis, side) slice / row-scatter / write-back passes was measured
    # 4-5x slower in context (ct_faces 1.1 -> 5.1 ms at r=6/p=4, reverted —
    # DESIGN.md round-3b sliced-write rule).
    sf_patch_rows: tuple           # per level: tuple of fidx arrays
    sf_single_rows: tuple          # per level: tuple of sidx arrays
    # retired block-row source tables (kept as empty tuples for pytree/
    # sharding compatibility)
    sf_patch_src: tuple
    sf_single_src: tuple
    # static
    use_ssweep: bool
    NP: int
    NS: int
    S: int
    nloc: int
    n_slots: int
    n_dofs: int
    n_shards: int = 1
    sf_levels: tuple = ()          # fine levels with structured faces (meta)
    sf_patch_rows_meta: tuple = () # per level: tuple of (d, side, count)
    sf_single_rows_meta: tuple = ()  # per level: tuple of (d, side, count)
    # scatter-round grouping (meta): tuples of sf_levels indices proven
    # chain-free by the build-time slot-table dependency analysis, so each
    # round is ONE combined volume-sized scatter.  apply_c rounds ascend,
    # ct_faces rounds descend; () falls back to one level per round.
    sf_c_rounds: tuple = ()
    sf_ct_rounds: tuple = ()
    sf_Eh: jax.Array | None = None  # [2, n1, n1] per-parity h-embedding
    # patch<->singleton cross exchange (active when use_cross): entry
    # 2g+side_p is None or (ppos [m] = pidx*K^2 + b1*K + b2, sidx [m]).
    # Easm [S, K*n1] is the 0/1 overlap-assembly matrix
    # (Easm[b*p+i, b*n1+i] = 1): singleton face planes assemble onto a patch
    # face as Z = Easm @ grid @ Easm^T, and the reverse extraction is the
    # transpose — dense GEMMs instead of element-priced irregular scatters
    cross: tuple = ()
    Easm: jax.Array | None = None
    use_cross: bool = False
    # lane-dense variants (RESULTS.md round-3c tile-padding diagnosis):
    # whole-row singleton sweeps ([NS, nloc] GEMMs, no lattice view) and the
    # patch-minor transpose-sandwich stencil ([S, S, S, NP], NP on lanes).
    # Flip with dataclasses.replace(op, use_row_single=True, ...) — the
    # supporting matrices are always built.
    ssweep_T: jax.Array | None = None    # [6, nloc, nloc]
    sface_sel: jax.Array | None = None   # [6, nloc, n1^2] plane extract
    sface_selT: jax.Array | None = None  # [6, nloc, n1^2] transposed plane
    # one-hot patch-neighbour matrices [6, NP, NP] (mask folded in) for the
    # transposed exchange; built only when NP <= 1024 (make_hybrid_operator)
    pnbr_P: jax.Array | None = None
    use_row_single: bool = False
    use_tstencil: bool = False
    use_texchange: bool = False
    # transposed-vmult mode (round-4): ONE entry transpose into the
    # patch-minor flat layout ([lidx, patch] with patches on lanes), every
    # stage lane-dense on PERMUTED slot tables, ONE exit transpose.  The
    # dict holds the permuted copies of the slot-indexed tables (built in
    # make_hybrid_operator when MGTPU_TV is on, single-shard only); None
    # disables the mode.  Motivation: the per-stage transposes and the
    # (8,128)-padded lattice materialisations price the L7 vmult at
    # 26.5 ms where ~11 ms of real work exists (RESULTS.md round-4).
    tv: dict | None = None

    @property
    def dtype(self):
        return self.pscale.dtype

    @property
    def patch_slots(self) -> int:
        return self.NP * self.S**3

    # device-major layout accessors
    def _patches(self, x: jax.Array) -> jax.Array:
        return unpack_patches(x, self.n_shards, self.NP, self.S)

    def _singles(self, x: jax.Array) -> jax.Array:
        return unpack_singles(x, self.n_shards, self.NP, self.S, self.NS, self.nloc)

    def _with_patches(self, x: jax.Array, up: jax.Array) -> jax.Array:
        return with_patches(x, up, self.n_shards, self.NP, self.S)

    def _with_singles(self, x: jax.Array, us: jax.Array) -> jax.Array:
        return with_singles(x, us, self.n_shards, self.NP, self.S)

    def _patches2d(self, x: jax.Array) -> jax.Array:
        """[NP, S^3] patch view straight from the flat vector — 2D with a
        ~36k lane dim, so it never materialises the (8,128)-padded 4D
        lattice layout."""
        pp = (self.NP // self.n_shards) * self.S**3
        return x.reshape(self.n_shards, -1)[:, :pp].reshape(self.NP, self.S**3)

    def _with_patches2d(self, x: jax.Array, up2d: jax.Array) -> jax.Array:
        pp = (self.NP // self.n_shards) * self.S**3
        xa = x.reshape(self.n_shards, -1)
        return xa.at[:, :pp].set(up2d.reshape(self.n_shards, -1)).reshape(-1)

    def new_vector(self) -> jax.Array:
        return jnp.zeros(self.n_slots, self.dtype)

    def dot(self, x: jax.Array, y: jax.Array) -> jax.Array:
        # elementwise multiply + sum: full-precision VPU reduction (jnp.vdot
        # would route through the MXU at bf16 input precision)
        return jnp.sum(x * self.owner * y)

    @property
    def _n1(self) -> int:
        n1 = round(self.nloc ** (1 / 3))
        while n1**3 < self.nloc:
            n1 += 1
        return n1

    # ------------------------------------------------------------ constraints
    def apply_c(self, x: jax.Array) -> jax.Array:
        x = x * self.dirichlet_keep
        if self.slave_rep.shape[0]:
            vals = (self.slave_w * x[self.slave_master_slots]).sum(-1)
            x = x.at[self.slave_all_slots].set(vals[self.slave_all_src].astype(x.dtype))
        if self.sf_levels:
            E1 = self.sf_E1.astype(x.dtype)
            # fine levels ASCENDING with a flush per ROUND resolves constraint
            # chains (a coarse source plane may itself be the fine side of a
            # deeper hanging interface); rounds group the levels the build-time
            # dependency analysis proved chain-free, so each round is one
            # gather + GEMMs + ONE combined volume-sized scatter.  Element-
            # priced flat tables beat block-row restructures here IN CONTEXT
            # (measured apply_c 0.94 -> 1.41 ms at r=6/p=4, reverted).
            rounds = self.sf_c_rounds or tuple(
                (i,) for i in range(len(self.sf_levels))
            )
            for rnd in rounds:
                idxs, vals_ = [], []
                for i in rnd:
                    if self.sf_patch[i] is not None:
                        face, src, _m = self.sf_patch[i]
                        sv = x[src]                             # [n, sub, sub]
                        plane = jnp.einsum(
                            "nsj,is->nij",
                            jnp.einsum("nst,jt->nsj", sv, E1, precision=HIGHEST),
                            E1, precision=HIGHEST,
                        )
                        idxs.append(face.reshape(-1))
                        vals_.append(plane.reshape(-1))
                    if self.sf_single[i] is not None:
                        face, src, _m, pa, pb = self.sf_single[i]
                        Ea = self.sf_Eh[pa].astype(x.dtype)     # [n, n1, n1]
                        Eb = self.sf_Eh[pb].astype(x.dtype)
                        sv = x[src]                             # [n, n1, n1]
                        tmp = jnp.einsum("nmk,njk->nmj", sv, Eb, precision=HIGHEST)
                        plane = jnp.einsum("nmj,nim->nij", tmp, Ea, precision=HIGHEST)
                        idxs.append(face.reshape(-1))
                        vals_.append(plane.reshape(-1))
                # duplicate indices (slots on two covered faces) receive equal
                # values, so an unordered scatter-set is well-defined; across
                # levels of one round the write sets are proven disjoint
                if idxs:
                    x = x.at[jnp.concatenate(idxs)].set(jnp.concatenate(vals_))
            x = x * self.dirichlet_keep
        return x

    def apply_ct_faces(self, r: jax.Array) -> jax.Array:
        """Structured C^T on RAW residuals (before exchange): ship masked fine
        face planes to the coarse quarter-planes, zero the structured slaves.

        Patch-face READS are axis slice + block-row gathers on the patch
        lattice view (microbench pattern A2, ~free); singleton-face reads and
        all WRITES stay on the flat element tables, with ONE combined
        scatter-add per level.  A per-(axis, side) slice / row-scatter /
        write-back restructure was measured 4-5x slower in context (ct_faces
        1.1 -> 5.1 ms at r=6/p=4) and reverted — the DESIGN.md round-3b
        sliced-write rule."""
        if not self.sf_levels:
            return r
        E1 = self.sf_E1.astype(r.dtype)
        S = self.S
        # fine-level DESCENDING for the transpose chains; a level's adds land
        # on level-(l-1) cells, disjoint from its own face reads, and the
        # build-time rounds group levels whose reads provably miss every
        # earlier add of the round — so ONE combined scatter-add per round
        rounds = self.sf_ct_rounds or tuple(
            (i,) for i in range(len(self.sf_levels) - 1, -1, -1)
        )
        for rnd in rounds:
            idxs, vals_ = [], []
            for i in rnd:
                idxs, vals_ = self._ct_faces_level(r, i, E1, S, idxs, vals_)
            r = r.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals_))
        return r * self.sf_slave_keep

    def _ct_faces_level(self, r, i, E1, S, idxs, vals_):
        """Collect one level's C^T face contributions (reads + GEMMs only —
        the combined scatter-add happens once per round in apply_ct_faces)."""
        if True:
            if self.sf_patch[i] is not None:
                _face, src, mask = self.sf_patch[i]
                # read whole patch-face planes via axis slice + block-row
                # gather; group concat order matches the combined tables.
                # use_tstencil mode gathers the bucket ROWS from the 2D form
                # first, so only [n_rows, S, S, S] — not the whole bucket —
                # materialises in the (8,128)-padded lattice layout
                if self.use_tstencil:
                    rp2 = self._patches2d(r)
                    plane = jnp.concatenate(
                        [
                            rp2[fidx].reshape(-1, S, S, S)[
                                (slice(None),) + _face_slicer(S, d, side)[1:]
                            ]
                            for fidx, (d, side, _c) in zip(
                                self.sf_patch_rows[i], self.sf_patch_rows_meta[i]
                            )
                        ]
                    ) * mask.astype(r.dtype)
                else:
                    rp = self._patches(r)
                    plane = jnp.concatenate(
                        [
                            rp[_face_slicer(S, d, side)][fidx]
                            for fidx, (d, side, _c) in zip(
                                self.sf_patch_rows[i], self.sf_patch_rows_meta[i]
                            )
                        ]
                    ) * mask.astype(r.dtype)
                tmp = jnp.einsum("nij,is->nsj", plane, E1, precision=HIGHEST)
                contrib = jnp.einsum("nsj,jt->nst", tmp, E1, precision=HIGHEST)
                idxs.append(src.reshape(-1))
                vals_.append(contrib.reshape(-1))
            if self.sf_single[i] is not None:
                face, src, mask, pa, pb = self.sf_single[i]
                Ea = self.sf_Eh[pa].astype(r.dtype)
                Eb = self.sf_Eh[pb].astype(r.dtype)
                # element-priced flat read: materializing the [NS, n1, n1, n1]
                # lattice view for a slice+block-row read pays ~40x tile
                # padding (n1 = p+1 << 128 lanes) per level — measured slower
                # than the surface-sized element gather
                plane = r[face] * mask.astype(r.dtype)
                tmp = jnp.einsum("nij,nim->nmj", plane, Ea, precision=HIGHEST)
                contrib = jnp.einsum("nmj,njk->nmk", tmp, Eb, precision=HIGHEST)
                idxs.append(src.reshape(-1))
                vals_.append(contrib.reshape(-1))
        return idxs, vals_

    def apply_ct(self, r: jax.Array) -> jax.Array:
        if self.slave_rep.shape[0]:
            vals = r[self.slave_rep]
            r = r * self.slave_keep
            r = r.at[self.ct_target].add((self.ct_w * vals[self.ct_src]).astype(r.dtype))
            # broadcast master rep values to their duplicate slots
            if self.refresh_slots.shape[0]:
                r = r.at[self.refresh_slots].set(r[self.refresh_src])
        return r * self.dirichlet_keep

    @property
    def _K(self) -> int:
        return (self.S - 1) // max(self._n1 - 1, 1)

    def _psweeps_t(self, ut: jax.Array) -> jax.Array:
        """Plain patch face sweeps on the transposed [S, S, S, NP] bucket:
        leading-axis slices + one-hot [NP, NP] neighbour GEMMs."""
        S = self.S
        P = self.pnbr_P.astype(ut.dtype)
        for g in range(3):
            sl_lo = tuple(0 if a == g else slice(None) for a in range(3))
            sl_hi = tuple((S - 1) if a == g else slice(None) for a in range(3))
            p_lo, p_hi = ut[sl_lo], ut[sl_hi]
            add_lo = jnp.matmul(p_hi, P[2 * g], precision=HIGHEST)
            add_hi = jnp.matmul(p_lo, P[2 * g + 1], precision=HIGHEST)
            ut = ut.at[sl_lo].add(add_lo)
            ut = ut.at[sl_hi].add(add_hi)
        return ut

    # ------------------------------------------------- transposed-vmult (tv)
    # The whole vmult chain in the patch-minor flat layout: patch slot
    # (pi, lidx) lives at flat position lidx*NP + pi, singles unchanged.
    # ONE transpose in, ONE out; every stage runs on self.tv's permuted
    # tables with patches on the (dense) lane dimension — no (8,128)-padded
    # lattice materialisation anywhere.
    def _t_eye(self, dtype) -> jax.Array | None:
        """One-hot [NP, NP] transpose matrix (tv["eye"], present only under
        MGTPU_TGEMM).  The boundary transposes then ride the MXU as exact
        one-hot GEMMs (every output element is a single 1.0*x product)
        instead of XLA's native transpose, which pays ~5x the HBM floor on
        the odd [NP, S^3] shape.  f32 only — a f64 one-hot GEMM would be
        slower than the transpose it replaces."""
        tv = self.tv
        eye = tv.get("eye") if tv is not None else None
        if eye is not None and dtype == eye.dtype:
            return eye
        return None

    def _to_t(self, x: jax.Array) -> jax.Array:
        ps = self.patch_slots
        if not ps:
            return x
        eye = self._t_eye(x.dtype)
        if eye is not None:
            # [NP, S3] -(contract NP against one-hot)-> [S3, NP]
            pt = jax.lax.dot_general(
                x[:ps].reshape(self.NP, -1), eye,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=HIGHEST,
            ).reshape(-1)
        else:
            pt = x[:ps].reshape(self.NP, -1).T.reshape(-1)
        if x.shape[0] == ps:
            return pt
        return jnp.concatenate([pt, x[ps:]])

    def _from_t(self, xt: jax.Array) -> jax.Array:
        ps = self.patch_slots
        if not ps:
            return xt
        eye = self._t_eye(xt.dtype)
        if eye is not None:
            # [S3, NP] -(contract NP against one-hot)-> [NP, S3]
            pt = jax.lax.dot_general(
                eye, xt[:ps].reshape(-1, self.NP),
                dimension_numbers=(((0,), (1,)), ((), ())),
                precision=HIGHEST,
            ).reshape(-1)
        else:
            pt = xt[:ps].reshape(-1, self.NP).T.reshape(-1)
        if xt.shape[0] == ps:
            return pt
        return jnp.concatenate([pt, xt[ps:]])

    def _apply_c_t(self, xt: jax.Array) -> jax.Array:
        tv = self.tv
        xt = xt * tv["dirichlet_keep"]
        if self.slave_rep.shape[0]:
            vals = (self.slave_w * xt[tv["slave_master_slots"]]).sum(-1)
            xt = xt.at[tv["slave_all_slots"]].set(
                vals[self.slave_all_src].astype(xt.dtype)
            )
        if self.sf_levels:
            E1 = self.sf_E1.astype(xt.dtype)
            rounds = self.sf_c_rounds or tuple(
                (i,) for i in range(len(self.sf_levels))
            )
            dense = tv.get("sfp_dense")
            for rnd in rounds:
                idxs, vals_ = [], []
                routed: dict = {}
                covers: dict = {}
                for i in rnd:
                    if tv["sf_patch"][i] is not None:
                        face, src = tv["sf_patch"][i]
                        sv = xt[src]
                        plane = jnp.einsum(
                            "nsj,is->nij",
                            jnp.einsum("nst,jt->nsj", sv, E1, precision=HIGHEST),
                            E1, precision=HIGHEST,
                        )
                        if dense is not None and dense[i] is not None:
                            # dense-plane write: route [n, S, S] group planes
                            # to [S, S, NP] slabs via one-hot patch matrices;
                            # ONE blended strided-slab update per (d, side)
                            # per round replaces the element-priced scatter
                            off = 0
                            for (hot, cover), (d, side, n) in zip(
                                dense[i], self.sf_patch_rows_meta[i]
                            ):
                                pg = plane[off : off + n]
                                off += n
                                term = jnp.tensordot(
                                    pg, hot.astype(xt.dtype),
                                    axes=([0], [0]), precision=HIGHEST,
                                )
                                key = (d, side)
                                if key in routed:
                                    routed[key] = routed[key] + term
                                    covers[key] = covers[key] + cover
                                else:
                                    routed[key] = term
                                    covers[key] = cover
                        else:
                            idxs.append(face.reshape(-1))
                            vals_.append(plane.reshape(-1))
                    if tv["sf_single"][i] is not None:
                        face, src = tv["sf_single"][i]
                        _f, _s, _m, pa, pb = self.sf_single[i]
                        Ea = self.sf_Eh[pa].astype(xt.dtype)
                        Eb = self.sf_Eh[pb].astype(xt.dtype)
                        sv = xt[src]
                        tmp = jnp.einsum("nmk,njk->nmj", sv, Eb, precision=HIGHEST)
                        plane = jnp.einsum(
                            "nmj,nim->nij", tmp, Ea, precision=HIGHEST
                        )
                        idxs.append(face.reshape(-1))
                        vals_.append(plane.reshape(-1))
                if idxs:
                    xt = xt.at[jnp.concatenate(idxs)].set(jnp.concatenate(vals_))
                if routed:
                    S, NP = self.S, self.NP
                    ps = self.patch_slots
                    ut = xt[:ps].reshape(S, S, S, NP)
                    for (d, side), term in routed.items():
                        cov = jnp.minimum(covers[(d, side)], 1.0).astype(
                            xt.dtype
                        )
                        sl = tuple(
                            ((S - 1) if side else 0) if a == d else slice(None)
                            for a in range(3)
                        )
                        ut = ut.at[sl].set(ut[sl] * (1.0 - cov) + term)
                    if xt.shape[0] == ps:
                        xt = ut.reshape(-1)
                    else:
                        xt = jnp.concatenate([ut.reshape(-1), xt[ps:]])
            xt = xt * tv["dirichlet_keep"]
        return xt

    def _cell_apply_raw_t(self, xt: jax.Array) -> jax.Array:
        ps = self.patch_slots
        outs = []
        if self.NP:
            S, NP = self.S, self.NP
            ut = xt[:ps].reshape(S, S, S, NP)

            def axl(u, mat, axis):
                return jnp.moveaxis(
                    jnp.tensordot(mat, u, axes=([1], [axis]), precision=HIGHEST),
                    0, axis,
                )

            KS, MS = self.KS, self.MS
            kx = axl(axl(axl(ut, KS, 0), MS, 1), MS, 2)
            ky = axl(axl(axl(ut, MS, 0), KS, 1), MS, 2)
            kz = axl(axl(axl(ut, MS, 0), MS, 1), KS, 2)
            rt = (kx + ky + kz) * self.pscale[None, None, None, :]
            outs.append(rt.reshape(-1))
        if self.NS:
            xs = xt[ps:].reshape(self.NS, self.nloc)
            rs = jnp.matmul(xs, self.elem, precision=HIGHEST) * self.sscale[:, None]
            outs.append(rs.reshape(-1))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _ct_faces_t(self, rt: jax.Array) -> jax.Array:
        if not self.sf_levels:
            return rt
        tv = self.tv
        E1 = self.sf_E1.astype(rt.dtype)
        rounds = self.sf_ct_rounds or tuple(
            (i,) for i in range(len(self.sf_levels) - 1, -1, -1)
        )
        dense = tv.get("sfp_dense")
        for rnd in rounds:
            idxs, vals_ = [], []
            for i in rnd:
                if tv["sf_patch"][i] is not None:
                    face, src = tv["sf_patch"][i]
                    mask = self.sf_patch[i][2]
                    if dense is not None and dense[i] is not None:
                        # dense-plane read: ONE strided T-lattice slab per
                        # (d, side) group, routed [S, S, NP] -> [n, S, S] by
                        # the one-hot patch matrices (replaces the element-
                        # priced flat face gather)
                        S_, NP = self.S, self.NP
                        ut = rt[: self.patch_slots].reshape(S_, S_, S_, NP)
                        parts = []
                        for (hot, _cov), (d, side, n) in zip(
                            dense[i], self.sf_patch_rows_meta[i]
                        ):
                            sl = tuple(
                                ((S_ - 1) if side else 0)
                                if a == d
                                else slice(None)
                                for a in range(3)
                            )
                            slab = ut[sl]  # [S, S, NP]
                            parts.append(
                                jnp.tensordot(
                                    slab, hot.astype(rt.dtype),
                                    axes=([2], [1]), precision=HIGHEST,
                                ).transpose(2, 0, 1)
                            )
                        plane = jnp.concatenate(parts) * mask.astype(rt.dtype)
                    else:
                        # surface-priced flat gather — small face population
                        # (census: 209k elements at r=7/p=4 L7)
                        plane = rt[face] * mask.astype(rt.dtype)
                    tmp = jnp.einsum("nij,is->nsj", plane, E1, precision=HIGHEST)
                    contrib = jnp.einsum("nsj,jt->nst", tmp, E1, precision=HIGHEST)
                    idxs.append(src.reshape(-1))
                    vals_.append(contrib.reshape(-1))
                if tv["sf_single"][i] is not None:
                    face, src = tv["sf_single"][i]
                    _f, _s, mask, pa, pb = self.sf_single[i]
                    Ea = self.sf_Eh[pa].astype(rt.dtype)
                    Eb = self.sf_Eh[pb].astype(rt.dtype)
                    plane = rt[face] * mask.astype(rt.dtype)
                    tmp = jnp.einsum("nij,nim->nmj", plane, Ea, precision=HIGHEST)
                    contrib = jnp.einsum("nmj,njk->nmk", tmp, Eb, precision=HIGHEST)
                    idxs.append(src.reshape(-1))
                    vals_.append(contrib.reshape(-1))
            rt = rt.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals_))
        return rt * tv["sf_slave_keep"]

    def _exchange_t(self, rt: jax.Array) -> jax.Array:
        tv = self.tv
        ps = self.patch_slots
        sums = [rt[slots].sum(-1) for slots, _, _ in tv["irr_buckets"]]
        if self.NP:
            S, NP = self.S, self.NP
            ut = rt[:ps].reshape(S, S, S, NP)
            if self.use_cross:
                us = rt[ps:].reshape(self.NS, self.nloc)
                ut, us = self._exchange_cross_t_core(ut, us)
                rt = jnp.concatenate([ut.reshape(-1), us.reshape(-1)])
            else:
                ut = self._psweeps_t(ut)
                parts = [ut.reshape(-1)]
                if self.NS:
                    us = rt[ps:].reshape(self.NS, self.nloc)
                    if self.use_ssweep:
                        us = self._ssweep_rows(us)
                    parts.append(us.reshape(-1))
                rt = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        elif self.NS and self.use_ssweep:
            us = self._ssweep_rows(rt.reshape(self.NS, self.nloc))
            rt = us.reshape(-1)
        if sums:
            out_all = jnp.concatenate([b[1] for b in tv["irr_buckets"]])
            val_all = jnp.concatenate(
                [
                    s[g].astype(rt.dtype)
                    for (_, _, g), s in zip(tv["irr_buckets"], sums)
                ]
            )
            rt = rt.at[out_all].set(val_all)
        return rt

    def _apply_ct_t(self, rt: jax.Array) -> jax.Array:
        tv = self.tv
        if self.slave_rep.shape[0]:
            vals = rt[tv["slave_rep"]]
            rt = rt * tv["slave_keep"]
            rt = rt.at[tv["ct_target"]].add(
                (self.ct_w * vals[self.ct_src]).astype(rt.dtype)
            )
            if self.refresh_slots.shape[0]:
                rt = rt.at[tv["refresh_slots"]].set(rt[tv["refresh_src"]])
        return rt * tv["dirichlet_keep"]

    def _vmult_t_core(self, xt: jax.Array) -> jax.Array:
        """Full vmult in the transposed layout (T in, T out) — lets callers
        that chain applies with elementwise ops (the Chebyshev smoother)
        keep their state in T space and skip the per-apply transposes."""
        yt = self._apply_c_t(xt)
        rt = self._cell_apply_raw_t(yt)
        rt = self._ct_faces_t(rt)
        rt = self._exchange_t(rt)
        rt = self._apply_ct_t(rt)
        ck = self.tv["constrained_keep"]
        return rt * ck + xt * (1.0 - ck)

    def _vmult_t(self, x: jax.Array) -> jax.Array:
        if "split" in self.tv:
            return self._from_ts(self._vmult_ts_core(self._to_ts(x)))
        return self._from_t(self._vmult_t_core(self._to_t(x)))

    # --------------------------------------- split-state (TVec) pipeline
    # The tv pipeline with the patch/singleton buckets carried as separate
    # leaves (TVec): no volume-sized fused vector ever exists between the
    # entry and exit transposes, so constraint scatters cost the bucket
    # they live in (tail-sized at bench shapes) and the per-stage
    # split/concat repacks vanish.  Algebra identical to the _t stages.
    def _to_ts(self, x: jax.Array) -> TVec:
        ps = self.patch_slots
        if not ps:
            return TVec(x[:0], x)
        head = x[:ps].reshape(self.NP, -1).T.reshape(-1)
        return TVec(head, x[ps:])

    def _from_ts(self, v: TVec) -> jax.Array:
        ps = self.patch_slots
        if not ps:
            return v.tail
        head = v.head.reshape(-1, self.NP).T.reshape(-1)
        if v.tail.shape[0] == 0:
            return head
        return jnp.concatenate([head, v.tail])

    def _ts_scatter(self, h, t, hparts, tparts, add: bool):
        if hparts:
            idx = hparts[0][0] if len(hparts) == 1 else jnp.concatenate(
                [i for i, _ in hparts])
            val = hparts[0][1] if len(hparts) == 1 else jnp.concatenate(
                [v for _, v in hparts])
            h = h.at[idx].add(val) if add else h.at[idx].set(val)
        if tparts:
            idx = tparts[0][0] if len(tparts) == 1 else jnp.concatenate(
                [i for i, _ in tparts])
            val = tparts[0][1] if len(tparts) == 1 else jnp.concatenate(
                [v for _, v in tparts])
            t = t.at[idx].add(val) if add else t.at[idx].set(val)
        return h, t

    def _apply_c_ts(self, v: TVec) -> TVec:
        sp = self.tv["split"]
        h = v.head * sp["dk_h"]
        t = v.tail * sp["dk_t"]
        if self.slave_rep.shape[0]:
            sv = _split_gather(sp["sms"], h, t, self.slave_master_slots.shape)
            vals = (self.slave_w * sv).sum(-1)
            per = vals[self.slave_all_src].astype(t.dtype)
            hp, tp = [], []
            for side, idx, vv in _split_parts(sp["sas"], per):
                (hp if side == "h" else tp).append((idx, vv))
            h, t = self._ts_scatter(h, t, hp, tp, add=False)
        if self.sf_levels:
            E1 = self.sf_E1.astype(t.dtype)
            rounds = self.sf_c_rounds or tuple(
                (i,) for i in range(len(self.sf_levels))
            )
            dense = self.tv.get("sfp_dense")
            rowsf = sp.get("rowsf_c")
            sfs_tabs = sp["sfs_ro"] if rowsf is not None else sp["sfs"]
            S, NP = self.S, self.NP
            for ridx, rnd in enumerate(rounds):
                hp, tp = [], []
                routed: dict = {}
                covers: dict = {}
                for i in rnd:
                    if sp["sfp"][i] is not None:
                        fsp, ssp = sp["sfp"][i]
                        sv = _split_gather(
                            ssp, h, t, self.sf_patch[i][1].shape
                        )
                        plane = jnp.einsum(
                            "nsj,is->nij",
                            jnp.einsum("nst,jt->nsj", sv, E1,
                                       precision=HIGHEST),
                            E1, precision=HIGHEST,
                        )
                        if dense is not None and dense[i] is not None:
                            off = 0
                            for (hot, cover), (d, side, n) in zip(
                                dense[i], self.sf_patch_rows_meta[i]
                            ):
                                pg = plane[off : off + n]
                                off += n
                                term = jnp.tensordot(
                                    pg, hot.astype(t.dtype),
                                    axes=([0], [0]), precision=HIGHEST,
                                )
                                key = (d, side)
                                if key in routed:
                                    routed[key] = routed[key] + term
                                    covers[key] = covers[key] + cover
                                else:
                                    routed[key] = term
                                    covers[key] = cover
                        else:
                            for side_, idx, vv in _split_parts(fsp, plane):
                                (hp if side_ == "h" else tp).append((idx, vv))
                    if sfs_tabs[i] is not None:
                        fsp, ssp = sfs_tabs[i]
                        _f, _s, _m, pa, pb = self.sf_single[i]
                        Ea = self.sf_Eh[pa].astype(t.dtype)
                        Eb = self.sf_Eh[pb].astype(t.dtype)
                        sv = _split_gather(ssp, h, t, _s.shape)
                        tmp = jnp.einsum(
                            "nmk,njk->nmj", sv, Eb, precision=HIGHEST
                        )
                        plane = jnp.einsum(
                            "nmj,nim->nij", tmp, Ea, precision=HIGHEST
                        )
                        for side_, idx, vv in _split_parts(fsp, plane):
                            (hp if side_ == "h" else tp).append((idx, vv))
                h, t = self._ts_scatter(h, t, hp, tp, add=False)
                if rowsf is not None and rowsf[ridx] is not None:
                    # row-form singleton faces: block-row src gathers +
                    # plane-selection GEMMs; one blended unique-cell row
                    # write per round (designated writer per slot — the
                    # duplicate face writes carry equal values, so picking
                    # one is exact).  Round analysis proves the src reads
                    # are disjoint from this round's writes.
                    rd = rowsf[ridx]
                    nl = self.nloc
                    n1 = self._n1
                    t2 = t.reshape(self.NS, nl)
                    acc = jnp.zeros((rd["uc"].shape[0], nl), t.dtype)
                    for bk in rd["b"]:
                        srows = t2[bk["sc"]]
                        sv = jnp.matmul(
                            srows, bk["sx"].astype(t.dtype),
                            precision=HIGHEST,
                        ).reshape(-1, n1, n1)
                        Ea = self.sf_Eh[bk["pa"]].astype(t.dtype)
                        Eb = self.sf_Eh[bk["pb"]].astype(t.dtype)
                        tmp = jnp.einsum(
                            "nmk,njk->nmj", sv, Eb, precision=HIGHEST
                        )
                        plane = jnp.einsum(
                            "nmj,nim->nij", tmp, Ea, precision=HIGHEST
                        )
                        pm = plane.reshape(plane.shape[0], -1) \
                            * bk["wm"].astype(t.dtype)
                        c_full = jnp.matmul(
                            pm, bk["fx"].astype(t.dtype).T,
                            precision=HIGHEST,
                        )
                        acc = acc.at[bk["cp"]].add(c_full)
                    rows_old = t2[rd["uc"]]
                    keep = rd["keep"].astype(t.dtype)
                    t2 = t2.at[rd["uc"]].set(rows_old * (1.0 - keep) + acc)
                    t = t2.reshape(-1)
                if routed:
                    ut = h.reshape(S, S, S, NP)
                    for (d, side), term in routed.items():
                        cov = jnp.minimum(covers[(d, side)], 1.0).astype(
                            t.dtype
                        )
                        sl = tuple(
                            ((S - 1) if side else 0) if a == d else slice(None)
                            for a in range(3)
                        )
                        ut = ut.at[sl].set(ut[sl] * (1.0 - cov) + term)
                    h = ut.reshape(-1)
            h = h * sp["dk_h"]
            t = t * sp["dk_t"]
        return TVec(h, t)

    def _cell_apply_raw_ts(self, v: TVec) -> TVec:
        h, t = v.head, v.tail
        if self.NP:
            S, NP = self.S, self.NP
            ut = h.reshape(S, S, S, NP)

            def axl(u, mat, axis):
                return jnp.moveaxis(
                    jnp.tensordot(mat, u, axes=([1], [axis]),
                                  precision=HIGHEST),
                    0, axis,
                )

            KS, MS = self.KS, self.MS
            kx = axl(axl(axl(ut, KS, 0), MS, 1), MS, 2)
            ky = axl(axl(axl(ut, MS, 0), KS, 1), MS, 2)
            kz = axl(axl(axl(ut, MS, 0), MS, 1), KS, 2)
            h = ((kx + ky + kz) * self.pscale[None, None, None, :]).reshape(-1)
        if self.NS:
            xs = t.reshape(self.NS, self.nloc)
            t = (jnp.matmul(xs, self.elem, precision=HIGHEST)
                 * self.sscale[:, None]).reshape(-1)
        return TVec(h, t)

    def _ct_faces_ts(self, v: TVec) -> TVec:
        sp = self.tv["split"]
        h, t = v.head, v.tail
        if not self.sf_levels:
            return TVec(h * sp["sfk_h"], t * sp["sfk_t"])
        E1 = self.sf_E1.astype(t.dtype)
        rounds = self.sf_ct_rounds or tuple(
            (i,) for i in range(len(self.sf_levels) - 1, -1, -1)
        )
        dense = self.tv.get("sfp_dense")
        rowsf = sp.get("rowsf_ct")
        sfs_tabs = sp["sfs_ro"] if rowsf is not None else sp["sfs"]
        for ridx, rnd in enumerate(rounds):
            hp, tp = [], []
            row_adds = []
            if rowsf is not None and rowsf[ridx] is not None:
                # row-form singleton faces: block-row face gathers (ct
                # coverage mask folded into the gathered plane, as in the
                # flat path) + block-row scatter-ADDS to the src cells
                # (adds commute, duplicate rows fine)
                nl = self.nloc
                n1 = self._n1
                t2 = t.reshape(self.NS, nl)
                for bk in rowsf[ridx]["b"]:
                    frows = t2[bk["fc"]]
                    plane = (
                        jnp.matmul(frows, bk["fx"].astype(t.dtype),
                                   precision=HIGHEST)
                        * bk["mask"].astype(t.dtype)
                    ).reshape(-1, n1, n1)
                    Ea = self.sf_Eh[bk["pa"]].astype(t.dtype)
                    Eb = self.sf_Eh[bk["pb"]].astype(t.dtype)
                    tmp = jnp.einsum(
                        "nij,nim->nmj", plane, Ea, precision=HIGHEST
                    )
                    contrib = jnp.einsum(
                        "nmj,njk->nmk", tmp, Eb, precision=HIGHEST
                    )
                    c_full = jnp.matmul(
                        contrib.reshape(contrib.shape[0], -1),
                        bk["sx"].astype(t.dtype).T, precision=HIGHEST,
                    )
                    row_adds.append((bk["sc"], c_full))
            for i in rnd:
                if sp["sfp"][i] is not None:
                    fsp, ssp = sp["sfp"][i]
                    mask = self.sf_patch[i][2]
                    if dense is not None and dense[i] is not None:
                        S_, NP = self.S, self.NP
                        ut = h.reshape(S_, S_, S_, NP)
                        parts = []
                        for (hot, _cov), (d, side, n) in zip(
                            dense[i], self.sf_patch_rows_meta[i]
                        ):
                            sl = tuple(
                                ((S_ - 1) if side else 0)
                                if a == d
                                else slice(None)
                                for a in range(3)
                            )
                            parts.append(
                                jnp.tensordot(
                                    ut[sl], hot.astype(t.dtype),
                                    axes=([2], [1]), precision=HIGHEST,
                                ).transpose(2, 0, 1)
                            )
                        plane = jnp.concatenate(parts) * mask.astype(t.dtype)
                    else:
                        plane = _split_gather(
                            fsp, h, t, self.sf_patch[i][0].shape
                        ) * mask.astype(t.dtype)
                    tmp = jnp.einsum("nij,is->nsj", plane, E1,
                                     precision=HIGHEST)
                    contrib = jnp.einsum("nsj,jt->nst", tmp, E1,
                                         precision=HIGHEST)
                    for side_, idx, vv in _split_parts(ssp, contrib):
                        (hp if side_ == "h" else tp).append((idx, vv))
                if sfs_tabs[i] is not None:
                    fsp, ssp = sfs_tabs[i]
                    _f, _s, mask, pa, pb = self.sf_single[i]
                    Ea = self.sf_Eh[pa].astype(t.dtype)
                    Eb = self.sf_Eh[pb].astype(t.dtype)
                    plane = _split_gather(
                        fsp, h, t, _f.shape
                    ) * mask.astype(t.dtype)
                    tmp = jnp.einsum("nij,nim->nmj", plane, Ea,
                                     precision=HIGHEST)
                    contrib = jnp.einsum("nmj,njk->nmk", tmp, Eb,
                                         precision=HIGHEST)
                    for side_, idx, vv in _split_parts(ssp, contrib):
                        (hp if side_ == "h" else tp).append((idx, vv))
            h, t = self._ts_scatter(h, t, hp, tp, add=True)
            if row_adds:
                t2 = t.reshape(self.NS, self.nloc)
                if len(row_adds) == 1:
                    t2 = t2.at[row_adds[0][0]].add(row_adds[0][1])
                else:
                    t2 = t2.at[jnp.concatenate([a for a, _ in row_adds])].add(
                        jnp.concatenate([b for _, b in row_adds])
                    )
                t = t2.reshape(-1)
        return TVec(h * sp["sfk_h"], t * sp["sfk_t"])

    def _exchange_ts(self, v: TVec) -> TVec:
        sp = self.tv["split"]
        h, t = v.head, v.tail
        sums = [
            _split_gather(ssp, h, t, slots.shape).sum(-1)
            for (ssp, _osp), (slots, _o, _g) in zip(sp["irr"],
                                                    self.irr_buckets)
        ]
        if self.NP:
            S, NP = self.S, self.NP
            ut = h.reshape(S, S, S, NP)
            if self.use_cross:
                us = t.reshape(self.NS, self.nloc)
                ut, us = self._exchange_cross_t_core(ut, us)
                h, t = ut.reshape(-1), us.reshape(-1)
            else:
                h = self._psweeps_t(ut).reshape(-1)
                if self.NS and self.use_ssweep:
                    t = self._ssweep_rows(
                        t.reshape(self.NS, self.nloc)
                    ).reshape(-1)
        elif self.NS and self.use_ssweep:
            t = self._ssweep_rows(t.reshape(self.NS, self.nloc)).reshape(-1)
        if sums:
            hp, tp = [], []
            for ((_ssp, osp), (_s, _o, g)), s in zip(
                zip(sp["irr"], self.irr_buckets), sums
            ):
                for side_, idx, vv in _split_parts(
                    osp, s[g].astype(t.dtype)
                ):
                    (hp if side_ == "h" else tp).append((idx, vv))
            h, t = self._ts_scatter(h, t, hp, tp, add=False)
        return TVec(h, t)

    def _apply_ct_ts(self, v: TVec) -> TVec:
        sp = self.tv["split"]
        h, t = v.head, v.tail
        if self.slave_rep.shape[0]:
            vals = _split_gather(sp["srep"], h, t, self.slave_rep.shape)
            h = h * sp["slk_h"]
            t = t * sp["slk_t"]
            contrib = (self.ct_w * vals[self.ct_src]).astype(t.dtype)
            hp, tp = [], []
            for side_, idx, vv in _split_parts(sp["ctt"], contrib):
                (hp if side_ == "h" else tp).append((idx, vv))
            h, t = self._ts_scatter(h, t, hp, tp, add=True)
            if self.refresh_slots.shape[0]:
                rvals = _split_gather(
                    sp["rfr"], h, t, self.refresh_src.shape
                )
                hp, tp = [], []
                for side_, idx, vv in _split_parts(sp["rfs"], rvals):
                    (hp if side_ == "h" else tp).append((idx, vv))
                h, t = self._ts_scatter(h, t, hp, tp, add=False)
        return TVec(h * sp["dk_h"], t * sp["dk_t"])

    def _vmult_ts_core(self, xt: TVec) -> TVec:
        """Full vmult on the split T state (TVec in, TVec out) — the
        smoother keeps its recurrence split so per-apply repacks vanish."""
        sp = self.tv["split"]
        yt = self._apply_c_ts(xt)
        rt = self._cell_apply_raw_ts(yt)
        rt = self._ct_faces_ts(rt)
        rt = self._exchange_ts(rt)
        rt = self._apply_ct_ts(rt)
        ck = TVec(sp["ck_h"], sp["ck_t"])
        return rt * ck + xt * (1.0 - ck)

    def _ssweep_rows(self, us: jax.Array) -> jax.Array:
        """Whole-row singleton face sweeps: per lattice axis, one block-row
        gather of the neighbour rows + one [NS, nloc] @ [nloc, nloc] fused
        face-transfer GEMM per side (lane-dense; no [NS, n1, n1, n1] view)."""
        T = self.ssweep_T.astype(us.dtype)
        for d in range(3):
            nb_lo = us[self.snbr[2 * d]] * self.snbr_mask[2 * d][:, None]
            nb_hi = us[self.snbr[2 * d + 1]] * self.snbr_mask[2 * d + 1][:, None]
            us = us + jnp.matmul(nb_lo, T[2 * d], precision=HIGHEST) \
                    + jnp.matmul(nb_hi, T[2 * d + 1], precision=HIGHEST)
        return us

    def _exchange_cross_rows(self, r: jax.Array) -> jax.Array:
        """_exchange_cross with the singleton side in whole-row form: the
        [NS, nloc] bucket never reshapes to the 41x-tile-padded lattice;
        face planes move through sface_sel/selT GEMMs and the s<->s sweep
        terms through the fused ssweep_T transfer matrices."""
        S, n1 = self.S, self._n1
        K = self._K
        NP, NS = self.NP, self.NS
        E = self.Easm.astype(r.dtype)
        T = self.ssweep_T.astype(r.dtype)
        sel = self.sface_sel.astype(r.dtype)
        selT = self.sface_selT.astype(r.dtype)
        up = self._patches(r)
        us = self._singles(r)  # [NS, nloc], stays 2D throughout
        b3 = (-1, 1, 1)
        for g in range(3):
            psl_lo = _face_slicer(S, g, 0)
            psl_hi = _face_slicer(S, g, 1)
            p_lo, p_hi = up[psl_lo], up[psl_hi]
            add_plo = p_hi[self.nbr[2 * g]] * self.nbr_mask[2 * g].reshape(b3)
            add_phi = p_lo[self.nbr[2 * g + 1]] * self.nbr_mask[2 * g + 1].reshape(b3)
            ds = 2 - g  # snbr tables are lattice-axis ([z, y, x]) ordered
            nb_lo = us[self.snbr[2 * ds]] * self.snbr_mask[2 * ds][:, None]
            nb_hi = us[self.snbr[2 * ds + 1]] * self.snbr_mask[2 * ds + 1][:, None]
            add_us = jnp.matmul(nb_lo, T[2 * ds], precision=HIGHEST) \
                   + jnp.matmul(nb_hi, T[2 * ds + 1], precision=HIGHEST)
            for side_p in (0, 1):
                tbl = self.cross[2 * g + side_p]
                if tbl is None:
                    continue
                ppos, sidx = tbl
                # singleton source face: (axis ds, side hi) when the patch
                # face is lo — extracted in transposed (b, a) plane order,
                # exactly the sp = spre[sidx].transpose(0, 2, 1) feed
                s_side = 1 - side_p
                ppre = p_lo if side_p == 0 else p_hi
                sp = jnp.matmul(
                    us[sidx], selT[2 * ds + s_side], precision=HIGHEST
                ).reshape(-1, n1, n1)
                grid = jnp.zeros((NP * K * K, n1, n1), r.dtype).at[ppos].set(sp)
                Gm = (
                    grid.reshape(NP, K, K, n1, n1)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(NP, K * n1, K * n1)
                )
                Z = jnp.einsum("su,puv,tv->pst", E, Gm, E, precision=HIGHEST)
                Gi = jnp.einsum("su,pst,tv->puv", E, ppre, E, precision=HIGHEST)
                sub = (
                    Gi.reshape(NP, K, n1, K, n1)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(NP * K * K, n1, n1)[ppos]
                )
                # subT (transposed plane order) injected back onto the same
                # singleton face as whole-row adds
                inj = jnp.matmul(
                    sub.transpose(0, 2, 1).reshape(sub.shape[0], -1),
                    sel[2 * ds + s_side].T,
                    precision=HIGHEST,
                )
                add_us = add_us.at[sidx].add(inj)
                if side_p == 0:
                    add_plo = add_plo + Z
                else:
                    add_phi = add_phi + Z
            up = up.at[psl_lo].add(add_plo)
            up = up.at[psl_hi].add(add_phi)
            us = us + add_us
        r = self._with_patches(r, up)
        return self._with_singles(r, us)

    def _exchange_cross_t(self, r: jax.Array) -> jax.Array:
        """Fully lane-dense cross exchange: the patch bucket lives in the
        transposed [S, S, S, NP] form (NP on lanes), face planes are leading
        -axis slices, cross-patch neighbour adds are one-hot [NP, NP] GEMMs
        (mask folded in), and the singleton side is whole-row (_ssweep_rows
        machinery).  Same adds-read-pre-axis-values semantics as
        _exchange_cross."""
        S, NP = self.S, self.NP
        ut = self._patches2d(r).T.reshape(S, S, S, NP)
        us = self._singles(r)
        ut, us = self._exchange_cross_t_core(ut, us)
        r = self._with_patches2d(r, ut.reshape(S**3, NP).T)
        return self._with_singles(r, us)

    def _exchange_cross_t_core(self, ut: jax.Array, us: jax.Array):
        """The (ut [S,S,S,NP], us [NS,nloc]) core of _exchange_cross_t —
        shared with the transposed-vmult pipeline, which already holds the
        buckets in this layout."""
        S, n1 = self.S, self._n1
        K = self._K
        NP, NS = self.NP, self.NS
        E = self.Easm.astype(ut.dtype)
        T = self.ssweep_T.astype(ut.dtype)
        sel = self.sface_sel.astype(ut.dtype)
        selT = self.sface_selT.astype(ut.dtype)
        P = self.pnbr_P.astype(ut.dtype)
        for g in range(3):
            sl_lo = tuple(0 if a == g else slice(None) for a in range(3))
            sl_hi = tuple((S - 1) if a == g else slice(None) for a in range(3))
            p_lo, p_hi = ut[sl_lo], ut[sl_hi]          # [A, B, NP]
            add_plo = jnp.matmul(p_hi, P[2 * g], precision=HIGHEST)
            add_phi = jnp.matmul(p_lo, P[2 * g + 1], precision=HIGHEST)
            ds = 2 - g
            nb_lo = us[self.snbr[2 * ds]] * self.snbr_mask[2 * ds][:, None]
            nb_hi = us[self.snbr[2 * ds + 1]] * self.snbr_mask[2 * ds + 1][:, None]
            add_us = jnp.matmul(nb_lo, T[2 * ds], precision=HIGHEST) \
                   + jnp.matmul(nb_hi, T[2 * ds + 1], precision=HIGHEST)
            for side_p in (0, 1):
                tbl = self.cross[2 * g + side_p]
                if tbl is None:
                    continue
                ppos, sidx = tbl
                s_side = 1 - side_p
                ppre = p_lo if side_p == 0 else p_hi
                sp = jnp.matmul(
                    us[sidx], selT[2 * ds + s_side], precision=HIGHEST
                ).reshape(-1, n1, n1)
                grid = jnp.zeros((NP * K * K, n1, n1), ut.dtype).at[ppos].set(sp)
                Gm_t = (
                    grid.reshape(NP, K, K, n1, n1)
                    .transpose(1, 3, 2, 4, 0)
                    .reshape(K * n1, K * n1, NP)
                )
                Z_t = jnp.einsum("su,uvp,tv->stp", E, Gm_t, E, precision=HIGHEST)
                Gi_t = jnp.einsum("su,stp,tv->uvp", E, ppre, E, precision=HIGHEST)
                sub = (
                    Gi_t.reshape(K, n1, K, n1, NP)
                    .transpose(4, 0, 2, 1, 3)
                    .reshape(NP * K * K, n1, n1)[ppos]
                )
                inj = jnp.matmul(
                    sub.transpose(0, 2, 1).reshape(sub.shape[0], -1),
                    sel[2 * ds + s_side].T,
                    precision=HIGHEST,
                )
                add_us = add_us.at[sidx].add(inj)
                if side_p == 0:
                    add_plo = add_plo + Z_t
                else:
                    add_phi = add_phi + Z_t
            ut = ut.at[sl_lo].add(add_plo)
            ut = ut.at[sl_hi].add(add_phi)
            us = us + add_us
        return ut, us

    def _exchange_cross(self, r: jax.Array) -> jax.Array:
        """Interleaved structured exchange: per geometric axis, patch sweeps,
        singleton sweeps AND patch<->singleton cross terms, all adds within an
        axis reading pre-axis values (host mirror: _simulate_full)."""
        S, n1 = self.S, self._n1
        K = self._K
        NP, NS = self.NP, self.NS
        E = self.Easm.astype(r.dtype)
        up = self._patches(r)
        us = self._singles(r).reshape(NS, n1, n1, n1)
        b3 = (-1, 1, 1)
        for g in range(3):
            sax = 3 - g
            psl_lo = _face_slicer(S, g, 0)
            psl_hi = _face_slicer(S, g, 1)
            ssl_lo = [slice(None)] * 4
            ssl_lo[sax] = 0
            ssl_hi = [slice(None)] * 4
            ssl_hi[sax] = n1 - 1
            ssl_lo, ssl_hi = tuple(ssl_lo), tuple(ssl_hi)
            p_lo, p_hi = up[psl_lo], up[psl_hi]
            s_lo, s_hi = us[ssl_lo], us[ssl_hi]
            add_plo = p_hi[self.nbr[2 * g]] * self.nbr_mask[2 * g].reshape(b3)
            add_phi = p_lo[self.nbr[2 * g + 1]] * self.nbr_mask[2 * g + 1].reshape(b3)
            ds = 2 - g  # snbr tables are lattice-axis ([z, y, x]) ordered
            add_slo = s_hi[self.snbr[2 * ds]] * self.snbr_mask[2 * ds].reshape(b3)
            add_shi = s_lo[self.snbr[2 * ds + 1]] * self.snbr_mask[2 * ds + 1].reshape(b3)
            for side_p in (0, 1):
                tbl = self.cross[2 * g + side_p]
                if tbl is None:
                    continue
                ppos, sidx = tbl
                ppre, spre = (p_lo, s_hi) if side_p == 0 else (p_hi, s_lo)
                # singleton planes [m, n1, n1] -> dense patch-face grid ->
                # overlap-assembled [NP, S, S] via two tiny GEMMs
                sp = spre[sidx].transpose(0, 2, 1)
                grid = jnp.zeros((NP * K * K, n1, n1), r.dtype).at[ppos].set(sp)
                Gm = (
                    grid.reshape(NP, K, K, n1, n1)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(NP, K * n1, K * n1)
                )
                Z = jnp.einsum("su,puv,tv->pst", E, Gm, E, precision=HIGHEST)
                # reverse: extract the n1 x n1 subblocks of the patch face
                Gi = jnp.einsum("su,pst,tv->puv", E, ppre, E, precision=HIGHEST)
                sub = (
                    Gi.reshape(NP, K, n1, K, n1)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(NP * K * K, n1, n1)[ppos]
                )
                subT = sub.transpose(0, 2, 1)
                if side_p == 0:
                    add_plo = add_plo + Z
                    add_shi = add_shi.at[sidx].add(subT)
                else:
                    add_phi = add_phi + Z
                    add_slo = add_slo.at[sidx].add(subT)
            up = up.at[psl_lo].add(add_plo)
            up = up.at[psl_hi].add(add_phi)
            us = us.at[ssl_lo].add(add_slo)
            us = us.at[ssl_hi].add(add_shi)
        r = self._with_patches(r, up)
        return self._with_singles(r, us.reshape(NS, self.nloc))

    # --------------------------------------------------------------- exchange
    def exchange(self, r: jax.Array) -> jax.Array:
        """Sum duplicated slots: irregular group sums (from raw values), then
        structured plane sweeps, then overwrite irregular slots."""
        sums = [r[slots].sum(-1) for slots, _, _ in self.irr_buckets]
        def sweeps(up, nbr, nbr_mask, S):
            for d in range(3):
                axis = d + 1
                lo_n, hi_n = nbr[2 * d], nbr[2 * d + 1]
                lo_m, hi_m = nbr_mask[2 * d], nbr_mask[2 * d + 1]
                sl_top = [slice(None)] * 4
                sl_top[axis] = S - 1
                sl_bot = [slice(None)] * 4
                sl_bot[axis] = 0
                bshape = (-1,) + (1,) * 2
                # pre-slice the face planes so the cross-patch gather touches
                # a SURFACE-sized array (under sharding this is the halo
                # exchange: an all-gather of face planes, never the volume)
                top = up[tuple(sl_top)]
                bot = up[tuple(sl_bot)]
                add_lo = top[lo_n] * lo_m.reshape(bshape)
                add_hi = bot[hi_n] * hi_m.reshape(bshape)
                # whole-plane updates at a STATIC axis position lower to
                # dynamic-update-slice (fast); an iota-select volume pass was
                # measured 2.4x slower (V-cycle 49.6 -> 66.5 ms) — the slow
                # "sliced write" pattern is row-scatter INTO a slice, not this
                up = up.at[tuple(sl_bot)].add(add_lo)
                up = up.at[tuple(sl_top)].add(add_hi)
            return up

        if (self.use_cross and self.use_row_single and self.use_texchange
                and self.pnbr_P is not None):
            r = self._exchange_cross_t(r)
        elif self.use_cross and self.use_row_single:
            r = self._exchange_cross_rows(r)
        elif self.use_cross:
            r = self._exchange_cross(r)
        else:
            if self.NP and self.use_texchange and self.pnbr_P is not None:
                # transposed plain patch sweeps: leading-axis face slices +
                # one-hot neighbour GEMMs on [S, S, S, NP] (LS level meshes
                # are all-patch, no cross tables — this is their hot path)
                S = self.S
                ut = self._patches2d(r).T.reshape(S, S, S, self.NP)
                ut = self._psweeps_t(ut)
                r = self._with_patches2d(r, ut.reshape(S**3, self.NP).T)
            elif self.NP:
                up = sweeps(self._patches(r), self.nbr, self.nbr_mask, self.S)
                r = self._with_patches(r, up)
            if self.NS and self.use_ssweep and self.use_row_single:
                us = self._singles(r)
                r = self._with_singles(r, self._ssweep_rows(us))
            elif self.NS and self.use_ssweep:
                n1 = self._n1
                us = self._singles(r).reshape(self.NS, n1, n1, n1)
                us = sweeps(us, self.snbr, self.snbr_mask, n1)
                r = self._with_singles(r, us)
        if sums:
            # ONE combined scatter for all size buckets: bucket dofs are
            # disjoint, and each sequential volume-sized .at[].set was measured
            # to cost a full-vector copy (~0.39 ms at r=7/p=4 — 7 buckets were
            # 2.7 ms of the 11 ms exchange)
            out_all = jnp.concatenate([b[1] for b in self.irr_buckets])
            val_all = jnp.concatenate(
                [s[g].astype(r.dtype) for (_, _, g), s in zip(self.irr_buckets, sums)]
            )
            r = r.at[out_all].set(val_all)
        return r

    # ------------------------------------------------------------------ apply
    def cell_apply_raw(self, x: jax.Array) -> jax.Array:
        """Per-patch stencil + per-singleton GEMM; result is pre-exchange."""
        rp = rs = None
        if self.NP and self.use_tstencil:
            # patch-minor transpose sandwich: contractions run on
            # [S, S, S, NP] with the patch index on the (dense) lane dim
            # instead of paying the 4.7x (8,128) tile on [.., S, S]
            S, NP = self.S, self.NP
            ut = self._patches2d(x).T.reshape(S, S, S, NP)

            def axl(u, mat, axis):
                return jnp.moveaxis(
                    jnp.tensordot(mat, u, axes=([1], [axis]), precision=HIGHEST),
                    0, axis,
                )

            KS, MS = self.KS, self.MS
            kx = axl(axl(axl(ut, KS, 0), MS, 1), MS, 2)
            ky = axl(axl(axl(ut, MS, 0), KS, 1), MS, 2)
            kz = axl(axl(axl(ut, MS, 0), MS, 1), KS, 2)
            rt = (kx + ky + kz) * self.pscale[None, None, None, :]
            rp = rt.reshape(S**3, NP).T.reshape(NP, S, S, S)
        elif self.NP:
            up = self._patches(x)

            def ax(u, mat, axis):
                return jnp.moveaxis(
                    jnp.tensordot(u, mat, axes=([axis], [1]), precision=HIGHEST),
                    -1, axis,
                )

            KS, MS = self.KS, self.MS
            kx = ax(ax(ax(up, KS, 1), MS, 2), MS, 3)
            ky = ax(ax(ax(up, MS, 1), KS, 2), MS, 3)
            kz = ax(ax(ax(up, MS, 1), MS, 2), KS, 3)
            rp = (kx + ky + kz) * self.pscale[:, None, None, None]
        if self.NS:
            xs = self._singles(x)
            rs = jnp.matmul(xs, self.elem, precision=HIGHEST) * self.sscale[:, None]
        return pack_buckets(rp, rs, self.n_shards)

    def vmult(self, x: jax.Array) -> jax.Array:
        if self.tv is not None:
            return self._vmult_t(x)
        r = self.cell_apply_raw(self.apply_c(x))
        r = self.apply_ct_faces(r)
        r = self.exchange(r)
        r = self.apply_ct(r)
        # identity on constrained DoFs (reference operator.h:152-183)
        return r * self.constrained_keep + x * (1.0 - self.constrained_keep)

    Tvmult = vmult


jax.tree_util.register_dataclass(
    HybridOperator,
    data_fields=[
        "KS", "MS", "elem", "pscale", "sscale", "nbr", "nbr_mask",
        "snbr", "snbr_mask", "irr_buckets",
        "dirichlet_keep", "slave_keep", "constrained_keep",
        "slave_master_slots", "slave_w",
        "slave_all_slots", "slave_all_src", "slave_rep",
        "ct_target", "ct_src", "ct_w", "refresh_slots", "refresh_src", "owner",
        "sf_patch", "sf_single", "sf_patch_rows", "sf_single_rows",
        "sf_patch_src", "sf_single_src", "sf_E1",
        "sf_slave_keep", "sf_Eh", "cross", "Easm",
        "ssweep_T", "sface_sel", "sface_selT", "pnbr_P", "tv",
    ],
    meta_fields=["sf_levels", "sf_patch_rows_meta", "sf_single_rows_meta", "sf_c_rounds", "sf_ct_rounds", "use_ssweep", "use_cross", "use_row_single", "use_tstencil", "use_texchange", "NP", "NS", "S", "nloc", "n_slots", "n_dofs", "n_shards"],
)


def make_hybrid_operator(
    fmt: HybridFormat, hanging: Constraints, dtype=jnp.float32
) -> HybridOperator:
    dofh = fmt.dofh
    mesh = dofh.mesh
    p = dofh.degree
    hang, dirichlet = split_boundary_constraints(dofh, hanging)

    KS = _assembled_1d(tensor.stiffness_matrix_1d(p), fmt.K, p)
    MS = _assembled_1d(tensor.mass_matrix_1d(p), fmt.K, p)
    elem_m = element.laplace_element_matrix(3, p)
    # padding dummies (level -1 / cell -1) get scale 0: their stencil output
    # is exactly zero and nothing ever reads their slots
    real_p = fmt.patch_level >= 0
    real_s = fmt.single_cells >= 0
    h_p = np.where(
        real_p, mesh.h(np.maximum(fmt.patch_level, 0)).astype(np.float64), 0.0
    )
    h_s = np.where(
        real_s,
        mesh.h(mesh.level[np.maximum(fmt.single_cells, 0)]).astype(np.float64),
        0.0,
    )

    # ---- structured hanging faces ----------------------------------------
    sf_raw, covered = find_structured_faces(fmt, hang.slave)
    ssf_raw, covered_s = find_structured_single_faces(fmt)
    covered = covered | covered_s
    is_slave_dof = np.zeros(dofh.n_dofs, bool)
    is_slave_dof[hang.slave] = True
    # structured slaves: hanging slaves ALL of whose slots lie on covered faces
    if len(hang.slave):
        _, h_flat, h_grp = slots_of(fmt, hang.slave)
        cov_ok = np.ones(len(hang.slave), bool)
        np.logical_and.at(cov_ok, h_grp, covered[h_flat])
    else:
        cov_ok = np.zeros(0, bool)
    struct_sel = cov_ok
    table_sel = ~struct_sel
    # covered-face multiplicity per slot (for the C^T masks)
    S = fmt.S
    cov_count = np.zeros(fmt.n_slots, np.int64)
    slave_slot = np.zeros(fmt.n_slots, bool)
    if len(hang.slave):
        ssel_pad, ssel_flat, _ = slots_of(fmt, hang.slave[struct_sel])
        slave_slot[ssel_flat] = True

    def face_slots(i_arr, d, side):
        idx = np.arange(S)
        if d == 0:
            plane = (np.full((S, S), (S - 1) if side else 0) * S + idx[:, None]) * S + idx[None, :]
        elif d == 1:
            plane = (idx[:, None] * S + ((S - 1) if side else 0)) * S + idx[None, :]
        else:
            plane = (idx[:, None] * S + idx[None, :]) * S + ((S - 1) if side else 0)
        return fmt.patch_slot_base(i_arr)[:, None, None] + plane[None, :, :]

    for l, d, side, fidx, src_slots in sf_raw:
        fs = face_slots(fidx, d, side)
        np.add.at(cov_count, fs.reshape(-1), slave_slot[fs.reshape(-1)].astype(np.int64))
    for l, d, side, pa, pb, sidx, src_slots in ssf_raw:
        fs = _single_face_slots(fmt, sidx, d, side)
        np.add.at(cov_count, fs.reshape(-1), slave_slot[fs.reshape(-1)].astype(np.int64))
    def ct_mask(fs):
        return np.where(
            slave_slot[fs] & (cov_count[fs] > 0),
            1.0 / np.maximum(cov_count[fs], 1),
            0.0,
        )

    # batch all structured faces of one fine level into single tables
    sf_levels = sorted({b[0] for b in sf_raw} | {b[0] for b in ssf_raw})
    sf_patch, sf_single = [], []
    sf_patch_rows, sf_patch_rows_meta = [], []
    sf_single_rows, sf_single_rows_meta = [], []
    lvl_face_np, lvl_src_np = [], []  # flat numpy slot sets per level (rounds)
    sf_patch_np, sf_single_np = [], []  # (face, src) numpy copies (tv tables)
    sfp_groups_np = []  # per level: [(d, side, fidx)] for the tv dense path
    for lev in sf_levels:
        faces, srcs, masks = [], [], []
        rows, rows_meta = [], []
        np_faces, np_srcs = [], []
        grp_np = []
        for l, d, side, fidx, src_slots in sf_raw:
            if l != lev:
                continue
            fs = face_slots(fidx, d, side)
            faces.append(fs)
            srcs.append(src_slots)
            masks.append(ct_mask(fs))
            rows.append(to_device(fidx, jnp.int32))
            rows_meta.append((d, side, len(fidx)))
            grp_np.append((d, side, np.asarray(fidx, np.int64)))
            np_faces.append(fs.reshape(-1))
            np_srcs.append(np.asarray(src_slots).reshape(-1))
        if faces:
            cat_f, cat_s = np.concatenate(faces), np.concatenate(srcs)
            sf_patch_np.append((cat_f, cat_s))
            sf_patch.append(
                (
                    to_device(cat_f, jnp.int32),
                    to_device(cat_s, jnp.int32),
                    to_device(np.concatenate(masks), dtype),
                )
            )
            sfp_groups_np.append(grp_np)
        else:
            sf_patch_np.append(None)
            sf_patch.append(None)
            sfp_groups_np.append(None)
        sf_patch_rows.append(tuple(rows))
        sf_patch_rows_meta.append(tuple(rows_meta))
        faces, srcs, masks, pas, pbs = [], [], [], [], []
        srows, srows_meta = [], []
        for l, d, side, pa, pb, sidx, src_slots in ssf_raw:
            if l != lev:
                continue
            fs = _single_face_slots(fmt, sidx, d, side)
            faces.append(fs)
            srcs.append(src_slots)
            masks.append(ct_mask(fs))
            pas.append(np.full(len(sidx), pa, np.int64))
            pbs.append(np.full(len(sidx), pb, np.int64))
            srows.append(to_device(sidx, jnp.int32))
            srows_meta.append((d, side, len(sidx)))
            np_faces.append(fs.reshape(-1))
            np_srcs.append(np.asarray(src_slots).reshape(-1))
        lvl_face_np.append(
            np.concatenate(np_faces) if np_faces else np.zeros(0, np.int64)
        )
        lvl_src_np.append(
            np.concatenate(np_srcs) if np_srcs else np.zeros(0, np.int64)
        )
        sf_single_rows.append(tuple(srows))
        sf_single_rows_meta.append(tuple(srows_meta))
        if faces:
            cat_f, cat_s = np.concatenate(faces), np.concatenate(srcs)
            sf_single_np.append(
                (cat_f, cat_s, np.concatenate(masks),
                 np.concatenate(pas), np.concatenate(pbs))
            )
            sf_single.append(
                (
                    to_device(cat_f, jnp.int32),
                    to_device(cat_s, jnp.int32),
                    to_device(np.concatenate(masks), dtype),
                    to_device(np.concatenate(pas), jnp.int32),
                    to_device(np.concatenate(pbs), jnp.int32),
                )
            )
        else:
            sf_single_np.append(None)
            sf_single.append(None)
    # ---- scatter-round grouping (round-4): each volume-sized .at[].set/add
    # was measured to cost a full-vector copy (~0.39 ms at r=7/p=4, ~12 of
    # the 27.6 ms L7 vmult across apply_c/ct_faces/exchange), so merge the
    # per-level scatters into combined rounds whenever the EXACT slot tables
    # prove no constraint chaining between the levels.  apply_c (ascending)
    # needs a flush before level j if j READS (src) a slot an earlier level
    # WROTE (face), or writes overlap (set order); ct_faces (descending,
    # scatter-ADD) only before level i if i reads (face) a slot a finer
    # level adds into (src) — add/add overlaps commute.
    def _scatter_rounds(order, reads, writes, disjoint_writes):
        rounds: list[tuple[int, ...]] = []
        cur: list[int] = []
        cur_w = np.zeros(0, np.int64)
        for i in order:
            conflict = bool(cur) and (
                np.isin(reads[i], cur_w).any()
                or (disjoint_writes and np.isin(writes[i], cur_w).any())
            )
            if conflict:
                rounds.append(tuple(cur))
                cur, cur_w = [], np.zeros(0, np.int64)
            cur.append(i)
            cur_w = np.concatenate([cur_w, writes[i]])
        if cur:
            rounds.append(tuple(cur))
        return tuple(rounds)

    sf_c_rounds = _scatter_rounds(
        range(len(sf_levels)), lvl_src_np, lvl_face_np, True
    )
    sf_ct_rounds = _scatter_rounds(
        range(len(sf_levels) - 1, -1, -1), lvl_face_np, lvl_src_np, False
    )
    sf_slave_keep = np.ones(fmt.n_slots, np.float32)
    sf_slave_keep[slave_slot] = 0.0
    from . import tensor as _tensor

    Eh = _tensor.h_embedding_1d(p)
    sub = (fmt.K // 2) * p + 1 if fmt.K >= 2 else 1
    E1 = np.zeros((S, sub))
    if fmt.K >= 2:
        for kf in range(fmt.K):
            kc, bb = kf >> 1, kf & 1
            E1[kf * p : kf * p + p + 1, kc * p : kc * p + p + 1] = Eh[bb]

    # per-node tables only for the remaining (non-structured) slaves;
    # the identity-on-constrained set keeps ALL slaves (structured included)
    full_slaves = hang.slave
    hang = Constraints(
        hang.n_dofs, hang.slave[table_sel], hang.masters[table_sel],
        hang.weights[table_sel],
    )

    # constraint tables in slot space
    _, d_flat, _ = slots_of(fmt, dirichlet)
    _, sl_flat, sl_grp = slots_of(fmt, hang.slave)
    master_rep = fmt.rep_slot[hang.masters]  # [n_sl, Kc]
    # C^T: add w*val to the REP slot of each master, then broadcast the rep
    # value to the master's duplicate slots
    if len(hang.slave):
        nz = hang.weights != 0
        si, ki = np.nonzero(nz)
        m_dofs = hang.masters[si, ki]
        ct_target = fmt.rep_slot[m_dofs]
        ct_src = si
        ct_w = hang.weights[si, ki]
        uniq_masters = np.unique(m_dofs)
        _, mf, mg = slots_of(fmt, uniq_masters)
        rep = fmt.rep_slot[uniq_masters][mg]
        nonrep = mf != rep
        refresh_slots = mf[nonrep]
        refresh_src = rep[nonrep]
    else:
        ct_target = np.zeros(0, np.int64)
        ct_src = np.zeros(0, np.int64)
        ct_w = np.zeros(0)
        refresh_slots = np.zeros(0, np.int64)
        refresh_src = np.zeros(0, np.int64)

    constrained = np.unique(np.concatenate([dirichlet, full_slaves])).astype(np.int64)
    _, c_flat, _ = slots_of(fmt, constrained)
    dirichlet_keep = np.ones(fmt.n_slots, np.float32)
    dirichlet_keep[d_flat] = 0.0
    slave_keep = np.ones(fmt.n_slots, np.float32)
    slave_keep[sl_flat] = 0.0
    constrained_keep = np.ones(fmt.n_slots, np.float32)
    constrained_keep[c_flat] = 0.0

    # size-bucketed irregular exchange tables
    import numpy as _np
    irr_buckets = []
    irr_np = []
    if fmt.irr_slots.shape[0]:
        counts = (fmt.irr_slots < fmt.n_slots).sum(axis=1)
        gidx_of = {}
        for s in _np.unique(counts):
            gsel = _np.nonzero(counts == s)[0]
            slots_s = fmt.irr_slots[gsel, :s]
            # remap out tables for these groups
            gmap = _np.full(fmt.irr_slots.shape[0], -1, _np.int64)
            gmap[gsel] = _np.arange(len(gsel))
            osel = gmap[fmt.irr_out_group] >= 0
            irr_np.append(
                (slots_s, fmt.irr_out_slots[osel], gmap[fmt.irr_out_group[osel]])
            )
            irr_buckets.append(
                (
                    to_device(slots_s, jnp.int32),
                    to_device(fmt.irr_out_slots[osel], jnp.int32),
                    to_device(gmap[fmt.irr_out_group[osel]], jnp.int32),
                )
            )
    Kc = max(hang.masters.shape[1], 1)

    # patch<->singleton cross-exchange device tables + assembly matrix
    n1p = p + 1
    cross_dev = []
    for t in fmt.cross_faces or (None,) * 6:
        if t is None:
            cross_dev.append(None)
        else:
            pidx, b1, b2, sidx = t
            ppos = pidx * fmt.K * fmt.K + b1 * fmt.K + b2
            cross_dev.append(
                (to_device(ppos, jnp.int32), to_device(sidx, jnp.int32))
            )
    Easm = np.zeros((S, fmt.K * n1p))
    for b in range(fmt.K):
        Easm[b * p : b * p + n1p, b * n1p : b * n1p + n1p] = np.eye(n1p)

    # lane-dense singleton machinery (always built — flags flip at runtime
    # via dataclasses.replace; see RESULTS.md round-3c)
    ssweep_T = _ssweep_transfer_mats(n1p)
    sface_sel, sface_selT = _sface_selectors(n1p)
    # one-hot patch-neighbour matrices for the transposed exchange (mask
    # folded in); bounded to keep the table surface-sized
    pnbr_P = None
    if 0 < fmt.n_patches <= 1024:
        NPn = fmt.n_patches
        pnbr_P = np.zeros((6, NPn, NPn), np.float32)
        cols = np.arange(NPn)
        for row in range(6):
            ok = fmt.nbr[row] >= 0
            pnbr_P[row][np.maximum(fmt.nbr[row], 0)[ok], cols[ok]] = 1.0
    from ..utils.flags import variant_flag

    use_row_single = variant_flag(
        "MGTPU_ROW_SINGLE", np=fmt.n_patches, ns=fmt.n_singles
    )
    use_tstencil = variant_flag(
        "MGTPU_TSTENCIL", np=fmt.n_patches, ns=fmt.n_singles
    )
    use_texchange = variant_flag(
        "MGTPU_TEXCHANGE", np=fmt.n_patches, ns=fmt.n_singles
    )

    # ---- transposed-vmult table permutation (tv mode) ---------------------
    # Built host-side (device-side gathers would each cost a fresh remote
    # compile of a volume-sized program).  Single-shard only; the patch
    # bucket needs the one-hot neighbour matrices for its sweeps.
    tv = None
    if (
        fmt.n_shards == 1
        and (fmt.n_patches == 0 or pnbr_P is not None)
        and variant_flag("MGTPU_TV", np=fmt.n_patches, ns=fmt.n_singles)
    ):
        S3 = S**3
        ps_ = fmt.n_patches * S3
        perm = np.arange(fmt.n_slots + 1, dtype=np.int64)  # pad id -> itself
        if fmt.n_patches:
            lidx = np.arange(ps_, dtype=np.int64)
            perm[:ps_] = (lidx % S3) * fmt.n_patches + (lidx // S3)

        def pid(t):
            return to_device(perm[np.asarray(t, np.int64)], jnp.int32)

        def pval(v):
            out = np.empty_like(np.asarray(v))
            out[perm[:-1]] = v
            return to_device(out, dtype)

        tv = {
            "dirichlet_keep": pval(dirichlet_keep),
            "slave_keep": pval(slave_keep),
            "sf_slave_keep": pval(sf_slave_keep),
            "constrained_keep": pval(constrained_keep),
            "slave_master_slots": pid(
                master_rep if master_rep.size else np.zeros((0, Kc), np.int64)
            ),
            "slave_all_slots": pid(sl_flat),
            "slave_rep": pid(
                fmt.rep_slot[hang.slave] if len(hang.slave) else np.zeros(0, np.int64)
            ),
            "ct_target": pid(ct_target),
            "refresh_slots": pid(refresh_slots),
            "refresh_src": pid(refresh_src),
            "irr_buckets": tuple(
                (pid(a), pid(b), to_device(c, jnp.int32)) for a, b, c in irr_np
            ),
            "sf_patch": tuple(
                None if t is None else (pid(t[0]), pid(t[1])) for t in sf_patch_np
            ),
            "sf_single": tuple(
                None if t is None else (pid(t[0]), pid(t[1])) for t in sf_single_np
            ),
        }
        if fmt.n_patches and variant_flag(
            "MGTPU_TGEMM", np=fmt.n_patches, ns=fmt.n_singles
        ):
            # one-hot transpose GEMM operand (see _t_eye); f32 regardless of
            # the operator dtype — the GEMM path only engages on f32 vectors
            tv["eye"] = to_device(np.eye(fmt.n_patches), jnp.float32)
        if fmt.n_patches and variant_flag(
            "MGTPU_TCFACES", np=fmt.n_patches, ns=fmt.n_singles
        ):
            # dense-plane structured patch faces (tv layout): per sf level a
            # tuple of (hot [n, NP], cover [NP]) per face group — the
            # T-lattice face plane [S, S, NP] is read/written as ONE strided
            # slab with one-hot patch routing instead of element-priced flat
            # tables.  Group order and the STATIC (d, side, n) metadata come
            # from sf_patch_rows_meta (same build order).
            dense = []
            for grp in sfp_groups_np:
                if grp is None:
                    dense.append(None)
                    continue
                items = []
                for d, side, fidx in grp:
                    hot = np.zeros((len(fidx), fmt.n_patches), np.float32)
                    hot[np.arange(len(fidx)), fidx] = 1.0
                    cover = np.zeros(fmt.n_patches, np.float32)
                    cover[fidx] = 1.0
                    items.append(
                        (to_device(hot, dtype), to_device(cover, dtype))
                    )
                dense.append(tuple(items))
            tv["sfp_dense"] = tuple(dense)
        if variant_flag("MGTPU_TSPLIT", np=fmt.n_patches, ns=fmt.n_singles):
            # split-state (TVec) pipeline tables: every slot table split
            # into (head, tail) halves at the patch/singleton boundary so
            # scatters hit the bucket they live in (census_rounds.py: ALL
            # element-priced constraint tables at bench shapes are tail-
            # resident — the tail is 4 MB vs the 78 MB fused volume) and
            # the stage-boundary split/concat repacks disappear.
            _e32 = to_device(np.zeros(0, np.int64), jnp.int32)

            def stab(t):
                flat = perm[np.asarray(t, np.int64).reshape(-1)]
                is_h = flat < ps_
                hsel = np.nonzero(is_h)[0]
                tsel = np.nonzero(~is_h)[0]
                if len(hsel) == 0:
                    return (_e32, _e32, to_device(flat - ps_, jnp.int32), _e32)
                if len(tsel) == 0:
                    return (to_device(flat, jnp.int32), _e32, _e32, _e32)
                return (
                    to_device(flat[hsel], jnp.int32),
                    to_device(hsel, jnp.int32),
                    to_device(flat[tsel] - ps_, jnp.int32),
                    to_device(tsel, jnp.int32),
                )

            def pvs(v):
                out = np.empty_like(np.asarray(v))
                out[perm[:-1]] = v
                return to_device(out[:ps_], dtype), to_device(out[ps_:], dtype)

            dk_h, dk_t = pvs(dirichlet_keep)
            slk_h, slk_t = pvs(slave_keep)
            sfk_h, sfk_t = pvs(sf_slave_keep)
            ck_h, ck_t = pvs(constrained_keep)
            tv["split"] = {
                "dk_h": dk_h, "dk_t": dk_t,
                "slk_h": slk_h, "slk_t": slk_t,
                "sfk_h": sfk_h, "sfk_t": sfk_t,
                "ck_h": ck_h, "ck_t": ck_t,
                "sms": stab(
                    master_rep if master_rep.size else np.zeros((0, Kc), np.int64)
                ),
                "sas": stab(sl_flat),
                "srep": stab(
                    fmt.rep_slot[hang.slave]
                    if len(hang.slave) else np.zeros(0, np.int64)
                ),
                "ctt": stab(ct_target),
                "rfs": stab(refresh_slots),
                "rfr": stab(refresh_src),
                "irr": tuple(
                    (stab(a), stab(b)) for a, b, _c in irr_np
                ),
                "sfp": tuple(
                    None if t is None else (stab(t[0]), stab(t[1]))
                    for t in sf_patch_np
                ),
                "sfs": tuple(
                    None if t is None else (stab(t[0]), stab(t[1]))
                    for t in sf_single_np
                ),
            }
            if fmt.n_singles and variant_flag(
                "MGTPU_ROWSF", np=fmt.n_patches, ns=fmt.n_singles
            ):
                ps_raw = fmt.n_patches * S**3
                c_rounds = sf_c_rounds or tuple(
                    (i,) for i in range(len(sf_levels))
                )
                ct_rounds = sf_ct_rounds or tuple(
                    (i,) for i in range(len(sf_levels) - 1, -1, -1)
                )
                rc, covered = _build_rowsf(
                    c_rounds, sf_single_np, ps_raw, fmt.dofh.n_loc,
                    fmt.n_singles, dtype, True, to_device,
                )
                rct, _ = _build_rowsf(
                    ct_rounds, sf_single_np, ps_raw, fmt.dofh.n_loc,
                    fmt.n_singles, dtype, False, to_device,
                )
                if any(covered):
                    tv["split"]["rowsf_c"] = rc
                    tv["split"]["rowsf_ct"] = rct
                    # residual element tables: only the uncovered levels
                    tv["split"]["sfs_ro"] = tuple(
                        None if (t is None or covered[i])
                        else (stab(t[0]), stab(t[1]))
                        for i, t in enumerate(sf_single_np)
                    )

    return HybridOperator(
        KS=to_device(KS, dtype),
        MS=to_device(MS, dtype),
        elem=to_device(elem_m, dtype),
        pscale=to_device(h_p, dtype),
        sscale=to_device(h_s, dtype),
        nbr=to_device(np.maximum(fmt.nbr, 0), jnp.int32),
        nbr_mask=to_device((fmt.nbr >= 0).astype(np.float64), dtype),
        # pre-reordered for the [cell, z, y, x] singleton lattice axes
        snbr=to_device(np.maximum(fmt.nbr_s[SINGLE_SWEEP_ROWS], 0), jnp.int32),
        snbr_mask=to_device(
            (fmt.nbr_s[SINGLE_SWEEP_ROWS] >= 0).astype(np.float64), dtype
        ),
        irr_buckets=tuple(irr_buckets),
        dirichlet_keep=to_device(dirichlet_keep, dtype),
        slave_keep=to_device(slave_keep, dtype),
        constrained_keep=to_device(constrained_keep, dtype),
        slave_master_slots=to_device(
            master_rep if master_rep.size else np.zeros((0, Kc), np.int64), jnp.int32
        ),
        slave_w=to_device(
            hang.weights if hang.weights.size else np.zeros((0, Kc)), dtype
        ),
        slave_all_slots=to_device(sl_flat, jnp.int32),
        slave_all_src=to_device(sl_grp, jnp.int32),
        slave_rep=to_device(fmt.rep_slot[hang.slave] if len(hang.slave) else np.zeros(0, np.int64), jnp.int32),
        ct_target=to_device(ct_target, jnp.int32),
        ct_src=to_device(ct_src, jnp.int32),
        ct_w=to_device(ct_w, dtype),
        refresh_slots=to_device(refresh_slots, jnp.int32),
        refresh_src=to_device(refresh_src, jnp.int32),
        owner=to_device(fmt.owner, dtype),
        use_ssweep=fmt.use_singleton_sweeps,
        sf_patch=tuple(sf_patch),
        sf_single=tuple(sf_single),
        sf_patch_rows=tuple(sf_patch_rows),
        sf_patch_rows_meta=tuple(sf_patch_rows_meta),
        sf_single_rows=tuple(sf_single_rows),
        sf_single_rows_meta=tuple(sf_single_rows_meta),
        sf_patch_src=(),
        sf_single_src=(),
        sf_levels=tuple(int(l) for l in sf_levels),
        sf_c_rounds=sf_c_rounds,
        sf_ct_rounds=sf_ct_rounds,
        sf_E1=to_device(E1, dtype),
        sf_slave_keep=to_device(sf_slave_keep, dtype),
        sf_Eh=to_device(np.stack([Eh[0], Eh[1]]), dtype),
        cross=tuple(cross_dev),
        Easm=to_device(Easm, dtype),
        use_cross=fmt.use_cross,
        ssweep_T=to_device(ssweep_T, dtype),
        sface_sel=to_device(sface_sel, dtype),
        sface_selT=to_device(sface_selT, dtype),
        pnbr_P=to_device(pnbr_P, dtype) if pnbr_P is not None else None,
        use_row_single=use_row_single,
        use_tstencil=use_tstencil,
        use_texchange=use_texchange,
        tv=tv,
        NP=fmt.n_patches,
        NS=fmt.n_singles,
        S=fmt.S,
        nloc=dofh.n_loc,
        n_slots=fmt.n_slots,
        n_dofs=dofh.n_dofs,
        n_shards=fmt.n_shards,
    )


def tv_permute_host(op: "HybridOperator", v: np.ndarray) -> np.ndarray:
    """Value-permute a [n_slots] HOST vector into the tv (patch-minor)
    layout — the numpy mirror of op._to_t, for setup-time table permutation
    without paying a remote compile for a standalone transpose program."""
    S3 = op.S**3
    ps = op.NP * S3
    out = np.array(v, copy=True)
    if op.NP:
        out[:ps] = out[:ps].reshape(op.NP, S3).T.reshape(-1)
    return out


def cell_slot_table(fmt: HybridFormat) -> np.ndarray:
    """[n_cells, nloc] slot id of each cell-local node in the hybrid layout."""
    dofh = fmt.dofh
    p = dofh.degree
    nloc = dofh.n_loc
    out = np.full((dofh.mesh.n_cells, nloc), -1, dtype=np.int64)
    if fmt.n_patches:
        loc = local_node_indices(3, p)
        K = fmt.K
        S = fmt.S
        bidx = np.empty((K**3, 3), dtype=np.int64)
        f = np.arange(K**3)
        for d in range(3):
            bidx[:, d] = (f // K**d) % K
        # lattice flat index (x, y, z axes of the [NP, S, S, S] array)
        TX = bidx[:, None, 0] * p + loc[None, :, 0]
        TY = bidx[:, None, 1] * p + loc[None, :, 1]
        TZ = bidx[:, None, 2] * p + loc[None, :, 2]
        lat = (TX * S + TY) * S + TZ                     # [K^3, nloc]
        real = np.nonzero(fmt.patch_level >= 0)[0]
        base = fmt.patch_slot_base(real)[:, None, None]
        slots = base + lat[None, :, :]
        out[fmt.patch_cells[real].reshape(-1)] = slots.reshape(-1, nloc)
    if fmt.n_singles:
        real = np.nonzero(fmt.single_cells >= 0)[0]
        base = fmt.single_slot_base(real)[:, None]
        out[fmt.single_cells[real]] = base + np.arange(nloc)[None, :]
    return out


# ---------------------------------------------------------------------------
# structured hanging-face constraints
# ---------------------------------------------------------------------------
#
# Hanging interfaces in octree meshes are (mostly) whole patch faces of a
# level-l patch resting on a quarter-face of a level-(l-1) patch in the SAME
# hybrid format.  For those, constraint application C collapses to a 2D
# tensor interpolation of the coarse quarter-plane (two small GEMMs per face)
# and C^T to its transpose applied to the RAW residual BEFORE the exchange
# (which then restores slot consistency for free).  Only the leftover slaves
# (singleton neighbours, partial faces, 3D edge-only constraints) stay in the
# per-node tables — turning the volume-priced irregular gathers into
# surface-priced plane GEMMs (DESIGN.md).


def find_structured_faces(fmt: HybridFormat, hang_slave: np.ndarray):
    """Detect fine patch faces FULLY hanging on level-(l-1) cells.

    The coarse source is a sub x sub node plane addressed through a slot
    table (works whether the coarse cells sit in patches or singletons).
    Returns (buckets, covered_slots): buckets = list of
    (fine_level, d, side, fidx [n], src_slots [n, sub, sub]).
    """
    mesh = fmt.dofh.mesh
    p = fmt.dofh.degree
    K, S = fmt.K, fmt.S
    covered = np.zeros(fmt.n_slots, bool)
    if fmt.n_patches == 0 or K < 2:
        return [], covered
    half = K // 2
    sub = half * p + 1
    cslot = cell_slot_table(fmt)
    loc = local_node_indices(3, p)
    # same-level patch lookup (conforming neighbour => not hanging)
    key = {}
    for i in range(fmt.n_patches):
        if fmt.patch_level[i] < 0:  # padding dummy
            continue
        key[
            (int(fmt.patch_level[i]), int(fmt.patch_block[i, 0]),
             int(fmt.patch_block[i, 1]), int(fmt.patch_block[i, 2]))
        ] = i
    k2 = K.bit_length() - 1

    idx1 = np.arange(S)
    out = {}
    for i in range(fmt.n_patches):
        l = int(fmt.patch_level[i])
        if l < 0:  # padding dummy
            continue
        blk = fmt.patch_block[i]
        for d in range(3):
            t1, t2 = [e for e in range(3) if e != d]
            for side in (0, 1):
                nb = blk.copy()
                nb[d] += 1 if side else -1
                if nb[d] < 0 or nb[d] >= (1 << max(l - k2, 0)):
                    continue
                if (l, int(nb[0]), int(nb[1]), int(nb[2])) in key:
                    continue
                # the facing coarse region: half x half cells at level l-1
                base = np.zeros(3, np.int64)
                base[t1] = nb[t1] * half
                base[t2] = nb[t2] * half
                # facing coarse layer along d at level l-1: the layer of
                # coarse cells adjacent to the interface plane
                if side:  # fine patch's high face; coarse region above
                    base[d] = (nb[d] * K) >> 1
                else:     # coarse region below; its top layer
                    base[d] = ((blk[d] * K) >> 1) - 1

                # enumerate the half x half coarse cells on the facing layer
                cc = np.zeros((half, half, 3), np.int64)
                cc[..., d] = base[d]
                cc[..., t1] = base[t1] + np.arange(half)[:, None]
                cc[..., t2] = base[t2] + np.arange(half)[None, :]
                cells = mesh.covering_cell_level(l - 1, cc.reshape(-1, 3), l - 1)
                if (cells != l - 1).any():
                    continue  # not uniformly one level coarser
                find = _active_lookup_cache(mesh)
                cidx = find(l - 1, cc.reshape(-1, 3))
                # coarse face plane slot table [sub, sub]
                plane = np.full((sub, sub), -1, np.int64)
                # node on the coarse cell's face toward the fine patch:
                # local index on axis d = p if side==0 ... coarse cell is on
                # the OTHER side: its facing face has i_d = 0 if side else p
                i_d = 0 if side else p
                sel = loc[:, d] == i_d
                fl = loc[sel]
                for k, (c1, c2) in enumerate(
                    [(a, b) for a in range(half) for b in range(half)]
                ):
                    cell = cidx[c1 * half + c2]
                    ii = fl[:, t1] + c1 * p
                    jj = fl[:, t2] + c2 * p
                    plane[ii, jj] = cslot[cell][sel]
                assert (plane >= 0).all()
                bucket = out.setdefault((l, d, side), ([], []))
                bucket[0].append(i)
                bucket[1].append(plane)
                # mark fine face slots covered
                base_slot = int(fmt.patch_slot_base(i))
                if d == 0:
                    pl = (np.full((S, S), (S - 1) if side else 0) * S + idx1[:, None]) * S + idx1[None, :]
                elif d == 1:
                    pl = (idx1[:, None] * S + ((S - 1) if side else 0)) * S + idx1[None, :]
                else:
                    pl = (idx1[:, None] * S + idx1[None, :]) * S + ((S - 1) if side else 0)
                covered[base_slot + pl.reshape(-1)] = True
    buckets = [
        (l, d, side, np.asarray(f, np.int64), np.stack(s))
        for (l, d, side), (f, s) in sorted(out.items())
    ]
    return buckets, covered


def _single_face_slots(fmt: HybridFormat, j_arr: np.ndarray, d: int, side: int):
    """Flat slot ids of singleton j's face plane, axes (t_hi, t_lo) =
    the non-d geometric axes in descending order (the order produced by
    slicing the [cell, z, y, x] singleton lattice)."""
    p = fmt.dofh.degree
    n1 = p + 1
    pos = p if side else 0
    ij = np.arange(n1)
    if d == 0:    # plane [z, y]
        plane = pos + n1 * ij[None, :] + n1 * n1 * ij[:, None]
    elif d == 1:  # plane [z, x]
        plane = ij[None, :] + n1 * pos + n1 * n1 * ij[:, None]
    else:         # plane [y, x]
        plane = ij[None, :] + n1 * ij[:, None] + n1 * n1 * pos
    return fmt.single_slot_base(j_arr)[:, None, None] + plane[None]


_QUADS = ((0, 0), (0, 1), (1, 0), (1, 1))


def sanitizer_enabled() -> bool:
    """Routine debug checks — the TPU-side analog of the reference's
    sanitizer builds (no data races exist under SPMD/XLA; the failure modes
    here are NaN propagation and broken slot-layout invariants).  Set
    MGTPU_DEBUG=1 to enable jax_debug_nans plus per-level format
    verification on EVERY solve (CLI included), not just the dryrun."""
    import os

    return os.environ.get("MGTPU_DEBUG", "") not in ("", "0")


def verify_format(fmt: HybridFormat) -> None:
    """Slot-layout invariants: every real dof owned by exactly one slot,
    rep_slot round-trips, dummy slots carry the sentinel dof id."""
    n_dofs = fmt.dofh.n_dofs
    owned = fmt.slot_dof[fmt.owner > 0]
    counts = np.bincount(owned, minlength=n_dofs + 1)
    assert (counts[:n_dofs] == 1).all(), "owner mask broken"
    assert (
        fmt.slot_dof[fmt.rep_slot] == np.arange(n_dofs)
    ).all(), "rep_slot does not round-trip"
    assert (fmt.slot_dof <= n_dofs).all(), "slot dof id out of range"


def _single_face_slicer(n1: int, d: int, side: int):
    """Static slicing tuple selecting singleton face planes from the
    [NS, z, y, x] lattice view (geometric axis d = array axis 3-d)."""
    sl = [slice(None)] * 4
    sl[3 - d] = (n1 - 1) if side else 0
    return tuple(sl)


def find_structured_single_faces(fmt: HybridFormat):
    """Detect singleton-cell faces FULLY hanging on a level-(l-1) cell.

    The hanging constraint on such a face is the 2D tensor interpolation of
    the parent-cell facing face with the half-embedding E_h[b] per in-plane
    axis (b = the fine cell's anchor parity) — two small GEMMs per bucket
    instead of per-node constraint rows (the singleton-side counterpart of
    find_structured_faces).  Returns (buckets, covered_slots) with buckets =
    list of (fine_level, d, side, pa, pb, sidx [n], src_slots [n, p+1, p+1]).
    """
    mesh = fmt.dofh.mesh
    p = fmt.dofh.degree
    n1 = p + 1
    covered = np.zeros(fmt.n_slots, bool)
    if fmt.n_singles == 0:
        return [], covered
    cslot = cell_slot_table(fmt)
    loc = local_node_indices(3, p)
    idx = mesh.active_index()

    def find_exact(level, anchors):
        got = idx.get(int(level))
        if got is None or len(got[0]) == 0:
            return np.full(len(anchors), -1, np.int64)
        codes_sorted, gidx = got
        q = morton_encode(anchors)
        pos = np.minimum(np.searchsorted(codes_sorted, q), len(codes_sorted) - 1)
        return np.where(codes_sorted[pos] == q, gidx[pos], -1)

    real = np.nonzero(fmt.single_cells >= 0)[0]
    cells = fmt.single_cells[real]
    levels = mesh.level[cells].astype(np.int64)
    anchors = mesh.anchor[cells]
    out = {}
    for d in range(3):
        t_hi, t_lo = [e for e in range(2, -1, -1) if e != d]
        for side in (0, 1):
            q = anchors.copy()
            q[:, d] += 1 if side else -1
            ext = 1 << levels
            inside = (q[:, d] >= 0) & (q[:, d] < ext)
            same = np.full(len(cells), -1, np.int64)
            for l in np.unique(levels):
                s = np.nonzero((levels == l) & inside)[0]
                if len(s):
                    same[s] = find_exact(l, q[s])
            cand = np.nonzero(inside & (same < 0))[0]
            if len(cand) == 0:
                continue
            par = np.full(len(cand), -1, np.int64)
            for l in np.unique(levels[cand]):
                s = np.nonzero(levels[cand] == l)[0]
                par[s] = find_exact(l - 1, q[cand[s]] >> 1)
            ok = np.nonzero(par >= 0)[0]
            if len(ok) == 0:
                continue
            sel = cand[ok]
            par_cells = par[ok]
            i_d = 0 if side else p
            fsel = loc[:, d] == i_d
            fl = loc[fsel]
            src = np.zeros((len(ok), n1, n1), np.int64)
            src[:, fl[:, t_hi], fl[:, t_lo]] = cslot[par_cells][:, fsel]
            assert (src >= 0).all()
            pa = (anchors[sel, t_hi] & 1).astype(np.int64)
            pb = (anchors[sel, t_lo] & 1).astype(np.int64)
            lv = levels[sel]
            for key in sorted(set(zip(lv.tolist(), pa.tolist(), pb.tolist()))):
                l, a, b_ = key
                m = (lv == l) & (pa == a) & (pb == b_)
                bucket = out.setdefault(
                    (int(l), d, side, int(a), int(b_)), ([], [])
                )
                bucket[0].extend(real[sel[m]].tolist())
                bucket[1].append(src[m])
            fs = _single_face_slots(fmt, real[sel], d, side)
            covered[fs.reshape(-1)] = True
    buckets = [
        (
            l, d, side, a, b_, np.asarray(sidx, np.int64),
            np.concatenate(srcs),
        )
        for (l, d, side, a, b_), (sidx, srcs) in sorted(out.items())
    ]
    return buckets, covered


def _active_lookup_cache(mesh):
    # cache ON the mesh instance (an id()-keyed global dict would collide
    # when ids are recycled after garbage collection)
    find = getattr(mesh, "_mgtpu_active_lookup", None)
    if find is None:
        idx = mesh.active_index()

        def find(level, anchors):
            codes_sorted, gidx = idx[int(level)]
            q = morton_encode(anchors)
            pos = np.searchsorted(codes_sorted, q)
            return gidx[np.minimum(pos, len(codes_sorted) - 1)]

        mesh._mgtpu_active_lookup = find
    return find


def _face_slicer(S: int, d: int, side: int):
    """Static slicing tuple selecting a patch's face plane [n, S, S]."""
    sl = [slice(None)] * 4
    sl[d + 1] = (S - 1) if side else 0
    return tuple(sl)


def _sub_slicer(S: int, sub: int, d: int, side: int, o):
    """Coarse patch's facing quarter-plane [n, sub, sub]."""
    half = (S - 1) // 2
    sl = [slice(None)] * 4
    sl[d + 1] = 0 if side else (S - 1)  # coarse face opposite to fine side
    t = [e for e in range(3) if e != d]
    sl[t[0] + 1] = slice(o[0] * half, o[0] * half + sub)
    sl[t[1] + 1] = slice(o[1] * half, o[1] * half + sub)
    return tuple(sl)
