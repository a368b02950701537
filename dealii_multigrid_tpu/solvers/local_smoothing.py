"""Geometric multigrid with LOCAL SMOOTHING (HMG-local / HPMG-local).

Capability mirror of the reference's solve_with_local_smoothing path
(multigrid_throughput.cc:1670-1873) built on deal.II's Multigrid +
MGTransferMatrixFree + refinement-edge interface operators
(include/operator.h:49-120, 152-226):

  * level-l mesh = all tree cells at level exactly l (ancestors of active
    cells); levels cover only the region refined to >= l;
  * level operators treat domain-boundary and refinement-edge ("edge") DoFs
    as identity rows (reference vmult semantics, operator.h:152-183);
  * the V-cycle carries the global defect distributed over levels: residuals
    at refinement-edge rows flow to the coarser level with the restriction
    (vmult_interface_down, operator.h:191-205), and the prolongated coarse
    solution couples back into the post-smoothing RHS
    (vmult_interface_up, operator.h:207-226);
  * copy_to_mg / copy_from_mg map between the active-mesh global vector and
    the per-level vectors through the active-cell correspondence.

The derivation is the standard multiplicative-Schwarz splitting over level
spaces (Clevenger/Heister/Kanschat/Kronbichler, arXiv:1904.03317); CG
convergence with mesh-independent iteration counts is the correctness oracle
(an SPD-violating sign error makes PCG fail immediately).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.dof import DoFHandler, distribute_dofs, local_node_indices
from ..mesh.octree import AdaptiveMesh, morton_encode
from ..ops import element, tensor
from .chebyshev import ChebyshevSmoother
from ..utils.device import to_device


def level_mesh(active: AdaptiveMesh, l: int) -> AdaptiveMesh:
    """Cells at tree level exactly l: active cells at l plus level-l ancestors
    of finer active cells."""
    parts = [active.anchor[active.level == l]]
    for lf in np.unique(active.level):
        if lf > l:
            parts.append(active.anchor[active.level == lf] >> (lf - l))
    anchors = np.unique(np.concatenate(parts), axis=0)
    m = AdaptiveMesh(
        active.dim,
        np.full(len(anchors), l, np.int32),
        anchors.astype(np.int64),
        active.lower,
        active.upper,
    )
    m._sort_morton()
    return m


def _expected_valence(dofh: DoFHandler) -> np.ndarray:
    """Number of level-mesh cells that WOULD contain each DoF if the level
    region had no boundary except the domain boundary."""
    mesh, p, dim = dofh.mesh, dofh.degree, dofh.dim
    loc = local_node_indices(dim, p)
    on_face = (loc == 0) | (loc == p)              # [nloc, dim]
    lvl = mesh.level.astype(np.int64)
    out = np.zeros(dofh.n_dofs, dtype=np.int64)
    # per (cell, node): factor per axis: 1 if node interior to the cell in
    # that axis, else 2 unless the face is on the domain boundary.
    anchors = mesh.anchor
    extent = (1 << lvl)[:, None]                   # [ncell, 1]
    fac = np.ones((mesh.n_cells, len(loc)), dtype=np.int64)
    for d in range(dim):
        lo_bd = (anchors[:, d : d + 1] == 0) & (loc[None, :, d] == 0)
        hi_bd = (anchors[:, d : d + 1] == extent - 1) & (loc[None, :, d] == p)
        f = np.where(on_face[None, :, d], 2, 1)
        f = np.where(lo_bd | hi_bd, 1, f)
        fac *= f
    out[dofh.cell_dofs.reshape(-1)] = fac.reshape(-1)
    return out


@dataclass
class LSLevel:
    """One local-smoothing level (global gather engine).  Host-side mesh and
    DoFHandler live outside the pytree (see build_local_smoothing_mg)."""

    cell_dofs: jax.Array       # i32 [nc, nloc]
    scale: jax.Array           # f [nc]
    elem: jax.Array            # f [nloc, nloc]
    keep: jax.Array            # f [n]: 0 on boundary ∪ edge (constrained)
    edge_ind: jax.Array        # f [n]: 1 on refinement-edge DoFs
    inv_diag: jax.Array
    n_dofs: int

    def cell_apply_raw(self, u):
        ucell = u[self.cell_dofs]
        rcell = jnp.matmul(
            ucell, self.elem, precision=jax.lax.Precision.HIGHEST
        ) * self.scale[:, None]
        r = jnp.zeros_like(u)
        return r.at[self.cell_dofs.reshape(-1)].add(rcell.reshape(-1))

    # level operator: identity on boundary ∪ edge (operator.h:152-183)
    def vmult(self, u):
        r = self.cell_apply_raw(u * self.keep) * self.keep
        return r + u * (1.0 - self.keep)

    # Γ-rows of the raw operator applied to an interior-supported function
    # (operator.h:191-205, used for the downward residual flow)
    def interface_down(self, u):
        return self.cell_apply_raw(u * self.keep) * self.edge_ind

    # interior rows of the raw operator applied to the Γ part
    # (operator.h:207-226)
    def interface_up(self, u):
        return self.cell_apply_raw(u * self.edge_ind) * self.keep


jax.tree_util.register_dataclass(
    LSLevel,
    data_fields=["cell_dofs", "scale", "elem", "keep", "edge_ind", "inv_diag"],
    meta_fields=["n_dofs"],
)


@dataclass
class LSTransfer:
    """Prolongation level l-1 -> l over the refined region; restriction is
    the exact transpose with 1/valence fine weights (MGTransferMatrixFree
    equivalent; no constraint handling — levels are conforming)."""

    buckets: tuple             # ((fine_cells, coarse_cells, M), ...) per octant
    fine_cell_dofs: jax.Array
    coarse_cell_dofs: jax.Array
    fine_weight: jax.Array
    n_f: int
    n_c: int

    def prolong(self, uc):
        out = jnp.zeros(self.n_f, uc.dtype)
        for fc, cc, M in self.buckets:
            vals = jnp.matmul(uc[self.coarse_cell_dofs[cc]], M.T.astype(uc.dtype), precision=jax.lax.Precision.HIGHEST)
            fd = self.fine_cell_dofs[fc]
            out = out.at[fd.reshape(-1)].add((vals * self.fine_weight[fd]).reshape(-1))
        return out

    def restrict(self, rf):
        rw = rf * self.fine_weight
        acc = jnp.zeros(self.n_c, rf.dtype)
        for fc, cc, M in self.buckets:
            vals = jnp.matmul(rw[self.fine_cell_dofs[fc]], M.astype(rf.dtype), precision=jax.lax.Precision.HIGHEST)
            cd = self.coarse_cell_dofs[cc]
            acc = acc.at[cd.reshape(-1)].add(vals.reshape(-1))
        return acc


jax.tree_util.register_dataclass(
    LSTransfer,
    data_fields=["buckets", "fine_cell_dofs", "coarse_cell_dofs", "fine_weight"],
    meta_fields=["n_f", "n_c"],
)


@dataclass
class CopyMap:
    """copy_to_mg / copy_from_mg index pairs for one level: level DoFs on
    active cells of that level <-> global active-mesh DoFs."""

    level_idx: jax.Array
    global_idx: jax.Array


jax.tree_util.register_dataclass(
    CopyMap, data_fields=["level_idx", "global_idx"], meta_fields=[]
)


@dataclass
class LocalSmoothingMG:
    """The local-smoothing V-cycle as a global-vector preconditioner."""

    levels: tuple              # LSLevel, coarsest first
    smoothers: tuple           # ChebyshevSmoother per level (coarsest unused)
    transfers: tuple           # LSTransfer; transfers[l]: level l-1 -> l
    copy_maps: tuple           # CopyMap per level
    coarse_solve: object
    n_dofs_global: int

    def vmult(self, r_global: jax.Array) -> jax.Array:
        L = len(self.levels) - 1
        # copy_to_mg: distribute the global residual onto the levels,
        # zeroing constrained rows (boundary + refinement edge)
        defect = []
        for lev, cm in zip(self.levels, self.copy_maps):
            d = jnp.zeros(lev.n_dofs, r_global.dtype)
            d = d.at[cm.level_idx].set(r_global[cm.global_idx])
            defect.append(d * lev.keep)
        sols = [None] * (L + 1)

        def v_step(l, d_l):
            lev = self.levels[l]
            if l == 0:
                u = self.coarse_solve(d_l)
                sols[0] = u
                return u
            sm = self.smoothers[l]
            d_smooth = d_l * lev.keep
            u = sm.vmult(d_smooth)
            t = d_smooth - lev.vmult(u)
            t = t * lev.keep + (d_l - lev.interface_down(u)) * lev.edge_ind
            # accumulate onto the coarser level's own copy_to defect
            # (deal.II: defect[l-1] += restrict_and_add(t))
            d_c = defect[l - 1] + self.transfers[l].restrict(t)
            u_c = v_step(l - 1, d_c)
            u = u + self.transfers[l].prolong(u_c)
            b_eff = (d_smooth - lev.interface_up(u)) * lev.keep + u * (
                1.0 - lev.keep
            )
            u = sm.step(u, b_eff)
            sols[l] = u
            return u

        v_step(L, defect[L])
        # copy_from_mg: coarse-to-fine overwrite; each global DoF takes its
        # finest-level value (interface values agree by construction)
        out = jnp.zeros(self.n_dofs_global, r_global.dtype)
        for lev, cm, u in zip(self.levels, self.copy_maps, sols):
            out = out.at[cm.global_idx].set(u[cm.level_idx])
        return out


jax.tree_util.register_dataclass(
    LocalSmoothingMG,
    data_fields=["levels", "smoothers", "transfers", "copy_maps", "coarse_solve"],
    meta_fields=["n_dofs_global"],
)


def _octant_matrix(dim: int, degree: int, octant: int) -> np.ndarray:
    E = tensor.h_embedding_1d(degree)
    out = np.array([[1.0]])
    for d in range(dim):
        out = np.kron(E[(octant >> d) & 1], out)
    return out


# ---------------------------------------------------------------------------
# hybrid (patch-structured) local smoothing — the TPU fast path
# ---------------------------------------------------------------------------
#
# Level meshes are UNIFORM-level meshes: away from the region boundary they
# are pure K^3 patch lattices with no hanging constraints, so the hybrid
# engine (ops/hybrid.py) applies directly — the level operator is the hybrid
# operator built with Dirichlet = domain boundary ∪ refinement edge (the
# identity-row set of reference operator.h:152-183), and the refinement-edge
# interface operators (operator.h:191-226) are raw-apply + exchange + masks.


@dataclass
class LSHybridLevel:
    """One local-smoothing level on the hybrid patch engine."""

    op: object                 # HybridOperator (identity on boundary ∪ edge)
    edge_ind: jax.Array        # f [n_slots] 1 on refinement-edge slots
    inv_diag: jax.Array        # slot layout
    eig_b0: jax.Array          # deterministic eig-estimation seed vector
    # copy_to_mg: level slots <- active-format rep slots
    to_slots: jax.Array        # i32 [W]
    to_src: jax.Array          # i32 [W]
    # copy_from_mg: active-format slots <- level rep slots
    from_slots: jax.Array      # i32 [V]
    from_src: jax.Array        # i32 [V]
    n_dofs: int                # n_slots of the level layout
    # row-copy fast path (MGTPU_LS_ROWCOPY): cells copied at this level
    # whose patch (same (level, block, K) key) or singleton bucket exists
    # in BOTH formats copy as whole contiguous rows — block-priced gathers
    # and row scatters instead of the element-priced flat tables, which
    # measured as ~70 of the 72 ms LS V-cycle at r=6/p=4 once the
    # per-level ops went lane-dense.  ``rowcopy`` holds the device index
    # arrays, ``rowcopy_meta`` the static active-layout dims:
    #   rowcopy = (pa_gather [NP_l], sa_gather [NS_l],
    #              pa_sc, pl_sc, sa_sc, sl_sc,
    #              to_rest_slots, to_rest_src, fr_rest_slots, fr_rest_src)
    #   rowcopy_meta = (NP_a, S, NS_a, nloc, D_a)
    rowcopy: tuple | None = None
    rowcopy_meta: tuple | None = None

    @property
    def keep(self) -> jax.Array:
        return self.op.dirichlet_keep

    def vmult(self, u: jax.Array) -> jax.Array:
        return self.op.vmult(u)

    def dot(self, x, y):
        return self.op.dot(x, y)

    def _raw_exchanged(self, u: jax.Array) -> jax.Array:
        """exchange(cell_apply_raw(u)) — via the lane-dense transposed
        pipeline when the operator carries tv tables."""
        op = self.op
        if op.tv is not None:
            return op._from_t(op._exchange_t(op._cell_apply_raw_t(op._to_t(u))))
        return op.exchange(op.cell_apply_raw(u))

    # Γ-rows of the raw operator applied to an interior-supported function
    # (operator.h:191-205); the exchange assembles the raw per-slot sums
    def interface_down(self, u: jax.Array) -> jax.Array:
        return self._raw_exchanged(u * self.op.dirichlet_keep) * self.edge_ind

    # interior rows of the raw operator applied to the Γ part (operator.h:207-226)
    def interface_up(self, u: jax.Array) -> jax.Array:
        return self._raw_exchanged(u * self.edge_ind) * self.op.dirichlet_keep


jax.tree_util.register_dataclass(
    LSHybridLevel,
    data_fields=[
        "op", "edge_ind", "inv_diag", "eig_b0",
        "to_slots", "to_src", "from_slots", "from_src",
        "rowcopy",
    ],
    meta_fields=["n_dofs", "rowcopy_meta"],
)


@dataclass
class LocalSmoothingMGHybrid:
    """The local-smoothing V-cycle on hybrid slot vectors: input/output is
    the ACTIVE mesh's hybrid slot layout (api.build_level_hybrid)."""

    levels: tuple              # LSHybridLevel, coarsest first
    smoothers: tuple
    transfers: tuple           # HybridTransfer (ls_mode), transfers[l]: l-1 -> l
    coarse_solve: object
    n_dofs_global: int         # n_slots of the active layout

    def vmult(self, r_active: jax.Array) -> jax.Array:
        L = len(self.levels) - 1
        from ..ops.hybrid import pack_buckets, unpack_patches, unpack_singles

        defect = []
        for lev in self.levels:
            if lev.rowcopy is not None:
                (pa_g, sa_g, _pa, _pl, _sa, _sl, trs, trsrc, _f1, _f2) = (
                    lev.rowcopy
                )
                NPa, S_a, NSa, nloc, D_a, has_pp = lev.rowcopy_meta
                op = lev.op
                S_l = op.S
                dt = r_active.dtype
                pt = None
                if op.NP:
                    if has_pp:  # patch pairs exist => S_l == S_a
                        a2 = unpack_patches(r_active, D_a, NPa, S_a).reshape(
                            NPa, S_a**3
                        )
                        a2p = jnp.concatenate(
                            [a2, jnp.zeros((1, S_a**3), dt)]
                        )
                        pt = a2p[pa_g].reshape(op.NP, S_l, S_l, S_l)
                    else:
                        pt = jnp.zeros((op.NP, S_l, S_l, S_l), dt)
                st = None
                if op.NS:
                    as_ = unpack_singles(r_active, D_a, NPa, S_a, NSa, nloc)
                    asp = jnp.concatenate([as_, jnp.zeros((1, nloc), dt)])
                    st = asp[sa_g]
                d = pack_buckets(pt, st, op.n_shards)
                if trs.shape[0]:
                    d = d.at[trs].set(r_active[trsrc])
            else:
                d = jnp.zeros(lev.n_dofs, r_active.dtype)
                d = d.at[lev.to_slots].set(r_active[lev.to_src])
            defect.append(d * lev.keep)
        sols = [None] * (L + 1)

        def v_step(l, d_l):
            lev = self.levels[l]
            if l == 0:
                u = self.coarse_solve(d_l)
                sols[0] = u
                return u
            sm = self.smoothers[l]
            d_smooth = d_l * lev.keep
            u = sm.vmult(d_smooth)
            t = d_smooth - lev.vmult(u)
            t = t * lev.keep + (d_l - lev.interface_down(u)) * lev.edge_ind
            d_c = defect[l - 1] + self.transfers[l].restrict(t)
            u_c = v_step(l - 1, d_c)
            u = u + self.transfers[l].prolong(u_c)
            b_eff = (d_smooth - lev.interface_up(u)) * lev.keep + u * (
                1.0 - lev.keep
            )
            u = sm.step(u, b_eff)
            sols[l] = u
            return u

        v_step(L, defect[L])
        # copy_from_mg: coarse-to-fine overwrite (finest level wins); the
        # from-tables cover ALL active slots of each copied dof, so the
        # result is slot-consistent by construction
        out = jnp.zeros(self.n_dofs_global, r_active.dtype)
        for lev, u in zip(self.levels, sols):
            if lev.rowcopy is not None:
                (_pg, _sg, pa_sc, pl_sc, sa_sc, sl_sc, _t1, _t2, frs,
                 frsrc) = lev.rowcopy
                NPa, S_a, NSa, nloc, D_a, has_pp = lev.rowcopy_meta
                op = lev.op
                oa2 = os_ = None
                if has_pp:  # patch pairs exist => S_l == S_a
                    oa2 = unpack_patches(out, D_a, NPa, S_a).reshape(
                        NPa, S_a**3
                    )
                    u2 = unpack_patches(u, op.n_shards, op.NP, op.S).reshape(
                        op.NP, op.S**3
                    )
                    oa2 = oa2.at[pa_sc].set(u2[pl_sc]).reshape(
                        NPa, S_a, S_a, S_a
                    )
                if sa_sc.shape[0]:
                    os_ = unpack_singles(out, D_a, NPa, S_a, NSa, nloc)
                    us_ = unpack_singles(
                        u, op.n_shards, op.NP, op.S, op.NS, nloc
                    )
                    os_ = os_.at[sa_sc].set(us_[sl_sc])
                if oa2 is not None or os_ is not None:
                    if oa2 is None:
                        oa2 = unpack_patches(out, D_a, NPa, S_a)
                    if os_ is None and NSa:
                        os_ = unpack_singles(out, D_a, NPa, S_a, NSa, nloc)
                    out = pack_buckets(oa2, os_, D_a)
                if frs.shape[0]:
                    out = out.at[frs].set(u[frsrc])
            else:
                out = out.at[lev.from_slots].set(u[lev.from_src])
        return out


jax.tree_util.register_dataclass(
    LocalSmoothingMGHybrid,
    data_fields=["levels", "smoothers", "transfers", "coarse_solve"],
    meta_fields=["n_dofs_global"],
)


def _copy_row_maps(
    active_fmt, fmt, l, sel, pos, to_flat, to_src, fr_flat, fr_src
):
    """Row-structured copy maps for one LS level (MGTPU_LS_ROWCOPY).

    Cells copied at level ``l`` that sit in SAME-(level, block, K) patches
    or in singleton buckets of BOTH formats copy as whole contiguous rows
    (identical intra-row layouts by construction); the remaining entries of
    the exact element tables stay as a leftover element copy.  Returns
    (rowcopy, rowcopy_meta) or (None, None) when nothing matches / flag off.
    """
    from ..utils.flags import variant_flag

    if sel is None or not len(sel) or not variant_flag(
        "MGTPU_LS_ROWCOPY", np=fmt.n_patches, ns=fmt.n_singles
    ):
        return None, None
    S3 = fmt.S**3
    nloc = fmt.dofh.n_loc
    # patch pairs by (block) key at level l (same K => same lattice layout)
    pa_list, pl_list = [], []
    if fmt.K == active_fmt.K and fmt.n_patches and active_fmt.n_patches:
        keys_l = {}
        for j in range(fmt.n_patches):
            if int(fmt.patch_level[j]) == l:
                keys_l[tuple(int(x) for x in fmt.patch_block[j])] = j
        for i in range(active_fmt.n_patches):
            if int(active_fmt.patch_level[i]) != l:
                continue
            j = keys_l.get(tuple(int(x) for x in active_fmt.patch_block[i]))
            if j is not None:
                pa_list.append(i)
                pl_list.append(j)
    # singleton pairs: copied cell is a singleton in BOTH formats
    srow_act = np.full(active_fmt.dofh.mesh.n_cells, -1, np.int64)
    real_a = np.nonzero(active_fmt.single_cells >= 0)[0]
    srow_act[active_fmt.single_cells[real_a]] = real_a
    srow_lvl = np.full(fmt.dofh.mesh.n_cells, -1, np.int64)
    real_l = np.nonzero(fmt.single_cells >= 0)[0]
    srow_lvl[fmt.single_cells[real_l]] = real_l
    sa_arr = srow_act[sel]
    sl_arr = srow_lvl[pos]
    s_ok = (sa_arr >= 0) & (sl_arr >= 0)
    sa_arr, sl_arr = sa_arr[s_ok], sl_arr[s_ok]
    if not pa_list and not len(sa_arr):
        return None, None
    pa_arr = np.asarray(pa_list, np.int64)
    pl_arr = np.asarray(pl_list, np.int64)
    # coverage masks -> leftover element entries
    cov_l = np.zeros(fmt.n_slots, bool)
    cov_a = np.zeros(active_fmt.n_slots, bool)
    if len(pa_arr):
        cov_l[
            (fmt.patch_slot_base(pl_arr)[:, None]
             + np.arange(S3)[None, :]).reshape(-1)
        ] = True
        cov_a[
            (active_fmt.patch_slot_base(pa_arr)[:, None]
             + np.arange(S3)[None, :]).reshape(-1)
        ] = True
    if len(sa_arr):
        cov_l[
            (fmt.single_slot_base(sl_arr)[:, None]
             + np.arange(nloc)[None, :]).reshape(-1)
        ] = True
        cov_a[
            (active_fmt.single_slot_base(sa_arr)[:, None]
             + np.arange(nloc)[None, :]).reshape(-1)
        ] = True
    t_rest = ~cov_l[to_flat]
    f_rest = ~cov_a[fr_flat]
    # gather maps (pad row = zero)
    pa_g = np.full(fmt.n_patches, active_fmt.n_patches, np.int64)
    pa_g[pl_arr] = pa_arr
    sa_g = np.full(fmt.n_singles, active_fmt.n_singles, np.int64)
    sa_g[sl_arr] = sa_arr
    rowcopy = (
        to_device(pa_g, jnp.int32),
        to_device(sa_g, jnp.int32),
        to_device(pa_arr, jnp.int32),
        to_device(pl_arr, jnp.int32),
        to_device(sa_arr, jnp.int32),
        to_device(sl_arr, jnp.int32),
        to_device(to_flat[t_rest], jnp.int32),
        to_device(to_src[t_rest], jnp.int32),
        to_device(fr_flat[f_rest], jnp.int32),
        to_device(fr_src[f_rest], jnp.int32),
    )
    meta = (
        active_fmt.n_patches, active_fmt.S, active_fmt.n_singles, nloc,
        active_fmt.n_shards, bool(len(pa_arr)),
    )
    return rowcopy, meta


def build_local_smoothing_mg_hybrid(
    active_dofh: DoFHandler,
    active_fmt,
    mg_data,
    dtype=jnp.float32,
    min_level: int = 0,
    n_shards: int = 1,
    dmesh=None,
    return_partitions: bool = False,
) -> LocalSmoothingMGHybrid:
    """Hybrid-engine LS hierarchy; ``active_fmt`` is the ACTIVE mesh's
    HybridFormat whose slot layout the preconditioner operates on.

    With ``n_shards`` > 1 each LEVEL mesh gets its own Morton-block
    device-major partition — the analog of the reference's per-level
    partitioners inside MGTransferMatrixFree on the fullydistributed
    level triangulations (multigrid_throughput.cc:1800-1802, 2196-2212);
    levels below the granularity threshold are replicated (redundant
    compute — the sub-communicator analog).  ``dmesh`` places the arrays."""
    from ..mesh.dof import Constraints
    from ..ops.hybrid import (
        build_hybrid_format,
        make_hybrid_operator,
        repartition_format,
        slots_of,
    )
    from ..ops.hybrid_transfer import make_hybrid_transfer
    from .chebyshev import estimate_eigenvalue_ranges
    from .coarse import make_algebraic_solver

    active = active_dofh.mesh
    p = active_dofh.degree
    dim = active.dim
    assert dim == 3, "hybrid LS is 3D (2D uses the gather engine)"
    L = active.max_level
    lmin = max(min_level, 0)
    elem = element.laplace_element_matrix(dim, p)

    levels = []
    host_fmts, host_dofhs = [], []
    rng = np.random.default_rng(42)
    level_meshes = [level_mesh(active, l) for l in range(lmin, L + 1)]
    from ..api import choose_level_ks

    level_ks = choose_level_ks([(lm, p) for lm in level_meshes])
    for l in range(lmin, L + 1):
        lm = level_meshes[l - lmin]
        dofh = distribute_dofs(lm, p)
        valence = np.bincount(dofh.cell_dofs.reshape(-1), minlength=dofh.n_dofs)
        expected = _expected_valence(dofh)
        edge = (valence < expected) & ~dofh.boundary_mask
        # identity rows of the level operator = boundary ∪ edge
        # (operator.h:152-183); fold the edge set into the Dirichlet mask
        dofh.boundary_mask = dofh.boundary_mask | edge
        fmt = build_hybrid_format(dofh, K=level_ks[l - lmin])
        if n_shards > 1:
            from ..parallel.sharding import hybrid_level_shard_count

            D_l = hybrid_level_shard_count(lm.n_cells, n_shards)
            if D_l > 1:
                fmt = repartition_format(fmt, D_l)
        from ..ops.hybrid import sanitizer_enabled, verify_format

        if sanitizer_enabled():
            verify_format(fmt)
        empty = Constraints(
            dofh.n_dofs, np.zeros(0, np.int32), np.zeros((0, 1), np.int32),
            np.zeros((0, 1)),
        )
        op = make_hybrid_operator(fmt, empty, dtype=dtype)
        scale = lm.h(lm.level).astype(np.float64) ** (dim - 2)
        diag = np.zeros(dofh.n_dofs)
        np.add.at(
            diag,
            dofh.cell_dofs.reshape(-1),
            (scale[:, None] * np.diag(elem)[None, :]).reshape(-1),
        )
        diag[dofh.boundary_mask] = 1.0
        edge_f = np.zeros(dofh.n_dofs)
        edge_f[edge] = 1.0

        # copy maps: active cells at level l <-> level-mesh cells; the tables
        # list ALL slots of each copied dof (slots_of), so both directions
        # write slot-consistent vectors
        sel = np.nonzero(active.level == l)[0]
        if len(sel):
            codes = morton_encode(lm.anchor)
            order = np.argsort(codes)
            pos = order[np.searchsorted(codes[order], morton_encode(active.anchor[sel]))]
            ld = dofh.cell_dofs[pos].reshape(-1).astype(np.int64)
            gd = active_dofh.cell_dofs[sel].reshape(-1).astype(np.int64)
            uniq_ld, first = np.unique(ld, return_index=True)
            uniq_gd = gd[first]
            _, to_flat, to_grp = slots_of(fmt, uniq_ld)
            to_src = active_fmt.rep_slot[uniq_gd][to_grp]
            _, fr_flat, fr_grp = slots_of(active_fmt, uniq_gd)
            fr_src = fmt.rep_slot[uniq_ld][fr_grp]
        else:
            to_flat = to_src = fr_flat = fr_src = np.zeros(0, np.int64)

        rowcopy, rowcopy_meta = _copy_row_maps(
            active_fmt, fmt, l, sel, pos if len(sel) else None,
            to_flat, to_src, fr_flat, fr_src,
        )

        lev = LSHybridLevel(
            op=op,
            edge_ind=to_device(fmt.from_global(edge_f), dtype),
            inv_diag=to_device(fmt.from_global(1.0 / diag), dtype),
            eig_b0=to_device(
                fmt.from_global(rng.standard_normal(dofh.n_dofs)), dtype
            ),
            to_slots=to_device(to_flat, jnp.int32),
            to_src=to_device(to_src, jnp.int32),
            from_slots=to_device(fr_flat, jnp.int32),
            from_src=to_device(fr_src, jnp.int32),
            n_dofs=fmt.n_slots,
            rowcopy=rowcopy,
            rowcopy_meta=rowcopy_meta,
        )
        if dmesh is not None:
            lev = _place_ls_level(lev, dmesh)
        levels.append(lev)
        host_fmts.append(fmt)
        host_dofhs.append(dofh)

    transfers = [None]
    for i in range(1, len(levels)):
        transfers.append(
            make_hybrid_transfer(
                host_fmts[i], host_fmts[i - 1],
                levels[i].op, levels[i - 1].op,
                dtype=dtype, ls_mode=True,
            )
        )

    # batched eigenvalue estimation (one compile for all levels)
    ranges = estimate_eigenvalue_ranges(
        [lv.op for lv in levels[1:]],
        [lv.inv_diag for lv in levels[1:]],
        [lv.eig_b0 for lv in levels[1:]],
        n_iterations=(
            mg_data.smoother.eig_cg_n_iterations if mg_data else 20
        ),
        use_op_dot=True,
        extrapolate_above=(
            2_000_000 if jax.default_backend() != "cpu" else None
        ),
        degrees=[d.degree for d in host_dofhs[1:]],
        cache_key=__import__("dealii_multigrid_tpu.api", fromlist=["_eig_cache_key"])._eig_cache_key(
            "ls",
            [d.mesh for d in host_dofhs[1:]],
            [d.degree for d in host_dofhs[1:]],
            [f.n_slots for f in host_fmts[1:]],
            mg_data.smoother.eig_cg_n_iterations if mg_data else 20,
            dtype,
        ),
    )
    smoothers = [None]
    for lv, rg in zip(levels[1:], ranges):
        smoothers.append(
            ChebyshevSmoother(
                lv.op,
                lv.inv_diag,
                mg_data.smoother.degree if mg_data else 3,
                *_cheb_interval(
                    1.2 * rg[0],
                    mg_data.smoother.smoothing_range if mg_data else 20.0,
                ),
            )
        )

    coarse = make_algebraic_solver(
        host_dofhs[0],
        Constraints(
            host_dofhs[0].n_dofs, np.zeros(0, np.int32),
            np.zeros((0, 1), np.int32), np.zeros((0, 1)),
        ),
        dtype,
        mg_data,
        to_idx=to_device(host_fmts[0].rep_slot, jnp.int32),
        from_idx=to_device(host_fmts[0].slot_dof, jnp.int32),
    )

    mg = LocalSmoothingMGHybrid(
        levels=tuple(levels),
        smoothers=tuple(smoothers),
        transfers=tuple(transfers),
        coarse_solve=coarse,
        n_dofs_global=active_fmt.n_slots,
    )
    if return_partitions:
        # the partition ACTUALLY applied per level mesh (None = replicated):
        # the Morton index-block layout of each level's device-major format
        from ..parallel.sharding import default_cell_shard_map

        parts = [
            default_cell_shard_map(f, f.dofh.mesh.n_cells)
            if f.n_shards > 1 else None
            for f in host_fmts
        ]
        return mg, parts
    return mg


def _place_ls_level(lev: LSHybridLevel, dmesh):
    """Place one LS level on the device mesh: op arrays per its n_shards,
    slot vectors likewise, copy-map index tables replicated (their gathers
    are the copy_to/from_mg communication — XLA SPMD places it)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import CELL_AXIS, place_hybrid_op

    op = place_hybrid_op(lev.op, dmesh)
    sh1 = (
        NamedSharding(dmesh, P(CELL_AXIS))
        if op.n_shards > 1
        else NamedSharding(dmesh, P())
    )
    rep = NamedSharding(dmesh, P())
    put = jax.device_put
    return dataclasses.replace(
        lev,
        op=op,
        edge_ind=put(lev.edge_ind, sh1),
        inv_diag=put(lev.inv_diag, sh1),
        eig_b0=put(lev.eig_b0, sh1),
        to_slots=put(lev.to_slots, rep),
        to_src=put(lev.to_src, rep),
        from_slots=put(lev.from_slots, rep),
        from_src=put(lev.from_src, rep),
        rowcopy=(
            jax.tree.map(lambda a: put(a, rep), lev.rowcopy)
            if lev.rowcopy is not None
            else None
        ),
    )


def _cheb_interval(max_eigenvalue: float, smoothing_range: float):
    min_eigenvalue = max_eigenvalue / smoothing_range
    theta = 0.5 * (max_eigenvalue + min_eigenvalue)
    delta = 0.5 * (max_eigenvalue - min_eigenvalue)
    return float(theta), float(delta)


def build_local_smoothing_mg(
    active_dofh: DoFHandler,
    mg_data,
    dtype=jnp.float32,
    min_level: int = 0,
) -> LocalSmoothingMG:
    """Construct the LS hierarchy for the active mesh (global gather engine).

    Constrained-DoF masking of the preconditioner OUTPUT (Dirichlet + hanging
    slaves of the active mesh) is the caller's job — see PreconditionLS.keep
    in api.py.
    """
    active = active_dofh.mesh
    p = active_dofh.degree
    dim = active.dim
    L = active.max_level
    lmin = max(min_level, 0)
    elem = element.laplace_element_matrix(dim, p)

    levels, copy_maps = [], []
    host_meshes, host_dofhs = [], []
    # active-cell lookup per level for copy maps
    for l in range(lmin, L + 1):
        lm = level_mesh(active, l)
        dofh = distribute_dofs(lm, p)
        valence = np.bincount(dofh.cell_dofs.reshape(-1), minlength=dofh.n_dofs)
        expected = _expected_valence(dofh)
        edge = (valence < expected) & ~dofh.boundary_mask
        keep = np.ones(dofh.n_dofs)
        keep[dofh.boundary_mask] = 0.0
        keep[edge] = 0.0
        scale = lm.h(lm.level).astype(np.float64) ** (dim - 2)
        # exact diagonal (no hanging constraints on level meshes)
        diag = np.zeros(dofh.n_dofs)
        np.add.at(
            diag,
            dofh.cell_dofs.reshape(-1),
            (scale[:, None] * np.diag(elem)[None, :]).reshape(-1),
        )
        diag[keep == 0.0] = 1.0
        lev = LSLevel(
            cell_dofs=to_device(dofh.cell_dofs, jnp.int32),
            scale=to_device(scale, dtype),
            elem=to_device(elem, dtype),
            keep=to_device(keep, dtype),
            edge_ind=to_device(edge.astype(np.float64), dtype),
            inv_diag=to_device(1.0 / diag, dtype),
            n_dofs=dofh.n_dofs,
        )
        levels.append(lev)
        host_meshes.append(lm)
        host_dofhs.append(dofh)
        # copy map: active cells at level l <-> level-mesh cells
        sel = np.nonzero(active.level == l)[0]
        if len(sel):
            codes = morton_encode(lm.anchor)
            order = np.argsort(codes)
            q = morton_encode(active.anchor[sel])
            pos = order[np.searchsorted(codes[order], q)]
            lidx = dofh.cell_dofs[pos].reshape(-1)
            gidx = active_dofh.cell_dofs[sel].reshape(-1)
        else:
            lidx = np.zeros(0, np.int64)
            gidx = np.zeros(0, np.int64)
        copy_maps.append(
            CopyMap(to_device(lidx, jnp.int32), to_device(gidx, jnp.int32))
        )

    # transfers between consecutive level meshes (bucket by octant)
    transfers = [None]
    for i in range(1, len(levels)):
        fine, coarse = levels[i], levels[i - 1]
        lm_f, lm_c = host_meshes[i], host_meshes[i - 1]
        codes_c = morton_encode(lm_c.anchor)
        order_c = np.argsort(codes_c)
        par = lm_f.anchor >> 1
        pos = order_c[np.searchsorted(codes_c[order_c], morton_encode(par))]
        bits = lm_f.anchor & 1
        octs = bits[:, 0] | (bits[:, 1] << 1) | (bits[:, 2] << 2 if dim == 3 else 0)
        valence = np.bincount(
            host_dofhs[i].cell_dofs.reshape(-1), minlength=fine.n_dofs
        )
        buckets = []
        for o in range(1 << dim):
            s = np.nonzero(octs == o)[0]
            if len(s):
                buckets.append(
                    (
                        to_device(s, jnp.int32),
                        to_device(pos[s], jnp.int32),
                        to_device(_octant_matrix(dim, p, o), dtype),
                    )
                )
        transfers.append(
            LSTransfer(
                buckets=tuple(buckets),
                fine_cell_dofs=fine.cell_dofs,
                coarse_cell_dofs=coarse.cell_dofs,
                fine_weight=to_device(1.0 / np.maximum(valence, 1), dtype),
                n_f=fine.n_dofs,
                n_c=coarse.n_dofs,
            )
        )

    # smoothers (Chebyshev on the masked level operators)
    smoothers = [None]
    for lev in levels[1:]:
        smoothers.append(
            ChebyshevSmoother.create(
                lev,
                lev.inv_diag,
                degree=mg_data.smoother.degree if mg_data else 3,
                smoothing_range=(
                    mg_data.smoother.smoothing_range if mg_data else 20.0
                ),
                eig_cg_n_iterations=(
                    mg_data.smoother.eig_cg_n_iterations if mg_data else 20
                ),
            )
        )

    # coarse solve: dense Cholesky of the coarsest level matrix
    from ..mesh.dof import Constraints
    from .coarse import make_direct_coarse_solver

    empty = Constraints(
        levels[0].n_dofs, np.zeros(0, np.int32), np.zeros((0, 1), np.int32),
        np.zeros((0, 1)),
    )
    coarse = make_direct_coarse_solver(host_dofhs[0], empty, dtype)

    return LocalSmoothingMG(
        levels=tuple(levels),
        smoothers=tuple(smoothers),
        transfers=tuple(transfers),
        copy_maps=tuple(copy_maps),
        coarse_solve=coarse,
        n_dofs_global=active_dofh.n_dofs,
    )
