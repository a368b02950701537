"""Two-level transfers in the hybrid patch layout.

Same global linear maps as ops/transfer.py (nodal interpolation of the
constraint-distributed coarse function; restriction = exact transpose), but
executed patch-structured:

  * h-transfer: fine K^3 patches bucket by parent octant; the coarse source is
    a static strided sub-lattice slice of the parent coarse patch, interpolated
    by three axis GEMMs with a 1D patch embedding.  Patches that exist on both
    levels (regions untouched by the coarsening step) are whole-patch copies.
  * p-transfer: patch-to-patch identity pairing with the 1D degree embedding.
  * fallback: fine patches whose coarse source is not patch-covered gather
    their sub-lattice through a (small) irregular slot table; fine singleton
    cells gather their source cell's nodes the same way.

Every fine slot has exactly one writer, so prolongation needs no weights;
restriction applies the fine ownership mask (each global DoF counted once),
runs the mechanical transposes, and finishes with the coarse exchange +
constraint transpose.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.octree import morton_encode
from . import tensor
from .hybrid import (
    HybridFormat,
    HybridOperator,
    cell_slot_table,
    pack_buckets,
    unpack_patches,
    unpack_singles,
)
from ..mesh.dof import local_node_indices
from ..utils.device import to_device


HIGHEST = jax.lax.Precision.HIGHEST


def _axis_apply(u, mat, axis):
    return jnp.moveaxis(
        jnp.tensordot(u, mat, axes=([axis], [1]), precision=HIGHEST), -1, axis
    )


@dataclass(frozen=True)
class HybridTransfer:
    coarse_op: HybridOperator
    fine_constrained_keep: jax.Array
    fine_owner: jax.Array
    E1: jax.Array                  # [S_f, sub] 1D patch embedding
    patch_buckets: tuple           # ((fidx, cidx, child_rows [NC_c]), ...)
    patch_offsets: tuple           # ((ox, oy, oz), ...) static
    id_bucket: tuple | None        # (fidx, cidx) whole-patch copy
    # identity across K (coarse K = fine K/2): per octant a dense row-routed
    # window copy — (src_rows [NP_f], fine_rows [NP_c], hot [NP_c, NP_f]|None)
    id_oct: tuple                  # octant buckets (may be empty)
    irr_patch: tuple | None        # (fidx, sub_slots [n, sub^3])
    irr_id: tuple | None           # (fidx, slots [n, S_f^3]) copy via slot table
    single_buckets: tuple          # ((sidx, src_slots [n, nloc_c], M), ...)
    # singles whose coarse source cell is itself a coarse-format singleton:
    # src/dst are whole ROWS of the two [NS, nloc] buckets, so both directions
    # are block-row gathers/scatter-adds (~30 ns/row) instead of
    # element-priced slot tables (~7 ns/elem, DESIGN.md)
    single_fast: tuple             # ((sidx [n], crow [n], M), ...)
    # static
    S_f: int
    S_c: int
    sub: int
    NP_f: int
    NS_f: int
    nloc_f: int
    n_slots_f: int
    n_slots_c: int
    D_f: int = 1  # fine level's n_shards (device-major layout)
    # transposed-transfer machinery (lane-dense; RESULTS.md round-3c): per
    # patch bucket a one-hot [NP_c, NP_f] routing matrix so ALL buckets share
    # ONE leading-axis interpolation chain on [*, NP_f]-lane arrays instead
    # of per-bucket ops on the 10.6x-tile-padded [n, sub, sub, sub] views.
    # BANDED form (round-5, the NP >> 128 path): when NP_c * NP_f exceeds
    # the one-hot budget, the entry is a TUPLE of per-lane-tile one-hots
    # H_j [W, T] with static window starts in *_hot_starts — patches are
    # Morton-sorted on both levels, so the lane map is monotone and the
    # routing is a narrow band: storage O(NP_f * W) instead of O(NP_c*NP_f),
    # same MXU GEMM structure per tile.
    patch_hot: tuple = ()
    patch_hot_starts: tuple = ()   # static: per bucket None (full) | (s_j,...)
    id_oct_starts: tuple = ()      # static: per id_oct bucket None | (s_j,...)
    id_oct_offsets: tuple = ()     # static (dx, dy, dz) per id_oct bucket
    use_ttransfer: bool = False
    # local-smoothing mode (MGTransferMatrixFree semantics,
    # multigrid_throughput.cc:1800-1802): level meshes are conforming and
    # level vectors are unconstrained, so no constraint application and no
    # constrained-row masking — only the ownership mask and the coarse
    # exchange (the restrict_and_add assembly)
    ls_mode: bool = False
    # T-state transfer masks (round-4j, MGTPU_TVCYCLE): the fine-side keep
    # masks permuted into the fine op's T layout and split at the bucket
    # boundary, so restrict_ts/prolong_ts read/write the split (TVec) fine
    # state with NO fine-side boundary transposes (the main ttransfer path
    # is already T-shaped; only the small id/irr extras transpose on
    # demand).  None when the fine op carries no split tables.
    tsx: dict | None = None

    @property
    def fine_patch_slots(self) -> int:
        return self.NP_f * self.S_f**3

    def _interp_sub(self, sub_vals: jax.Array) -> jax.Array:
        """[n, sub, sub, sub] -> [n, S_f, S_f, S_f] via three axis GEMMs."""
        E = self.E1.astype(sub_vals.dtype)
        v = _axis_apply(sub_vals, E, 1)
        v = _axis_apply(v, E, 2)
        return _axis_apply(v, E, 3)

    def _interp_sub_t(self, v: jax.Array) -> jax.Array:
        ET = self.E1.T.astype(v.dtype)
        r = _axis_apply(v, ET, 1)
        r = _axis_apply(r, ET, 2)
        return _axis_apply(r, ET, 3)

    def _patch_starts(self):
        return self.patch_hot_starts or (None,) * len(self.patch_hot)

    def _oct_starts(self):
        return self.id_oct_starts or (None,) * len(self.id_oct)

    # ------------------------------------------------ lane routing
    # One-hot routing along the minor (lane) axis: full [NP_c, NP_f] GEMM
    # when small, banded per-tile GEMMs with STATIC window slices when
    # large (lane gathers are element-priced on TPU; static slice + small
    # GEMM stays on the MXU).

    def _lanes_to_fine(self, w: jax.Array, hot, starts, dtype) -> jax.Array:
        """[..., NP_c] -> [..., NP_f] (prolong direction)."""
        if starts is None:
            return jnp.tensordot(
                w, hot.astype(dtype), axes=([-1], [0]), precision=HIGHEST
            )
        chunks = []
        for s, Hj in zip(starts, hot):
            win = jax.lax.slice_in_dim(w, s, s + Hj.shape[0], axis=-1)
            chunks.append(jnp.tensordot(
                win, Hj.astype(dtype), axes=([-1], [0]), precision=HIGHEST
            ))
        return jnp.concatenate(chunks, axis=-1)

    def _lanes_to_coarse(self, v: jax.Array, hot, starts, dtype,
                         np_c: int) -> jax.Array:
        """[..., NP_f] -> [..., NP_c] (restrict direction, transposed)."""
        if starts is None:
            return jnp.tensordot(
                v, hot.astype(dtype), axes=([-1], [1]), precision=HIGHEST
            )
        acc = jnp.zeros(v.shape[:-1] + (np_c,), dtype)
        off = 0
        for s, Hj in zip(starts, hot):
            tile = Hj.shape[1]
            g = jnp.tensordot(
                jax.lax.slice_in_dim(v, off, off + tile, axis=-1),
                Hj.astype(dtype), axes=([-1], [1]), precision=HIGHEST,
            )
            acc = acc.at[..., s : s + Hj.shape[0]].add(g)
            off += tile
        return acc

    def _interp_lead(self, u: jax.Array) -> jax.Array:
        """[sub, sub, sub, L] -> [S_f, S_f, S_f, L]: E1 along leading axes,
        lanes untouched."""
        E = self.E1.astype(u.dtype)
        for axis in range(3):
            u = jnp.moveaxis(
                jnp.tensordot(E, u, axes=([1], [axis]), precision=HIGHEST),
                0, axis,
            )
        return u

    def _interp_lead_t(self, u: jax.Array) -> jax.Array:
        ET = self.E1.T.astype(u.dtype)
        for axis in range(3):
            u = jnp.moveaxis(
                jnp.tensordot(ET, u, axes=([1], [axis]), precision=HIGHEST),
                0, axis,
            )
        return u

    def _prolong_patches_t(self, uc: jax.Array, dtype) -> jax.Array:
        """Transposed patch prolongation -> [NP_f, S_f^3] rows."""
        cop = self.coarse_op
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        uc2 = cop._patches2d(uc)
        out2 = jnp.zeros((self.NP_f, S_f**3), dtype)
        if cop.NP and (self.patch_buckets or self.id_oct):
            uct = uc2.T.reshape(S_c, S_c, S_c, cop.NP)
            vt = None
            if self.patch_buckets:
                acc = None
                for ((_f, _c, _ch), (ox, oy, oz), H, st) in zip(
                    self.patch_buckets, self.patch_offsets, self.patch_hot,
                    self._patch_starts(),
                ):
                    w = uct[ox : ox + sub, oy : oy + sub, oz : oz + sub, :]
                    term = self._lanes_to_fine(w, H, st, dtype)
                    acc = term if acc is None else acc + term
                vt = self._interp_lead(acc)
            if self.id_oct:
                if vt is None:
                    vt = jnp.zeros((S_f, S_f, S_f, self.NP_f), dtype)
                for (_sr, _fr, H), (dx, dy, dz), st in zip(
                    self.id_oct, self.id_oct_offsets, self._oct_starts()
                ):
                    w = uct[dx:, dy:, dz:, :]
                    vt = vt.at[
                        dx * S_c : dx * S_c + S_c - dx,
                        dy * S_c : dy * S_c + S_c - dy,
                        dz * S_c : dz * S_c + S_c - dz,
                        :,
                    ].add(self._lanes_to_fine(w, H, st, dtype))
            out2 = vt.reshape(S_f**3, self.NP_f).T
        if self.id_bucket is not None:
            fidx, cidx = self.id_bucket
            out2 = out2.at[fidx].set(uc2[cidx])
        if self.irr_patch is not None:
            fidx, sub_slots = self.irr_patch
            sv = uc[sub_slots].reshape(-1, sub, sub, sub)
            out2 = out2.at[fidx].set(self._interp_sub(sv).reshape(len(fidx), -1))
        if self.irr_id is not None:
            fidx, slots = self.irr_id
            out2 = out2.at[fidx].set(uc[slots].reshape(len(fidx), -1))
        return out2

    def prolong(self, uc: jax.Array) -> jax.Array:
        if not self.ls_mode:
            cop = self.coarse_op
            if cop.tv is not None and "split" in cop.tv:
                uc = cop._from_ts(cop._apply_c_ts(cop._to_ts(uc)))
            elif cop.tv is not None:
                # run C through the lane-dense transposed pipeline (one
                # transpose each way beats the padded-lattice passes)
                uc = cop._from_t(cop._apply_c_t(cop._to_t(uc)))
            else:
                uc = cop.apply_c(uc)
        dtype = uc.dtype
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        if self.use_ttransfer and self.patch_hot and self.NP_f:
            out_p = self._prolong_patches_t(uc, dtype)
        else:
            out_p = (
                jnp.zeros((self.NP_f, S_f, S_f, S_f), dtype) if self.NP_f else None
            )
            if self.coarse_op.NP and self.NP_f:
                up_c = self.coarse_op._patches(uc)
                for (fidx, cidx, _ch), (ox, oy, oz) in zip(
                    self.patch_buckets, self.patch_offsets
                ):
                    sv = up_c[cidx, ox : ox + sub, oy : oy + sub, oz : oz + sub]
                    out_p = out_p.at[fidx].set(self._interp_sub(sv))
                if self.id_bucket is not None:
                    fidx, cidx = self.id_bucket
                    out_p = out_p.at[fidx].set(up_c[cidx])
                if self.id_oct:
                    up_pad = jnp.concatenate(
                        [up_c, jnp.zeros((1,) + up_c.shape[1:], dtype)], axis=0
                    )
                    for (src_rows, _fr, _h), (dx, dy, dz) in zip(
                        self.id_oct, self.id_oct_offsets
                    ):
                        g = up_pad[src_rows]
                        out_p = out_p.at[
                            :,
                            dx * S_c : dx * S_c + S_c - dx,
                            dy * S_c : dy * S_c + S_c - dy,
                            dz * S_c : dz * S_c + S_c - dz,
                        ].add(g[:, dx:, dy:, dz:])
            if self.irr_patch is not None:
                fidx, sub_slots = self.irr_patch
                sv = uc[sub_slots].reshape(-1, sub, sub, sub)
                out_p = out_p.at[fidx].set(self._interp_sub(sv))
            if self.irr_id is not None:
                fidx, slots = self.irr_id
                out_p = out_p.at[fidx].set(uc[slots].reshape(-1, S_f, S_f, S_f))
        out_s = None
        if self.NS_f:
            out_s = jnp.zeros((self.NS_f, self.nloc_f), dtype)
            for sidx, src_slots, M in self.single_buckets:
                v = jnp.matmul(uc[src_slots], M.T.astype(dtype), precision=HIGHEST)
                out_s = out_s.at[sidx].set(v)
            if self.single_fast:
                us_c = self.coarse_op._singles(uc)
                for sidx, crow, M in self.single_fast:
                    v = jnp.matmul(
                        us_c[crow], M.T.astype(dtype), precision=HIGHEST
                    )
                    out_s = out_s.at[sidx].set(v)
        out = pack_buckets(out_p, out_s, self.D_f)
        if self.ls_mode:
            return out
        return out * self.fine_constrained_keep

    def _fine_patches2d(self, rf: jax.Array) -> jax.Array:
        pp = (self.NP_f // self.D_f) * self.S_f**3
        return rf.reshape(self.D_f, -1)[:, :pp].reshape(self.NP_f, self.S_f**3)

    def _restrict_patches_t(self, rf: jax.Array, dtype) -> jax.Array:
        """Transposed patch restriction -> flat coarse accumulator."""
        cop = self.coarse_op
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        rp2 = self._fine_patches2d(rf)
        acc = jnp.zeros(self.n_slots_c, dtype)
        acc2 = jnp.zeros((cop.NP, S_c**3), dtype) if cop.NP else None
        if cop.NP and (self.patch_buckets or self.id_oct):
            rt = rp2.T.reshape(S_f, S_f, S_f, self.NP_f)
            acc_t = jnp.zeros((S_c, S_c, S_c, cop.NP), dtype)
            if self.patch_buckets:
                v = self._interp_lead_t(rt)  # [sub, sub, sub, NP_f]
                for ((_f, _c, _ch), (ox, oy, oz), H, st) in zip(
                    self.patch_buckets, self.patch_offsets, self.patch_hot,
                    self._patch_starts(),
                ):
                    g = self._lanes_to_coarse(v, H, st, dtype, cop.NP)
                    acc_t = acc_t.at[
                        ox : ox + sub, oy : oy + sub, oz : oz + sub, :
                    ].add(g)
            for (_sr, _fr, H), (dx, dy, dz), st in zip(
                self.id_oct, self.id_oct_offsets, self._oct_starts()
            ):
                w = rt[
                    dx * S_c : dx * S_c + S_c - dx,
                    dy * S_c : dy * S_c + S_c - dy,
                    dz * S_c : dz * S_c + S_c - dz,
                    :,
                ]
                g = self._lanes_to_coarse(w, H, st, dtype, cop.NP)
                acc_t = acc_t.at[dx:, dy:, dz:, :].add(g)
            acc2 = acc_t.reshape(S_c**3, cop.NP).T
        if acc2 is not None and self.id_bucket is not None:
            fidx, cidx = self.id_bucket
            acc2 = acc2.at[cidx].add(rp2[fidx])
        if acc2 is not None:
            acc = cop._with_patches2d(acc, acc2)
        if self.irr_patch is not None:
            fidx, sub_slots = self.irr_patch
            sv = rp2[fidx].reshape(-1, S_f, S_f, S_f)
            acc = acc.at[sub_slots.reshape(-1)].add(
                self._interp_sub_t(sv).reshape(-1)
            )
        if self.irr_id is not None:
            fidx, slots = self.irr_id
            acc = acc.at[slots.reshape(-1)].add(rp2[fidx].reshape(-1))
        return acc

    def restrict(self, rf: jax.Array) -> jax.Array:
        dtype = rf.dtype
        if self.ls_mode:
            rf = rf * self.fine_owner
        else:
            rf = rf * self.fine_constrained_keep * self.fine_owner
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        cop = self.coarse_op
        if self.use_ttransfer and self.patch_hot and self.NP_f:
            acc = self._restrict_patches_t(rf, dtype)
        else:
            acc = jnp.zeros(self.n_slots_c, dtype)
            rp = (
                unpack_patches(rf, self.D_f, self.NP_f, S_f) if self.NP_f else None
            )
            if cop.NP and self.NP_f:
                acc_p = jnp.zeros((cop.NP, S_c, S_c, S_c), dtype)
                for (fidx, cidx, child_rows), (ox, oy, oz) in zip(
                    self.patch_buckets, self.patch_offsets
                ):
                    v = self._interp_sub_t(rp[fidx])
                    # every coarse patch has at most ONE fine child per octant
                    # (verified at build time), so the octant-window update is
                    # a block-row GATHER + static-window add instead of an
                    # element-priced window scatter
                    vpad = jnp.concatenate(
                        [v, jnp.zeros((1, sub, sub, sub), dtype)], axis=0
                    )
                    g = vpad[child_rows]
                    acc_p = acc_p.at[
                        :, ox : ox + sub, oy : oy + sub, oz : oz + sub
                    ].add(g)
                if self.id_bucket is not None:
                    fidx, cidx = self.id_bucket
                    acc_p = acc_p.at[cidx].add(rp[fidx])
                if self.id_oct:
                    for (_sr, fine_rows, _h), (dx, dy, dz) in zip(
                        self.id_oct, self.id_oct_offsets
                    ):
                        win = rp[
                            :,
                            dx * S_c : dx * S_c + S_c - dx,
                            dy * S_c : dy * S_c + S_c - dy,
                            dz * S_c : dz * S_c + S_c - dz,
                        ]
                        wpad = jnp.concatenate(
                            [win, jnp.zeros((1,) + win.shape[1:], dtype)],
                            axis=0,
                        )
                        acc_p = acc_p.at[:, dx:, dy:, dz:].add(wpad[fine_rows])
                acc = cop._with_patches(acc, acc_p)
            if self.irr_patch is not None:
                fidx, sub_slots = self.irr_patch
                v = self._interp_sub_t(rp[fidx]).reshape(len(sub_slots), -1)
                acc = acc.at[sub_slots.reshape(-1)].add(v.reshape(-1))
            if self.irr_id is not None:
                fidx, slots = self.irr_id
                acc = acc.at[slots.reshape(-1)].add(rp[fidx].reshape(-1))
        if self.NS_f:
            rs = unpack_singles(
                rf, self.D_f, self.NP_f, S_f, self.NS_f, self.nloc_f
            )
            for sidx, src_slots, M in self.single_buckets:
                v = jnp.matmul(rs[sidx], M.astype(dtype), precision=HIGHEST)
                acc = acc.at[src_slots.reshape(-1)].add(v.reshape(-1))
            if self.single_fast:
                acc_s = cop._singles(acc)
                for sidx, crow, M in self.single_fast:
                    v = jnp.matmul(rs[sidx], M.astype(dtype), precision=HIGHEST)
                    acc_s = acc_s.at[crow].add(v)
                acc = cop._with_singles(acc, acc_s)
        return self._restrict_coarse_tail(acc)

    def _restrict_coarse_tail(self, acc: jax.Array) -> jax.Array:
        """Coarse-side assembly after the restriction accumulator: C^T on
        structured faces, exchange, C^T per-node (skipped in ls_mode)."""
        cop = self.coarse_op
        if cop.tv is not None and "split" in cop.tv:
            acc_t = cop._to_ts(acc)
            if self.ls_mode:
                return cop._from_ts(cop._exchange_ts(acc_t))
            acc_t = cop._ct_faces_ts(acc_t)
            acc_t = cop._exchange_ts(acc_t)
            return cop._from_ts(cop._apply_ct_ts(acc_t))
        if cop.tv is not None:
            acc_t = cop._to_t(acc)
            if self.ls_mode:
                return cop._from_t(cop._exchange_t(acc_t))
            acc_t = cop._ct_faces_t(acc_t)
            acc_t = cop._exchange_t(acc_t)
            return cop._from_t(cop._apply_ct_t(acc_t))
        if self.ls_mode:
            return cop.exchange(acc)
        acc = cop.apply_ct_faces(acc)
        acc = cop.exchange(acc)
        return cop.apply_ct(acc)

    # ------------------------------------------------ T-state entry points
    # (round-4j, MGTPU_TVCYCLE): the V-cycle keeps each level's state split
    # (TVec), so the fine side of both directions reads/writes the T head
    # and tail directly — the per-visit boundary transposes (to/from_t
    # around every smoother call, residual vmult and transfer) collapse to
    # ONE pair per level visit.
    def restrict_ts(self, rf) -> jax.Array:
        """restrict() from the fine level's split T state; returns the flat
        coarse vector (the coarse boundary pair stays — coarse levels are
        8-64x smaller)."""
        tsx = self.tsx
        dtype = rf.head.dtype if rf.head.size else rf.tail.dtype
        h = rf.head * tsx["rk_h"]
        t = rf.tail * tsx["rk_t"]
        cop = self.coarse_op
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        acc = jnp.zeros(self.n_slots_c, dtype)
        acc2 = jnp.zeros((cop.NP, S_c**3), dtype) if cop.NP else None
        rp2 = None
        if cop.NP and (self.patch_buckets or self.id_oct):
            rt = h.reshape(S_f, S_f, S_f, self.NP_f)
            acc_t = jnp.zeros((S_c, S_c, S_c, cop.NP), dtype)
            if self.patch_buckets:
                v = self._interp_lead_t(rt)
                for ((_f, _c, _ch), (ox, oy, oz), H, st) in zip(
                    self.patch_buckets, self.patch_offsets, self.patch_hot,
                    self._patch_starts(),
                ):
                    g = self._lanes_to_coarse(v, H, st, dtype, cop.NP)
                    acc_t = acc_t.at[
                        ox : ox + sub, oy : oy + sub, oz : oz + sub, :
                    ].add(g)
            for (_sr, _fr, H), (dx, dy, dz), st in zip(
                self.id_oct, self.id_oct_offsets, self._oct_starts()
            ):
                w = rt[
                    dx * S_c : dx * S_c + S_c - dx,
                    dy * S_c : dy * S_c + S_c - dy,
                    dz * S_c : dz * S_c + S_c - dz,
                    :,
                ]
                g = self._lanes_to_coarse(w, H, st, dtype, cop.NP)
                acc_t = acc_t.at[dx:, dy:, dz:, :].add(g)
            acc2 = acc_t.reshape(S_c**3, cop.NP).T
        if self.id_bucket is not None or self.irr_patch is not None \
                or self.irr_id is not None:
            # small extras need patch-major rows: one transpose on demand
            rp2 = h.reshape(S_f**3, self.NP_f).T
        if acc2 is not None and self.id_bucket is not None:
            fidx, cidx = self.id_bucket
            acc2 = acc2.at[cidx].add(rp2[fidx])
        if acc2 is not None:
            acc = cop._with_patches2d(acc, acc2)
        if self.irr_patch is not None:
            fidx, sub_slots = self.irr_patch
            sv = rp2[fidx].reshape(-1, S_f, S_f, S_f)
            acc = acc.at[sub_slots.reshape(-1)].add(
                self._interp_sub_t(sv).reshape(-1)
            )
        if self.irr_id is not None:
            fidx, slots = self.irr_id
            acc = acc.at[slots.reshape(-1)].add(rp2[fidx].reshape(-1))
        if self.NS_f:
            rs = t.reshape(self.NS_f, self.nloc_f)
            for sidx, src_slots, M in self.single_buckets:
                v = jnp.matmul(rs[sidx], M.astype(dtype), precision=HIGHEST)
                acc = acc.at[src_slots.reshape(-1)].add(v.reshape(-1))
            if self.single_fast:
                acc_s = cop._singles(acc)
                for sidx, crow, M in self.single_fast:
                    v = jnp.matmul(rs[sidx], M.astype(dtype),
                                   precision=HIGHEST)
                    acc_s = acc_s.at[crow].add(v)
                acc = cop._with_singles(acc, acc_s)
        return self._restrict_coarse_tail(acc)

    def prolong_ts(self, uc: jax.Array):
        """prolong() emitting the fine level's split T state (TVec)."""
        from .hybrid import TVec

        tsx = self.tsx
        cop = self.coarse_op
        if not self.ls_mode:
            if cop.tv is not None and "split" in cop.tv:
                uc = cop._from_ts(cop._apply_c_ts(cop._to_ts(uc)))
            elif cop.tv is not None:
                uc = cop._from_t(cop._apply_c_t(cop._to_t(uc)))
            else:
                uc = cop.apply_c(uc)
        dtype = uc.dtype
        S_c, S_f, sub = self.S_c, self.S_f, self.sub
        uc2 = cop._patches2d(uc) if cop.NP else None
        vt = jnp.zeros((S_f, S_f, S_f, self.NP_f), dtype) if self.NP_f \
            else None
        if cop.NP and (self.patch_buckets or self.id_oct):
            uct = uc2.T.reshape(S_c, S_c, S_c, cop.NP)
            if self.patch_buckets:
                acc = None
                for ((_f, _c, _ch), (ox, oy, oz), H, st) in zip(
                    self.patch_buckets, self.patch_offsets, self.patch_hot,
                    self._patch_starts(),
                ):
                    w = uct[ox : ox + sub, oy : oy + sub, oz : oz + sub, :]
                    term = self._lanes_to_fine(w, H, st, dtype)
                    acc = term if acc is None else acc + term
                vt = vt + self._interp_lead(acc)
            for (_sr, _fr, H), (dx, dy, dz), st in zip(
                self.id_oct, self.id_oct_offsets, self._oct_starts()
            ):
                w = uct[dx:, dy:, dz:, :]
                vt = vt.at[
                    dx * S_c : dx * S_c + S_c - dx,
                    dy * S_c : dy * S_c + S_c - dy,
                    dz * S_c : dz * S_c + S_c - dz,
                    :,
                ].add(self._lanes_to_fine(w, H, st, dtype))
        if self.id_bucket is not None or self.irr_patch is not None \
                or self.irr_id is not None:
            # small extras set patch-major rows: transpose in/out on demand
            out2 = vt.reshape(S_f**3, self.NP_f).T
            if self.id_bucket is not None:
                fidx, cidx = self.id_bucket
                out2 = out2.at[fidx].set(uc2[cidx])
            if self.irr_patch is not None:
                fidx, sub_slots = self.irr_patch
                sv = uc[sub_slots].reshape(-1, sub, sub, sub)
                out2 = out2.at[fidx].set(
                    self._interp_sub(sv).reshape(len(fidx), -1)
                )
            if self.irr_id is not None:
                fidx, slots = self.irr_id
                out2 = out2.at[fidx].set(uc[slots].reshape(len(fidx), -1))
            head = out2.T.reshape(-1)
        else:
            head = vt.reshape(-1) if vt is not None else jnp.zeros(0, dtype)
        if self.NS_f:
            out_s = jnp.zeros((self.NS_f, self.nloc_f), dtype)
            for sidx, src_slots, M in self.single_buckets:
                v = jnp.matmul(uc[src_slots], M.T.astype(dtype),
                               precision=HIGHEST)
                out_s = out_s.at[sidx].set(v)
            if self.single_fast:
                us_c = cop._singles(uc)
                for sidx, crow, M in self.single_fast:
                    v = jnp.matmul(us_c[crow], M.T.astype(dtype),
                                   precision=HIGHEST)
                    out_s = out_s.at[sidx].set(v)
            tail = out_s.reshape(-1)
        else:
            tail = jnp.zeros(0, dtype)
        out = TVec(head, tail)
        if self.ls_mode:
            return out
        return out * TVec(tsx["pk_h"], tsx["pk_t"])


jax.tree_util.register_dataclass(
    HybridTransfer,
    data_fields=[
        "coarse_op", "fine_constrained_keep", "fine_owner", "E1",
        "patch_buckets", "id_bucket", "id_oct", "irr_patch", "irr_id",
        "single_buckets", "single_fast", "patch_hot", "tsx",
    ],
    meta_fields=["patch_offsets", "id_oct_offsets", "patch_hot_starts", "id_oct_starts", "S_f", "S_c", "sub", "NP_f", "NS_f", "nloc_f", "n_slots_f", "n_slots_c", "D_f", "ls_mode", "use_ttransfer"],
)


def _lane_routing(f_arr, c_arr, np_c, np_f, dtype, budget=4_000_000):
    """One-hot lane routing c_arr[i] -> f_arr[i], full or banded.

    Returns (hot, starts): a full [np_c, np_f] device matrix with
    starts=None when np_c*np_f fits the budget; otherwise BANDED per-tile
    one-hots — fine lanes are cut into tiles of <= 512, and because both
    patch sequences are Morton-sorted the coarse sources of one tile span
    a narrow contiguous window [s_j, s_j+W): storage O(np_f * W) instead
    of O(np_c * np_f), the static-slice + small-GEMM apply stays on the
    MXU (lane gathers are element-priced — DESIGN.md).  Returns
    (None, None) when even the band exceeds the budget (the t-path then
    falls back to the plain-layout transfer)."""
    if np_c * np_f <= budget:
        H = np.zeros((np_c, np_f), np.float32)
        H[c_arr, f_arr] = 1.0
        return to_device(H, dtype), None
    tile = 512
    n_tiles = -(-np_f // tile)
    # per-tile coarse windows
    lo = np.full(n_tiles, np_c, np.int64)
    hi = np.full(n_tiles, -1, np.int64)
    t_of = f_arr // tile
    np.minimum.at(lo, t_of, c_arr)
    np.maximum.at(hi, t_of, c_arr)
    width = int((hi - lo + 1)[hi >= 0].max()) if (hi >= 0).any() else 1
    W = min(-(-width // 8) * 8, np_c)
    if W * np_f > max(budget, 8_000_000):
        return None, None
    starts, tiles = [], []
    for j in range(n_tiles):
        T_j = min(tile, np_f - j * tile)
        s = 0 if hi[j] < 0 else min(int(lo[j]), np_c - W)
        H = np.zeros((W, T_j), np.float32)
        sel = t_of == j
        if sel.any():
            H[c_arr[sel] - s, f_arr[sel] - j * tile] = 1.0
        starts.append(s)
        tiles.append(to_device(H, dtype))
    return tuple(tiles), tuple(starts)


def _h_patch_embedding_1d(K: int, degree: int) -> np.ndarray:
    """[S_f, (K/2)*p+1]: fine K-cell patch nodes from the coarse (K/2)-cell
    sub-lattice (one global-coarsening step)."""
    p = degree
    Eh = tensor.h_embedding_1d(p)
    S_f = K * p + 1
    sub = (K // 2) * p + 1
    out = np.zeros((S_f, sub))
    for kf in range(K):
        kc, b = kf >> 1, kf & 1
        out[kf * p : kf * p + p + 1, kc * p : kc * p + p + 1] = Eh[b]
    return out


def _p_patch_embedding_1d(K: int, deg_c: int, deg_f: int) -> np.ndarray:
    Ep = tensor.p_embedding_1d(deg_c, deg_f)
    S_f = K * deg_f + 1
    S_c = K * deg_c + 1
    out = np.zeros((S_f, S_c))
    for k in range(K):
        out[k * deg_f : k * deg_f + deg_f + 1, k * deg_c : k * deg_c + deg_c + 1] = Ep
    return out


def _kron3(E: np.ndarray) -> np.ndarray:
    return np.kron(np.kron(E, E), E)


def make_hybrid_transfer(
    fine_fmt: HybridFormat,
    coarse_fmt: HybridFormat,
    fine_op: HybridOperator,
    coarse_op: HybridOperator,
    dtype=jnp.float32,
    ls_mode: bool = False,
) -> HybridTransfer:
    fd, cd = fine_fmt.dofh, coarse_fmt.dofh
    mf, mc = fd.mesh, cd.mesh
    p_f, p_c = fd.degree, cd.degree
    K = fine_fmt.K
    same_mesh = (
        mf.n_cells == mc.n_cells
        and np.array_equal(mf.level, mc.level)
        and np.array_equal(mf.anchor, mc.anchor)
    )
    cslot = cell_slot_table(coarse_fmt)
    nloc_c = cd.n_loc
    loc_c = local_node_indices(3, p_c)

    # coarse cell -> coarse singleton row (or -1): sources that are coarse
    # singletons use whole-row block gathers instead of slot tables
    srow_c = np.full(mc.n_cells, -1, np.int64)
    real_c = np.nonzero(coarse_fmt.single_cells >= 0)[0]
    srow_c[coarse_fmt.single_cells[real_c]] = real_c

    single_buckets_out: list = []
    single_fast_out: list = []

    def add_single_bucket(sidx_arr, cells_arr, M):
        """Route a singleton bucket through the fast (coarse-singleton-row)
        or the slot-table path, splitting mixed buckets."""
        fast = srow_c[cells_arr] >= 0
        if fast.any():
            single_fast_out.append(
                (sidx_arr[fast], srow_c[cells_arr[fast]], M)
            )
        if (~fast).any():
            single_buckets_out.append(
                (sidx_arr[~fast], cslot[cells_arr[~fast]], M)
            )

    # coarse patch lookup (level, block) -> idx (only same-K decompositions)
    cp_key = {}
    if coarse_fmt.K == K:
        for i in range(coarse_fmt.n_patches):
            cp_key[
                (
                    int(coarse_fmt.patch_level[i]),
                    int(coarse_fmt.patch_block[i, 0]),
                    int(coarse_fmt.patch_block[i, 1]),
                    int(coarse_fmt.patch_block[i, 2]),
                )
            ] = i
    # half-K coarse decomposition (adaptive per-level patch granularity,
    # K_coarse = K_fine/2): a fine K-patch's one-level-coarser region is
    # exactly ONE whole half-K coarse patch (the parent case rides the
    # existing sub-window machinery with off=(0,0,0), sub == S_c), and its
    # same-level region is exactly EIGHT half-K coarse patches (octants —
    # the id_oct buckets below)
    cp_key_h = {}
    if K > 1 and coarse_fmt.K == K // 2:
        for i in range(coarse_fmt.n_patches):
            if int(coarse_fmt.patch_level[i]) < 0:  # padding dummy
                continue
            cp_key_h[
                (
                    int(coarse_fmt.patch_level[i]),
                    int(coarse_fmt.patch_block[i, 0]),
                    int(coarse_fmt.patch_block[i, 1]),
                    int(coarse_fmt.patch_block[i, 2]),
                )
            ] = i

    # coarse active-cell lookup
    cindex = {}
    for l in np.unique(mc.level):
        sel = np.nonzero(mc.level == l)[0]
        codes = morton_encode(mc.anchor[sel])
        order = np.argsort(codes)
        cindex[int(l)] = (codes[order], sel[order])

    def find_cell(level, anchors):
        got = cindex.get(int(level))
        if got is None:
            return np.full(len(anchors), -1, np.int64)
        codes_sorted, gidx = got
        q = morton_encode(anchors)
        pos = np.minimum(np.searchsorted(codes_sorted, q), len(codes_sorted) - 1)
        return np.where(codes_sorted[pos] == q, gidx[pos], -1)

    patch_buckets = []
    id_pairs = ([], [])
    id_oct_groups = {o: ([], []) for o in range(8)}
    irr_f, irr_slots_list = [], []
    irr_id_f, irr_id_slots = [], []

    if same_mesh:
        assert p_f != p_c
        sub = coarse_fmt.S
        E1 = _p_patch_embedding_1d(K, p_c, p_f)
        # patch pairing is identical by construction
        pair = np.arange(fine_fmt.n_patches, dtype=np.int64)
        if coarse_fmt.K == K and coarse_fmt.n_patches == fine_fmt.n_patches:
            patch_buckets.append((pair, pair, (0, 0, 0)))
        else:  # degenerate: route through irregular sub-lattice
            for i in range(fine_fmt.n_patches):
                if fine_fmt.patch_level[i] < 0:  # padding dummy
                    continue
                irr_f.append(i)
                irr_slots_list.append(
                    _sub_slots_same_mesh(fine_fmt, coarse_fmt, i, cslot, loc_c, p_c)
                )
        M_single = _kron3(tensor.p_embedding_1d(p_c, p_f))
        # same mesh => same singleton cells in both formats (skip dummies)
        sidx = np.nonzero(fine_fmt.single_cells >= 0)[0].astype(np.int64)
        if len(sidx):
            add_single_bucket(sidx, fine_fmt.single_cells[sidx], M_single)
    else:
        assert p_f == p_c
        p = p_f
        if K > 1:
            sub = (K // 2) * p + 1
            E1 = _h_patch_embedding_1d(K, p)
        else:  # no fine patches (singleton-only level)
            sub = 1
            E1 = np.ones((fine_fmt.S, 1))
        # --- fine patches ---
        oct_groups = {o: ([], []) for o in range(8)}
        half_parent: tuple[list, list] = ([], [])
        for i in range(fine_fmt.n_patches):
            lvl = int(fine_fmt.patch_level[i])
            if lvl < 0:  # padding dummy
                continue
            blk = fine_fmt.patch_block[i]
            # identity: same patch in coarse decomposition
            j = cp_key.get((lvl, int(blk[0]), int(blk[1]), int(blk[2])))
            if j is not None:
                id_pairs[0].append(i)
                id_pairs[1].append(j)
                continue
            # identity across K: the fine patch's region = 8 half-K coarse
            # patches (one per octant), values copy without interpolation
            if cp_key_h:
                subs_j = [
                    cp_key_h.get(
                        (
                            lvl,
                            int(2 * blk[0] + (o & 1)),
                            int(2 * blk[1] + ((o >> 1) & 1)),
                            int(2 * blk[2] + ((o >> 2) & 1)),
                        )
                    )
                    for o in range(8)
                ]
                if all(sj is not None for sj in subs_j):
                    for o, sj in enumerate(subs_j):
                        id_oct_groups[o][0].append(i)
                        id_oct_groups[o][1].append(sj)
                    continue
                # parent across K: one whole half-K coarse patch at lvl-1
                jp_h = cp_key_h.get(
                    (lvl - 1, int(blk[0]), int(blk[1]), int(blk[2]))
                )
                if jp_h is not None:
                    half_parent[0].append(i)
                    half_parent[1].append(jp_h)
                    continue
            # identity cells present in coarse but not patch-covered there
            ident_cells = find_cell(lvl, mf.anchor[fine_fmt.patch_cells[i]])
            if (ident_cells >= 0).all():
                lat, _ = _lattice_cells(p, K, loc_c)
                slots = np.full(fine_fmt.S**3, -1, np.int64)
                slots[lat.reshape(-1)] = cslot[ident_cells].reshape(-1)
                assert (slots >= 0).all()
                irr_id_f.append(i)
                irr_id_slots.append(slots)
                continue
            # parent half-patch
            o = int((blk[0] & 1) | ((blk[1] & 1) << 1) | ((blk[2] & 1) << 2))
            jp = cp_key.get(
                (lvl - 1, int(blk[0] >> 1), int(blk[1] >> 1), int(blk[2] >> 1))
            )
            if jp is not None:
                oct_groups[o][0].append(i)
                oct_groups[o][1].append(jp)
            else:
                irr_f.append(i)
                irr_slots_list.append(
                    _sub_slots_h(fine_fmt, i, mc, find_cell, cslot, loc_c, p, K, sub)
                )
        half = (K // 2) * p
        for o, (fi, ci) in oct_groups.items():
            if fi:
                off = ((o & 1) * half, ((o >> 1) & 1) * half, ((o >> 2) & 1) * half)
                patch_buckets.append(
                    (np.asarray(fi, np.int64), np.asarray(ci, np.int64), off)
                )
        if half_parent[0]:
            # K_c = K/2 parent: the coarse patch IS the fine patch's whole
            # one-level-coarser region — off (0,0,0), window = full coarse
            # patch (sub == S_c), same E1 interpolation
            patch_buckets.append(
                (
                    np.asarray(half_parent[0], np.int64),
                    np.asarray(half_parent[1], np.int64),
                    (0, 0, 0),
                )
            )
        # --- fine singles: identity cell or parent cell ---
        if fine_fmt.n_singles:
            real_sel = np.nonzero(fine_fmt.single_cells >= 0)[0]
            scells = fine_fmt.single_cells[real_sel]
            lvls = mf.level[scells]
            anch = mf.anchor[scells]
            ident = np.full(len(scells), -1, np.int64)
            for l in np.unique(lvls):
                s = lvls == l
                ident[s] = find_cell(l, anch[s])
            id_sel = ident >= 0
            if id_sel.any():
                add_single_bucket(
                    real_sel[id_sel].astype(np.int64),
                    ident[id_sel],
                    np.eye(fd.n_loc),
                )
            rest = np.nonzero(~id_sel)[0]
            if len(rest):
                par = np.full(len(rest), -1, np.int64)
                octs = np.zeros(len(rest), np.int64)
                for l in np.unique(lvls[rest]):
                    s = lvls[rest] == l
                    cells = rest[s]
                    par[s] = find_cell(l - 1, anch[cells] >> 1)
                    bits = anch[cells] & 1
                    octs[s] = bits[:, 0] | (bits[:, 1] << 1) | (bits[:, 2] << 2)
                assert (par >= 0).all(), "fine singleton without coarse source"
                Eh = tensor.h_embedding_1d(p)
                for o in range(8):
                    s = octs == o
                    if s.any():
                        M = np.kron(
                            np.kron(Eh[(o >> 2) & 1], Eh[(o >> 1) & 1]), Eh[o & 1]
                        )
                        add_single_bucket(
                            real_sel[rest[s]].astype(np.int64), par[s], M
                        )

    id_bucket = None
    if id_pairs[0]:
        id_bucket = (
            to_device(np.asarray(id_pairs[0]), jnp.int32),
            to_device(np.asarray(id_pairs[1]), jnp.int32),
        )
    irr_id = None
    if irr_id_f:
        irr_id = (
            to_device(np.asarray(irr_id_f), jnp.int32),
            to_device(np.stack(irr_id_slots), jnp.int32),
        )
    irr_patch = None
    if irr_f:
        irr_patch = (
            to_device(np.asarray(irr_f), jnp.int32),
            to_device(np.stack(irr_slots_list), jnp.int32),
        )

    # identity-across-K octant buckets.  Both directions are dense
    # whole-bucket window updates: a [NP_f]-row (src_rows) / [NP_c]-row
    # (fine_rows) gather with a zero pad row replaces any element-priced
    # volume scatter.  Octant windows are TRIMMED on their low-side shared
    # plane (delta=1 skips plane 0) so every fine slot has exactly one
    # writer in prolong, and restrict routes each masked fine contribution
    # to exactly one coarse copy (the coarse exchange completes the sums).
    id_oct = []
    id_oct_offsets = []
    id_oct_starts = []
    hot_bound = int(os.environ.get("MGTPU_HOT_BOUND", "4000000"))
    hot_ok = True  # any id_oct bucket without a routing turns this off
    for o in range(8):
        fi, ci = id_oct_groups[o]
        if not fi:
            continue
        f_arr = np.asarray(fi, np.int64)
        c_arr = np.asarray(ci, np.int64)
        src_rows = np.full(fine_fmt.n_patches, coarse_fmt.n_patches, np.int64)
        src_rows[f_arr] = c_arr
        fine_rows = np.full(coarse_fmt.n_patches, fine_fmt.n_patches, np.int64)
        assert len(np.unique(c_arr)) == len(c_arr), "coarse patch in 2 octants"
        fine_rows[c_arr] = f_arr
        hot, st = _lane_routing(
            f_arr, c_arr, coarse_fmt.n_patches, fine_fmt.n_patches,
            dtype, hot_bound,
        )
        if hot is None:
            hot_ok = False
        id_oct.append(
            (
                to_device(src_rows, jnp.int32),
                to_device(fine_rows, jnp.int32),
                hot,
            )
        )
        id_oct_starts.append(st)
        id_oct_offsets.append((o & 1, (o >> 1) & 1, (o >> 2) & 1))

    def child_rows_of(f, c):
        # one fine child per (coarse patch, octant): restrict's window update
        # inverts the map into a block-row gather (see HybridTransfer.restrict)
        assert len(np.unique(c)) == len(c), "duplicate coarse patch in octant"
        rows = np.full(coarse_fmt.n_patches, len(f), np.int64)
        rows[c] = np.arange(len(f))
        return rows

    # one-hot [NP_c, NP_f] routing matrices for the transposed transfer:
    # full below the budget, BANDED per-tile one-hots above it (Morton
    # order makes the lane map monotone — see _lane_routing)
    patch_hot = ()
    patch_hot_starts = ()
    if patch_buckets:
        hots, starts = [], []
        for f, c, off in patch_buckets:
            hot, st = _lane_routing(
                np.asarray(f, np.int64), np.asarray(c, np.int64),
                coarse_fmt.n_patches, fine_fmt.n_patches, dtype, hot_bound,
            )
            if hot is None:
                hot_ok = False
                break
            hots.append(hot)
            starts.append(st)
        else:
            patch_hot = tuple(hots)
            patch_hot_starts = tuple(starts)
    from ..utils.flags import variant_flag

    use_ttransfer = variant_flag(
        "MGTPU_TTRANSFER",
        np=fine_fmt.n_patches,
        nc=coarse_fmt.n_patches,
    )
    if not hot_ok or (patch_buckets and not patch_hot):
        use_ttransfer = False  # t-path needs the one-hot routing matrices

    tsx = None
    if (
        use_ttransfer
        and fine_op.tv is not None
        and "split" in fine_op.tv
        and fine_fmt.n_shards == 1
    ):
        from .hybrid import tv_permute_host

        ps_f = fine_fmt.n_patches * fine_fmt.S**3

        def _pvs(v):
            out = tv_permute_host(fine_op, np.asarray(v))
            return to_device(out[:ps_f], dtype), to_device(out[ps_f:], dtype)

        fck = np.asarray(fine_op.constrained_keep)
        own = np.asarray(fine_op.owner)
        rk_h, rk_t = _pvs(own if ls_mode else fck * own)
        pk_h, pk_t = _pvs(fck)
        tsx = {"rk_h": rk_h, "rk_t": rk_t, "pk_h": pk_h, "pk_t": pk_t}

    return HybridTransfer(
        tsx=tsx,
        coarse_op=coarse_op,
        fine_constrained_keep=fine_op.constrained_keep,
        fine_owner=fine_op.owner,
        E1=to_device(E1, dtype),
        patch_buckets=tuple(
            (
                to_device(f, jnp.int32),
                to_device(c, jnp.int32),
                to_device(child_rows_of(f, c), jnp.int32),
            )
            for f, c, off in patch_buckets
        ),
        patch_offsets=tuple(tuple(int(x) for x in off) for f, c, off in patch_buckets),
        id_bucket=id_bucket,
        id_oct=tuple(id_oct),
        id_oct_offsets=tuple(id_oct_offsets),
        id_oct_starts=tuple(id_oct_starts),
        irr_patch=irr_patch,
        irr_id=irr_id,
        single_buckets=tuple(
            (to_device(s, jnp.int32), to_device(src, jnp.int32), to_device(M, dtype))
            for s, src, M in single_buckets_out
        ),
        single_fast=tuple(
            (to_device(s, jnp.int32), to_device(cr, jnp.int32), to_device(M, dtype))
            for s, cr, M in single_fast_out
        ),
        S_f=fine_fmt.S,
        S_c=coarse_fmt.S,
        sub=sub,
        NP_f=fine_fmt.n_patches,
        NS_f=fine_fmt.n_singles,
        nloc_f=fd.n_loc,
        n_slots_f=fine_fmt.n_slots,
        n_slots_c=coarse_fmt.n_slots,
        D_f=fine_fmt.n_shards,
        ls_mode=ls_mode,
        patch_hot=patch_hot,
        patch_hot_starts=patch_hot_starts,
        use_ttransfer=use_ttransfer,
    )


def _lattice_cells(p: int, ncell: int, loc: np.ndarray):
    """Map (cell position in sub-block, local node) -> sub-lattice flat index."""
    sub = ncell * p + 1
    bidx = np.empty((ncell**3, 3), dtype=np.int64)
    f = np.arange(ncell**3)
    for d in range(3):
        bidx[:, d] = (f // ncell**d) % ncell
    TX = bidx[:, None, 0] * p + loc[None, :, 0]
    TY = bidx[:, None, 1] * p + loc[None, :, 1]
    TZ = bidx[:, None, 2] * p + loc[None, :, 2]
    return (TX * sub + TY) * sub + TZ, bidx  # [ncell^3, nloc]


def _sub_slots_h(fmt_f, i, mc, find_cell, cslot, loc_c, p, K, sub):
    """Irregular coarse sub-lattice slots for one fine patch (h-transfer)."""
    lvl = int(fmt_f.patch_level[i])
    blk = fmt_f.patch_block[i]
    nc = K // 2
    lat, bidx = _lattice_cells(p, nc, loc_c)
    out = np.full(sub**3, -1, dtype=np.int64)
    # coarse cells covering the fine patch: anchors blk*(K//1)... fine patch
    # spans K cells at lvl = nc cells at lvl-1 starting at blk*K//2
    base = blk * (K // 2)
    anchors = base[None, :] + bidx
    cells = find_cell(lvl - 1, anchors)
    if (cells < 0).any():
        # mixed: some regions unrefined (identity cells at lvl)
        # fall back to identity cells at lvl for the missing ones
        miss = np.nonzero(cells < 0)[0]
        raise AssertionError(
            "irregular h-transfer patch with mixed-level coarse source"
        )
    out[lat.reshape(-1)] = cslot[cells].reshape(-1)
    assert (out >= 0).all()
    return out


def _sub_slots_same_mesh(fmt_f, fmt_c, i, cslot, loc_c, p_c):
    """Irregular coarse sub-lattice for one fine patch (p-transfer with
    mismatched decompositions)."""
    K = fmt_f.K
    lvl = int(fmt_f.patch_level[i])
    lat, bidx = _lattice_cells(p_c, K, loc_c)
    sub = K * p_c + 1
    out = np.full(sub**3, -1, dtype=np.int64)
    cells = fmt_f.patch_cells[i]  # same mesh: same cell ids
    out[lat.reshape(-1)] = cslot[cells].reshape(-1)
    assert (out >= 0).all()
    return out
