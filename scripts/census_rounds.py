"""Round structure + bucket residency census for the apply_c/ct_faces
pipeline at bench scale — the follow-up to census_tables.py that decides
the round-4h restructure:

* sf_c_rounds / sf_ct_rounds — each round costs one volume-sized
  .at[].set/add (~0.39 ms at r=7/p=4) regardless of how few elements it
  moves, so the ROUND COUNT is a first-order cost.
* residency of the singleton-face tables (face and src) in the singleton
  tail (slots >= NP*S^3): if whole levels live in the tail, their
  scatters can run on the 4 MB tail instead of the 78 MB volume.
* the level-7 patch src plane-coordinate distribution: how many distinct
  (axis, plane) strided slabs would cover the coarse-side reads.

Host-only. Usage: python scripts/census_rounds.py [r] [p]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence

    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    for li in (len(plan) - 1, len(plan) - 2):
        m, d = plan[li]
        lev = api.build_level_hybrid(m, d, np.float32)
        op = lev.op
        ps = op.NP * op.S**3
        print(f"--- L{li}: NP={op.NP} NS={op.NS} S={op.S} n_slots={op.n_slots} "
              f"patch_slots={ps} tail={op.n_slots - ps}")
        print(f"  sf_levels     {op.sf_levels}")
        print(f"  sf_c_rounds   {op.sf_c_rounds}")
        print(f"  sf_ct_rounds  {op.sf_ct_rounds}")
        for i, lv in enumerate(op.sf_levels):
            for name, tbl in (("patch", op.sf_patch[i]), ("single", op.sf_single[i])):
                if tbl is None:
                    continue
                face = np.asarray(tbl[0])
                src = np.asarray(tbl[1])
                f_tail = float((face >= ps).mean())
                s_tail = float((src >= ps).mean())
                print(f"  sf level {lv} [{name}]: n={face.shape[0]} "
                      f"face_in_tail={f_tail:.2f} src_in_tail={s_tail:.2f}")
                if name == "patch":
                    # distinct strided-plane classes of the src table: a src
                    # row [sub, sub] is a plane of the T-lattice iff its flat
                    # ids decompose as base + a*S + b with one fixed axis.
                    # classify by (delta pattern)
                    d01 = src[:, 0, 1] - src[:, 0, 0]
                    d10 = src[:, 1, 0] - src[:, 0, 0]
                    uniq = np.unique(np.stack([d01, d10], 1), axis=0)
                    print(f"    src stride classes: {len(uniq)} -> {uniq[:8].tolist()}")
                    # how many rows are single-patch planes (all ids within
                    # one patch's S^3 block)?
                    if op.NP:
                        pid0 = src // (op.S**3)
                        same = (pid0 == pid0[:, :1, :1]).all(axis=(1, 2))
                        print(f"    src rows within ONE patch block: {same.mean():.2f}")


if __name__ == "__main__" and not (len(sys.argv) > 3 and sys.argv[3] == "irr"):
    main()


def irr_residency():
    """Residency of the irregular-exchange tables (slots gathered, outs
    written) in head vs tail at the fine level."""
    import sys
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    m, d = plan[-1]
    lev = api.build_level_hybrid(m, d, np.float32)
    op = lev.op
    ps = op.NP * op.S**3
    for slots, outs, grp in op.irr_buckets:
        s = np.asarray(slots)
        o = np.asarray(outs)
        print(f"  irr bucket s={s.shape}: slots_in_tail={(s >= ps).mean():.2f} "
              f"outs_in_tail={(o >= ps).mean():.2f}")


if __name__ == "__main__" and len(sys.argv) > 3 and sys.argv[3] == "irr":
    irr_residency()
