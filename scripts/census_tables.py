"""Census of the irregular-table sizes that price apply_c / apply_ct_faces /
exchange at bench scale (r=7/p=4) — the element-gather/scatter populations
the round-4 probe shows dominating the L7 vmult (4.9 + 7.4 + 2.7 ms of the
26.5 ms all-variants apply).

Host-only (format build); no TPU needed.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/census_tables.py [r] [p]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import time

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    for li in (len(plan) - 1, len(plan) - 2):
        m, d = plan[li]
        lev = api.build_level_hybrid(m, d, np.float32)
        op = lev.op
        print(f"--- L{li}: slots={op.n_slots} NP={op.NP} NS={op.NS} "
              f"S={op.S} cross={op.use_cross} ({time.time()-t0:.0f}s)")
        # apply_c / apply_ct per-node tables
        print(f"  slave_rep          {np.asarray(op.slave_rep).shape}")
        print(f"  slave_master_slots {np.asarray(op.slave_master_slots).shape}")
        print(f"  slave_all_slots    {np.asarray(op.slave_all_slots).shape}")
        print(f"  ct_target          {np.asarray(op.ct_target).shape}")
        print(f"  refresh_slots      {np.asarray(op.refresh_slots).shape}")
        # structured faces per level
        for i, lev_id in enumerate(op.sf_levels):
            n_p = 0 if op.sf_patch[i] is None else op.sf_patch[i][0].shape
            n_s = 0 if op.sf_single[i] is None else op.sf_single[i][0].shape
            src_p = 0 if op.sf_patch[i] is None else op.sf_patch[i][1].shape
            src_s = 0 if op.sf_single[i] is None else op.sf_single[i][1].shape
            print(f"  sf level {lev_id}: patch face {n_p} src {src_p} "
                  f"| single face {n_s} src {src_s}")
        # scatter/gather element volume of ct_faces per level
        tot_gather = tot_scatter = 0
        for i in range(len(op.sf_levels)):
            if op.sf_patch[i] is not None:
                face, src, _ = op.sf_patch[i]
                tot_gather += int(np.prod(face.shape))
                tot_scatter += int(np.prod(src.shape))
            if op.sf_single[i] is not None:
                face, src, _m, _pa, _pb = op.sf_single[i]
                tot_gather += int(np.prod(face.shape))
                tot_scatter += int(np.prod(src.shape))
        print(f"  ct_faces element volume: gather {tot_gather} scatter {tot_scatter}")
        # irregular exchange buckets
        for slots, out_slots, out_group in op.irr_buckets:
            print(f"  irr bucket: slots {np.asarray(slots).shape} "
                  f"out {np.asarray(out_slots).shape}")
        # contiguity analysis of the dominant face tables: are the flat slot
        # ids of a face row a contiguous run (block-row gatherable)?
        for i in range(len(op.sf_levels)):
            if op.sf_patch[i] is None:
                continue
            face = np.asarray(op.sf_patch[i][0])  # [n, S, S]
            d = np.diff(face, axis=-1)
            contig = (d == 1).all(axis=-1)
            print(f"  sf level {op.sf_levels[i]}: patch-face rows contiguous "
                  f"{contig.mean():.2f} (n={face.shape[0]})")
            src = np.asarray(op.sf_patch[i][1])
            ds = np.diff(src, axis=-1)
            contig_s = (ds == 1).all(axis=-1)
            print(f"    src rows contiguous {contig_s.mean():.2f}")
        if op.sf_levels and op.sf_single[0] is not None:
            pass


if __name__ == "__main__":
    main()
