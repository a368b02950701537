"""Transfer variants at bench scale: restrict/prolong L7<->L6, base vs
use_ttransfer (transposed lane-dense interpolation chain).

Usage: PYTHONPATH=... python scripts/profile_r7_transfer.py [r] [p]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from profile_r7 import timeit_looped  # noqa: E402  (same loop-in-jit harness)


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from dealii_multigrid_tpu import api
    from dealii_multigrid_tpu.mesh import generators
    from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
    from dealii_multigrid_tpu.ops.hybrid_transfer import make_hybrid_transfer

    t0 = time.time()
    mesh = generators.create("quadrant", 3, r, 0)
    tri_seq = geometric_coarsening_sequence(mesh)
    plan = api.gc_level_plan("HMG-global", tri_seq, p)
    lc = api.build_level_hybrid(*plan[-2], jnp.float32)
    lf = api.build_level_hybrid(*plan[-1], jnp.float32)
    tr = make_hybrid_transfer(lf.fmt, lc.fmt, lf.op, lc.op, jnp.float32)
    print(f"setup {time.time()-t0:.1f}s  patch_hot={len(tr.patch_hot)}",
          flush=True)

    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.standard_normal(lc.op.n_slots), jnp.float32)
    rf = jnp.asarray(rng.standard_normal(lf.op.n_slots), jnp.float32)
    for name, t in (("base", tr),
                    ("ttransfer", dataclasses.replace(tr, use_ttransfer=True))):
        tt, _cs = timeit_looped(lambda o, v: o.restrict(v), t, rf, n_loop=8)
        print(f"  restrict[{name:9s}] {tt*1e3:8.3f} ms", flush=True)
        tt, _cs = timeit_looped(lambda o, v: o.prolong(v), t, uc, n_loop=8)
        print(f"  prolong [{name:9s}] {tt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
