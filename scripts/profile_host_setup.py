import sys, time, os
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np

r = int(sys.argv[1]) if len(sys.argv) > 1 else 7
p = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from dealii_multigrid_tpu import api
from dealii_multigrid_tpu.mesh import generators
from dealii_multigrid_tpu.mesh.coarsening import geometric_coarsening_sequence
from dealii_multigrid_tpu.mesh.dof import distribute_dofs, make_hanging_node_constraints
from dealii_multigrid_tpu.ops import hybrid as _hy
from dealii_multigrid_tpu.ops.operator import compute_diagonal

t0 = time.perf_counter()
mesh = generators.create("quadrant", 3, r, 0)
print(f"mesh gen: {time.perf_counter()-t0:.2f}s  n_cells={mesh.n_cells}", flush=True)
t0 = time.perf_counter()
tri_seq = geometric_coarsening_sequence(mesh)
print(f"coarsening seq: {time.perf_counter()-t0:.2f}s  levels={len(tri_seq)}", flush=True)
plan = api.gc_level_plan("HMG-global", tri_seq, p)
tot = {"dofs":0.0,"hang":0.0,"fmt":0.0,"diag":0.0}
for i,(m,d) in enumerate(plan):
    t0=time.perf_counter(); dofh = distribute_dofs(m, d); t1=time.perf_counter()
    hanging = make_hanging_node_constraints(dofh); t2=time.perf_counter()
    fmt = _hy.build_hybrid_format(dofh, K=8); t3=time.perf_counter()
    diag = compute_diagonal(dofh, hanging); t4=time.perf_counter()
    print(f"L{i} d={d} cells={m.n_cells:>9} dofs={dofh.n_dofs:>10}: dofs {t1-t0:6.2f}  hang {t2-t1:6.2f}  fmt {t3-t2:6.2f}  diag {t4-t3:6.2f}", flush=True)
    tot["dofs"]+=t1-t0; tot["hang"]+=t2-t1; tot["fmt"]+=t3-t2; tot["diag"]+=t4-t3
print("TOTALS:", {k: round(v,2) for k,v in tot.items()}, flush=True)
