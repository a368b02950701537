#!/bin/bash
# Round-4 TPU session (run ONCE the axon service is healthy; ONE TPU
# process at a time).  Produces the measurements that gate the round's
# perf deliverables, most-decision-grade first so a short service window
# still yields the flag winners:
#   A. in-context variant probes (components r=7/p=4, LS r=6/p=4,
#      lattice microbench) -> /tmp/measure3d.log
#      (-> set utils/flags.py DEFAULT_POLICY from the winners, confirm
#       with scripts/profile_r7.py, re-run bench.py for the headline)
#   C. Pallas stencil probe at bench shapes -> /tmp/pallas_probe.log
#   E. bench refresh under current defaults (outage insurance)
#   B. monolithic-LS retry at r=6/p=4 (the floor-aware guard raises on a
#      miscompile instead of returning it) -> /tmp/ls_monolithic.log
#   D. truncated hp-amg sweep -> results/parameters-hp-amg-trunc-tpu.txt
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session: $1" >> /tmp/tpu_health.log; }

LOG=/tmp/measure3d.log
mark "phase A start"
echo "=== $(date) components probe r=7/p=4 ===" >> $LOG
timeout 9000 python scripts/profile_r7_components.py 7 4 >> $LOG 2>&1
mark "components probe done"
echo "=== $(date) LS V-cycle probe r=6/p=4 ===" >> $LOG
timeout 5400 python scripts/profile_ls_r6.py 6 4 >> $LOG 2>&1
mark "LS probe done"
echo "=== $(date) lattice microbench L7 shape (NP=512) ===" >> $LOG
timeout 3600 python scripts/microbench_lattice.py 512 33 7854 5 >> $LOG 2>&1
echo "=== $(date) phase A done ===" >> $LOG
mark "phase A done"

# C. pallas probe at the bench S=33 shape
echo "=== $(date) pallas stencil probe ===" > /tmp/pallas_probe.log
timeout 1800 python - >> /tmp/pallas_probe.log 2>&1 <<'PYEOF'
import time
import jax, jax.numpy as jnp, numpy as np
from dealii_multigrid_tpu.ops import pallas_stencil as PS

for S, NP in ((33, 512), (9, 4096)):
    ok = PS.available(S)
    print(f"S={S}: available={ok}", flush=True)
    if not ok:
        print(f"  probe error: {PS.probe_errors.get(S)}", flush=True)
        continue
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NP, S**3)), jnp.float32)
    KS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    MS = jnp.asarray(rng.standard_normal((S, S)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(NP), jnp.float32)
    def run(n):
        def f(x):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                x = PS.patch_stencil_pallas(x * (1 + 1e-30 * acc), KS, MS, sc, S)
                acc = acc + x.ravel()[0]
            return x, acc
        g = jax.jit(f)
        r = g(x); float(r[1])
        t0 = time.perf_counter(); r = g(x); float(r[1])
        return time.perf_counter() - t0
    t1, t2 = run(4), run(8)
    print(f"S={S} NP={NP}: {(t2-t1)/4*1e3:.3f} ms/apply", flush=True)
PYEOF
mark "pallas probe done"

# E. bench fallback: refresh the last-good measurement under CURRENT
# defaults so a later outage cannot leave the round without a fresh
# driver-visible number.  (The flag winners from phase A are applied
# manually afterwards and bench re-run for the headline.)
if [ ! -e /tmp/skip_bench_fallback ]; then
  timeout 5400 python bench.py > /tmp/bench_fallback.log 2>&1
  echo "bench rc=$?" >> /tmp/bench_fallback.log
fi
mark "bench refresh done"

# B. monolithic-LS retry (guard-protected)
cat > /tmp/cfg_ls_mono.json <<'EOF'
{"Type": "HMG-local", "GeometryType": "quadrant", "NRefGlobal": 6,
 "Degree": 4, "CoarseGridSolverType": "amg", "SmootherDegree": 3,
 "RelativeTolerance": 1e-4, "MGNumberType": "float", "NumberType": "float",
 "NRepetitions": 3}
EOF
echo "=== $(date) monolithic LS retry r=6/p=4 ===" > /tmp/ls_monolithic.log
MGTPU_LS_MONOLITHIC=1 timeout 5400 python -m dealii_multigrid_tpu.cli \
  /tmp/cfg_ls_mono.json >> /tmp/ls_monolithic.log 2>&1
echo "rc=$?" >> /tmp/ls_monolithic.log
echo "=== $(date) host-loop LS baseline (same config) ===" >> /tmp/ls_monolithic.log
timeout 5400 python -m dealii_multigrid_tpu.cli /tmp/cfg_ls_mono.json \
  >> /tmp/ls_monolithic.log 2>&1
mark "LS retry done"

# D. hp-amg at a discriminating scale (VERDICT weak #7): the regenerated
# parameters_hp_amg.py adds MinLevel-truncated variants (volume-scale
# coarse problem) so the AMG flavours / n_cycles separate.
(
  cd experiments
  timeout 7200 python run_experiment.py --isolate \
    --out ../results/parameters-hp-amg-trunc-tpu.txt parameters_hp_amg 5 6 \
    > /tmp/hpamg_tpu.log 2>&1
  echo "rc=$?" >> /tmp/hpamg_tpu.log
)
mark "hp-amg sweep done"

echo "=== $(date) round-4 session phases done ==="
