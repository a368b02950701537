#!/bin/bash
# Round-4b TPU session — the phases still pending after the tv/KADAPT/
# TCFACES winners landed (run ONCE the axon service is healthy; ONE TPU
# process at a time).  Most-decision-grade first:
#   A. bench A/B: monolithic while_loop CG vs depth-1-pipelined host
#      loop on the SAME config (the ~45 ms/it monolithic overhead)
#      -> /tmp/bench_default.log /tmp/bench_hostloop.log
#      (if host loop wins >=5%, flip the default in api.py:1125 region)
#   B. LS throughput at r=6/p=4 under KADAPT (the LS/GC gap after the
#      adaptive-K hierarchy) -> /tmp/ls_kadapt.log
#   C. truncated hp-amg rerun: the 2 crashed + 5 budget-skipped configs
#      of results/parameters-hp-amg-trunc-tpu.txt
#   D. profile_ls_r6 attribution if B still shows >1.5x vs GC
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4b: $1" >> /tmp/tpu_health.log; }

mark "A default bench"
timeout 3600 python bench.py > /tmp/bench_default.log 2>&1
mark "A host-loop bench"
MGTPU_GC_HOST_LOOP=1 timeout 3600 python bench.py > /tmp/bench_hostloop.log 2>&1
mark "A done"

mark "B LS r=6/p=4"
cat > /tmp/cfg_ls_r6.json <<'EOF'
{"Type": "HMG-local", "GeometryType": "quadrant", "NRefGlobal": 6,
 "Degree": 4, "CoarseGridSolverType": "amg", "SmootherDegree": 3,
 "RelativeTolerance": 1e-4, "MGNumberType": "float", "NumberType": "float",
 "NRepetitions": 5, "Verbosity": 1}
EOF
timeout 5400 python -m dealii_multigrid_tpu.cli /tmp/cfg_ls_r6.json \
  > /tmp/ls_kadapt.log 2>&1
echo "rc=$?" >> /tmp/ls_kadapt.log
mark "B done"

mark "C hp-amg rerun"
(
  cd experiments
  timeout 10800 python run_experiment.py --isolate --budget-s 9000 \
    --out ../results/parameters-hp-amg-trunc-tpu.txt parameters_hp_amg 5 6 \
    > /tmp/hpamg_rerun.log 2>&1
  echo "rc=$?" >> /tmp/hpamg_rerun.log
)
mark "C done"

mark "session4b done"
