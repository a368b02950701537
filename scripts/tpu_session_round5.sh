#!/bin/bash
# Round-5 TPU session queue (VERDICT round-4 "do this" items, value-ranked).
# ONE TPU process at a time; every step is budget-limited via `timeout` and
# leaves a crash-safe artifact (run_experiment rewrites the table after
# every config).  Sweep economics (measured round-4j): ~400-950 s per
# isolated config, size-independent — the quadrant/annulus families run
# NON-isolated so the ~96 s backend init and shared programs amortize
# (run_experiment auto-falls-back to --isolate if the TPU client dies).
#
#   0. bench.py first: validates the reworked failure path on chip, lands a
#      FRESH last-good seed, measures warm setup_time_s (target < 400 s).
#   1. quadrant small-scaling remainder (configs 1-18; 0/15/19 captured
#      round-4j under the production pipeline — 15 is the r6/p4 GC row, 14
#      (r6/p4 LS) was NOT captured and reruns here).
#   2. parameters_tolerance + parameters_weights at refs 5 6 — the two
#      families with no artifact in ANY round; heavy program sharing
#      (reltol is a traced argument; weights only change host partition).
#   3. hp-amg r=6 boomer row (config 13 of "5 6") with the spectral clamp
#      (solvers/amg.py::_lam_max_dinv_a) — replaces part2's diverged row.
#   4. annulus / hypercube / gaussian family recapture (08-17 artifacts
#      predate the production pipeline).
#   5. LS chain vs GENUINE host loop A/B (probe baseline arm now pins
#      MGTPU_LS_CHAIN=0 — the round-4 arm measured chain k0=4 by mistake).
#   6. Stokes / nsinker TPU rows (profile_stokes_tpu.py, real f64 now).
#   7. parameters smoother-degree / mgnumber recapture.
#   8. bench.py again: leaves the freshest seed + a warm compile cache for
#      the driver-time run (CLAUDE.md mandates pre-warming).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session5: $1" >> /tmp/tpu_health.log; }

if [ -f /tmp/sweep.pid ]; then
  while kill -0 "$(cat /tmp/sweep.pid)" 2>/dev/null; do sleep 20; done
fi

mark "0 bench validation + fresh seed"
timeout 3000 python bench.py > /tmp/bench_r5_first.log 2>&1

mark "1 quadrant remainder (non-isolated, skip-n 1)"
timeout 10800 python experiments/run_experiment.py small-scaling quadrant \
  --max-ref 7 --budget-s 9600 --skip-n 1 \
  --out results/small-scaling-quadrant-tpu-part2.txt \
  > /tmp/sweep_quadrant_r5.log 2>&1

mark "2a parameters_tolerance 5 6"
timeout 3600 python experiments/run_experiment.py parameters_tolerance 5 6 \
  --budget-s 3000 \
  --out results/parameters-tolerance-tpu.txt \
  > /tmp/sweep_tolerance_r5.log 2>&1

mark "2b parameters_weights 5 6"
timeout 3600 python experiments/run_experiment.py parameters_weights 5 6 \
  --budget-s 3000 \
  --out results/parameters-weights-tpu.txt \
  > /tmp/sweep_weights_r5.log 2>&1

mark "3 hp-amg r=6 boomer row (spectral clamp)"
timeout 2400 python experiments/run_experiment.py parameters_hp_amg 5 6 \
  --skip-n 13 --budget-s 2000 --isolate \
  --out results/parameters-hp-amg-trunc-tpu-part3.txt \
  > /tmp/hpamg_boomer_r5.log 2>&1

mark "4a annulus"
timeout 7200 python experiments/run_experiment.py small-scaling annulus \
  --max-ref 7 --budget-s 6600 \
  --out results/small-scaling-annulus-tpu.txt \
  > /tmp/sweep_annulus_r5.log 2>&1

mark "4b hypercube"
timeout 3600 python experiments/run_experiment.py small-scaling-hypercube \
  --max-ref 5 --budget-s 3000 \
  --out results/small-scaling-hypercube-tpu.txt \
  > /tmp/sweep_hypercube_r5.log 2>&1

mark "4c gaussian (l2_error rows)"
timeout 3600 python experiments/run_experiment.py small-scaling-gaussian \
  --max-ref 5 --budget-s 3000 \
  --out results/small-scaling-gaussian-tpu.txt \
  > /tmp/sweep_gaussian_r5.log 2>&1

mark "5 LS chain vs genuine host loop A/B"
timeout 2400 python scripts/probe_ls_chain.py 6 4 3 > /tmp/probe_ls_r5.log 2>&1

mark "6 stokes/nsinker rows (f64)"
timeout 2700 python scripts/profile_stokes_tpu.py 3 1e4 3 \
  > /tmp/stokes_tpu_r5_c4.log 2>&1
timeout 2700 python scripts/profile_stokes_tpu.py 3 1e6 3 \
  > /tmp/stokes_tpu_r5_c6.log 2>&1

mark "7 smoother-degree + mgnumber recapture"
timeout 3600 python experiments/run_experiment.py parameters_smoother_degree 4 5 6 \
  --budget-s 3000 \
  --out results/parameters-smoother-degree-tpu.txt \
  > /tmp/sweep_smoother_r5.log 2>&1
timeout 3600 python experiments/run_experiment.py parameters_mgnumber 4 5 6 \
  --budget-s 3000 \
  --out results/parameters-mgnumber-tpu.txt \
  > /tmp/sweep_mgnumber_r5.log 2>&1

mark "8 bench re-warm + freshest seed"
timeout 3000 python bench.py > /tmp/bench_r5_last.log 2>&1

mark "done"
