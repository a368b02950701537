#!/bin/bash
# Round-5 session part 2 — replaces the tail of tpu_session_round5.sh when
# wall clock forces triage (launched manually after the weights step).
# Order = VERDICT value rank: the advisor's genuine host-loop A/B, the
# hp-amg diverged-row replacement, the Stokes/nsinker TPU rows, the r=8
# banded-routing probe, the final bench (fresh seed + warm cache for the
# driver-time run).  Everything budget-limited; all artifacts crash-safe.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session5b: $1" >> /tmp/tpu_health.log; }

mark "b1 LS chain vs genuine host loop A/B"
timeout 2400 python scripts/probe_ls_chain.py 6 4 3 > /tmp/probe_ls_r5.log 2>&1

# (b2 hp-amg boomer row: already captured by session part 1 step 3 —
# results/parameters-hp-amg-trunc-tpu-part3.txt, 8 its converged)

mark "b3 stokes/nsinker rows (f64, FGMRES)"
timeout 2100 python scripts/profile_stokes_tpu.py 3 1e4 3 \
  > /tmp/stokes_tpu_r5_c4.log 2>&1
timeout 2100 python scripts/profile_stokes_tpu.py 3 1e6 3 \
  > /tmp/stokes_tpu_r5_c6.log 2>&1

mark "b4 r=8/p=4 single-chip probe (banded lane routing)"
# MGTPU_HOT_BOUND=2000000 bands the [512, 4096] finest-pair routing
# (67 MB / 165 GFLOP full -> ~9 MB / ~24 GFLOP banded); the r=8 HBM
# shortfall was 658 MB in round 4f, so every volume-adjacent MB counts.
MGTPU_HOT_BOUND=2000000 timeout 4200 python scripts/probe_r8_solve.py 8 4 \
  > /tmp/probe_r8_r5.log 2>&1

mark "b5 final bench (fresh seed + driver-time warm cache)"
timeout 2400 python bench.py > /tmp/bench_r5_last.log 2>&1

mark "b6 gaussian l2 rows (if time remains)"
timeout 2400 python experiments/run_experiment.py small-scaling-gaussian \
  --max-ref 5 --budget-s 2000 \
  --out results/small-scaling-gaussian-tpu.txt \
  > /tmp/sweep_gaussian_r5.log 2>&1

mark "b7 large_scaling_hp first-ever artifact (refs 4-5, 5 variants each)"
timeout 2700 python experiments/run_experiment.py large_scaling_hp \
  --max-ref 5 --budget-s 2400 \
  --out results/large-scaling-hp-tpu.txt \
  > /tmp/sweep_lshp_r5.log 2>&1

mark "b8 annulus refresh r<=6 (if time remains)"
timeout 3000 python experiments/run_experiment.py small-scaling annulus \
  --max-ref 6 --budget-s 2700 \
  --out results/small-scaling-annulus-tpu-r5.txt \
  > /tmp/sweep_annulus_r5.log 2>&1

mark "b9 hypercube refresh r<=5 (if time remains)"
timeout 2400 python experiments/run_experiment.py small-scaling-hypercube \
  --max-ref 5 --budget-s 2100 \
  --out results/small-scaling-hypercube-tpu-r5.txt \
  > /tmp/sweep_hypercube_r5.log 2>&1

mark "b-done"
