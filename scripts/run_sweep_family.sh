#!/bin/bash
# Run the reference's experiment family end-to-end on the local TPU chip
# (VERDICT r2 item 5).  Sequential — ONE TPU process at a time; each
# experiment is budget-limited and leaves a crash-safe results/ artifact.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() { echo "=== $(date +%H:%M:%S) $*"; timeout 7200 python experiments/run_experiment.py "$@"; }

run small-scaling quadrant --max-ref 7 --budget-s 5400 \
    --out results/small-scaling-quadrant-tpu.txt
run small-scaling annulus --max-ref 7 --budget-s 2700 \
    --out results/small-scaling-annulus-tpu.txt
run small-scaling-hypercube --max-ref 6 --budget-s 1800 \
    --out results/small-scaling-hypercube-tpu.txt
run small-scaling-gaussian --max-ref 6 --budget-s 1800 \
    --out results/small-scaling-gaussian-tpu.txt
run parameters_smoother_degree 4 5 6 --budget-s 1500 \
    --out results/parameters-smoother-degree-tpu.txt
run parameters_mgnumber 4 5 6 --budget-s 1500 \
    --out results/parameters-mgnumber-tpu.txt
run parameters_hp_amg 4 5 --budget-s 1200 \
    --out results/parameters-hp-amg-tpu.txt
echo "=== $(date +%H:%M:%S) sweep family done"
