#!/bin/bash
# Round-3d TPU measurement session (run ONCE the axon service is healthy;
# ONE TPU process at a time — do not run anything else on the chip).
#
# Phase A: decide the lane-dense variant flags (DESIGN.md round-3c) at
# bench scale, attribute the LS V-cycle, and time the df32 row.
# Outputs append to /tmp/measure3d.log; read it, set
# utils/flags.py::DEFAULT_POLICY from the winners, re-run profile_r7.py to
# confirm, then bench.py (which also warms the cache for the driver).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/measure3d.log
echo "=== $(date) lattice microbench L7 shape (NP=512) ===" >> $LOG
timeout 3600 python scripts/microbench_lattice.py 512 33 7854 5 >> $LOG 2>&1
echo "=== $(date) components probe r=7/p=4 ===" >> $LOG
timeout 9000 python scripts/profile_r7_components.py 7 4 >> $LOG 2>&1
echo "=== $(date) LS V-cycle probe r=6/p=4 ===" >> $LOG
timeout 5400 python scripts/profile_ls_r6.py 6 4 >> $LOG 2>&1
echo "=== $(date) phase A done ===" >> $LOG
