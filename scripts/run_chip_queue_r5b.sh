#!/bin/bash
# Round-5 chip queue B: re-run the two flagship artifacts with the fixes
# (MG env freed before measurement + kernel-layout pallas measurement;
# stochastic trace contraction jitted via the pallas contraction kernel).
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ===" | tee -a artifacts/chip_queue.log
  timeout "$tmo" "$@" > "artifacts/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ===" | tee -a artifacts/chip_queue.log
}
run time_mg32   5400 python scripts/time_mg32.py
run stoch32     4200 python scripts/stoch32.py
echo "QUEUE_R5B DONE $(date +%H:%M:%S)" | tee -a artifacts/chip_queue.log
