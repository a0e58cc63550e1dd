#!/bin/bash
# Round-5 chip queue A: land the two missing flagship artifacts first
# (VERDICT items 1 and 4), cold XLA cache this round so budget generous
# timeouts.  Later queues re-run flagship + bench after the contraction
# rework.
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ===" | tee -a artifacts/chip_queue.log
  timeout "$tmo" "$@" > "artifacts/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ===" | tee -a artifacts/chip_queue.log
}
run time_mg32   7200 python scripts/time_mg32.py
run stoch32     4800 python scripts/stoch32.py
echo "QUEUE_R5A DONE $(date +%H:%M:%S)" | tee -a artifacts/chip_queue.log
