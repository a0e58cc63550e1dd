#!/bin/bash
# Serial TPU job queue for the round-4 artifacts. Each job has its own
# timeout and log; a failure does not stop the queue.
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ===" | tee -a artifacts/chip_queue.log
  timeout "$tmo" "$@" > "artifacts/${name}.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] $name rc=$rc ===" | tee -a artifacts/chip_queue.log
}

run probe_mg_split_mgs    1500 python scripts/probe_mg32_onchip.py split_mgs
run probe_mg_split_term   1500 python scripts/probe_mg32_onchip.py split_term
run probe_mg_kernel_to_rc 1200 python scripts/probe_mg32_onchip.py kernel_to_rc
run time_mg32             4200 python scripts/time_mg32.py
run flagship32_cli        3600 python scripts/flagship32_cli.py
run stoch32               3000 python scripts/stoch32.py
run probe_aot             1800 python scripts/probe_aot.py
run probe_streams32       2400 python scripts/probe_streams32.py
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a artifacts/chip_queue.log
