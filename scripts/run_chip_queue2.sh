#!/bin/bash
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ===" | tee -a artifacts/chip_queue.log
  timeout "$tmo" "$@" > "artifacts/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ===" | tee -a artifacts/chip_queue.log
}
run time_mg32   4800 python scripts/time_mg32.py
run stoch32     3000 python scripts/stoch32.py
run overhead32  3000 python scripts/overhead32.py
echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a artifacts/chip_queue.log
