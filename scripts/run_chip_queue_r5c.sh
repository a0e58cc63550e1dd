#!/bin/bash
# Round-5 chip queue C: ps-variant A/B, flagship rerun (cold+warm, new
# kernel measurement), error budget chip half, headline bench refresh.
cd /root/repo
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ===" | tee -a artifacts/chip_queue.log
  timeout "$tmo" "$@" > "artifacts/${name}.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name rc=$? ===" | tee -a artifacts/chip_queue.log
}
run bench_ps        3600 python scripts/bench_ps.py
run flagship32_cli  5400 python scripts/flagship32_cli.py
run error_budget16  3600 python scripts/error_budget16.py
run bench_check     3600 python bench.py
echo "QUEUE_R5C DONE $(date +%H:%M:%S)" | tee -a artifacts/chip_queue.log
