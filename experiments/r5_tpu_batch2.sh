#!/bin/bash
# Round-5 TPU batch 2: 2.09M gate/dma probes, cull3 A/B, 8.38M ladder
# re-attribution, NIF spheres sweep re-run, e2e phase probe.
set -u
cd /root/repo
LOG=/tmp/r5_batch2.log
echo "=== r5 batch2 $(date) ===" >> $LOG

probe() {
  timeout 120 python -c "
import sys; sys.path.insert(0,'experiments')
from _health import tunnel_probe_s
print(tunnel_probe_s())" 2>/dev/null | tail -1
}

for i in $(seq 1 60); do
  P=$(probe)
  echo "probe attempt $i: ${P:-DOWN}" >> $LOG
  if [ -n "$P" ] && python -c "exit(0 if float('$P') < 0.3 else 1)" 2>/dev/null; then
    break
  fi
  sleep 120
done

echo "--- e2e phase probe $(date) ---" >> $LOG
timeout 580 python experiments/e2e_phase_probe.py >> $LOG 2>&1

echo "--- nif flush sweep (spheres, retry) $(date) ---" >> $LOG
BENCH_REPS=3 timeout 580 python experiments/nif_flush_sweep.py every=1,4 count=0 >> $LOG 2>&1

echo "--- 2.09M cull3 A/B $(date) ---" >> $LOG
timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 >> $LOG 2>&1
RAY_HBM_CULL3=1 timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 >> $LOG 2>&1

echo "--- 2.09M gate/dma probes $(date) ---" >> $LOG
timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 probe=gate >> $LOG 2>&1
timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 probe=dma >> $LOG 2>&1

echo "--- 8.38M base + probes + cull3 $(date) ---" >> $LOG
for ARGS in "" "probe=scan" "probe=dense" "probe=dma"; do
  timeout 580 python experiments/hbm_sweep.py grid=2048 rf=64 $ARGS >> $LOG 2>&1
done
RAY_HBM_CULL3=1 timeout 580 python experiments/hbm_sweep.py grid=2048 rf=64 >> $LOG 2>&1

echo "=== r5 batch2 done $(date) ===" >> $LOG
