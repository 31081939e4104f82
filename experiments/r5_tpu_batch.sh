#!/bin/bash
# Round-5 TPU measurement queue: run when the tunnel recovers.
# Each step stamps tunnel health; results append to experiments/results.jsonl
# and /tmp/r5_batch.log. Never run alongside another TPU process.
set -u
cd /root/repo
LOG=/tmp/r5_batch.log
echo "=== r5 batch $(date) ===" >> $LOG

probe() {
  timeout 120 python -c "
import sys; sys.path.insert(0,'experiments')
from _health import tunnel_probe_s
print(tunnel_probe_s())" 2>/dev/null | tail -1
}

# Wait for a healthy window (up to ~50 min)
for i in $(seq 1 25); do
  P=$(probe)
  echo "probe attempt $i: ${P:-DOWN}" >> $LOG
  if [ -n "$P" ] && python -c "exit(0 if float('$P') < 0.3 else 1)" 2>/dev/null; then
    break
  fi
  sleep 120
done

echo "--- bench spp64 $(date) ---" >> $LOG
timeout 580 python bench.py >> $LOG 2>/dev/null

echo "--- bench spp1000 $(date) ---" >> $LOG
BENCH_SPP=1000 BENCH_REPS=1 timeout 580 python bench.py >> $LOG 2>/dev/null

echo "--- nif flush sweep (spheres) $(date) ---" >> $LOG
timeout 580 python experiments/nif_flush_sweep.py every=1,4,16 count=0,128 >> $LOG 2>&1

echo "--- nif flush sweep (box interior) $(date) ---" >> $LOG
timeout 580 python experiments/nif_flush_sweep.py every=4,16 count=0,128,256 scene=box size=256 spp=16 >> $LOG 2>&1

echo "--- hbm 2.09M attribution probes $(date) ---" >> $LOG
for PR in "" "probe=scan" "probe=refine" "probe=dense" "probe=gate" "probe=dma"; do
  timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 $PR >> $LOG 2>&1
done

echo "--- hbm 2.09M cull3 A/B $(date) ---" >> $LOG
RAY_HBM_CULL3=1 timeout 580 python experiments/hbm_sweep.py grid=1024 rf=64 >> $LOG 2>&1

echo "=== r5 batch done $(date) ===" >> $LOG
