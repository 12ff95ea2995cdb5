#!/bin/bash
# Supervised on-chip IVF recall run (VERDICT r3 item 3). The axon
# remote-compile service dies/hangs sporadically (docs/DEVELOPMENT.md); the
# --prep-cache makes a retry skip the ~30 min table/k-means prep.
cd /root/repo
for i in 1 2 3; do
  echo "=== attempt $i $(date +%H:%M:%S) ===" >> bench_r4/ivf_recall.stderr
  timeout 4500 python scripts/ivf_recall.py --sizes 300000 1000000 --dim 768 \
    --prep-cache bench_r4/ivfprep \
    >> bench_r4/ivf_recall.jsonl 2>> bench_r4/ivf_recall.stderr
  rc=$?
  echo "=== attempt $i rc=$rc ===" >> bench_r4/ivf_recall.stderr
  [ $rc -eq 0 ] && break
  sleep 60
done
echo "supervisor done rc=$rc" >> bench_r4/ivf_recall.stderr
