#!/bin/bash
# Supervised on-chip IVF recall/latency sweep (VERDICT r4 item 2): put
# recall and ms/chunk on the SAME operating points, at 1M x 768,
# nlist=16000, probes=120, correlated chunk queries.
#   pass 1: balanced layouts (lcap 64..512) + untruncated (lcap 0)
#   pass 2: legacy TRUNCATING layouts at lcap 64/512 (the round-4 mismatch,
#           kept for the before/after record)
#   pass 3: adversarial random queries at the shipped point (balanced 64)
# The axon remote-compile service dies/hangs sporadically
# (docs/DEVELOPMENT.md); --prep-cache + the truth cache make retries cheap.
cd /root/repo
run () {
  for i in 1 2 3; do
    echo "=== $* attempt $i $(date +%H:%M:%S) ===" >> bench_r5/ivf_sweep.stderr
    timeout 5400 python scripts/ivf_recall.py --sizes 1000000 --dim 768 \
      --prep-cache bench_r4/ivfprep "$@" \
      >> bench_r5/ivf_sweep.jsonl 2>> bench_r5/ivf_sweep.stderr
    rc=$?
    echo "=== rc=$rc ===" >> bench_r5/ivf_sweep.stderr
    [ $rc -eq 0 ] && return 0
    sleep 30
  done
  return $rc
}
run --probes 120 --lcap 64 128 256 512 0 --balance --labels correlated
run --probes 120 --lcap 64 512 --labels correlated
run --probes 120 --lcap 64 --balance --labels random
echo "sweep done" >> bench_r5/ivf_sweep.stderr
