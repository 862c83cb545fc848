#!/bin/bash
# Round-5 verify-kernel config sweep (headline ECDSA verifies/s).
cd /root/repo
for cfg in "4096 2" "2048 1" "2048 2" "4096 1" "4096 4" "8192 2"; do
  set -- $cfg
  echo "=== tb=$1 pairs=$2 ===" >> /tmp/sweep.log
  SECP_TPU_TB=$1 SECP_TPU_PAIRS=$2 SECP_TPU_BENCH_FAST=1 \
    timeout 1200 python bench.py >> /tmp/sweep.log 2>/dev/null \
    || echo "FAILED rc=$?" >> /tmp/sweep.log
done
echo SWEEP-DONE >> /tmp/sweep.log
