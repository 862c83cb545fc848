#!/bin/bash
# Round-5: fresh-cache dryrun_multichip(8) timing series (VERDICT r4 #6:
# p95 evidence, >= 5 runs).  Uses a throwaway compile cache per run so
# the shared cache (and the driver's warm path) is untouched.
cd /root/repo
N=${1:-5}
rm -f /tmp/dryrun_p95.log
for i in $(seq 1 $N); do
  CACHE=$(mktemp -d /tmp/secp_cache_XXXX)
  T0=$SECONDS
  SECP_TPU_CACHE_DIR=$CACHE JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    timeout 900 python __graft_entry__.py >> /tmp/dryrun_p95.log 2>&1
  RC=$?
  echo "run $i: $((SECONDS - T0)) s rc=$RC" >> /tmp/dryrun_p95.log
  rm -rf $CACHE
done
echo P95-DONE >> /tmp/dryrun_p95.log
