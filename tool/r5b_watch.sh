#!/bin/bash
# Detached watcher: polls tunnel health and fires tool/r5b_measure.sh at
# the first healthy window. Launch detached:
#   setsid bash tool/r5b_watch.sh >> /tmp/r5b_watch.log 2>&1 < /dev/null &
# Stop: kill $(cat /tmp/r5b_watch.pid)
#
# Holds the advisory host lock (/tmp/align3r_host.lock, shared with
# __graft_entry__._HostLock) for the duration of the measure batch so the
# driver's virtual-8-device CPU dryrun never overlaps a CPU-hungry
# measurement run. Health probes run OUTSIDE the lock.
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5b_watch.pid
while true; do
  if [ -f /tmp/r5b_watch_done ]; then echo "watch: done marker present, exiting"; exit 0; fi
  if timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) watch: tunnel healthy, firing r5b measure batch (with host lock)"
    if flock /tmp/align3r_host.lock bash tool/r5b_measure.sh; then
      echo "$(date -u +%FT%TZ) watch: R5B BATCH DONE"
      touch /tmp/r5b_watch_done
      exit 0
    fi
    echo "$(date -u +%FT%TZ) watch: batch incomplete (wedge mid-run?), will retry remaining stages"
  else
    echo "$(date -u +%FT%TZ) watch: tunnel wedged, sleeping"
  fi
  sleep 300
done
