#!/bin/bash
# Chained watcher: waits for the r5b batch to finish (its done marker),
# then fires tool/r5c_measure.sh at the first healthy window under the
# shared host lock. Launch detached:
#   setsid bash tool/r5c_watch.sh >> /tmp/r5c_watch.log 2>&1 < /dev/null &
# Stop: kill $(cat /tmp/r5c_watch.pid)
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5c_watch.pid
while true; do
  if [ -f /tmp/r5c_watch_done ]; then echo "watch: done marker present, exiting"; exit 0; fi
  if [ ! -f /tmp/r5b_watch_done ]; then
    echo "$(date -u +%FT%TZ) watch: r5b still running, sleeping"
    sleep 120; continue
  fi
  if timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) watch: tunnel healthy, firing r5c measure batch (with host lock)"
    if flock /tmp/align3r_host.lock bash tool/r5c_measure.sh; then
      echo "$(date -u +%FT%TZ) watch: R5C BATCH DONE"
      touch /tmp/r5c_watch_done
      exit 0
    fi
    echo "$(date -u +%FT%TZ) watch: batch incomplete (wedge mid-run?), will retry remaining stages"
  else
    echo "$(date -u +%FT%TZ) watch: tunnel wedged, sleeping"
  fi
  sleep 300
done
