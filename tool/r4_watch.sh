#!/bin/bash
# Detached watcher: polls tunnel health and fires tool/r4_measure.sh at the
# first healthy window. Lives in the repo (a /tmp copy died with a container
# restart and cost a day of watching). Launch detached:
#   setsid bash tool/r4_watch.sh >> /tmp/r4_watch.log 2>&1 < /dev/null &
# Stop: kill $(cat /tmp/r4_watch.pid)
# Only ONE process may use the chip: while this is live, do not run TPU work
# by hand (the probe grabs the chip for <90 s every 5 min; the measure batch
# holds it for up to ~4 h).
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_watch.pid
while true; do
  if [ -f /tmp/r4_watch_done ]; then echo "watch: done marker present, exiting"; exit 0; fi
  if timeout 90 python -c "import jax, jax.numpy as jnp, numpy as np; print(float(np.asarray(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256))))))" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) watch: tunnel healthy, firing measure batch"
    if bash tool/r4_measure.sh; then
      echo "$(date -u +%FT%TZ) watch: R4 BATCH DONE"
      touch /tmp/r4_watch_done
      exit 0
    fi
    echo "$(date -u +%FT%TZ) watch: batch incomplete (wedge mid-run?), will retry remaining stages"
  else
    echo "$(date -u +%FT%TZ) watch: tunnel wedged, sleeping"
  fi
  sleep 300
done
