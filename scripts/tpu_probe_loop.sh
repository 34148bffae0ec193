#!/bin/bash
# Low-cadence axon-tunnel recovery probe (see memory/axon-tpu-environment-traps:
# per-probe timeout >=420 s, cadence >=8 min, SIGTERM-only so a mid-grant kill
# can't leave the chip claimed-but-dead). Writes status to /tmp/tpu_probe_status
# and exits as soon as the tunnel answers. Stop early: touch /tmp/tpu_probe_stop.
set -u
STATUS=/tmp/tpu_probe_status
STOP=/tmp/tpu_probe_stop
rm -f "$STOP"
echo "probing since $(date -Is)" > "$STATUS"
while true; do
  [ -e "$STOP" ] && { echo "stopped $(date -Is)" >> "$STATUS"; exit 0; }
  if timeout --signal=TERM --kill-after=60 420 python -c "
import jax, jax.numpy as jnp
assert any(d.platform == 'tpu' for d in jax.devices())
x = jnp.ones((256, 256))
(x @ x).block_until_ready()
print('tpu ok')
" >> "$STATUS" 2>&1; then
    echo "RECOVERED $(date -Is)" >> "$STATUS"
    exit 0
  fi
  echo "down $(date -Is)" >> "$STATUS"
  sleep 480
done
