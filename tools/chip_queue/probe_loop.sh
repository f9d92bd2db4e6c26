#!/bin/bash
# Loop a bounded backend-init probe; touch /tmp/tunnel_up on success.
# Each attempt runs in its own python subprocess, killed after 150s
# (a blocked init would otherwise hang 25-50 min). 120s backoff between
# attempts so a killed client can fully die (wedge avoidance).
rm -f /tmp/tunnel_up
while true; do
  if timeout -k 15 150 python -c "
import jax
ds = jax.devices()
assert any('cpu' not in str(d).lower() for d in ds), ds
print('TPU up:', ds)
" >> /tmp/chip_queue/probe.log 2>&1; then
    touch /tmp/tunnel_up
    echo "tunnel up $(date -u)" >> /tmp/chip_queue/probe.log
    exit 0
  fi
  echo "probe failed $(date -u), backing off 120s" >> /tmp/chip_queue/probe.log
  sleep 120
done
