#!/bin/bash
# Wait for the tunnel probe to report recovery, then run the chip queue.
while [ ! -f /tmp/tunnel_up ]; do sleep 60; done
sleep 45   # let the probe's python client fully exit (one TPU process rule)
bash /tmp/chip_queue/run_queue.sh
