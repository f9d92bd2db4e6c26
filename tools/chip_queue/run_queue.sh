#!/bin/bash
# Chip work queue: runs when the tunnel recovers. ONE TPU process at a time,
# strictly sequential. Logs to /tmp/chip_queue/queue.log.
set -u
cd /tmp
LOG=/tmp/chip_queue/queue.log
echo "=== chip queue start $(date -u) ===" >> "$LOG"

echo "--- 01_drives ---" >> "$LOG"
python /tmp/chip_queue/01_drives.py >> "$LOG" 2>&1
echo "01_drives rc=$?" >> "$LOG"

echo "--- 01b_ct1024_probe ---" >> "$LOG"
python /tmp/chip_queue/ct1024_probe.py >> "$LOG" 2>&1
echo "01b_ct1024_probe rc=$?" >> "$LOG"

echo "--- 04_metamorphic ---" >> "$LOG"
(cd /root/repo && python /tmp/chip_queue/04_metamorphic.py >> "$LOG" 2>&1)
echo "04_metamorphic rc=$?" >> "$LOG"

echo "--- 02_bench_report ---" >> "$LOG"
(cd /root/repo && python tools/bench_report.py >> "$LOG" 2>&1)
echo "02_bench_report rc=$?" >> "$LOG"

echo "--- 03_driver_bench ---" >> "$LOG"
(cd /root/repo && python bench.py >> "$LOG" 2>&1)
echo "03_driver_bench rc=$?" >> "$LOG"

echo "--- 05_serve_latency ---" >> "$LOG"
(cd /root/repo && timeout 1800 python /tmp/chip_queue/05_serve_latency.py >> "$LOG" 2>&1)
echo "05_serve_latency rc=$?" >> "$LOG"

echo "=== chip queue done $(date -u) ===" >> "$LOG"
touch /tmp/chip_queue/DONE
