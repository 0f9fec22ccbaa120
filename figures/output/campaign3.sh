#!/bin/bash
# Chained teaser campaign: wait for the in-flight naive leg, then run the
# remaining legs sequentially (chip is single-tenant).
cd /root/repo/figures/teaser
while kill -0 985 2>/dev/null; do sleep 30; done
echo "=== naive finished, starting ours_remesh $(date +%H:%M:%S) ===" >> /root/repo/figures/output/campaign3.log
timeout 5400 python generate_data.py --only ours_remesh >> /root/repo/figures/output/campaign3.log 2>&1
echo "=== ours_remesh done rc=$? $(date +%H:%M:%S) ===" >> /root/repo/figures/output/campaign3.log
timeout 5400 python generate_data.py --only reg >> /root/repo/figures/output/campaign3.log 2>&1
echo "=== reg done rc=$? $(date +%H:%M:%S) ===" >> /root/repo/figures/output/campaign3.log
