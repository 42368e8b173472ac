#!/bin/bash
# Round-3 sequential TPU jobs (one TPU client at a time — CLAUDE.md).
# Stage 1 (tile sweep + sol) runs separately first; this is the bench
# ladder proper, including the two artifacts VERDICT r2 demanded:
# pod-render (BASELINE config 5) and a live-measured baseline anchor.
cd /root/repo
exec 2>&1
stamp() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
stamp "bench small (live baseline)"
timeout 900 python bench.py --live-baseline
stamp "bench single64"
timeout 900 python bench.py --config single64
stamp "bench full"
timeout 1800 python bench.py --config full
stamp "bench fit"
timeout 900 python bench.py --config fit
stamp "bench fit-hires"
timeout 900 python bench.py --config fit-hires
stamp "bench pod-render"
timeout 1800 python bench.py --config pod-render
stamp "LADDER DONE"
