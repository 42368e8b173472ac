#!/bin/bash
# Sequential TPU jobs (one TPU client at a time), generous timeouts,
# per-stage wall timestamps for compile-time diagnosis.
cd /root/repo
exec 2>&1
stamp() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
stamp "sol stages"
timeout 900 python scripts/tpu_sol.py --outer 3
stamp "bench single64"
timeout 1500 python bench.py --config single64
stamp "bench full"
timeout 1800 python bench.py --config full
stamp "bench fit-hires"
timeout 900 python bench.py --config fit-hires
stamp "LADDER DONE"
