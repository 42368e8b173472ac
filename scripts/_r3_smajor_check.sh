#!/bin/bash
# On-chip validation + stage split for the s-major kernels (sequential —
# one TPU client at a time).
cd /root/repo
exec 2>&1
stamp() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
stamp "validate"
timeout 1500 python scripts/tpu_validate.py
stamp "sol smajor tile128"
timeout 1500 python scripts/tpu_sol.py
stamp "tile sweep smajor"
timeout 1800 python scripts/tpu_tile_sweep.py --tiles 128,256,512
stamp "DONE"
