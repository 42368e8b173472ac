#!/bin/bash
# Round-5 bench ladder: every BASELINE config in ONE log, live-measured
# baseline included (the oracle .so is pre-seeded by
# scripts/precompile_oracle.py — cached load, no compile in the timed
# window).  One TPU client at a time (CLAUDE.md).
cd /root/repo
exec 2>&1
stamp() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }
stamp "precompile oracle (untimed, CPU)"
python scripts/precompile_oracle.py
stamp "bench small (live baseline)"
timeout 900 python bench.py --live-baseline
stamp "bench single64 (live baseline)"
timeout 900 python bench.py --config single64 --live-baseline
stamp "bench full"
timeout 1800 python bench.py --config full
stamp "bench fit"
timeout 900 python bench.py --config fit --live-baseline
stamp "bench fit-hires"
timeout 900 python bench.py --config fit-hires
stamp "bench pod-render"
timeout 1800 python bench.py --config pod-render --live-baseline
stamp "LADDER DONE"
