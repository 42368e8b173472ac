#!/bin/bash
cd /root/repo
exec 2>&1
echo "=== validate ==="
timeout 420 python scripts/tpu_validate.py
echo "=== bench small ==="
timeout 600 python bench.py
echo "=== bench single64 ==="
timeout 600 python bench.py --config single64
echo "=== bench full ==="
timeout 900 python bench.py --config full
echo "=== bench fit ==="
timeout 600 python bench.py --config fit
echo "=== bench fit-hires ==="
timeout 600 python bench.py --config fit-hires
echo "=== sol stages ==="
timeout 600 python scripts/tpu_sol.py
echo "=== LADDER DONE ==="
