#!/bin/bash
# Round-4 follow-up measurements:
#  - re-measure the 4 adam_bf16m matrix rows with the hardware-rbg
#    stochastic-rounding dither (the full matrix ran with Threefry,
#    which cost more than the bf16 moment bandwidth saved)
#  - serving top-k bench (the sweep's run crashed on a sys.path bug)
set -x
cd "$(dirname "$0")/.."
python - <<'PYEOF'
import json
with open("bench_matrix.json") as f:
    data = json.load(f)
keep = [r for r in data["rows"] if r["opt"] != "adam_bf16m"]
with open("bench_matrix.json.partial", "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
print("seeded", len(keep), "rows; re-measuring", len(data["rows"]) - len(keep))
PYEOF
time python bench.py --matrix-only 2>matrix_stderr2.log
time python scripts/serving_bench.py
echo FOLLOWUP_DONE
