#!/bin/bash
# Round-4 post-campaign measurement sweep (single TPU chip, run after the
# quality campaigns release the device):
#   1. fresh MXU-shape matrix (streaming-CCE default + controls + the
#      B=8192 combined-ceiling rows)
#   2. large-catalog serving top-k (grouped vs lax control)
#   3. BPRMF adaptive sampling (device vs host)
#   4. GRU H=256 bb=64 train-kernel probe
#   5. headline bench (writes the final matrix into its JSON line)
set -x
cd "$(dirname "$0")/.."
rm -f bench_matrix.json
time python bench.py --matrix-only 2>matrix_stderr.log
time python scripts/serving_bench.py
time python scripts/adaptive_bench.py
time python scripts/gru256_probe.py
time python bench.py > bench_final.json
tail -c 400 bench_final.json
echo POST_CAMPAIGN_DONE
