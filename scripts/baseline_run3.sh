#!/bin/bash
# Measured-baseline campaign, part 3: FISM / Fossil reruns after the
# sub-chunked (collision-stable) SGD fix. Usage: bash scripts/baseline_run3.sh [outdir]
set -x
OUT=${1:-/tmp/ml1m_synth}
cd "$(dirname "$0")/.."

echo "==== FISM-RMSE ===="
timeout 2400 python train.py -d "$OUT/" -m FISM --extended_set -H 32 -l 0.01 \
    -r 0.0025 --init_sigma 0.1 --loss RMSE --fism_alpha 0.2 --save Best \
    --progress 400000 --max_iter 4000000 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m FISM -H 32 -l 0.01 -r 0.0025 \
    --init_sigma 0.1 --loss RMSE --fism_alpha 0.2 --save

echo "==== FISM-BPR ===="
timeout 2400 python train.py -d "$OUT/" -m FISM --extended_set -H 32 -l 0.01 \
    -r 0.0025 --init_sigma 0.1 --loss BPR --fism_alpha 0.2 --save Best \
    --progress 400000 --max_iter 4000000 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m FISM -H 32 -l 0.01 -r 0.0025 \
    --init_sigma 0.1 --loss BPR --fism_alpha 0.2 --save

echo "==== Fossil ===="
timeout 2400 python train.py -d "$OUT/" -m Fossil --extended_set -H 32 -l 0.05 \
    -r 0.0025 --init_sigma 0.1 --fossil_order 1 --save Best \
    --progress 400000 --max_iter 4000000 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m Fossil -H 32 -l 0.05 -r 0.0025 \
    --init_sigma 0.1 --fossil_order 1 --save

echo DONE
