#!/bin/bash
# Round-4 convergence-at-MXU-shape campaign (VERDICT r3 item 2): prove the
# fused Pallas train kernels' custom-VJP backwards train real models at the
# shapes they gate on for. Dataset: the 50k-item bench dataset
# (20k users, 1.2M interactions, planted Markov 0.5 — bench.py
# _ensure_matrix_dataset). Protocol: reference eval contract
# (/root/reference/test.py:55-59), early stop, then floors.
# Usage: bash scripts/convergence_run.sh [datadir]
set -x
OUT=${1:-/tmp/seqrec_conv_agrid50k}
cd "$(dirname "$0")/.."

# Dataset choice (measured rationale): on first-order planted data the
# Markov baseline IS near-Bayes, so "beat the MM floor" is structurally
# out of reach at 50k items — measured GRU val 0.47 / test ~MM on the
# uniform regime (MM 0.44), and a zipf regime caps the achievable edge
# at ~+0.02. The GRID regime's compositional second-order signal caps MM
# near strength*10/cols while a sequence model can learn the (row, col)
# factorization. ASYMMETRIC 784x64 grid: a symmetric 223x223 run was
# memorization-dominated (train cost 3.7, held-out sps stuck at the
# 0.04 first-order cap); 64 columns make the i_{t-2} column
# classification densely supervised (~47k examples per class) while the
# first-order cap stays low (0.6*10/64 ~ 0.09).
python - <<EOF
from seqrec_tpu.data.synthetic import make_dataset
import os
if not os.path.isfile("$OUT/data/stats"):
    make_dataset("$OUT", n_users=50_000, n_items=50_176, min_len=20,
                 max_len=100, markov_strength=0.6, seed=4, val_size=100,
                 test_size=100, generator="grid", grid_cols=64)
EOF

# GRU H=128 (pallas_rnn_train engaged at B=1024/H=128), CCE.
# --progress counts OPTIMIZER STEPS: 1000 steps x B=1024 ~ 0.35 epochs
# of the ~3M-interaction training set per validation. B=1024 / lr 0.002:
# the 50k-cell composition starts slow (measured: cost 10.8 -> 9.2 over
# 1.4 epochs at B=256/lr 0.001 with val sps still 0), so the campaign
# runs bigger steps with real patience (es_n 8 ~ 3 epochs).
# Both legs also train through the streaming-CCE head (the 50k catalog
# is >= STREAMING_CCE_MIN_ITEMS) — this campaign is the e2e convergence
# proof for the fused train kernels AND the flash-style loss together.
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 128 \
    --max_length 30 -b 1024 --u_m adam --u_l 0.002 --save Best \
    --progress 1000 --max_iter 50000 --es_m StopAfterN --es_n 8

python test.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 128 \
    --max_length 30 -b 1024 --u_l 0.002 --save

# LSTM H=128 (pallas_lstm_train engaged: H>=128)
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_m adam --u_l 0.002 --save Best \
    --progress 1000 --max_iter 50000 --es_m StopAfterN --es_n 8

python test.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_l 0.002 --save

# floors
for m in POP MM; do
  echo "==== $m ===="
  python test.py -d "$OUT/" -m $m
done

echo DONE
