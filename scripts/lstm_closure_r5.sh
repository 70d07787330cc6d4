#!/bin/bash
# Round-5 LSTM convergence closure (VERDICT r4 weak item 6): the round-4
# campaign left LSTM-128 at test sps 0.43 vs GRU 0.62 on the lag-2 50k
# regime with the note "learns the lag-2 delay slower" — an observation,
# not a closure. This campaign either brings the LSTM to GRU-level sps
# (longer early-stop budget + learning-rate sweep, the two levers inside
# the reference flag surface) or pins its plateau with full validation
# learning curves (train.py's stderr TSV, one row per --progress
# checkpoint, captured in the leg logs).
#
# Reference init semantics are already parity (sparse_lstm.py:59-130 ->
# seqrec_tpu/models/recurrent.py); lr and patience are the remaining
# free knobs.
# Usage: bash scripts/lstm_closure_r5.sh [datadir]
set -x
OUT=${1:-/tmp/seqrec_conv_lag2_50k}
cd "$(dirname "$0")/.."

python - <<EOF
from seqrec_tpu.data.synthetic import make_dataset
import os
if not os.path.isfile("$OUT/data/stats"):
    make_dataset("$OUT", n_users=50_000, n_items=50_000, min_len=20,
                 max_len=100, markov_strength=0.6, seed=4, val_size=100,
                 test_size=100, generator="lag2")
EOF

# leg A: round-4 config, doubled patience (es_n 8 -> 20, ~7 epochs) —
# tests "just needs longer" directly
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_m adam --u_l 0.002 --save Best \
    --progress 1000 --max_iter 120000 --es_m StopAfterN --es_n 20 \
    --dir lrA/ 2> /tmp/lstm_closure_legA.tsv

python test.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_l 0.002 --dir lrA/ --save

# leg B: cooler lr (the round-4 LSTM val series was noisier than the
# GRU's at the same lr — classic too-hot symptom for the 4-gate cell)
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_m adam --u_l 0.001 --save Best \
    --progress 1000 --max_iter 120000 --es_m StopAfterN --es_n 20 \
    --dir lrB/ 2> /tmp/lstm_closure_legB.tsv

python test.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_l 0.001 --dir lrB/ --save

# leg C: hotter lr with the same patience (completes the sweep bracket)
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_m adam --u_l 0.004 --save Best \
    --progress 1000 --max_iter 120000 --es_m StopAfterN --es_n 20 \
    --dir lrC/ 2> /tmp/lstm_closure_legC.tsv

python test.py -d "$OUT/" -m RNN --loss CCE --r_t LSTM --r_l 128 \
    --max_length 30 -b 1024 --u_l 0.004 --dir lrC/ --save

echo LSTM_CLOSURE_DONE
