#!/bin/bash
# Second synthetic quality regime (BASELINE.md): the LAG-2 dataset plants
# next = succ[i_{t-2}] — a second-order signal a first-order Markov model
# cannot capture (held-out MM ~ chance) but that a recurrent model learns
# as readily as the lag-1 regime (same permutation lookup, delayed one
# step) — the complement of baseline_run.sh's first-order regime where MM
# wins by construction. (The compositional GRID generator stays in-tree;
# it was measured memorization-dominated for these models at every scale
# tried — see BASELINE.md.) Records the model ordering for the quality
# table. Usage: bash scripts/quality_run_regime2.sh [outdir]
set -x
OUT=${1:-/tmp/lag2_synth}
cd "$(dirname "$0")/.."

python - <<EOF
from seqrec_tpu.data.synthetic import make_dataset
import os
if not os.path.exists("$OUT/data/stats"):
    make_dataset("$OUT", n_users=6040, n_items=3600, min_len=20, max_len=310,
                 markov_strength=0.6, seed=9, generator="lag2",
                 val_size=100, test_size=100)
EOF

# parity config RNN (GRU-50) — must clearly beat MM here
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_m adam --u_l 0.002 --save Best \
    --progress 1500 --max_iter 60000 --es_m StopAfterN --es_n 6
python test.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_l 0.002 --save

# sampled BPR
time python train.py -d "$OUT/" -m RNN --loss BPR --sampling 256 --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_m adam --u_l 0.002 --save Best \
    --progress 1500 --max_iter 60000 --es_m StopAfterN --es_n 6
python test.py -d "$OUT/" -m RNN --loss BPR --sampling 256 --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_l 0.002 --save

# margin hinge
time python train.py -d "$OUT/" -m RNN --loss hinge --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_m adam --u_l 0.002 --save Best \
    --progress 1500 --max_iter 60000 --es_m StopAfterN --es_n 6
python test.py -d "$OUT/" -m RNN --loss hinge --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_l 0.002 --save

# clustered softmax (cluster-restricted scoring on a second-order task)
time python train.py -d "$OUT/" -m RNN --clusters 10 --loss Blackout --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_m adam --u_l 0.002 --save Best \
    --progress 1500 --max_iter 60000 --es_m StopAfterN --es_n 6
python test.py -d "$OUT/" -m RNN --clusters 10 --loss Blackout --r_t GRU --r_l 50 \
    --max_length 30 -b 64 --u_l 0.002 --save

# floors + FPMC (first-order MC term: should trail the RNNs here)
for m in POP MM UKNN; do
  echo "==== $m ===="
  python test.py -d "$OUT/" -m $m
done

echo "==== FPMC ===="
time python train.py -d "$OUT/" -m FPMC --extended_set --k_cf 32 --k_mc 32 -l 0.1 \
    --no_adaptive_sampling --save Best --progress 400000 --max_iter 4000000 \
    --es_m StopAfterN --es_n 2
python test.py -d "$OUT/" -m FPMC --k_cf 32 --k_mc 32 -l 0.1 --no_adaptive_sampling --save

echo DONE
