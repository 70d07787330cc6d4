#!/bin/bash
# Measured-baseline campaign, part 2 (BASELINE.md): quality rows for the
# remaining model families on the same ML-1M-scale synthetic dataset as
# scripts/baseline_run.sh. Usage: bash scripts/baseline_run2.sh [outdir]
set -x
OUT=${1:-/tmp/ml1m_synth}
cd "$(dirname "$0")/.."

python - <<EOF
from seqrec_tpu.data.synthetic import generate_interactions
import numpy as np, os
os.makedirs("$OUT", exist_ok=True)
if not os.path.exists("$OUT/ratings.dat"):
    rows = generate_interactions(n_users=6040, n_items=3706, min_len=20,
                                 max_len=310, markov_strength=0.45, seed=7)
    np.savetxt("$OUT/ratings.dat", rows, fmt="%d", delimiter="::")
    print("interactions:", len(rows))
EOF

if [ ! -f "$OUT/data/stats" ]; then
  python preprocess.py -f "$OUT/ratings.dat" --columns uirt --sep :: \
      --min_item_pop 5 --val_size 100 --test_size 100 --yes
fi

run_rnn () {  # name, extra train flags..., then matching test flags via same args
  echo "==== RNN $* ===="
}

echo "==== RNN-BPR (sampled loss) ===="
timeout 2400 python train.py -d "$OUT/" -m RNN --loss BPR --sampling 256 \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_m adam --u_l 0.001 \
    --save Best --progress 8000 --max_iter 160000 --spd 8 \
    --es_m StopAfterN --es_n 3
timeout 1200 python test.py -d "$OUT/" -m RNN --loss BPR --sampling 256 \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_l 0.001 --save

echo "==== RNN-Blackout (sampled loss) ===="
timeout 2400 python train.py -d "$OUT/" -m RNN --loss Blackout --sampling 256 \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_m adam --u_l 0.001 \
    --save Best --progress 8000 --max_iter 160000 --spd 8 \
    --es_m StopAfterN --es_n 3
timeout 1200 python test.py -d "$OUT/" -m RNN --loss Blackout --sampling 256 \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_l 0.001 --save

echo "==== RNN-hinge (margin loss) ===="
timeout 2400 python train.py -d "$OUT/" -m RNN --loss hinge \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_m adam --u_l 0.001 \
    --save Best --progress 8000 --max_iter 160000 --spd 8 \
    --es_m StopAfterN --es_n 3
timeout 1200 python test.py -d "$OUT/" -m RNN --loss hinge \
    --r_t GRU --r_l 50 --max_length 30 -b 64 --u_l 0.001 --save

echo "==== RNNCluster (Blackout, 10 clusters) ===="
timeout 3600 python train.py -d "$OUT/" -m RNN --clusters 10 --loss Blackout \
    --sampling 256 --c_sampling 256 --r_t GRU --r_l 50 --max_length 30 -b 64 \
    --u_m adam --u_l 0.001 --save Best --progress 8000 --max_iter 120000 \
    --spd 8 --es_m StopAfterN --es_n 2
timeout 1800 python test.py -d "$OUT/" -m RNN --clusters 10 --loss Blackout \
    --sampling 256 --c_sampling 256 --r_t GRU --r_l 50 --max_length 30 -b 64 \
    --u_l 0.001 --save

echo "==== FISM (factorization) ===="
timeout 2400 python train.py -d "$OUT/" -m FISM --extended_set -H 32 -l 0.05 \
    -r 0.0025 --loss RMSE --fism_alpha 0.2 --save Best --progress 400000 \
    --max_iter 4000000 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m FISM -H 32 -l 0.05 -r 0.0025 \
    --loss RMSE --fism_alpha 0.2 --save

echo "==== Fossil (factorization + factored MC) ===="
timeout 2400 python train.py -d "$OUT/" -m Fossil --extended_set -H 32 -l 0.05 \
    -r 0.0025 --fossil_order 1 --save Best --progress 400000 \
    --max_iter 4000000 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m Fossil -H 32 -l 0.05 -r 0.0025 \
    --fossil_order 1 --save

echo "==== SDA (stacked denoising autoencoder) ===="
timeout 2400 python train.py -d "$OUT/" -m SDA -L 64-32-64 --do 0.3 --in_do 0.2 \
    -b 64 --u_m adam --u_l 0.001 --save Best --progress 2000 --max_iter 30000 \
    --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m SDA -L 64-32-64 --do 0.3 --in_do 0.2 \
    -b 64 --u_l 0.001 --save

echo "==== LTM (word2vec trajectory) ===="
timeout 2400 python train.py -d "$OUT/" -m LTM -H 32 --ltm_window 5 \
    --save Best --progress 2 --max_iter 14 --es_m StopAfterN --es_n 2
timeout 1200 python test.py -d "$OUT/" -m LTM -H 32 --ltm_window 5 --save

echo DONE
