#!/bin/bash
# Measured-baseline campaign (BASELINE.md): ML-1M-scale synthetic dataset,
# reference parity config. Usage: bash scripts/baseline_run.sh [outdir]
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

# parity config: GRU-50, ml30, bs16, adam 1e-3, CCE (BASELINE.md)
time python train.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 16 --u_m adam --u_l 0.001 --save Best \
    --progress 4000 --max_iter 60000 --es_m StopAfterN --es_n 3

python test.py -d "$OUT/" -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 16 --u_l 0.001 --save

for m in POP MM UKNN; do
  echo "==== $m ===="
  python test.py -d "$OUT/" -m $m
done

echo "==== BPRMF ===="
time python train.py -d "$OUT/" -m BPRMF --extended_set -H 32 -l 0.1 -r 0.0025 \
    --no_adaptive_sampling --save Best --progress 400000 --max_iter 4000000 \
    --es_m StopAfterN --es_n 2
python test.py -d "$OUT/" -m BPRMF -H 32 -l 0.1 -r 0.0025 --no_adaptive_sampling --save

echo "==== FPMC ===="
time python train.py -d "$OUT/" -m FPMC --extended_set --k_cf 32 --k_mc 32 -l 0.1 \
    --no_adaptive_sampling --save Best --progress 400000 --max_iter 4000000 \
    --es_m StopAfterN --es_n 2
python test.py -d "$OUT/" -m FPMC --k_cf 32 --k_mc 32 -l 0.1 --no_adaptive_sampling --save

echo DONE
