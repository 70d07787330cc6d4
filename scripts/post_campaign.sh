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
# the LSTM convergence leg's test.py crashed on the glob bug fixed in
# round 4 (GRU checkpoints swallowed by the tower-less LSTM pattern);
# re-evaluate its Best checkpoint first
python test.py -d /tmp/seqrec_conv_lag2_50k/ -m RNN --loss CCE --r_t LSTM \
    --r_l 128 --max_length 30 -b 1024 --u_l 0.002 --save

time python bench.py --matrix-only 2>matrix_stderr.log
time python scripts/serving_bench.py
time python scripts/adaptive_bench.py
time python scripts/gru256_probe.py
time python bench.py > bench_final.json
tail -c 400 bench_final.json

# round-4 parity-config quality regression (4th consecutive round):
# same cached ML-1M-scale dataset + config as BASELINE.md's headline row
time python train.py -d /tmp/ml1m_synth/ -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 16 --u_m adam --u_l 0.001 --save Best --dir r4/ \
    --progress 4000 --max_iter 60000 --es_m StopAfterN --es_n 3
python test.py -d /tmp/ml1m_synth/ -m RNN --loss CCE --r_t GRU --r_l 50 \
    --max_length 30 -b 16 --u_l 0.001 --save --dir r4/
echo POST_CAMPAIGN_DONE
