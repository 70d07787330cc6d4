"""Training CLI.

Usage parity with /root/reference/train.py:12-60:
``python train.py -d DATASET_DIR -m RNN --loss CCE --save Best ...``
(thin wrapper; the implementation lives in seqrec_tpu.cli.train so the
installed ``seqrec-train`` console script shares it).
"""

from seqrec_tpu.cli.train import main

if __name__ == "__main__":
    main()
