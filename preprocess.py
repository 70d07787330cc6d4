"""Preprocess CLI: CSV → canonical dataset directory.

Usage parity with /root/reference/preprocess.py:
``python preprocess.py -f path/to/ratings.dat --columns uirt --sep ::``
"""

from seqrec_tpu.data.preprocess import main

if __name__ == "__main__":
    main()
