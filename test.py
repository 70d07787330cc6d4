"""Offline model-evaluation CLI.

Usage parity with /root/reference/test.py:42-163 (thin wrapper; the
implementation lives in seqrec_tpu.cli.test so the installed
``seqrec-test`` console script shares it).
"""

from seqrec_tpu.cli.test import find_models, main  # noqa: F401 (find_models re-exported for tooling)

if __name__ == "__main__":
    main()
