"""Console entry points (seqrec-preprocess / seqrec-train / seqrec-test).

The repo-root ``preprocess.py`` / ``train.py`` / ``test.py`` wrappers keep
the reference's invocation style (/root/reference/train.py, test.py,
preprocess.py: ``python train.py -d data/ ...``); these modules are the
installable targets for ``pip install``'s console scripts.
"""
