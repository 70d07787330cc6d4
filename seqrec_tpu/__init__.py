"""seqrec_tpu: a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``rdevooght/sequence-based-recommendations`` (mounted read-only at
/root/reference): top-N item recommendation from user interaction
sequences, with an RNN family (full-softmax CCE, sampled losses,
margin losses, clustered softmax), a factorization family (BPR-MF,
FPMC, FISM, Fossil), lazy baselines (POP, Markov, user-KNN), an SDAE
and a word2vec-trajectory model — all implemented TPU-first:

- models are pure functions over parameter pytrees, train steps are
  jitted ``lax.scan``/``fori_loop`` programs with static shapes;
- the data pipeline produces packed integer arrays so batch assembly
  is gathers, not per-item Python featurization;
- the item-embedding input table and softmax output table shard over
  a ``jax.sharding.Mesh`` "model" axis while dense towers run
  data-parallel over the "data" axis;
- hot ops (multi-hot embedding gather-sum, fused recurrent cells,
  sampled-softmax losses, masked top-k) have Pallas TPU kernels with
  pure-XLA fallbacks for CPU tests.
"""

__version__ = "0.1.0"
