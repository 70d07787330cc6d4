"""Loss functions for the RNN family.

Math matches the reference losses:

- CCE with diversity bias: ``mean(CCE / target_popularity^db)``
  (rnn_one_hot.py:71, popularity computed host-side at rnn_one_hot.py:103).
- Sampled losses over a score matrix ``[B, B+S]`` whose first ``B`` columns
  score each example's own target (diagonal) and last ``S`` columns score
  shared negative samples (rnn_sampling.py:68-91 + BlackoutLayer,
  sparse_lstm.py:43-54).
- Margin losses over dense target/weight matrices (rnn_margin.py:61-68).

All functions are pure and shape-static; full-catalog logits may be
sharded over the mesh "model" axis (the log-sum-exp then reduces with a
psum inserted by XLA under pjit sharding constraints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_softmax_cce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-example categorical cross-entropy from raw logits.

    logits: [B, n_items]; targets: int [B]. Returns [B].
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    target_logit = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return logz - target_logit


def diversity_biased_cce(
    logits: jax.Array, targets: jax.Array, target_pop: jax.Array
) -> jax.Array:
    """mean(CCE / pop^db); ``target_pop`` is already ``pop**db``
    (rnn_one_hot.py:71,103)."""
    return (log_softmax_cce(logits, targets) / target_pop).mean()


# ----------------------------------------------------------------------
# sampled losses (scores: [B, B+S], diag of the left block = own target)
# ----------------------------------------------------------------------
def blackout_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """BlackOut (Ji et al. 2015, eq. 6) as in rnn_sampling.py:68-72:
    softmax over [B, B+S]; loss = CCE(own target) - Σ_samples log(1-p)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    diag = jnp.diagonal(logp[:, :batch_size])
    # log(1 - p) over the sample columns only
    log1m = jnp.log1p(-jnp.exp(logp[:, batch_size:]))
    return -diag - log1m.sum(axis=-1)


def bpr_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """BPR (rnn_sampling.py:80-84): -mean_s log σ(target - sample)."""
    diag = jnp.diagonal(scores[:, :batch_size])
    diff = scores[:, batch_size:] - diag[:, None]
    return -jax.nn.log_sigmoid(-diff).mean(axis=-1)


def top1_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """TOP1 (rnn_sampling.py:86-91): mean_s σ(sample-target) + σ(sample²)."""
    diag = jnp.diagonal(scores[:, :batch_size])
    diff = scores[:, batch_size:] - diag[:, None]
    reg = jnp.square(scores[:, batch_size:])
    return (jax.nn.sigmoid(diff) + jax.nn.sigmoid(reg)).mean(axis=-1)


def cce_sampled_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """CCE over the sampled score matrix (rnn_cluster.py:158-162)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.diagonal(logp[:, :batch_size])


def lin_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """Linear loss: Σ samples − own target (rnn_cluster.py:164-167)."""
    diag = jnp.diagonal(scores[:, :batch_size])
    return scores[:, batch_size:].sum(axis=-1) - diag


def bprelu_loss(scores: jax.Array, batch_size: int) -> jax.Array:
    """Leaky-relu approximation of BPR (rnn_cluster.py:173-175)."""
    diag = jnp.diagonal(scores[:, :batch_size])
    diff = scores[:, batch_size:] - diag[:, None]
    return jax.nn.leaky_relu(diff + 0.5, negative_slope=0.01).mean(axis=-1)


SAMPLED_LOSSES = {"Blackout": blackout_loss, "BPR": bpr_loss, "TOP1": top1_loss}

CLUSTER_LOSSES = {
    "Blackout": blackout_loss,
    "CCE": cce_sampled_loss,
    "lin": lin_loss,
    "BPR": bpr_loss,
    "BPRelu": bprelu_loss,
    "TOP1": top1_loss,
}


# ----------------------------------------------------------------------
# margin losses (multi-target; rnn_margin.py:61-68)
# ----------------------------------------------------------------------
def hinge_loss(predictions, targets, weights):
    return jax.nn.relu((predictions - targets) * weights).sum(axis=-1)


def logit_loss(predictions, targets, weights):
    return (jax.nn.sigmoid(predictions - targets) * weights).sum(axis=-1)


def logsig_loss(predictions, targets, weights):
    return -jax.nn.log_sigmoid((targets - predictions) * weights).sum(axis=-1)


MARGIN_LOSSES = {"hinge": hinge_loss, "logit": logit_loss, "logsig": logsig_loss}
