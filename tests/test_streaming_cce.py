"""Streaming (flash-style) CCE vs the dense reference path.

Oracles: ``losses.log_softmax_cce(h@W+b, t)`` and its jax.grad — the
streaming op must match forward values and all three parameter
cotangents, including with a non-divisible chunk tail and under bf16
compute dtype (looser tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.ops import losses
from seqrec_tpu.ops.streaming_cce import streaming_cce


def _case(B=16, H=8, N=300, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(B, H)).astype(np.float32)
    W = rng.normal(size=(H, N)).astype(np.float32)
    b = rng.normal(size=(N,)).astype(np.float32)
    t = rng.integers(0, N, size=(B,)).astype(np.int32)
    return jnp.asarray(h), jnp.asarray(W), jnp.asarray(b), jnp.asarray(t)


@pytest.mark.parametrize("chunk", [64, 128, 300, 512])
def test_forward_matches_dense(chunk):
    h, W, b, t = _case()
    dense = losses.log_softmax_cce(h @ W + b, t)
    stream = streaming_cce(h, W, b, t, chunk)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(dense), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [64, 300])
def test_grads_match_dense(chunk):
    h, W, b, t = _case(B=12, H=16, N=200, seed=1)
    # weighted mean like diversity_biased_cce so g varies per example
    wts = jnp.asarray(np.random.default_rng(2).uniform(0.5, 2.0, 12).astype(np.float32))

    def dense_loss(h, W, b):
        return (losses.log_softmax_cce(h @ W + b, t) / wts).mean()

    def stream_loss(h, W, b):
        return (streaming_cce(h, W, b, t, chunk) / wts).mean()

    gd = jax.grad(dense_loss, argnums=(0, 1, 2))(h, W, b)
    gs = jax.grad(stream_loss, argnums=(0, 1, 2))(h, W, b)
    for a, s, name in zip(gd, gs, ("dh", "dW", "db")):
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(a), rtol=2e-4, atol=1e-6, err_msg=name
        )


def test_bf16_compute_close():
    h, W, b, t = _case(B=8, H=32, N=500, seed=3)
    dense = losses.log_softmax_cce(
        jnp.dot(h.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b, t)
    stream = streaming_cce(h, W, b, t, 128, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(dense), rtol=5e-2, atol=5e-2)


def test_extreme_logits_stable():
    # online logsumexp must survive large-magnitude logits
    h, W, b, t = _case(B=4, H=4, N=96, seed=4)
    h = h * 100.0
    dense = losses.log_softmax_cce(h @ W + b, t)
    stream = streaming_cce(h, W, b, t, 32)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(dense), rtol=1e-5, atol=1e-4)


def test_model_integration_matches_dense_loss():
    """RNNOneHot routed through the streaming head must produce the same
    loss and the same one-step parameter update as the dense path.

    The gate (``_use_streaming_head``) is read at TRACE time — the first
    ``train_function`` call — so the threshold patch must stay active
    through that call, not just through construction (an earlier version
    restored it too early and compared dense against dense)."""
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_one_hot import RNNOneHot
    from seqrec_tpu.models.updates import Adam
    from seqrec_tpu.ops import streaming_cce as sc

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 40, size=(4, 4)).astype(np.int32)
    batch = {
        "ids": ids[..., None],
        "mask": np.ones((4, 4), dtype=np.float32),
        "targets": rng.integers(0, 40, size=(4,)).astype(np.int32),
        "target_pop": np.ones((4,), dtype=np.float32),
    }

    def run(min_items):
        old = sc.STREAMING_CCE_MIN_ITEMS
        sc.STREAMING_CCE_MIN_ITEMS = min_items
        try:
            m = RNNOneHot(
                recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[6]),
                updater=Adam(0.01),
                max_length=4,
                batch_size=4,
                seed=0,
            )
            m._prepare_networks(40)
            m.params = m._init_params()
            m._build_functions()
            m.opt_state = m._opt.init(m.params)
            assert m._use_streaming_head() == (min_items <= 40)
            cost = m.train_function(dict(batch))  # traces under the patch
        finally:
            sc.STREAMING_CCE_MIN_ITEMS = old
        return float(cost), np.asarray(m.params["W_out"])

    cd, wd = run(10**9)  # force dense
    cs, ws = run(8)  # force streaming
    np.testing.assert_allclose(cd, cs, rtol=1e-5)
    np.testing.assert_allclose(wd, ws, rtol=1e-4, atol=1e-6)
