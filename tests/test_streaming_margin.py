"""Streaming margin loss == dense margin loss (forward + all grads).

The dense oracle is the exact RNNMargin._loss Y/Wt assembly
(reference rnn_margin.py:112-149): default target everywhere, targets
(Y=1, Wt=-1), seen items zeroed when interactions are unique, negative
weight w_neg per example.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqrec_tpu.ops import losses
from seqrec_tpu.ops.streaming_margin import streaming_margin


def _dense_oracle(h, W, b, tgt_ids, seen_ids, w_neg, default_target,
                  loss_name, unique):
    pred = h @ W + b
    B, N = pred.shape
    n1 = N + 1
    b_idx = jnp.arange(B)[:, None]
    Y = jnp.broadcast_to(
        jnp.concatenate([default_target, jnp.zeros((1,), jnp.float32)]), (B, n1)
    )
    Y = Y.at[b_idx, tgt_ids].set(1.0)
    Wt = jnp.broadcast_to(w_neg[:, None], (B, n1))
    Wt = Wt.at[b_idx, tgt_ids].set(-1.0)
    if unique:
        Y = Y.at[b_idx, seen_ids].set(0.0)
        Wt = Wt.at[b_idx, seen_ids].set(0.0)
    return losses.MARGIN_LOSSES[loss_name](pred, Y[:, :N], Wt[:, :N])


def _mk(seed=0, B=8, H=8, N=1000, T=2, L=6):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)
    tgt = rng.integers(0, N, size=(B, T)).astype(np.int32)
    tgt[::3, -1] = N  # padded target slots
    seen = rng.integers(0, N, size=(B, L)).astype(np.int32)
    seen[::2, -2:] = N  # padded seen slots
    w_neg = jnp.asarray(rng.random(B) * 0.01 + 0.001, jnp.float32)
    dt = jnp.asarray(rng.random(N) * 0.3, jnp.float32)
    return h, W, b, jnp.asarray(tgt), jnp.asarray(seen), w_neg, dt


@pytest.mark.parametrize("loss_name", ["hinge", "logit", "logsig"])
@pytest.mark.parametrize("unique", [True, False])
@pytest.mark.parametrize("chunk", [250, 300])  # dividing + padded tail
def test_streaming_margin_matches_dense(loss_name, unique, chunk):
    h, W, b, tgt, seen, w_neg, dt = _mk()

    def dense(h, W, b):
        return _dense_oracle(h, W, b, tgt, seen, w_neg, dt, loss_name, unique).sum()

    def stream(h, W, b):
        return streaming_margin(
            h, W, b, tgt, seen, w_neg, dt, loss_name, unique, chunk
        ).sum()

    l_d, g_d = jax.value_and_grad(dense, argnums=(0, 1, 2))(h, W, b)
    l_s, g_s = jax.jit(jax.value_and_grad(stream, argnums=(0, 1, 2)))(h, W, b)
    assert np.isclose(float(l_d), float(l_s), rtol=1e-5), (float(l_d), float(l_s))
    for a, c in zip(g_d, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6)


def test_streaming_margin_model_loss_parity(synthetic_handler, monkeypatch):
    """RNNMargin._loss routed through the streaming head == the dense
    path, on a real model batch (threshold forced down)."""
    import seqrec_tpu.ops.streaming_margin as sm

    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_margin import RNNMargin
    from seqrec_tpu.models.updates import Adam

    def make():
        m = RNNMargin(
            loss_function="logsig",
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
            updater=Adam(0.01),
            max_length=12,
            batch_size=8,
            seed=0,
        )
        m.prepare_model(synthetic_handler)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        return m

    model = make()
    gen = model._gen_mini_batch(synthetic_handler.training_set(epochs=5))
    batch = next(gen)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    dense_loss = float(model._loss(model.params, batch))
    dense_grads = jax.grad(lambda p: model._loss(p, batch))(model.params)

    monkeypatch.setattr(sm, "STREAMING_MARGIN_MIN_ITEMS", 1)
    assert model._use_streaming_head()
    s_loss = float(model._loss(model.params, batch))
    s_grads = jax.grad(lambda p: model._loss(p, batch))(model.params)

    assert np.isclose(dense_loss, s_loss, rtol=1e-5)
    for (pa, a), (pb, c) in zip(
        jax.tree_util.tree_flatten_with_path(dense_grads)[0],
        jax.tree_util.tree_flatten_with_path(s_grads)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6, err_msg=str(pa)
        )


@pytest.mark.parametrize("loss_name", ["hinge", "logsig"])
@pytest.mark.parametrize("unique", [True, False])
def test_streaming_margin_duplicate_and_override_ids(loss_name, unique):
    """The uniform+correction decomposition must reproduce the dense
    scatter's idempotence (duplicate ids write a constant once) and
    precedence (seen overrides target) exactly."""
    h, W, b, _, _, w_neg, dt = _mk(seed=3, B=6, N=400, T=3, L=5)
    N = 400
    tgt = np.array(
        [[5, 5, 17], [10, 11, 10], [N, N, 3], [7, 8, 9], [50, 50, 50], [0, 1, 2]],
        dtype=np.int32,
    )
    seen = np.array(
        [
            [5, 30, 31, 32, N],    # target 5 also seen -> override
            [10, 10, 40, N, N],    # duplicate seen + overrides target 10
            [3, 3, 3, 3, 3],       # target 3 seen, seen all duplicates
            [60, 61, 62, 63, 64],
            [50, N, N, N, N],      # triple-dup target also seen
            [70, 71, 72, 73, 74],
        ],
        dtype=np.int32,
    )
    tgt, seen = jnp.asarray(tgt), jnp.asarray(seen)

    def dense(h, W, b):
        return _dense_oracle(h, W, b, tgt, seen, w_neg, dt, loss_name, unique).sum()

    def stream(h, W, b):
        return streaming_margin(
            h, W, b, tgt, seen, w_neg, dt, loss_name, unique, 128
        ).sum()

    l_d, g_d = jax.value_and_grad(dense, argnums=(0, 1, 2))(h, W, b)
    l_s, g_s = jax.jit(jax.value_and_grad(stream, argnums=(0, 1, 2)))(h, W, b)
    assert np.isclose(float(l_d), float(l_s), rtol=1e-5), (float(l_d), float(l_s))
    for a, c in zip(g_d, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6)


def test_streaming_margin_bf16_compute_dtype():
    """Under bf16 compute the correction must evaluate its predictions
    at the SAME precision as the uniform scan so the default-valued
    term cancels (bf16-level tolerance — the two dot orders differ)."""
    h, W, b, tgt, seen, w_neg, dt = _mk(seed=5)

    dense = _dense_oracle(
        h.astype(jnp.bfloat16).astype(jnp.float32),
        W.astype(jnp.bfloat16).astype(jnp.float32), b, tgt, seen, w_neg,
        dt, "hinge", True,
    ).sum()
    stream = streaming_margin(
        h, W, b, tgt, seen, w_neg, dt, "hinge", True, 250,
        compute_dtype=jnp.bfloat16,
    ).sum()
    # bf16 mantissa ~3 decimal digits; the check is that the special
    # columns don't carry an f32-vs-bf16 mismatch (was ~1e-4 relative)
    assert np.isclose(float(dense), float(stream), rtol=2e-2)
