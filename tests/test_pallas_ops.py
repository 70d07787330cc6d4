"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.ops.pallas_rnn import gru_scan
from seqrec_tpu.ops.pallas_topk import fused_score_topk


def _xla_gru_reference(x_pre, mask, w_hid, h0):
    """Plain lax.scan GRU with the same gate math."""
    H = h0.shape[-1]

    def step(h, inp):
        x_t, m = inp
        hid = h @ w_hid
        r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_t[:, H : 2 * H] + hid[:, H : 2 * H])
        c = jnp.tanh(x_t[:, 2 * H :] + r * hid[:, 2 * H :])
        h_new = (1.0 - u) * h + u * c
        h = jnp.where(m[:, None] > 0, h_new, h)
        return h, None

    xs = (jnp.swapaxes(x_pre, 0, 1), jnp.swapaxes(mask, 0, 1))
    h, _ = jax.lax.scan(step, h0, xs)
    return h


def test_gru_scan_matches_xla():
    rng = np.random.default_rng(0)
    B, L, H = 12, 7, 16
    x_pre = jnp.asarray(rng.normal(size=(B, L, 3 * H)).astype(np.float32))
    lengths = rng.integers(1, L + 1, size=B)
    mask = jnp.asarray(
        (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    )
    w_hid = jnp.asarray(rng.normal(0, 0.1, size=(H, 3 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    want = np.asarray(_xla_gru_reference(x_pre, mask, w_hid, h0))
    got = np.asarray(gru_scan(x_pre, mask, w_hid, h0, block_b=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gru_scan_padded_ragged_h_matches_xla():
    """The eval path pads ragged hidden sizes (the reference's H=50) to
    the 64-lane boundary; the padded kernel must match the unpadded XLA
    scan exactly on the real lanes and keep the pad lanes at 0."""
    from seqrec_tpu.ops.pallas_rnn import pad_gate_sections

    rng = np.random.default_rng(3)
    B, L, H, Hp = 6, 9, 50, 64
    x_pre = jnp.asarray(rng.normal(size=(B, L, 3 * H)).astype(np.float32))
    lengths = rng.integers(1, L + 1, size=B)
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    w_hid = jnp.asarray(rng.normal(0, 0.1, size=(H, 3 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    want = np.asarray(_xla_gru_reference(x_pre, mask, w_hid, h0))
    x_p, w_p, h0_p = pad_gate_sections(H, Hp, x_pre, w_hid, h0)
    got_full = np.asarray(gru_scan(x_p, mask, w_p, h0_p, block_b=8, interpret=True))
    np.testing.assert_allclose(got_full[:, :H], want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_full[:, H:], 0.0)


def _xla_lstm_reference(x_pre, mask, w, peep, h0, c0, clip=0.0):
    from seqrec_tpu.ops.core import grad_clip as gclip

    H = h0.shape[-1]
    xs = (jnp.swapaxes(x_pre, 0, 1), jnp.swapaxes(mask, 0, 1)[..., None])

    def step(carry, inp):
        h, c = carry
        x_t, m = inp
        pre = x_t + jnp.dot(h, w, preferred_element_type=jnp.float32)
        if clip:
            pre = gclip(pre, clip)
        i = jax.nn.sigmoid(pre[:, :H] + c * peep[0])
        f = jax.nn.sigmoid(pre[:, H : 2 * H] + c * peep[1])
        g = jnp.tanh(pre[:, 2 * H : 3 * H])
        c_new = f * c + i * g
        o = jax.nn.sigmoid(pre[:, 3 * H :] + c_new * peep[2])
        keep = m > 0
        return (
            jnp.where(keep, o * jnp.tanh(c_new), h),
            jnp.where(keep, c_new, c),
        ), None

    return jax.lax.scan(step, (h0, c0), xs)[0][0]


@pytest.mark.parametrize("clip", [0.0, 0.1])
def test_lstm_scan_train_grads_match_xla(clip):
    """LSTM custom-VJP kernel: forward AND all five gradients (dx, dW,
    dpeepholes, dh0, dc0) vs jax.grad of the XLA reference, incl. the
    Lasagne clip semantics (peephole grads branch off before the clip)."""
    from seqrec_tpu.ops.pallas_lstm_train import lstm_scan_train

    rng = np.random.default_rng(0)
    B, L, H = 6, 11, 16
    x = jnp.asarray(rng.normal(size=(B, L, 4 * H)).astype(np.float32))
    lengths = rng.integers(1, L + 1, size=B)
    mask = jnp.asarray((np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.2)
    peep = jnp.asarray(rng.normal(size=(3, H)).astype(np.float32) * 0.2)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.3)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.3)

    want = _xla_lstm_reference(x, mask, w, peep, h0, c0, clip)
    got = lstm_scan_train(x, mask, w, peep, h0, c0, clip, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def loss_p(x_, w_, p_, h_, c_):
        return jnp.sum(lstm_scan_train(x_, mask, w_, p_, h_, c_, clip, 8, True) ** 2)

    def loss_x(x_, w_, p_, h_, c_):
        return jnp.sum(_xla_lstm_reference(x_, mask, w_, p_, h_, c_, clip) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w, peep, h0, c0)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(x, w, peep, h0, c0)
    for a, b, name in zip(gp, gx, ("dx", "dw", "dpeep", "dh0", "dc0")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5, err_msg=name
        )


def test_auto_block_b():
    from seqrec_tpu.ops.pallas_rnn import auto_block_b

    assert auto_block_b(256, 30, 3 * 64) == 256  # fits the bigger tile
    assert auto_block_b(256, 30, 3 * 128) == 128  # bb=256 would blow VMEM
    assert auto_block_b(16, 30, 3 * 64) == 128  # minimum tile
    assert auto_block_b(256, 30, 3 * 256) is None  # falls back to XLA


def test_gru_scan_matches_tower():
    """Kernel output equals RecurrentLayers.apply for a 1-layer GRU."""
    rl = RecurrentLayers(layer_type="GRU", layers=[8], grad_clipping=0)
    params = rl.init_params(np.random.default_rng(1), true_input_size=20)
    lp = params["layer0_fwd"]
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 20, size=(4, 5, 1)).astype(np.int32)
    mask = np.ones((4, 5), dtype=np.float32)
    mask[2, 3:] = 0

    want = np.asarray(rl.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    x_pre = jnp.asarray(lp["W_in"])[ids[..., 0]] + lp["b"]
    h0 = jnp.broadcast_to(lp["h0"], (4, 8))
    got = np.asarray(
        gru_scan(x_pre, jnp.asarray(mask), jnp.asarray(lp["W_hid"]), h0,
                 block_b=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_items", [100, 513])
def test_fused_score_topk_matches_xla(n_items):
    rng = np.random.default_rng(3)
    B, H, k, S = 9, 16, 10, 6
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, n_items)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=n_items).astype(np.float32))
    seen = rng.integers(0, n_items, size=(B, S)).astype(np.int32)
    seen_mask = (rng.random((B, S)) > 0.4).astype(np.float32)

    # XLA reference
    scores = np.array(h @ w + b)
    for i in range(B):
        for s in range(S):
            if seen_mask[i, s] > 0:
                scores[i, seen[i, s]] = -np.inf
    want_ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]

    vals, ids = fused_score_topk(
        h, w, b, jnp.asarray(seen), jnp.asarray(seen_mask),
        k=k, block_b=8, block_n=128, interpret=True,
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    # values must be sorted descending and match the reference scores
    for i in range(B):
        np.testing.assert_allclose(
            vals[i], np.sort(scores[i])[::-1][:k], rtol=1e-5
        )
        # id sets must agree (ties broken arbitrarily but scores equal)
        np.testing.assert_allclose(
            scores[i, ids[i]], scores[i, want_ids[i]], rtol=1e-5
        )


def test_fused_score_topk_excludes_all_seen():
    rng = np.random.default_rng(4)
    B, H, N = 4, 8, 64
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32))
    b = jnp.zeros(N, jnp.float32)
    seen = np.tile(np.arange(10, dtype=np.int32), (B, 1))
    seen_mask = np.ones((B, 10), np.float32)
    _, ids = fused_score_topk(
        h, w, b, jnp.asarray(seen), jnp.asarray(seen_mask),
        k=5, block_b=4, block_n=64, interpret=True,
    )
    assert not (set(np.asarray(ids).ravel().tolist()) & set(range(10)))


def test_lstm_scan_matches_tower():
    from seqrec_tpu.ops.pallas_rnn import lstm_scan

    rl = RecurrentLayers(layer_type="LSTM", layers=[8], grad_clipping=0)
    params = rl.init_params(np.random.default_rng(5), true_input_size=20)
    lp = params["layer0_fwd"]
    rng = np.random.default_rng(6)
    ids = rng.integers(0, 20, size=(4, 6, 1)).astype(np.int32)
    mask = np.ones((4, 6), dtype=np.float32)
    mask[1, 4:] = 0

    want = np.asarray(rl.apply(params, jnp.asarray(ids), jnp.asarray(mask)))

    x_pre = jnp.asarray(lp["W_in"])[ids[..., 0]] + lp["b"]
    h0 = jnp.broadcast_to(jnp.asarray(lp["h0"]), (4, 8))
    c0 = jnp.broadcast_to(jnp.asarray(lp["c0"]), (4, 8))
    peep = jnp.stack([jnp.asarray(lp[kk]) for kk in ("w_ci", "w_cf", "w_co")])
    got = np.asarray(
        lstm_scan(x_pre, jnp.asarray(mask), jnp.asarray(lp["W_hid"]), peep, h0, c0,
                  block_b=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_topk_gates_off_at_large_catalogs(monkeypatch):
    """Above the measured crossover the eval path must use the XLA
    three-pass, not the fused kernel (ops/pallas_topk.py gate)."""
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_one_hot import RNNOneHot
    from seqrec_tpu.models.updates import Adam
    from seqrec_tpu.ops import pallas_topk

    import seqrec_tpu.models.recurrent as recurrent_mod

    monkeypatch.setattr(recurrent_mod, "_pallas_available", lambda: True)

    def build(n_items):
        model = RNNOneHot(
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[4]),
            updater=Adam(0.01), max_length=4, batch_size=4, seed=0)
        model._prepare_networks(n_items)
        return model

    big = build(pallas_topk.FUSED_TOPK_MAX_ITEMS + 1)
    assert big._fused_topk(None, None, None, None, np.zeros((2, 2)), None, 10) is None
