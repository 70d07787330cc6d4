"""RNN family: unit oracles for losses, tower behavior, and convergence
smoke tests (SURVEY.md §4 points 3-4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.rnn_sampling import RNNSampling
from seqrec_tpu.models.rnn_margin import RNNMargin
from seqrec_tpu.models.updates import Adam
from seqrec_tpu.ops import losses
from seqrec_tpu.ops.core import gather_sum, masked_top_k


# ----------------------------------------------------------------------
# ops
# ----------------------------------------------------------------------
def test_gather_sum_matches_onehot_matmul():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(20, 8)).astype(np.float32)
    ids = rng.integers(0, 20, size=(4, 5, 3)).astype(np.int32)
    id_mask = (rng.random((4, 5, 3)) > 0.3).astype(np.float32)
    got = np.asarray(gather_sum(jnp.asarray(table), jnp.asarray(ids), jnp.asarray(id_mask)))
    # dense reference
    onehot = np.zeros((4, 5, 20), dtype=np.float32)
    for b in range(4):
        for t in range(5):
            for f in range(3):
                if id_mask[b, t, f]:
                    onehot[b, t, ids[b, t, f]] += 1
    want = onehot @ table
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_top_k_excludes_seen():
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6], [0.1, 0.2, 0.3, 0.4]])
    seen_ids = jnp.asarray([[0, 0], [3, 0]], dtype=jnp.int32)
    seen_mask = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    ids = np.asarray(masked_top_k(scores, 2, seen_ids, seen_mask))
    assert ids[0].tolist() == [1, 2]  # 0 masked; padding slot (id 0) ignored... already masked
    assert ids[1].tolist() == [2, 1]  # 3 masked, 0 NOT masked (mask=0)


def test_grouped_top_k_matches_lax_top_k():
    """The two-level exact selection must return the same VALUES as a
    full lax.top_k (ids may swap only between equal values)."""
    from seqrec_tpu.ops.core import grouped_top_k

    rng = np.random.default_rng(0)
    # NB: (4, 1000, 10) has G=8 < k and covers the lax.top_k FALLBACK
    # branch; the other two exercise the two-level selection itself
    for B, N, k in ((4, 1000, 10), (3, 4096, 5), (2, 1280, 10)):
        scores = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
        want_v, want_i = jax.lax.top_k(scores, k)
        got_v, got_i = grouped_top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        # ids must point at the values they claim
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(scores), np.asarray(got_i), 1),
            np.asarray(got_v),
        )


def test_grouped_top_k_collisions_and_ties():
    from seqrec_tpu.ops.core import grouped_top_k

    # all top-k clustered inside ONE 128-lane group (within-group
    # collisions) plus exact ties straddling groups
    N, k = 1024, 6
    scores = np.zeros((2, N), dtype=np.float32)
    scores[0, 40:46] = [9, 8, 7, 6, 5, 4]  # same group
    scores[1, [10, 200, 300]] = 5.0  # three-way tie across groups
    scores[1, [400, 500]] = 7.0
    got_v, got_i = grouped_top_k(jnp.asarray(scores), k)
    want_v, _ = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(
        np.take_along_axis(scores, np.asarray(got_i), 1), np.asarray(got_v)
    )


def test_masked_top_k_grouped_path_matches_dense():
    """Above GROUPED_TOPK_MIN_ITEMS the masked path must stay exact."""
    from seqrec_tpu.ops import core

    rng = np.random.default_rng(1)
    B, S, k = 4, 8, 10
    N = core.GROUPED_TOPK_MIN_ITEMS
    scores = rng.normal(size=(B, N)).astype(np.float32)
    seen = rng.integers(0, N, size=(B, S)).astype(np.int32)
    sm = np.ones((B, S), dtype=np.float32)
    got = np.asarray(masked_top_k(jnp.asarray(scores), k, jnp.asarray(seen), jnp.asarray(sm)))
    masked = scores.copy()
    np.put_along_axis(masked, seen, -np.inf, axis=1)
    want = np.argsort(-masked, axis=1)[:, :k]
    np.testing.assert_array_equal(
        np.take_along_axis(masked, got, 1), np.take_along_axis(masked, want, 1)
    )


def test_cce_loss_oracle():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 1.0, 0.0]])
    targets = jnp.asarray([2, 0])
    got = np.asarray(losses.log_softmax_cce(logits, targets))
    want = -np.log(
        [
            np.exp(3) / (np.exp(1) + np.exp(2) + np.exp(3)),
            np.exp(3) / (np.exp(3) + np.exp(1) + np.exp(0)),
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_bpr_loss_oracle():
    # B=2, S=2; diag = own target scores
    scores = jnp.asarray([[2.0, 0.0, 1.0, 0.5], [0.0, 1.5, 1.0, 2.0]])
    got = np.asarray(losses.bpr_loss(scores, 2))

    def s(x):
        return 1 / (1 + np.exp(-x))

    want0 = -np.mean([np.log(s(2.0 - 1.0)), np.log(s(2.0 - 0.5))])
    want1 = -np.mean([np.log(s(1.5 - 1.0)), np.log(s(1.5 - 2.0))])
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-6)


def test_top1_loss_oracle():
    scores = jnp.asarray([[2.0, 0.0, 1.0, 0.5], [0.0, 1.5, 1.0, 2.0]])
    got = np.asarray(losses.top1_loss(scores, 2))

    def s(x):
        return 1 / (1 + np.exp(-x))

    want0 = np.mean([s(1.0 - 2.0) + s(1.0), s(0.5 - 2.0) + s(0.25)])
    np.testing.assert_allclose(got[0], want0, rtol=1e-6)


def test_blackout_loss_decreases_with_confidence():
    # higher own-target score => lower loss
    lo = losses.blackout_loss(jnp.asarray([[1.0, 0.0, 0.0]]), 1)
    hi = losses.blackout_loss(jnp.asarray([[5.0, 0.0, 0.0]]), 1)
    assert float(hi[0]) < float(lo[0])


def test_margin_losses_oracle():
    pred = jnp.asarray([[0.5, -0.5]])
    Y = jnp.asarray([[1.0, 0.0]])
    W = jnp.asarray([[-1.0, 0.1]])
    hinge = float(losses.hinge_loss(pred, Y, W)[0])
    # (0.5-1)*(-1)=0.5 ; (-0.5-0)*0.1=-0.05 -> relu: 0.5 + 0
    assert hinge == pytest.approx(0.5)


# ----------------------------------------------------------------------
# recurrent tower
# ----------------------------------------------------------------------
@pytest.mark.parametrize("layer_type", ["GRU", "LSTM", "Vanilla"])
def test_tower_mask_keeps_state(layer_type):
    """Padding steps must not change the final hidden state."""
    rl = RecurrentLayers(layer_type=layer_type, layers=[16])
    params = rl.init_params(np.random.default_rng(0), true_input_size=30)
    ids_short = jnp.asarray(np.array([[[1], [2], [3], [0], [0]]], dtype=np.int32))
    mask_short = jnp.asarray(np.array([[1, 1, 1, 0, 0]], dtype=np.float32))
    ids_exact = jnp.asarray(np.array([[[1], [2], [3]]], dtype=np.int32))
    mask_exact = jnp.asarray(np.ones((1, 3), dtype=np.float32))
    h_padded = np.asarray(rl.apply(params, ids_short, mask_short))
    h_exact = np.asarray(rl.apply(params, ids_exact, mask_exact))
    np.testing.assert_allclose(h_padded, h_exact, rtol=1e-5, atol=1e-6)


def test_tower_bidirectional_output_size():
    rl = RecurrentLayers(layer_type="GRU", layers=[8, 8], bidirectional=True)
    params = rl.init_params(np.random.default_rng(0), true_input_size=30)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 30, (2, 6, 1)).astype(np.int32))
    mask = jnp.asarray(np.ones((2, 6), dtype=np.float32))
    h = rl.apply(params, ids, mask)
    assert h.shape == (2, 16)
    assert rl.output_size == 16


def test_tower_embedding_mode():
    rl = RecurrentLayers(layer_type="GRU", layers=[8], embedding_size=4)
    params = rl.init_params(np.random.default_rng(0), true_input_size=30)
    assert params["embedding"].shape == (30, 4)
    assert params["layer0_fwd"]["W_in"].shape == (4, 24)
    ids = jnp.asarray(np.zeros((2, 5, 1), dtype=np.int32))
    mask = jnp.asarray(np.ones((2, 5), dtype=np.float32))
    assert rl.apply(params, ids, mask).shape == (2, 8)


def test_tower_gradients_flow():
    rl = RecurrentLayers(layer_type="GRU", layers=[8])
    params = rl.init_params(np.random.default_rng(0), true_input_size=30)
    ids = jnp.asarray(np.array([[[1], [2], [3]]], dtype=np.int32))
    mask = jnp.asarray(np.ones((1, 3), dtype=np.float32))

    def loss(p):
        return jnp.sum(rl.apply(p, ids, mask) ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["layer0_fwd"]["W_hid"])
    assert np.abs(g).sum() > 0


# ----------------------------------------------------------------------
# model-level convergence smoke tests
# ----------------------------------------------------------------------
def _train_model(model, handler, iters=250):
    model.prepare_model(handler)
    res, _, _ = model.train(
        handler, max_iter=iters, progress=iters, autosave="None", save_dir=""
    )
    return res


def _pop_floor(handler):
    from seqrec_tpu.models.lazy import Pop
    from seqrec_tpu.utils.evaluation import Evaluator

    pop = Pop()
    pop.prepare_model(handler)
    ev = Evaluator(handler, k=10)
    for sequence, _ in handler.validation_set(epochs=1):
        half = int(len(sequence) / 2)
        recs = pop.top_k_recommendations(sequence[:half], k=10)
        ev.add_instance([i[0] for i in sequence[half:]], recs)
    return ev.sps()


def test_rnn_cce_beats_pop(synthetic_handler):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[24]),
        updater=Adam(0.01),
        max_length=20,
        batch_size=32,
        seed=0,
    )
    res = _train_model(model, synthetic_handler)
    floor = _pop_floor(synthetic_handler)
    assert res["sps"] > floor + 0.05, (res["sps"], floor)


def test_rnn_sampling_bpr_learns(synthetic_handler):
    model = RNNSampling(
        loss_function="BPR",
        sampling=16,
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[24]),
        updater=Adam(0.02),
        max_length=20,
        batch_size=32,
        seed=0,
    )
    res = _train_model(model, synthetic_handler)
    floor = _pop_floor(synthetic_handler)
    assert res["sps"] > floor, (res["sps"], floor)


def test_rnn_margin_hinge_learns(synthetic_handler):
    model = RNNMargin(
        loss_function="hinge",
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[24]),
        updater=Adam(0.02),
        max_length=20,
        batch_size=32,
        seed=0,
    )
    res = _train_model(model, synthetic_handler)
    floor = _pop_floor(synthetic_handler)
    assert res["sps"] > floor, (res["sps"], floor)


def test_save_load_roundtrip(synthetic_handler, tmp_path):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    model.prepare_model(synthetic_handler)
    model.train(synthetic_handler, max_iter=5, progress=5, autosave="None")
    seq = [[1, 5.0], [2, 4.0], [3, 3.0]]
    recs_before = model.top_k_recommendations(seq, k=5)
    fn = str(tmp_path / model._get_model_filename(1.0))
    model.save(fn)

    model2 = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=1,
    )
    model2.prepare_model(synthetic_handler)
    model2.load(fn)
    recs_after = model2.top_k_recommendations(seq, k=5)
    assert recs_before == recs_after


def test_load_last_picks_highest_epoch(synthetic_handler, tmp_path):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    model.prepare_model(synthetic_handler)
    model.params = model._init_params()
    d = str(tmp_path) + "/"
    model.save(d + model._get_model_filename(1.5))
    model.save(d + model._get_model_filename(3.0))
    assert model.load_last(d) == 3.0


def test_pareto_front():
    model = RNNOneHot()
    metrics = {"sps": [0.1, 0.3, 0.2], "recall": [0.3, 0.1, 0.25]}
    front = model.get_pareto_front(metrics, ["sps", "recall"])
    assert set(front) == {0, 1, 2}
    # ties on one axis keep weakly-dominated points (rnn_base.py:165-173
    # uses >=, so run 2 survives via its sps tie with run 1)
    metrics2 = {"sps": [0.1, 0.3, 0.3], "recall": [0.1, 0.3, 0.2]}
    front2 = model.get_pareto_front(metrics2, ["sps", "recall"])
    assert front2 == [1, 2]
    metrics3 = {"sps": [0.1, 0.3, 0.2], "recall": [0.1, 0.3, 0.25]}
    front3 = model.get_pareto_front(metrics3, ["sps", "recall"])
    assert front3 == [1]


def test_bf16_compute_dtype(synthetic_handler):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=16,
        seed=0,
        compute_dtype="bfloat16",
    )
    model.prepare_model(synthetic_handler)
    res, _, _ = model.train(
        synthetic_handler, max_iter=60, progress=60, autosave="None"
    )
    assert res["sps"] is not None and np.isfinite(res["sps"])


def test_optimizer_state_checkpointing(synthetic_handler, tmp_path):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    model.save_optimizer_state = True
    model.prepare_model(synthetic_handler)
    model.train(synthetic_handler, max_iter=5, progress=5, autosave="None")
    fn = str(tmp_path / "ckpt")
    model.save(fn)

    model2 = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=1,
    )
    model2.prepare_model(synthetic_handler)
    model2.load(fn)
    assert model2.opt_state is not None
    a = jax.tree_util.tree_leaves(model.opt_state)
    b = jax.tree_util.tree_leaves(model2.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_validation_cache_reuses_staged_inputs(synthetic_handler):
    """Validation inputs are deterministic across checkpoints, so the
    encoded + uploaded chunks are cached; cached calls must return the
    same metrics as the first (fresh) pass."""
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_one_hot import RNNOneHot
    from seqrec_tpu.models.updates import Adam

    m = RNNOneHot(
        recurrent_layer=RecurrentLayers("GRU", [8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    m.prepare_model(synthetic_handler)
    m.set_dataset(synthetic_handler)
    m.params = m._init_params()
    m._build_functions()

    metrics = {k: [] for k in m.metrics}
    m._compute_validation_metrics(metrics)
    assert m._val_cache is not None
    staged_first = m._val_cache[1]
    m._compute_validation_metrics(metrics)
    assert m._val_cache[1] is staged_first  # reused, not re-uploaded
    for vals in metrics.values():
        assert vals[0] == vals[1]

    # --rand_test_target randomizes goals: the cache must stay off
    m.target_selection.determinist_test = False
    m._compute_validation_metrics(metrics)
    assert m._val_cache[1] is staged_first  # cache untouched, not refreshed
