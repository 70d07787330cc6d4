"""SDAE and LTM: unit + convergence smoke tests."""

import numpy as np

import jax.numpy as jnp

from seqrec_tpu.models.ltm import LTM
from seqrec_tpu.models.sdae import StackedDenoisingAutoencoder
from seqrec_tpu.models.updates import Adam


def test_sdae_bag_encoding(synthetic_handler):
    model = StackedDenoisingAutoencoder(layers=[8], updater=Adam(0.01), batch_size=4)
    model.prepare_model(synthetic_handler)
    ids = jnp.asarray(np.array([[1, 3, 0], [2, 2, 0]], dtype=np.int32))
    mask = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], dtype=np.float32))
    bag = np.asarray(model._bag(ids, mask))
    assert bag.shape == (2, synthetic_handler.n_items)
    assert bag[0, 1] == 1 and bag[0, 3] == 1 and bag[0, 0] == 0
    assert bag[1, 2] == 1 and bag[1].sum() == 1  # masked duplicate ignored


def test_sdae_eval_bag_not_truncated(synthetic_handler):
    """A >max_length first half must be consumed WHOLE (the reference SDAE
    feeds the entire first half, stacked_denoising_autoencoder.py:147-149):
    staged-eval scores must match an untruncated numpy one-hot oracle."""
    model = StackedDenoisingAutoencoder(
        layers=[8], updater=Adam(0.01), batch_size=4, max_length=16, seed=0
    )
    model.prepare_model(synthetic_handler)
    model.params = model._init_params()
    model._build_functions()
    n = synthetic_handler.n_items
    rng = np.random.default_rng(3)
    items = rng.choice(n, size=40, replace=False)  # 40 > max_length=16
    seq = [[int(i), 5.0] for i in items]

    # oracle: full multi-hot -> forward in numpy
    x = np.zeros(n, dtype=np.float32)
    x[items] = 1.0
    h = np.maximum(x @ model.params["W0"] + model.params["b0"], 0.0)
    logits = h @ model.params["W_out"] + model.params["b_out"]
    oracle = 1.0 / (1.0 + np.exp(-logits))
    oracle[items] = -np.inf  # seen-item masking
    want = set(np.argsort(-oracle)[:5].tolist())

    staged = model._stage_eval_inputs([seq])
    got = set(int(v) for v in model._topk_from_staged(staged, k=5)[0])
    assert got == want

    # single-user path agrees too
    recs = model.top_k_recommendations(seq, k=5)
    assert set(int(v) for v in recs) == want


def test_sdae_learns(synthetic_handler):
    model = StackedDenoisingAutoencoder(
        layers=[32], input_dropout=0.3, dropout=0.3,
        updater=Adam(0.005), batch_size=32, seed=0,
    )
    model.prepare_model(synthetic_handler)
    res, _, _ = model.train(
        synthetic_handler, max_iter=300, progress=300, autosave="None"
    )
    # SDAE reconstructs the user's item set; recall should be non-trivial
    assert res["recall"] is not None and res["recall"] > 0.05, res


def test_ltm_cbow_step_moves_embeddings(synthetic_handler):
    model = LTM(k=8, window=3, seed=0)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model._init_w2v()
    model._init_training_aux()
    before = np.asarray(model.syn0).copy()
    loss = model._train_one_epoch(0.05)
    assert loss > 0
    # first step only moves syn1neg (context grad is sum of g·v with v=0);
    # the second epoch must move syn0
    model._train_one_epoch(0.05)
    after = np.asarray(model.syn0)
    assert np.abs(after - before).sum() > 0
    assert np.abs(np.asarray(model.syn1neg)).sum() > 0


def test_ltm_trains_and_predicts(synthetic_handler):
    model = LTM(k=16, window=3, learning_rate=0.05, seed=0)
    model.prepare_model(synthetic_handler)
    res, _, _ = model.train(
        synthetic_handler, max_iter=3, progress=3, autosave="None"
    )
    assert res["sps"] is not None
    seq = [[1, 5.0], [2, 4.0], [3, 3.0], [4, 2.0]]
    recs = model.top_k_recommendations(seq, k=5)
    assert len(recs) == 5
    assert not (set(recs) & {1, 2, 3, 4})  # seen excluded


def test_ltm_query_features_match_ewma_loop(synthetic_handler):
    """Closed-form EWMA weights must equal the reference-shaped
    step-by-step recurrence (ltm.py:62-69)."""
    model = LTM(k=8, window=3, alpha=0.8, seed=0)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model._init_w2v()
    rng = np.random.default_rng(1)
    seq = [[int(i), 5.0] for i in rng.integers(0, model.n_items, size=9)]
    loop = model.user_features(seq)
    closed = model._query_features(seq, np.asarray(model.syn0))
    np.testing.assert_allclose(closed, loop, rtol=1e-5, atol=1e-7)


def test_ltm_batched_prediction_matches_per_user(synthetic_handler):
    model = LTM(k=16, window=4, seed=0)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model._init_w2v()
    model.syn0 = model.syn0 + 0.1 * np.random.default_rng(0).random(model.syn0.shape)
    instances = []
    for sequence, user_id in synthetic_handler.validation_set(epochs=1):
        instances.append((sequence[: len(sequence) // 2], user_id))
    batched = model.top_k_batch(instances, k=10)
    for (seq, _), brow in zip(instances, batched):
        single = model.top_k_recommendations(seq, k=10)
        assert set(int(x) for x in brow) == set(int(x) for x in single)


def test_ltm_epoch_positions_vectorized_semantics(synthetic_handler):
    """Window invariants of the one-pass epoch builder: every context id
    lies within `window` of the center inside the same sequence, padded
    slots are masked, and the total position count equals the number of
    tokens with a non-empty context."""
    model = LTM(k=8, window=3, seed=0, batch_positions=256)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    store = synthetic_handler.training_set.store
    n_tokens = int(store.lengths.sum())
    n_single = int((store.lengths == 1).sum())  # empty-context positions
    seen_rows = 0
    for ctx, mask, center, row_mask in model._epoch_positions():
        m = int(row_mask.sum())
        seen_rows += m
        assert (mask[:m].sum(axis=1) >= 1).all()
        assert (mask[row_mask == 0] == 0).all()
        # context size never exceeds 2*window
        assert mask.shape[1] == 2 * model.window
    assert seen_rows == n_tokens - n_single


def test_ltm_save_load_roundtrip(synthetic_handler, tmp_path):
    model = LTM(k=8, window=3, seed=0)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model._init_w2v()
    fn = str(tmp_path / model._get_model_filename(1.0))
    model.save(fn)
    model2 = LTM(k=8, window=3, seed=1)
    model2.prepare_model(synthetic_handler)
    model2.load(fn)
    np.testing.assert_allclose(np.asarray(model.syn0), np.asarray(model2.syn0))
