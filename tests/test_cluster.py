"""RNNCluster / FISMCluster: structure, training, cluster prediction."""

import numpy as np
import pytest

from seqrec_tpu.models.cluster import FISMCluster, RNNCluster
from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.updates import Adam


def _rnn_cluster(handler, **kw):
    opts = dict(
        n_clusters=4,
        loss="Blackout",
        sampling=16,
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        max_length=12,
        batch_size=16,
        seed=0,
    )
    opts.update(kw)
    model = RNNCluster(**opts)
    model.prepare_model(handler)
    return model


@pytest.mark.parametrize("cluster_type", ["softmax", "mix", "sigmoid"])
def test_rnn_cluster_trains(synthetic_handler, cluster_type):
    model = _rnn_cluster(synthetic_handler, cluster_type=cluster_type)
    res, _, _ = model.train(
        synthetic_handler, max_iter=60, progress=60, autosave="None"
    )
    assert res["sps"] is not None
    assert res["assr"] >= 1.0


def test_rnn_cluster_prediction_returns_cluster_size(synthetic_handler):
    model = _rnn_cluster(synthetic_handler)
    model.train(synthetic_handler, max_iter=30, progress=30, autosave="None")
    seq = [[1, 5.0], [2, 4.0], [3, 3.0]]
    recs, n = model.top_k_recommendations(seq, k=5)
    assert isinstance(n, (int, np.integer)) and n >= 1
    assert len(recs) <= 5
    assert not (set(map(int, recs)) & {1, 2, 3})


def test_rnn_cluster_predict_without_clusters(synthetic_handler):
    model = _rnn_cluster(synthetic_handler, predict_with_clusters=False)
    model.train(synthetic_handler, max_iter=20, progress=20, autosave="None")
    recs, n = model.top_k_recommendations([[1, 5.0], [2, 4.0]], k=5)
    assert n == synthetic_handler.n_items
    assert len(recs) == 5


def test_rnn_cluster_save_load_roundtrip(synthetic_handler, tmp_path):
    model = _rnn_cluster(synthetic_handler)
    model.train(synthetic_handler, max_iter=20, progress=20, autosave="None")
    fn = str(tmp_path / "cluster_model")
    model.save(fn)
    model2 = _rnn_cluster(synthetic_handler, seed=9)
    model2.load(fn)
    np.testing.assert_allclose(
        np.asarray(model.params["cluster_repartition"]),
        np.asarray(model2.params["cluster_repartition"]),
    )
    assert hasattr(model2, "clusters")  # load triggers prepare_tests


def test_prepare_tests_every_item_in_some_cluster(synthetic_handler):
    model = _rnn_cluster(synthetic_handler, cluster_type="sigmoid")
    model.params = model._init_params()
    model.prepare_tests()
    all_items = set()
    for c in model.clusters:
        all_items.update(int(i) for i in c)
    assert all_items == set(range(synthetic_handler.n_items))


def test_scale_grows_with_epochs(synthetic_handler):
    model = _rnn_cluster(
        synthetic_handler, scale_growing_rate=2.0, init_scale=1.0, max_scale=8.0
    )
    model.set_dataset(synthetic_handler)
    model._last_epoch = 0.0
    synthetic_handler.training_set.epochs = 2.5
    model._update_scale()
    assert model.effective_scale == 4.0
    synthetic_handler.training_set.epochs = 10.0
    model._update_scale()
    assert model.effective_scale == 8.0  # capped at max_scale
    synthetic_handler.training_set.epochs = 0.0


def test_scale_grows_at_every_epoch_boundary(synthetic_handler):
    """One growth step per integer epoch crossing: epochs 0 -> 1 -> 2 applies
    exactly two growth steps (rnn_cluster.py:61-62 contract)."""
    model = _rnn_cluster(
        synthetic_handler, scale_growing_rate=2.0, init_scale=1.0, max_scale=50.0
    )
    model.set_dataset(synthetic_handler)
    store = synthetic_handler.training_set
    try:
        for e in (0.01, 0.7):  # first epoch: no growth
            store.epochs = e
            model._update_scale()
            assert model.effective_scale == 1.0
        store.epochs = 1.01  # first boundary crossed
        model._update_scale()
        assert model.effective_scale == 2.0
        store.epochs = 1.9  # still within the second epoch
        model._update_scale()
        assert model.effective_scale == 2.0
        store.epochs = 2.05  # second boundary
        model._update_scale()
        assert model.effective_scale == 4.0
    finally:
        store.epochs = 0.0


def test_cluster_batched_prediction_matches_per_user(synthetic_handler):
    """top_k_batch_clustered (group-by-cluster, one matmul per cluster)
    must return the same recommendations AND the same items-in-cluster
    counts as the per-user path (rnn_cluster.py:489-513)."""
    model = _rnn_cluster(synthetic_handler)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model.params = model._init_params()
    model._build_functions()
    model.prepare_tests()

    seqs = []
    for sequence, _ in synthetic_handler.validation_set(epochs=1):
        seqs.append(sequence[: len(sequence) // 2])
    recs, ns = model.top_k_batch_clustered(seqs, k=5)
    assert len(recs) == len(seqs)
    for seq, brec, bn in zip(seqs, recs, ns):
        srec, sn = model.top_k_recommendations(seq, k=5)
        assert bn == sn
        assert set(int(x) for x in brec) == set(int(x) for x in srec)


def test_cluster_batched_prediction_without_clusters(synthetic_handler):
    model = _rnn_cluster(synthetic_handler, predict_with_clusters=False)
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model.params = model._init_params()
    model._build_functions()
    seqs = [
        sequence[: len(sequence) // 2]
        for sequence, _ in synthetic_handler.validation_set(epochs=1)
    ][:8]
    recs, ns = model.top_k_batch_clustered(seqs, k=5)
    assert all(n == synthetic_handler.n_items for n in ns)
    for seq, brec in zip(seqs, recs):
        srec, _ = model.top_k_recommendations(seq, k=5)
        assert set(int(x) for x in brec) == set(int(x) for x in srec)


def test_fism_cluster_trains(synthetic_handler):
    model = FISMCluster(
        h=16,
        alpha=0.5,
        reg=0.001,
        n_clusters=4,
        loss="CCE",
        sampling=16,
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        batch_size=16,
        seed=0,
    )
    model.prepare_model(synthetic_handler)
    res, _, _ = model.train(
        synthetic_handler, max_iter=60, progress=60, autosave="None"
    )
    assert res["sps"] is not None
    recs, n = model.top_k_recommendations([[1, 5.0], [2, 4.0], [3, 3.0]], k=5)
    assert len(recs) <= 5 and n >= 1
