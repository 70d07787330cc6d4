"""--mf/--uf side-feature input mode (rnn_base.py:546-613 semantics)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from seqrec_tpu.data.features import load_feature_tables, year_to_decade_idx
from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam
from seqrec_tpu.ops.core import gather_sum


def test_year_to_decade_matches_reference():
    """Oracle: the reference's year_to_decade (rnn_base.py:554-565)."""
    def ref(year):
        if year < 1950:
            return 0
        if year < 2000:
            return int((year - 1900) / 10) - 4
        return int((year - 2000) / 10) + 6

    years = [1890, 1949, 1950, 1959, 1960, 1975, 1999, 2000, 2009, 2010, 2015]
    got = year_to_decade_idx(np.array(years))
    want = [ref(y) for y in years]
    assert got.tolist() == want


def test_gather_sum_masks_negative_pad_ids():
    table = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    ids = jnp.asarray(np.array([[0, 2, -1], [1, -1, -1]], dtype=np.int32))
    out = np.asarray(gather_sum(table, ids))
    np.testing.assert_allclose(out[0], np.arange(3) + (np.arange(3) + 6))
    np.testing.assert_allclose(out[1], np.arange(3) + 3)


@pytest.fixture(scope="module")
def featured_dataset(synthetic_dataset, synthetic_handler):
    """Write movie/user feature files into the shared synthetic dataset
    (only read when --mf/--uf are on, so other tests are unaffected)."""
    rng = np.random.default_rng(9)
    n_items = synthetic_handler.n_items
    n_users = synthetic_handler.n_users
    G = 4
    rows = []
    for i in range(n_items):
        year = int(rng.integers(1940, 2016))
        genres = (rng.random(G) < 0.4).astype(int)
        rows.append([i, year] + genres.tolist())
    np.savetxt(
        os.path.join(str(synthetic_dataset), "data", "movie_features"),
        np.array(rows, dtype=np.int64), fmt="%d", delimiter="\t",
    )
    urows = [
        [u, int(rng.integers(0, 2)), int(rng.integers(0, 7)), int(rng.integers(0, 21))]
        for u in range(n_users)
    ]
    np.savetxt(
        os.path.join(str(synthetic_dataset), "data", "user_features"),
        np.array(urows, dtype=np.int64), fmt="%d", delimiter="\t",
    )
    return synthetic_handler


def _featured_model(handler, **kw):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
        use_ratings_features=True,
        use_movies_features=True,
        use_users_features=True,
        **kw,
    )
    model.prepare_model(handler)
    model.set_dataset(handler)
    return model


def test_feature_tables_and_input_size(featured_dataset):
    model = _featured_model(featured_dataset)
    ft = model._feature_tables
    G = 4
    assert ft.n_movie_feats == 8 + G + 10 + 10
    assert ft.n_user_feats == 30
    # rf(10) + movies + users after the item one-hot block
    assert model._input_size() == featured_dataset.n_items + 10 + (28 + G) + 30
    # slots: item + rating + (decade, avg, pop, genres<=G) + (sex, age, occ)
    assert model.n_feature_slots == 1 + 1 + ft.item_slots + 3
    # every id within bounds, pads negative
    mf_off, uf_off = model._feature_offsets()
    assert mf_off == featured_dataset.n_items + 10
    assert uf_off == mf_off + ft.n_movie_feats


def test_encode_matches_reference_feature_semantics(featured_dataset):
    """Spot-check one (item, rating, user) against hand-computed ids."""
    model = _featured_model(featured_dataset)
    ft = model._feature_tables
    n = featured_dataset.n_items
    mf_off, uf_off = model._feature_offsets()
    seq = [[3, 4.0], [5, 2.5]]
    ids, id_mask, mask = model._encode_sequences([seq], user_ids=[2])
    row = ids[0, 0]
    assert row[0] == 3
    assert row[1] == n + int(round(4.0 * 2)) - 1  # personal-rating bucket
    valid = row[2:][row[2:] >= 0]
    # all movie/user ids inside their blocks
    mf_ids = [v for v in valid if mf_off <= v < mf_off + ft.n_movie_feats]
    uf_ids = [v for v in valid if uf_off <= v < uf_off + 30]
    assert len(uf_ids) == 3
    # decade + avg + pop always present, genres variable
    assert len(mf_ids) >= 3
    # padded timesteps carry -1 feature slots
    assert (ids[0, len(seq):, 1:] == -1).all()
    # user features identical across the user's timesteps
    assert (ids[0, 0, -3:] == ids[0, 1, -3:]).all()


def test_packed_batcher_matches_slow_encoder(featured_dataset):
    """The vectorized packed batcher must emit the same feature ids as
    _encode_sequences for identical (row, cut) picks."""
    model = _featured_model(featured_dataset)
    store = featured_dataset.training_set.store
    gen = model._gen_packed_mini_batch(
        featured_dataset.training_set, np.random.default_rng(0)
    )
    batch = next(gen)
    # reconstruct ids for row 0 of the packed batch via the slow encoder:
    # the wire ships int16 ids + lengths; expand manually
    ids16 = np.asarray(batch["ids"]).astype(np.int32)
    lengths = np.asarray(batch["lengths"])
    L = ids16.shape[1]
    # find the matching (row, cut) by comparing item prefixes is fragile;
    # instead just validate invariants: pad slots -1 beyond lengths, user
    # ids constant within a row, all ids < input_size
    assert ids16.max() < model._input_size()
    for b in range(ids16.shape[0]):
        ln = int(lengths[b])
        assert (ids16[b, ln:, 1:] == -1).all()
        if ln > 1:
            assert (ids16[b, :ln, -3:] == ids16[b, 0, -3:]).all()


def test_featured_model_trains_and_predicts(featured_dataset):
    model = _featured_model(featured_dataset)
    res, _, _ = model.train(
        featured_dataset, max_iter=40, progress=40, autosave="None"
    )
    assert res["sps"] is not None and np.isfinite(res["recall"])
    seq = [[1, 5.0], [2, 4.0], [3, 3.0]]
    recs = model.top_k_recommendations(seq, user_id=0, k=5)
    assert len(recs) == 5


def test_featured_index_wire_matches_host_encoding(featured_dataset):
    """The on-device index-wire batch assembly must produce the same ids
    as the host packed batcher for the same (rows, cuts)."""
    import jax

    model = _featured_model(featured_dataset)
    model.params = model._init_params()
    model._build_functions()
    store_host = model._build_index_store(featured_dataset.training_set)
    store_dev = jax.device_put(store_host)
    rng = np.random.default_rng(4)
    st = featured_dataset.training_set.store
    rows = rng.choice(np.where(st.lengths >= 3)[0], size=6).astype(np.int32)
    cuts = np.array([int(rng.integers(2, st.lengths[r])) for r in rows], np.int32)
    out = model._expand_index_wire({"rows": rows, "cuts": cuts}, store_dev)
    dev_ids = np.asarray(out["ids"])

    # host encoding of the same windows
    L = model.max_length
    seqs, users = [], []
    for r, c in zip(rows, cuts):
        items, ratings, uid = st.sequence(int(r))
        start = max(0, int(c) - L)
        seqs.append([[int(i), float(rr)] for i, rr in
                     zip(items[start:c], ratings[start:c])])
        users.append(int(uid))
    host_ids, _, host_mask = model._encode_sequences(seqs, user_ids=users)
    m = host_mask.astype(bool)
    np.testing.assert_array_equal(dev_ids[m], host_ids[m])


def test_featured_model_trains_on_mesh(featured_dataset):
    """--mf/--uf combined with --mesh: feature tables replicate with the
    store; the sharded index-wire loop must run end-to-end."""
    import jax

    from seqrec_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    model = _featured_model(featured_dataset)
    model.set_mesh(mesh)
    model.steps_per_dispatch = 2
    res, _, _ = model.train(
        featured_dataset, max_iter=8, progress=8, autosave="None"
    )
    assert res["sps"] is not None and np.isfinite(res["recall"])


def test_missing_feature_file_raises(synthetic_handler, tmp_path):
    from seqrec_tpu.data.synthetic import make_dataset
    from seqrec_tpu.data import DataHandler

    d = make_dataset(str(tmp_path / "nf"), n_users=40, n_items=30,
                     min_len=5, max_len=10, seed=1)
    handler = DataHandler(d)
    with pytest.raises(FileNotFoundError, match="movie_features"):
        load_feature_tables(handler, True, False)
