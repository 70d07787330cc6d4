"""Vectorized packed batcher: consistency with the sequence store and
with the reference multi-cut sampling semantics."""

import numpy as np

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam


def _model(handler, **kw):
    opts = dict(
        recurrent_layer=RecurrentLayers("GRU", [8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=16,
        seed=0,
    )
    opts.update(kw)
    m = RNNOneHot(**opts)
    m.prepare_model(handler)
    m.set_dataset(handler)
    return m


def test_fast_batching_eligibility(synthetic_handler):
    m = _model(synthetic_handler)
    assert m._fast_batching_ok()
    m.target_selection.shuffle = True
    assert not m._fast_batching_ok()
    m.target_selection.shuffle = False
    m.sequence_noise.dropout = 0.5
    assert not m._fast_batching_ok()


def test_packed_batch_matches_store(synthetic_handler):
    m = _model(synthetic_handler)
    store = synthetic_handler.training_set.store
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(3)
    )
    for _ in range(5):
        batch = next(gen)
        ids, targets = batch["ids"], batch["targets"]
        # wire format: prefix lengths instead of a dense mask, narrow ids
        assert "mask" not in batch and batch["lengths"].dtype == np.int32
        assert ids.shape == (16, 10, 1)
        lengths = batch["lengths"].astype(int)
        assert (lengths >= 2).all()
        # every row's prefix+target must appear contiguously in the store
        flat = store.items
        for b in range(16):
            prefix = ids[b, : lengths[b], 0]
            window = np.concatenate([prefix, [targets[b]]])
            found = False
            for r in range(len(store)):
                seq = flat[store.offsets[r] : store.offsets[r + 1]]
                for s in range(len(seq) - len(window) + 1):
                    if (seq[s : s + len(window)] == window).all():
                        found = True
                        break
                if found:
                    break
            assert found, (b, window)
        # popularity weights follow the diversity bias (db=0 -> all ones)
        np.testing.assert_array_equal(batch["target_pop"], np.ones(16))


def test_packed_batch_epoch_counter_advances(synthetic_handler):
    m = _model(synthetic_handler, batch_size=64)
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(0)
    )
    next(gen)
    e1 = synthetic_handler.training_set.epochs
    for _ in range(20):
        next(gen)
    assert synthetic_handler.training_set.epochs > e1


def test_wire_expand_rebuilds_masks(synthetic_handler):
    """_expand_wire must reproduce the dense prefix masks and int32 ids."""
    import jax.numpy as jnp

    m = _model(synthetic_handler, use_ratings_features=True)
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(7)
    )
    batch = next(gen)
    assert batch["ids"].dtype == np.int16  # small catalog -> narrow wire
    expanded = m._expand_wire({k: jnp.asarray(v) for k, v in batch.items()})
    assert expanded["ids"].dtype == jnp.int32
    L = batch["ids"].shape[1]
    want = (np.arange(L)[None, :] < batch["lengths"][:, None]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(expanded["mask"]), want)
    np.testing.assert_array_equal(
        np.asarray(expanded["id_mask"]),
        np.broadcast_to(want[:, :, None], batch["ids"].shape),
    )


def test_dispatch_payload_pipeline_matches(synthetic_handler):
    """The device_put payload path must equal the per-batch list path."""
    a = _model(synthetic_handler, batch_size=8)
    b = _model(synthetic_handler, batch_size=8)
    for m in (a, b):
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
    gen_a = a._gen_packed_mini_batch(synthetic_handler.training_set, np.random.default_rng(9))
    gen_b = b._gen_packed_mini_batch(synthetic_handler.training_set, np.random.default_rng(9))
    payload = next(a._gen_dispatch_payloads(gen_a, 3))
    cost_a = a.train_function_stacked(payload)
    cost_b = b.train_function_multi([next(gen_b) for _ in range(3)])
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a.params["W_out"]), np.asarray(b.params["W_out"]), rtol=1e-5, atol=1e-6
    )


def test_prefetch_wrapper_yields_same_items():
    src = list(range(17))
    out = list(RNNOneHot._prefetch(iter(src), depth=3))
    assert out == src


def test_multi_step_dispatch_matches_single(synthetic_handler):
    """K fused steps must produce the same params as K sequential steps."""
    def make(seed):
        m = _model(synthetic_handler, batch_size=8)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    a, b = make(0), make(0)
    gen_a = a._gen_packed_mini_batch(synthetic_handler.training_set, np.random.default_rng(5))
    gen_b = b._gen_packed_mini_batch(synthetic_handler.training_set, np.random.default_rng(5))

    batches = [next(gen_a) for _ in range(4)]
    _ = [next(gen_b) for _ in range(4)]  # keep generators aligned

    cost_multi = a.train_function_multi(batches)
    costs_single = [b.train_function(x) for x in batches]

    np.testing.assert_allclose(
        float(cost_multi), sum(float(c) for c in costs_single), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.params["W_out"]), np.asarray(b.params["W_out"]), rtol=1e-5, atol=1e-6
    )


def test_stacked_generator_matches_layout(synthetic_handler):
    """n_stack=K yields [K, B, ...] arrays covering K*B distinct cuts."""
    m = _model(synthetic_handler, batch_size=8)
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(4), n_stack=3
    )
    batch = next(gen)
    assert batch["ids"].shape == (3, 8, 10, 1)
    assert batch["lengths"].shape == (3, 8)
    assert batch["targets"].shape == (3, 8)


def test_sampling_restack_draws_fresh_samples(synthetic_handler):
    from seqrec_tpu.models.rnn_sampling import RNNSampling
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.updates import Adam

    m = RNNSampling(
        loss_function="BPR",
        sampling=32,
        recurrent_layer=RecurrentLayers("GRU", [8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    m.prepare_model(synthetic_handler)
    m.set_dataset(synthetic_handler)
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(4), n_stack=4
    )
    batch = next(gen)
    assert batch["samples"].shape == (4, 32)
    # each fused step must see an independent negative-sample draw
    assert any(
        not np.array_equal(batch["samples"][0], batch["samples"][i])
        for i in range(1, 4)
    )


def test_cluster_restack_advances_noise_seed(synthetic_handler):
    from seqrec_tpu.models.cluster import RNNCluster
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.updates import Adam

    m = RNNCluster(
        n_clusters=4,
        loss="Blackout",
        sampling=16,
        recurrent_layer=RecurrentLayers("GRU", [8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
    )
    m.prepare_model(synthetic_handler)
    m.set_dataset(synthetic_handler)
    gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(4), n_stack=3
    )
    batch = next(gen)
    seeds = batch["noise_seed"]
    assert seeds.shape == (3,) and len(set(seeds.tolist())) == 3
    assert batch["samples"].shape[0] == 3 and batch["cluster_samples"].shape[0] == 3
    # stacked payloads must feed the fused dispatch end to end
    m.params = m._init_params()
    m._build_functions()
    m.opt_state = m._opt.init(m.params)
    import jax

    cost = m.train_function_stacked(jax.device_put(batch))
    assert np.isfinite(float(cost))


def test_topk_wire_matches_dense_path(synthetic_handler):
    """Compact-wire top-k must equal the 5-leaf dense-mask top-k."""
    import jax.numpy as jnp

    m = _model(synthetic_handler)
    m.params = m._init_params()
    m._build_functions()
    rng = np.random.default_rng(11)
    seqs = [
        [(int(i), 1.0) for i in rng.integers(0, m.n_items, size=rng.integers(3, 10))]
        for _ in range(16)
    ]
    ids, id_mask, mask = m._encode_sequences(seqs)
    dense = np.asarray(
        m._topk_jit(m.params, ids, id_mask, mask, ids[:, :, 0], mask, 5)
    )
    lengths = mask.sum(axis=1).astype(np.int32)
    wire = np.asarray(
        m._topk_wire_jit(m.params, ids.astype(np.int16), lengths, 5)
    )
    np.testing.assert_array_equal(dense, wire)


def test_index_wire_matches_packed_batcher(synthetic_handler):
    """The index-only wire (rows/cuts + device store) must expand on
    device to exactly the batch the packed numpy assembly produces for
    the same RNG stream."""
    import jax

    m = _model(synthetic_handler)
    assert m._index_batching_ok()
    m.params = m._init_params()
    m._build_functions()
    store = m._upload_index_store(synthetic_handler.training_set)

    packed_gen = m._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(9)
    )
    index_gen = m._gen_index_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(9)
    )
    expand_idx = jax.jit(lambda b: m._expand_index_wire(b, store))
    expand_packed = jax.jit(m._expand_wire)
    for _ in range(4):
        ref = jax.device_get(expand_packed(next(packed_gen)))
        got = jax.device_get(expand_idx(next(index_gen)))
        np.testing.assert_array_equal(got["ids"], ref["ids"])
        np.testing.assert_array_equal(got["mask"], ref["mask"])
        np.testing.assert_array_equal(got["targets"], ref["targets"])
        np.testing.assert_allclose(got["target_pop"], ref["target_pop"])


def test_index_wire_training_matches_compact_wire(synthetic_handler):
    """A fused K-step dispatch over the index wire reaches the same
    parameters as the compact-wire dispatch on the same batches."""
    import jax

    def make(seed):
        m = _model(synthetic_handler, seed=seed)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    K = 3
    a, b = make(5), make(5)
    a._dev_store = a._upload_index_store(synthetic_handler.training_set)

    gen_idx = a._gen_index_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(21), n_stack=K
    )
    gen_packed = b._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(21), n_stack=K
    )
    cost_a = a.train_function_stacked(jax.device_put(next(gen_idx)))
    cost_b = b.train_function_stacked(jax.device_put(next(gen_packed)))
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(a.params), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(b.params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
            err_msg=str(ka),
        )


def test_index_wire_diversity_bias_pop_table(synthetic_handler):
    """target_pop via the on-device pop^db table matches the packed
    path's host-side popularity lookup when diversity bias is on."""
    import jax

    m = _model(synthetic_handler, seed=2)
    m.diversity_bias = 0.7
    m.params = m._init_params()
    m._build_functions()
    store = m._upload_index_store(synthetic_handler.training_set)
    packed = next(
        m._gen_packed_mini_batch(
            synthetic_handler.training_set, np.random.default_rng(4)
        )
    )
    idx = next(
        m._gen_index_mini_batch(
            synthetic_handler.training_set, np.random.default_rng(4)
        )
    )
    got = jax.device_get(m._expand_index_wire(jax.device_put(idx), store))
    np.testing.assert_allclose(
        got["target_pop"], packed["target_pop"], rtol=1e-6
    )


def test_sampling_index_wire_matches_compact_wire(synthetic_handler):
    """RNNSampling's index wire (device assembly + host-drawn negative
    samples) must reproduce the compact-wire dispatch exactly, including
    the negative-sample RNG draw order."""
    import jax
    from seqrec_tpu.models.rnn_sampling import RNNSampling
    from seqrec_tpu.models.updates import Adam

    def make(seed):
        m = RNNSampling(
            loss_function="BPR",
            sampling=12,
            recurrent_layer=RecurrentLayers("GRU", [8]),
            updater=Adam(0.01),
            max_length=10,
            batch_size=16,
            seed=seed,
        )
        m.prepare_model(synthetic_handler)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    K = 3
    a, b = make(7), make(7)
    assert a._index_batching_ok()
    a._dev_store = a._upload_index_store(synthetic_handler.training_set)

    gen_idx = a._gen_index_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(13), n_stack=K
    )
    gen_packed = b._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(13), n_stack=K
    )
    cost_a = a.train_function_stacked(jax.device_put(next(gen_idx)))
    cost_b = b.train_function_stacked(jax.device_put(next(gen_packed)))
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    import jax.tree_util as jtu
    for (ka, va), (kb, vb) in zip(
        sorted(jtu.tree_leaves_with_path(a.params), key=lambda kv: str(kv[0])),
        sorted(jtu.tree_leaves_with_path(b.params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6, err_msg=str(ka)
        )


def test_margin_index_wire_matches_compact_wire(synthetic_handler):
    import jax
    import jax.tree_util as jtu
    from seqrec_tpu.models.rnn_margin import RNNMargin
    from seqrec_tpu.models.updates import Adam

    def make():
        m = RNNMargin(
            loss_function="hinge",
            recurrent_layer=RecurrentLayers("GRU", [8]),
            updater=Adam(0.01),
            max_length=10,
            batch_size=16,
            seed=3,
        )
        m.prepare_model(synthetic_handler)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    K = 3
    a, b = make(), make()
    assert a._index_batching_ok()
    a._dev_store = a._upload_index_store(synthetic_handler.training_set)
    gen_idx = a._gen_index_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(31), n_stack=K
    )
    gen_packed = b._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(31), n_stack=K
    )
    cost_a = a.train_function_stacked(jax.device_put(next(gen_idx)))
    cost_b = b.train_function_stacked(jax.device_put(next(gen_packed)))
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    for (ka, va), (_, vb) in zip(
        sorted(jtu.tree_leaves_with_path(a.params), key=lambda kv: str(kv[0])),
        sorted(jtu.tree_leaves_with_path(b.params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6, err_msg=str(ka)
        )


def test_cluster_index_wire_matches_compact_wire(synthetic_handler):
    import jax
    import jax.tree_util as jtu
    from seqrec_tpu.models.cluster import RNNCluster
    from seqrec_tpu.models.updates import Adam

    def make():
        m = RNNCluster(
            n_clusters=4,
            loss="Blackout",
            sampling=16,
            recurrent_layer=RecurrentLayers("GRU", [8]),
            updater=Adam(0.01),
            max_length=10,
            batch_size=16,
            seed=5,
        )
        m.prepare_model(synthetic_handler)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    K = 3
    a, b = make(), make()
    assert a._index_batching_ok()
    a._dev_store = a._upload_index_store(synthetic_handler.training_set)
    gen_idx = a._gen_index_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(41), n_stack=K
    )
    gen_packed = b._gen_packed_mini_batch(
        synthetic_handler.training_set, np.random.default_rng(41), n_stack=K
    )
    cost_a = a.train_function_stacked(jax.device_put(next(gen_idx)))
    cost_b = b.train_function_stacked(jax.device_put(next(gen_packed)))
    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    for (ka, va), (_, vb) in zip(
        sorted(jtu.tree_leaves_with_path(a.params), key=lambda kv: str(kv[0])),
        sorted(jtu.tree_leaves_with_path(b.params), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6, err_msg=str(ka)
        )


def test_fism_cluster_stays_off_index_wire(synthetic_handler):
    from seqrec_tpu.models.cluster import FISMCluster
    from seqrec_tpu.models.updates import Adam

    m = FISMCluster(
        n_clusters=4,
        sampling=16,
        updater=Adam(0.01),
        batch_size=8,
        seed=0,
    )
    m.prepare_model(synthetic_handler)
    m.set_dataset(synthetic_handler)
    # bag-of-items input + max_length=inf: must not take the index wire
    assert not m._index_batching_ok()
