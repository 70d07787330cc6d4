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
        ids, mask, targets = batch["ids"], batch["mask"], batch["targets"]
        assert ids.shape == (16, 10, 1) and mask.shape == (16, 10)
        lengths = mask.sum(axis=1).astype(int)
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
