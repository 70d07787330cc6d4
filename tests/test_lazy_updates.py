"""Row-sparse (lazy) Adam for the catalog input table (--lazy_updates).

Oracles:
- when a batch touches EVERY table row, lazy Adam is mathematically
  identical to dense Adam (the dense grad rows and global step count
  coincide), so full-coverage batches give bit-comparable trajectories;
- rows a step does not touch must stay frozen (TF LazyAdam semantics),
  whereas dense Adam keeps applying decayed momentum to them.
"""

import numpy as np
import pytest

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam, RMSProp

N_ITEMS = 8


def _model(lazy: bool, hidden=6):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[hidden]),
        updater=Adam(0.01),
        max_length=4,
        batch_size=4,
        seed=0,
        lazy_updates=lazy,
    )
    model._prepare_networks(N_ITEMS)
    model.params = model._init_params()
    model._build_functions()
    model.opt_state = model._opt.init(model.params)
    return model


def _batch(ids):
    ids = np.asarray(ids, dtype=np.int32)
    B, L = ids.shape
    return {
        "ids": ids[..., None],
        "mask": np.ones((B, L), dtype=np.float32),
        "targets": np.arange(B, dtype=np.int32) % N_ITEMS,
        "target_pop": np.ones((B,), dtype=np.float32),
    }


def test_lazy_matches_dense_when_all_rows_touched():
    full = np.arange(N_ITEMS, dtype=np.int32).reshape(4, 2)
    full = np.concatenate([full, full[:, ::-1]], axis=1)  # [4, 4], covers 0..7
    dense, lazy = _model(False), _model(True)
    for step in range(4):
        cd = dense.train_function(_batch(full))
        cl = lazy.train_function(_batch(full))
        np.testing.assert_allclose(float(cd), float(cl), rtol=1e-6)
    pd = dense.params["tower"]["layer0_fwd"]["W_in"]
    pl = lazy.params["tower"]["layer0_fwd"]["W_in"]
    np.testing.assert_allclose(np.asarray(pd), np.asarray(pl), rtol=2e-5, atol=1e-6)
    # the rest of the pytree goes through the SAME optax path
    np.testing.assert_allclose(
        np.asarray(dense.params["W_out"]), np.asarray(lazy.params["W_out"]),
        rtol=2e-5, atol=1e-6,
    )


def test_lazy_freezes_untouched_rows():
    lazy = _model(True)
    touch_all = _batch(np.arange(N_ITEMS, dtype=np.int32).reshape(4, 2).repeat(2, axis=1))
    lazy.train_function(touch_all)  # every row gains momentum
    after_first = np.asarray(lazy.params["tower"]["layer0_fwd"]["W_in"]).copy()

    only01 = _batch(np.array([[0, 1, 0, 1]] * 4))
    for _ in range(3):
        lazy.train_function(only01)
    after = np.asarray(lazy.params["tower"]["layer0_fwd"]["W_in"])
    # untouched rows are FROZEN...
    np.testing.assert_array_equal(after[2:], after_first[2:])
    # ...while touched rows moved
    assert np.abs(after[:2] - after_first[:2]).max() > 0

    # dense Adam, by contrast, keeps moving row 2+ on decayed momentum
    dense = _model(False)
    dense.train_function(touch_all)
    d_first = np.asarray(dense.params["tower"]["layer0_fwd"]["W_in"]).copy()
    for _ in range(3):
        dense.train_function(only01)
    d_after = np.asarray(dense.params["tower"]["layer0_fwd"]["W_in"])
    assert np.abs(d_after[2:] - d_first[2:]).max() > 0


def test_lazy_multi_step_dispatch_matches_single_steps():
    """The fused K-step scan path must apply the same lazy updates as K
    single-step dispatches."""
    a, b = _model(True), _model(True)
    rng = np.random.default_rng(0)
    batches = [
        _batch(rng.integers(0, N_ITEMS, size=(4, 4))) for _ in range(3)
    ]
    for batch in batches:
        a.train_function(batch)
    b.train_function_multi([dict(x) for x in batches])
    np.testing.assert_allclose(
        np.asarray(a.params["tower"]["layer0_fwd"]["W_in"]),
        np.asarray(b.params["tower"]["layer0_fwd"]["W_in"]),
        rtol=1e-6, atol=1e-7,
    )


def test_lazy_requires_adam():
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[4]),
        updater=RMSProp(0.01),
        max_length=4, batch_size=4, seed=0, lazy_updates=True,
    )
    model._prepare_networks(N_ITEMS)
    model.params = model._init_params()
    with pytest.raises(ValueError, match="adam"):
        model._build_functions()


def test_lazy_cli_end_to_end(synthetic_dataset):
    import glob

    import train as train_cli

    res = train_cli.main(
        [
            "-d", str(synthetic_dataset), "-m", "RNN", "--loss", "CCE",
            "--r_t", "GRU", "--r_l", "8", "--max_length", "10", "-b", "8",
            "--u_l", "0.01", "--max_iter", "30", "--progress", "30",
            "--save", "All", "--lazy_updates", "--dir", "lazy/",
        ]
    )
    assert res[0]["sps"] is not None
    files = glob.glob(str(synthetic_dataset) + "models/lazy/*_lu_*")
    assert files, "lazy flag must be encoded in the checkpoint filename"


def test_lazy_sampled_head_matches_dense_on_full_coverage():
    """RNNSampling's lazy head: when targets+samples cover EVERY column,
    lazy column-Adam equals dense Adam on W_out/b_out."""
    from seqrec_tpu.models.rnn_sampling import RNNSampling

    def build(lazy):
        model = RNNSampling(
            loss_function="BPR", sampling=N_ITEMS,  # samples cover catalog
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[6]),
            updater=Adam(0.01), max_length=4, batch_size=4, seed=0,
            lazy_updates=lazy,
        )
        model._prepare_networks(N_ITEMS)
        model.params = model._init_params()
        model._build_functions()
        model.opt_state = model._opt.init(model.params)
        return model

    rng = np.random.default_rng(0)
    dense, lazy = build(False), build(True)
    for _ in range(3):
        batch = {
            "ids": rng.integers(0, N_ITEMS, size=(4, 4, 1)).astype(np.int32),
            "mask": np.ones((4, 4), np.float32),
            "targets": rng.integers(0, N_ITEMS, size=(4,)).astype(np.int32),
            "target_pop": np.ones((4,), np.float32),
            "samples": np.arange(N_ITEMS, dtype=np.int32),  # all columns
        }
        cd = dense.train_function(dict(batch))
        cl = lazy.train_function(dict(batch))
        np.testing.assert_allclose(float(cd), float(cl), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dense.params["W_out"]), np.asarray(lazy.params["W_out"]),
        rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dense.params["b_out"]), np.asarray(lazy.params["b_out"]),
        rtol=2e-5, atol=1e-6,
    )


def test_lazy_sampled_head_freezes_unsampled_columns():
    from seqrec_tpu.models.rnn_sampling import RNNSampling

    model = RNNSampling(
        loss_function="BPR", sampling=2,
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[6]),
        updater=Adam(0.01), max_length=4, batch_size=4, seed=0,
        lazy_updates=True,
    )
    model._prepare_networks(N_ITEMS)
    model.params = model._init_params()
    model._build_functions()
    model.opt_state = model._opt.init(model.params)
    w0 = np.asarray(model.params["W_out"]).copy()
    rng = np.random.default_rng(1)
    batch = {
        "ids": rng.integers(0, N_ITEMS, size=(4, 4, 1)).astype(np.int32),
        "mask": np.ones((4, 4), np.float32),
        "targets": np.array([0, 1, 0, 1], np.int32),
        "target_pop": np.ones((4,), np.float32),
        "samples": np.array([2, 3], np.int32),
    }
    for _ in range(2):
        model.train_function(dict(batch))
    w = np.asarray(model.params["W_out"])
    np.testing.assert_array_equal(w[:, 4:], w0[:, 4:])  # untouched columns
    assert np.abs(w[:, :4] - w0[:, :4]).max() > 0
