"""Regression tests for the generic training loop's accounting and
failure paths (seqrec_tpu/models/base.py)."""

import numpy as np
import pytest

from seqrec_tpu.data.noise import SequenceNoise
from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam
from seqrec_tpu.ops.core import pad_bucket


def _tiny_model(**kwargs):
    return RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[8]),
        updater=Adam(0.01),
        max_length=10,
        batch_size=8,
        seed=0,
        **kwargs,
    )


def test_pad_bucket():
    assert pad_bucket(1) == 8
    assert pad_bucket(8) == 8
    assert pad_bucket(9) == 16
    assert pad_bucket(100, floor=16) == 128
    assert pad_bucket(3, floor=16) == 16


def test_prefetch_forwards_producer_errors():
    """An exception raised during background batch assembly must surface
    in the consumer, not end the stream like normal data exhaustion."""

    def boom():
        yield 1
        raise ValueError("assembly failed")

    gen = RNNBase._prefetch(boom(), depth=2)
    assert next(gen) == 1
    with pytest.raises(ValueError, match="assembly failed"):
        list(gen)


def test_prefetch_clean_exhaustion():
    gen = RNNBase._prefetch(iter([1, 2, 3]), depth=2)
    assert list(gen) == [1, 2, 3]


def test_spd_fallback_counts_real_steps(synthetic_handler):
    """When sequence noise disables the fused K-step dispatch, iteration
    accounting must count 1 per step, not steps_per_dispatch."""
    model = _tiny_model(sequence_noise=SequenceNoise(dropout=0.2))
    assert not model._fast_batching_ok()
    model.steps_per_dispatch = 4
    model.prepare_model(synthetic_handler)

    calls = {"n": 0}
    orig = model.train_function

    def counting(batch):
        calls["n"] += 1
        return orig(batch)

    model.train_function = counting
    model.train(
        synthetic_handler, max_iter=4, progress=100, autosave="None", save_dir=""
    )
    # before the fix: iterations += 4 per loop -> only 1 real step ran
    assert calls["n"] == 4


def test_geometric_checkpoints_catch_up(synthetic_handler):
    """With K iterations per dispatch, next_save must catch up past the
    progress indicator or validation runs after every dispatch."""
    model = _tiny_model()
    model.steps_per_dispatch = 8
    model.prepare_model(synthetic_handler)

    checkpoints = []
    orig = model._compute_validation_metrics

    def counting(metrics):
        checkpoints.append(True)
        return orig(metrics)

    model._compute_validation_metrics = counting
    model.train(
        synthetic_handler, max_iter=64, progress=2.0, autosave="None", save_dir=""
    )
    # geometric schedule, K=8: checkpoints at iterations 8, 16, 32, 64
    # (next_save: 2 -> catch up to 16 -> 32 -> 64 -> 128);
    # without catch-up next_save only doubles once per checkpoint and
    # validation fires at 8, 16, 24, 32, 40, 64 (6 checkpoints)
    assert len(checkpoints) == 4, checkpoints


def test_empty_validation_appends_zeros(synthetic_handler):
    """Zero validation instances must record 0s, not divide by zero."""
    model = _tiny_model()
    model.prepare_model(synthetic_handler)
    model.set_dataset(synthetic_handler)
    model._iter_test_instances = lambda gen: iter([])
    metrics = {name: [] for name in model.metrics}
    out = model._compute_validation_metrics(metrics)
    for name in model.metrics:
        assert out[name] == [0.0]


def test_init_distributed_raises_when_backend_already_up(monkeypatch):
    """Multi-host env vars + an already-initialized local backend must
    fail loudly instead of silently training standalone per host."""
    import jax

    from seqrec_tpu.parallel.distributed import init_distributed

    jax.devices()  # ensure the local backend is initialized
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    with pytest.raises(RuntimeError, match="already initialized"):
        init_distributed()


def test_init_distributed_noop_without_env(monkeypatch):
    from seqrec_tpu.parallel.distributed import init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert init_distributed() is False


def test_async_save_writes_and_drains(tmp_path):
    """Single-process saves are asynchronous (worker thread); drain must
    block until every queued file is on disk, loads must round-trip, and
    a writer error must re-raise at the drain (not vanish)."""
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[4]),
        updater=Adam(0.01),
        max_length=4,
        batch_size=2,
        seed=0,
    )
    model._prepare_networks(10)
    model.params = model._init_params()
    model._build_functions()

    files = [str(tmp_path / f"ck{i}.npz") for i in range(3)]
    for f in files:
        model.save(f, async_write=True)
    model._drain_saves()
    from seqrec_tpu.models.base import pytree_load

    for f in files:
        tree = pytree_load(f)
        np.testing.assert_array_equal(
            tree["params"]["W_out"], np.asarray(model.params["W_out"])
        )

    model.save(str(tmp_path), async_write=True)  # a directory: the npz open() must fail
    with pytest.raises(Exception):
        model._drain_saves()
    # the queue stays usable after an error
    model.save(files[0], async_write=True)
    model._drain_saves()


def test_load_last_ignores_other_family_checkpoints(tmp_path, capsys):
    """load_last's epoch glob must not swallow sibling-family files
    (default-config names omit tokens like the LSTM tower marker);
    picking a GRU file's epoch would resolve to a nonexistent
    LSTM-style filename and crash the resume."""
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="LSTM", layers=[4]),
        updater=Adam(0.01),
        max_length=4,
        batch_size=2,
        seed=0,
    )
    model._prepare_networks(10)
    model.params = model._init_params()
    model._build_functions()

    save_dir = str(tmp_path) + "/"
    # a GRU checkpoint the LSTM's glob pattern would otherwise match
    gru_name = model._get_model_filename(9.9).replace("_ne9.9_", "_ne9.9_GRU_")
    (tmp_path / gru_name).write_bytes(b"x")
    assert model.load_last(save_dir) == 0  # no LSTM checkpoint -> scratch

    model.save(save_dir + model._get_model_filename(2.5))
    model._drain_saves()
    assert model.load_last(save_dir) == 2.5
