"""Multi-device sharding: train-step parity on the 8-device CPU mesh.

The reference has no distributed path (SURVEY.md §2.9); the oracle here is
numerical consistency between the single-device and mesh-sharded train
steps (SURVEY.md §4 point 5).
"""

import numpy as np
import pytest

import jax

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam
from seqrec_tpu.parallel import make_mesh, shard_batch, shard_params


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _make_model(handler, seed=0):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        max_length=12,
        batch_size=16,
        seed=seed,
    )
    model.prepare_model(handler)
    model.set_dataset(handler)
    model.params = model._init_params()
    model._build_functions()
    model.opt_state = model._opt.init(model.params)
    return model


def _make_batch(model, handler):
    gen = model._gen_mini_batch(handler.training_set(epochs=10))
    return next(gen)


def test_mesh_shapes(devices):
    mesh = make_mesh(devices=devices)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh2 = make_mesh(n_data=4, n_model=2, devices=devices)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_train_step_matches_single_device(synthetic_handler, devices):
    mesh = make_mesh(n_data=2, n_model=4, devices=devices)

    model_a = _make_model(synthetic_handler, seed=0)
    model_b = _make_model(synthetic_handler, seed=0)
    batch = _make_batch(model_a, synthetic_handler)

    # single device step
    pa, oa, cost_a = model_a._train_step(model_a.params, model_a.opt_state, batch)

    # sharded step: same jitted function, sharded inputs
    params_s = shard_params(model_b.params, mesh)
    opt_s = jax.device_put(model_b.opt_state)  # replicated
    batch_s = shard_batch(batch, mesh)
    pb, ob, cost_b = model_b._train_step(params_s, opt_s, batch_s)

    assert np.isclose(float(cost_a), float(cost_b), rtol=1e-5)
    wa = np.asarray(pa["W_out"])
    wb = np.asarray(pb["W_out"])
    np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-6)


def test_sharded_params_layout(devices, synthetic_handler):
    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    model = _make_model(synthetic_handler, seed=1)
    params_s = shard_params(model.params, mesh)
    wout_sh = params_s["W_out"].sharding.spec
    assert tuple(wout_sh) == (None, "model")
    win_sh = params_s["tower"]["layer0_fwd"]["W_in"].sharding.spec
    assert tuple(win_sh) == ("model", None)
    # dense hidden weights replicated
    whid_sh = params_s["tower"]["layer0_fwd"]["W_hid"].sharding.spec
    assert tuple(whid_sh) == ()


def test_sharded_topk_matches_dense(devices):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from seqrec_tpu.ops.core import masked_top_k
    from seqrec_tpu.parallel.topk import sharded_score_topk

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    rng = np.random.default_rng(0)
    B, H, N, S, k = 8, 16, 64, 6, 5
    h = rng.normal(size=(B, H)).astype(np.float32)
    w = rng.normal(size=(H, N)).astype(np.float32)
    b = rng.normal(size=N).astype(np.float32)
    seen = rng.integers(0, N, size=(B, S)).astype(np.int32)
    seen_mask = (rng.random((B, S)) > 0.5).astype(np.float32)

    import jax.numpy as jnp

    dense = np.asarray(
        masked_top_k(jnp.asarray(h @ w + b), k, jnp.asarray(seen), jnp.asarray(seen_mask))
    )

    h_s = jax.device_put(h, NamedSharding(mesh, P("data", None)))
    w_s = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b_s = jax.device_put(b, NamedSharding(mesh, P("model")))
    seen_s = jax.device_put(seen, NamedSharding(mesh, P("data", None)))
    sm_s = jax.device_put(seen_mask, NamedSharding(mesh, P("data", None)))
    sharded = np.asarray(
        sharded_score_topk(mesh, h_s, w_s, b_s, seen_s, sm_s, k=k)
    )

    # identical candidate scores row by row (ties may reorder ids)
    scores = h @ w + b
    for i in range(B):
        np.testing.assert_allclose(
            scores[i, sharded[i]], scores[i, dense[i]], rtol=1e-5
        )


def test_mesh_training_slow_path(synthetic_handler, devices):
    """Mesh training through the NON-fast batching path (sequence noise
    forces the reference-shaped generator + _shard_batch_gen): the loop
    must run sharded end-to-end and reach a checkpoint."""
    from seqrec_tpu.data.noise import SequenceNoise
    from seqrec_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=2, devices=devices)
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01),
        max_length=12,
        batch_size=8,
        seed=0,
        sequence_noise=SequenceNoise(dropout=0.2),
    )
    model.prepare_model(synthetic_handler)
    assert not model._fast_batching_ok()  # noise => slow path
    model.set_mesh(mesh)
    res, _, _ = model.train(
        synthetic_handler, max_iter=8, progress=8, autosave="None"
    )
    assert res["sps"] is not None and np.isfinite(res["recall"])


def test_sharded_index_wire_matches_single_device(synthetic_handler, devices):
    """The fused index-wire dispatch under GSPMD (replicated store,
    data-sharded rows/cuts) must match the single-device dispatch."""
    from seqrec_tpu.parallel import index_payload_sharding, store_sharding

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    K = 2

    a = _make_model(synthetic_handler, seed=0)
    b = _make_model(synthetic_handler, seed=0)

    payload = next(
        a._gen_index_mini_batch(
            synthetic_handler.training_set, np.random.default_rng(3), n_stack=K
        )
    )

    # single device
    b._dev_store = b._upload_index_store(synthetic_handler.training_set)
    cost_b = b.train_function_stacked(jax.device_put(payload))

    # sharded
    a._dev_store = a._upload_index_store(
        synthetic_handler.training_set,
        sharding=store_sharding(
            a._build_index_store(synthetic_handler.training_set), mesh
        ),
    )
    a.params = shard_params(a.params, mesh)
    a.opt_state = a._opt.init(a.params)
    payload_s = jax.device_put(payload, index_payload_sharding(payload, mesh))
    cost_a = a.train_function_stacked(payload_s)

    np.testing.assert_allclose(float(cost_a), float(cost_b), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a.params["W_out"]),
        np.asarray(b.params["W_out"]),
        rtol=1e-4,
        atol=1e-6,
    )


def _train_pair(factory, handler, mesh, max_iter=16, progress=8):
    """Train two fresh instances of the same model — single-device and
    mesh-sharded — and return (result, params) for each."""
    results = []
    for use_mesh in (False, True):
        model = factory()
        model.prepare_model(handler)
        if use_mesh:
            model.set_mesh(mesh)
        res, _, _ = model.train(
            handler, max_iter=max_iter, progress=progress, autosave="None"
        )
        params = jax.tree_util.tree_map(np.asarray, model.params)
        results.append((res, params))
    return results


def test_sdae_mesh_matches_single_device(synthetic_handler, devices):
    """SDAE trains through the slow (bag-of-items) batching path; with a
    mesh the same batches are data-sharded and W_out column-shards.
    train.py advertises --mesh for the SDAE family — prove it."""
    from seqrec_tpu.models.sdae import StackedDenoisingAutoencoder

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    (res_a, pa), (res_b, pb) = _train_pair(
        lambda: StackedDenoisingAutoencoder(
            layers=[12], input_dropout=0.2, dropout=0.0,
            updater=Adam(0.01), batch_size=8, seed=0,
        ),
        synthetic_handler,
        mesh,
    )
    for m in ("sps", "recall", "ndcg"):
        assert np.isclose(res_a[m], res_b[m], atol=1e-9), (m, res_a, res_b)
    np.testing.assert_allclose(pa["W_out"], pb["W_out"], rtol=1e-4, atol=1e-5)


def test_rnn_sampling_mesh_matches_single_device(synthetic_handler, devices):
    """RNNSampling under --mesh: the per-step negative-sample sets are
    drawn on the HOST (seeded RNG) and ship as index-wire extras
    (`rnn_sampling._index_payload_extras`); every host must assemble the
    identical payload for `parallel/mesh.put_global` to be sound. The
    oracle is a bit-comparable trajectory vs single-device."""
    from seqrec_tpu.models.rnn_sampling import RNNSampling

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)

    def factory():
        return RNNSampling(
            loss_function="BPR",
            sampling=8,
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
            updater=Adam(0.01),
            max_length=12,
            batch_size=8,
            seed=0,
        )

    probe = factory()
    probe.prepare_model(synthetic_handler)
    assert probe._fast_batching_ok()  # the index-wire path is under test

    (res_a, pa), (res_b, pb) = _train_pair(factory, synthetic_handler, mesh)
    for m in ("sps", "recall"):
        assert np.isclose(res_a[m], res_b[m], atol=1e-9), (m, res_a, res_b)
    np.testing.assert_allclose(pa["W_out"], pb["W_out"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        pa["tower"]["layer0_fwd"]["W_in"],
        pb["tower"]["layer0_fwd"]["W_in"],
        rtol=1e-4,
        atol=1e-5,
    )


def test_rnn_cluster_mesh_matches_single_device(synthetic_handler, devices):
    """RNNCluster under --mesh: sample sets, noise seeds AND the
    epoch-boundary temperature schedule ride the index wire as per-step
    extras (`cluster._index_payload_extras`). 16 iterations over the
    120-user fixture crosses an epoch boundary, so the schedule's growth
    step is inside the compared trajectory."""
    from seqrec_tpu.models.cluster import RNNCluster

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)

    def factory():
        return RNNCluster(
            n_clusters=3,
            loss="Blackout",
            sampling=8,
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
            updater=Adam(0.01),
            max_length=12,
            batch_size=8,
            seed=0,
        )

    probe = factory()
    probe.prepare_model(synthetic_handler)
    assert probe._fast_batching_ok()

    (res_a, pa), (res_b, pb) = _train_pair(factory, synthetic_handler, mesh)
    for m in ("sps", "recall", "cluster_sps", "assr"):
        assert np.isclose(res_a[m], res_b[m], atol=1e-9), (m, res_a, res_b)
    np.testing.assert_allclose(pa["W_out"], pb["W_out"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        pa["cluster_repartition"], pb["cluster_repartition"], rtol=1e-4, atol=1e-5
    )


def test_rnn_margin_mesh_matches_single_device(synthetic_handler, devices):
    """RNNMargin under --mesh: the device-side Y/W target scatters and
    the pop-based soft targets must shard like the other families —
    completing the mesh-parity coverage of every dryrun family."""
    from seqrec_tpu.models.rnn_margin import RNNMargin

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)

    def factory():
        return RNNMargin(
            loss_function="hinge",
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
            updater=Adam(0.01),
            max_length=12,
            batch_size=8,
            seed=0,
        )

    (res_a, pa), (res_b, pb) = _train_pair(factory, synthetic_handler, mesh)
    for m in ("sps", "recall"):
        assert np.isclose(res_a[m], res_b[m], atol=1e-9), (m, res_a, res_b)
    np.testing.assert_allclose(pa["W_out"], pb["W_out"], rtol=1e-4, atol=1e-5)


def test_fism_cluster_mesh_matches_single_device(synthetic_handler, devices):
    """FISMCluster: bag representation + cluster machinery under --mesh
    (item_embeddings/cluster_repartition row-shard, W_out column-shards)."""
    from seqrec_tpu.models.cluster import FISMCluster

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    (res_a, pa), (res_b, pb) = _train_pair(
        lambda: FISMCluster(
            h=12, n_clusters=3, loss="Blackout", sampling=8,
            updater=Adam(0.01), batch_size=8, seed=0,
        ),
        synthetic_handler,
        mesh,
    )
    # the cluster family reports its own metric set (no ndcg)
    for m in ("sps", "recall", "cluster_sps", "assr"):
        assert np.isclose(res_a[m], res_b[m], atol=1e-9), (m, res_a, res_b)
    np.testing.assert_allclose(
        pa["item_embeddings"], pb["item_embeddings"], rtol=1e-4, atol=1e-5
    )


def test_sharded_streaming_cce_op_parity(devices):
    """sharded_streaming_cce (shard_map over the 2x4 mesh) == the
    single-device streaming op == the dense logsumexp, forward AND all
    three gradients, on both the dividing-chunk and padded-chunk paths."""
    import jax.numpy as jnp

    from seqrec_tpu.ops.streaming_cce import (
        pick_chunk,
        sharded_streaming_cce,
        streaming_cce,
    )

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    rng = np.random.default_rng(7)
    B, H, N = 16, 8, 4096
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.integers(0, N, B), jnp.int32)

    def ref(h, w, b):
        return streaming_cce(h, w, b, t, pick_chunk(N)).sum()

    l_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1, 2))(h, w, b)

    for chunk in (512, 600):  # dividing + padded tail
        def sh(h, w, b):
            return sharded_streaming_cce(h, w, b, t, mesh, chunk=chunk).sum()

        l_sh, g_sh = jax.jit(jax.value_and_grad(sh, argnums=(0, 1, 2)))(h, w, b)
        assert np.isclose(float(l_ref), float(l_sh), rtol=1e-5)
        for a, c in zip(g_ref, g_sh):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6
            )

    # dense oracle
    logits = np.asarray(h) @ np.asarray(w) + np.asarray(b)
    m = logits.max(axis=-1)
    dense = (
        np.log(np.exp(logits - m[:, None]).sum(-1)) + m
        - logits[np.arange(B), np.asarray(t)]
    ).sum()
    assert np.isclose(dense, float(l_ref), rtol=1e-5)


def test_streaming_head_mesh_train_step_parity(
    synthetic_handler, devices, monkeypatch
):
    """The full RNNOneHot train step with the STREAMING head forced on,
    mesh vs single device: the round-5 composition the round-4 gate
    forbade (streaming CCE used to be mesh is None only)."""
    import seqrec_tpu.ops.streaming_cce as sc

    monkeypatch.setattr(sc, "STREAMING_CCE_MIN_ITEMS", 1)

    model_probe = _make_model(synthetic_handler, seed=0)
    n_items = model_probe.n_items
    n_model = next(m for m in (4, 2, 1) if n_items % m == 0)
    mesh = make_mesh(n_data=2, n_model=n_model, devices=devices[: 2 * n_model])

    model_a = _make_model(synthetic_handler, seed=0)
    model_b = _make_model(synthetic_handler, seed=0)
    assert model_a._use_streaming_head()
    batch = _make_batch(model_a, synthetic_handler)

    pa, oa, cost_a = model_a._train_step(model_a.params, model_a.opt_state, batch)

    model_b.set_mesh(mesh)
    assert model_b._use_streaming_head()
    params_s = shard_params(model_b.params, mesh)
    opt_s = jax.device_put(model_b.opt_state)
    batch_s = shard_batch(batch, mesh)
    pb, ob, cost_b = model_b._train_step(params_s, opt_s, batch_s)

    assert np.isclose(float(cost_a), float(cost_b), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pa["W_out"]), np.asarray(pb["W_out"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pa["b_out"]), np.asarray(pb["b_out"]), rtol=1e-4, atol=1e-6
    )


def test_sharded_streaming_margin_op_parity(devices):
    """sharded_streaming_margin (shard_map over the 2x4 mesh) == the
    single-device streaming op, forward AND gradients, dividing and
    padded chunks, unique on/off."""
    import jax.numpy as jnp

    from seqrec_tpu.ops.streaming_margin import (
        sharded_streaming_margin,
        streaming_margin,
    )

    mesh = make_mesh(n_data=2, n_model=4, devices=devices)
    rng = np.random.default_rng(11)
    B, H, N, T, L = 16, 8, 4096, 2, 6
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)
    tgt = rng.integers(0, N, size=(B, T)).astype(np.int32)
    tgt[::3, -1] = N
    seen = rng.integers(0, N, size=(B, L)).astype(np.int32)
    seen[::2, -2:] = N
    tgt, seen = jnp.asarray(tgt), jnp.asarray(seen)
    w_neg = jnp.asarray(rng.random(B) * 0.01 + 0.001, jnp.float32)
    dt = jnp.asarray(rng.random(N) * 0.3, jnp.float32)

    for loss_name, unique, chunk in (
        ("hinge", True, 512),
        ("logsig", True, 600),
        ("logit", False, 512),
    ):
        def ref(h, w, b):
            return streaming_margin(
                h, w, b, tgt, seen, w_neg, dt, loss_name, unique, 512
            ).sum()

        def sh(h, w, b):
            return sharded_streaming_margin(
                h, w, b, tgt, seen, w_neg, dt, mesh, loss_name, unique,
                chunk=chunk,
            ).sum()

        l_r, g_r = jax.value_and_grad(ref, argnums=(0, 1, 2))(h, w, b)
        l_s, g_s = jax.jit(jax.value_and_grad(sh, argnums=(0, 1, 2)))(h, w, b)
        assert np.isclose(float(l_r), float(l_s), rtol=1e-5), (
            loss_name, float(l_r), float(l_s),
        )
        for a, c in zip(g_r, g_s):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6,
                err_msg=loss_name,
            )


def test_streaming_margin_mesh_train_step_parity(
    synthetic_handler, devices, monkeypatch
):
    """Full RNNMargin train step with the streaming head forced on,
    mesh vs single device."""
    import seqrec_tpu.ops.streaming_margin as sm

    from seqrec_tpu.models.rnn_margin import RNNMargin

    monkeypatch.setattr(sm, "STREAMING_MARGIN_MIN_ITEMS", 1)

    def make():
        m = RNNMargin(
            loss_function="hinge",
            recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
            updater=Adam(0.01),
            max_length=12,
            batch_size=16,
            seed=0,
        )
        m.prepare_model(synthetic_handler)
        m.set_dataset(synthetic_handler)
        m.params = m._init_params()
        m._build_functions()
        m.opt_state = m._opt.init(m.params)
        return m

    model_a = make()
    n_items = model_a.n_items
    n_model = next(m for m in (4, 2, 1) if n_items % m == 0)
    mesh = make_mesh(n_data=2, n_model=n_model, devices=devices[: 2 * n_model])

    assert model_a._use_streaming_head()
    gen = model_a._gen_mini_batch(synthetic_handler.training_set(epochs=10))
    batch = next(gen)

    pa, oa, cost_a = model_a._train_step(model_a.params, model_a.opt_state, batch)

    model_b = make()
    model_b.set_mesh(mesh)
    params_s = shard_params(model_b.params, mesh)
    opt_s = jax.device_put(model_b.opt_state)
    batch_s = shard_batch(batch, mesh)
    pb, ob, cost_b = model_b._train_step(params_s, opt_s, batch_s)

    assert np.isclose(float(cost_a), float(cost_b), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pa["W_out"]), np.asarray(pb["W_out"]), rtol=1e-4, atol=1e-6
    )
