"""Optimizer variants beyond the reference surface.

The reference's optimizer menu is flag-parity surface
(/root/reference/neural_networks/update_manager.py:24-47); these tests
cover the TPU-side extension: bf16 moment storage for Adam
(``--u_moments bfloat16``), which halves the optimizer's HBM traffic —
the measured step-time bound at 10^5-item catalogs (BASELINE.md matrix).

Oracles:
- over a short trajectory, bf16-moment Adam must track f32 Adam to
  within bf16 rounding (the moments' ~0.4% relative rounding error
  accumulates slowly; parameter deltas stay within ~1% over 10 steps);
- the stored moments must actually BE bf16 (the whole point);
- the CLI flag must reach the updater and stamp the checkpoint name.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam

N_ITEMS = 12


def _model(updater):
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[6]),
        updater=updater,
        max_length=4,
        batch_size=4,
        seed=0,
    )
    model._prepare_networks(N_ITEMS)
    model.params = model._init_params()
    model._build_functions()
    model.opt_state = model._opt.init(model.params)
    return model


def _batch(rng):
    ids = rng.integers(0, N_ITEMS, size=(4, 4)).astype(np.int32)
    return {
        "ids": ids[..., None],
        "mask": np.ones((4, 4), dtype=np.float32),
        "targets": rng.integers(0, N_ITEMS, size=(4,)).astype(np.int32),
        "target_pop": np.ones((4,), dtype=np.float32),
    }


def test_bf16_moment_adam_tracks_f32_adam():
    f32 = _model(Adam(0.01))
    bf16 = _model(Adam(0.01, moment_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    for _ in range(10):
        batch = _batch(rng)
        cf = f32.train_function(batch)
        cb = bf16.train_function(batch)
        np.testing.assert_allclose(float(cf), float(cb), rtol=5e-3)
    for name in ("W_out", "b_out"):
        a = np.asarray(f32.params[name], dtype=np.float64)
        b = np.asarray(bf16.params[name], dtype=np.float64)
        # parameter-delta closeness: both start identical (seed=0), so
        # compare the drift the two optimizers produced
        np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-3)


def test_bf16_moment_state_is_bfloat16():
    model = _model(Adam(0.01, moment_dtype="bfloat16"))
    rng = np.random.default_rng(1)
    model.train_function(_batch(rng))
    moment_dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(model.opt_state)
        if hasattr(leaf, "dtype") and leaf.ndim > 0
    }
    assert moment_dtypes == {jnp.dtype(jnp.bfloat16)}


def test_bf16_moments_track_small_ema_increments():
    """Absorption regression: Adam's second moment moves by (1-b2)=0.001
    of itself per step — below bf16's ~0.4% ulp, so a round-to-NEAREST
    store freezes nu forever. The stochastic-rounding store must track
    the EMA in expectation: after many zero-gradient steps nu must
    decay, and under a constant gradient it must grow toward g^2."""
    import optax

    from seqrec_tpu.models.updates import _scale_by_adam_bf16_moments

    tx = _scale_by_adam_bf16_moments(0.9, 0.999, 1e-8)
    params = {"w": jnp.ones((64,), jnp.float32)}
    state = tx.init(params)
    # seed nu at 1.0
    state = optax.ScaleByAdamState(
        count=state.count,
        mu=state.mu,
        nu={"w": jnp.ones((64,), jnp.bfloat16)},
    )
    zero = {"w": jnp.zeros((64,), jnp.float32)}
    for _ in range(1500):
        _, state = tx.update(zero, state)
    decayed = float(np.asarray(state.nu["w"], dtype=np.float32).mean())
    want = 0.999**1500  # ~0.223
    assert abs(decayed - want) < 0.1 * want + 0.02, decayed

    g = {"w": jnp.full((64,), 2.0, jnp.float32)}
    for _ in range(1500):
        _, state = tx.update(g, state)
    grown = float(np.asarray(state.nu["w"], dtype=np.float32).mean())
    # analytic f32 EMA toward g^2=4 from `decayed` after 1500 steps
    want = 4.0 - (4.0 - decayed) * 0.999**1500
    assert abs(grown - want) < 0.1 * want, (grown, want)


def test_bf16_moment_checkpoint_name_and_cli():
    import argparse

    from seqrec_tpu.models.updates import (
        get_update_manager,
        update_manager_command_parser,
    )

    parser = argparse.ArgumentParser()
    update_manager_command_parser(parser)
    args = parser.parse_args(["--u_m", "adam", "--u_moments", "bfloat16"])
    updater = get_update_manager(args)
    assert isinstance(updater, Adam)
    assert updater.moment_dtype == "bfloat16"
    assert updater.name.endswith("_mbf16")
    # f32 default keeps legacy filenames byte-identical
    args = parser.parse_args([])
    assert get_update_manager(args).name == "Ua_lr0.001_b10.9_b20.999"


def test_bf16_moment_exact_resume_roundtrip(tmp_path):
    """npz cannot encode ml_dtypes.bfloat16 natively (it round-trips as
    raw '|V2' void bytes); the pytree codec must restore bf16 moment
    state exactly for --u_moments bfloat16 exact-resume checkpoints."""
    model = _model(Adam(0.01, moment_dtype="bfloat16"))
    model.save_optimizer_state = True
    rng = np.random.default_rng(3)
    for _ in range(3):
        model.train_function(_batch(rng))
    f = str(tmp_path / "ck.npz")
    model.save(f)

    fresh = _model(Adam(0.01, moment_dtype="bfloat16"))
    fresh.save_optimizer_state = True
    fresh.load(f)
    a = jax.tree_util.tree_leaves(model.opt_state)
    b = jax.tree_util.tree_leaves(fresh.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_array_equal(
            np.asarray(x, dtype=np.float32), np.asarray(y, dtype=np.float32)
        )
