"""Pallas streaming-CCE kernels == the XLA chunk scan (interpret mode).

The kernels only ENGAGE on a real TPU (streaming_cce._kernel_engages);
these tests run them through the Pallas interpreter on CPU against the
scan implementation that is itself parity-tested against the dense
logsumexp (tests/test_streaming_cce.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seqrec_tpu.ops.pallas_streaming_cce import grads_pallas, stats_pallas
from seqrec_tpu.ops.streaming_cce import _grad_scan, _pad_cols, _stats_scan


def _mk(B=24, H=16, N=700, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    return h, W, b, t


@pytest.mark.parametrize("B", [24, 32])  # non-multiple + multiple of bb
def test_stats_kernel_matches_scan(B):
    bb, chunk = 8, 256
    h, W, b, _ = _mk(B=B)
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    m_ref, s_ref = _stats_scan(h, Wp, bp, chunk, n_chunks, jnp.float32)
    m, s = stats_pallas(h, Wp, bp, block_b=bb, chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)


@pytest.mark.parametrize("B", [24, 32])
def test_grads_kernel_matches_scan(B):
    bb, chunk = 8, 256
    h, W, b, t = _mk(B=B, seed=3)
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    m, s, _ = (
        *_stats_scan(h, Wp, bp, chunk, n_chunks, jnp.float32), None
    )[:3]
    logz = m + jnp.log(s)
    rng = np.random.default_rng(9)
    g = jnp.asarray(rng.normal(size=(B,)), jnp.float32)

    dh_ref, dW_ref, db_ref = _grad_scan(
        h, Wp, bp, t, logz[:, None], g[:, None], chunk, n_chunks, jnp.float32
    )
    dh, dW, db = grads_pallas(
        h, Wp, bp, t, logz, g, block_b=bb, chunk=chunk, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dW), np.asarray(dW_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-4, atol=1e-6)
