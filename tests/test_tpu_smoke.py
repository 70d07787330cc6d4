"""Real-TPU numerics smoke test (VERDICT round-1 item 10).

The regular suite verifies the Pallas kernels in interpret mode on CPU
(tests/conftest.py forces ``JAX_PLATFORMS=cpu``); this module checks the
COMPILED kernels against the XLA reference on the actual chip. It is
skipped by default and run by the bench driver / manually via::

    SEQREC_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

The check runs in a subprocess so the parent process's CPU-forced JAX
backend (set at conftest import time) does not leak into it.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SEQREC_TPU_SMOKE"),
    reason="real-TPU smoke; set SEQREC_TPU_SMOKE=1",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

if jax.devices()[0].platform == "cpu":
    print("TPU_SMOKE_SKIP: no accelerator visible")
    raise SystemExit(0)

from seqrec_tpu.ops.core import masked_top_k
from seqrec_tpu.ops.pallas_rnn import gru_scan, lstm_scan, pad_gate_sections
from seqrec_tpu.ops.pallas_rnn_train import gru_scan_train
from seqrec_tpu.ops.pallas_topk import fused_score_topk

rng = np.random.default_rng(0)
B, L = 256, 30


def xla_gru(x_pre, mask, w, h0):
    H = h0.shape[-1]
    xs = (jnp.swapaxes(x_pre, 0, 1), jnp.swapaxes(mask, 0, 1)[..., None])
    def step(h, inp):
        x_t, m = inp
        hid = jnp.dot(h, w, preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_t[:, H:2*H] + hid[:, H:2*H])
        c = jnp.tanh(x_t[:, 2*H:] + r * hid[:, 2*H:])
        return jnp.where(m > 0, (1.0 - u) * h + u * c, h), None
    return jax.lax.scan(step, h0, xs)[0]


def xla_lstm(x_pre, mask, w, peep, h0, c0):
    H = h0.shape[-1]
    xs = (jnp.swapaxes(x_pre, 0, 1), jnp.swapaxes(mask, 0, 1)[..., None])
    def step(carry, inp):
        h, c = carry
        x_t, m = inp
        pre = x_t + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :H] + c * peep[0])
        f = jax.nn.sigmoid(pre[:, H:2*H] + c * peep[1])
        g = jnp.tanh(pre[:, 2*H:3*H])
        c_new = f * c + i * g
        o = jax.nn.sigmoid(pre[:, 3*H:] + c_new * peep[2])
        keep = m > 0
        return (jnp.where(keep, o * jnp.tanh(c_new), h),
                jnp.where(keep, c_new, c)), None
    return jax.lax.scan(step, (h0, c0), xs)[0][0]


# --- GRU forward: exact H=128 and padded H=50 ---
for H in (128, 50):
    Hp = -(-H // 64) * 64
    x = jnp.asarray(rng.normal(size=(B, L, 3 * H)).astype(np.float32))
    m = jnp.asarray((rng.random((B, L)) < 0.9).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    want = np.asarray(xla_gru(x, m, w, h0))
    if H != Hp:
        x_p, w_p, h0_p = pad_gate_sections(H, Hp, x, w, h0)
        got = np.asarray(gru_scan(x_p, m, w_p, h0_p))[:, :H]
    else:
        got = np.asarray(gru_scan(x, m, w, h0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    print(f"gru fwd H={H}: OK")

# --- GRU train grads at H=128 ---
H = 128
x = jnp.asarray(rng.normal(size=(B, L, 3 * H)).astype(np.float32))
m = jnp.asarray((rng.random((B, L)) < 0.9).astype(np.float32))
w = jnp.asarray(rng.normal(size=(H, 3 * H)).astype(np.float32) * 0.1)
h0 = jnp.zeros((B, H), jnp.float32)
g_x = jax.grad(lambda ww: jnp.sum(xla_gru(x, m, ww, h0) ** 2))(w)
g_p = jax.grad(lambda ww: jnp.sum(gru_scan_train(x, m, ww, h0, 100.0) ** 2))(w)
np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-3, atol=1e-3)
print("gru train grad H=128: OK")

# --- LSTM train grads at H=128 ---
from seqrec_tpu.ops.pallas_lstm_train import lstm_scan_train

wl4 = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
xl4 = jnp.asarray(rng.normal(size=(B, L, 4 * H)).astype(np.float32))
peep4 = jnp.asarray(rng.normal(size=(3, H)).astype(np.float32) * 0.1)
c04 = jnp.zeros((B, H), jnp.float32)
g_x = jax.grad(lambda ww: jnp.sum(xla_lstm(xl4, m, ww, peep4, h0, c04) ** 2))(wl4)
g_p = jax.grad(
    lambda ww: jnp.sum(lstm_scan_train(xl4, m, ww, peep4, h0, c04, 0.0) ** 2)
)(wl4)
np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=2e-3, atol=2e-3)
print("lstm train grad H=128: OK")

# --- LSTM forward at H=128 ---
wl = jnp.asarray(rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1)
xl = jnp.asarray(rng.normal(size=(B, L, 4 * H)).astype(np.float32))
peep = jnp.asarray(rng.normal(size=(3, H)).astype(np.float32) * 0.1)
c0 = jnp.zeros((B, H), jnp.float32)
want = np.asarray(xla_lstm(xl, m, wl, peep, h0, c0))
got = np.asarray(lstm_scan(xl, m, wl, peep, h0, c0))
np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
print("lstm fwd H=128: OK")

# --- fused score+topk vs two-pass XLA ---
Bk, Hk, N, S, k = 64, 32, 999, 8, 10
h = jnp.asarray(rng.normal(size=(Bk, Hk)).astype(np.float32))
wo = jnp.asarray(rng.normal(size=(Hk, N)).astype(np.float32))
bo = jnp.asarray(rng.normal(size=N).astype(np.float32))
seen = jnp.asarray(rng.integers(0, N, size=(Bk, S)).astype(np.int32))
sm = jnp.asarray(np.ones((Bk, S), np.float32))
dense = np.asarray(masked_top_k(h @ wo + bo, k, seen, sm))
_, fused = fused_score_topk(h, wo, bo, seen, sm, k=k)
fused = np.asarray(fused)
scores = np.asarray(h @ wo + bo)
for i in range(Bk):
    np.testing.assert_allclose(scores[i, fused[i]], scores[i, dense[i]], rtol=1e-5)
print("fused topk: OK")

# --- bidirectional tower: fused kernels via the time-flip trick ---
import os as _os
from seqrec_tpu.models.recurrent import RecurrentLayers

rl = RecurrentLayers(layer_type="GRU", layers=[128], bidirectional=True)
bi_params = jax.tree_util.tree_map(
    jnp.asarray, rl.init_params(np.random.default_rng(3), 500)
)
bi_ids = jnp.asarray(rng.integers(0, 500, size=(B, L, 1)).astype(np.int32))
bi_mask = jnp.asarray((rng.random((B, L)) < 0.9).astype(np.float32))
out_fused = np.asarray(rl.apply(bi_params, bi_ids, bi_mask, fast=True))
_os.environ["SEQREC_NO_PALLAS"] = "1"
out_xla = np.asarray(rl.apply(bi_params, bi_ids, bi_mask, fast=True))
del _os.environ["SEQREC_NO_PALLAS"]
np.testing.assert_allclose(out_fused, out_xla, rtol=1e-4, atol=1e-5)
print("bidirectional fused tower: OK")

# --- a GSPMD-partitioned program on the real chip: sharded train step
# (mesh 1x1 — the runtime exposes one chip) + sharded_score_topk must
# match the unsharded step's numerics ---
from seqrec_tpu.models.rnn_one_hot import RNNOneHot
from seqrec_tpu.models.updates import Adam
from seqrec_tpu.parallel import make_mesh
from seqrec_tpu.parallel.topk import sharded_score_topk

mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])


def tiny_model():
    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[16]),
        updater=Adam(0.01), max_length=8, batch_size=8, seed=0)
    model._prepare_networks(64)
    model.params = model._init_params()
    model._build_functions()
    return model


batch = {
    "ids": rng.integers(0, 64, size=(8, 8, 1)).astype(np.int32),
    "mask": np.ones((8, 8), np.float32),
    "targets": rng.integers(0, 64, size=(8,)).astype(np.int32),
    "target_pop": np.ones((8,), np.float32),
}
plain = tiny_model()
plain.opt_state = plain._opt.init(plain.params)
cost_plain = float(plain.train_function(dict(batch)))

sharded = tiny_model()
sharded.set_mesh(mesh)
sharded._shard_state()
cost_sharded = float(sharded.train_function(dict(batch)))
np.testing.assert_allclose(cost_sharded, cost_plain, rtol=1e-5)

from jax.sharding import NamedSharding, PartitionSpec as SP

hm = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
tops = sharded_score_topk(
    mesh,
    jax.device_put(hm, NamedSharding(mesh, SP("data", None))),
    jax.device_put(jnp.asarray(np.asarray(sharded.params["W_out"])),
                   NamedSharding(mesh, SP(None, "model"))),
    jax.device_put(jnp.asarray(np.asarray(sharded.params["b_out"])),
                   NamedSharding(mesh, SP("model"))),
    jax.device_put(jnp.asarray(batch["ids"][:, :, 0]),
                   NamedSharding(mesh, SP("data", None))),
    jax.device_put(jnp.asarray(batch["mask"]),
                   NamedSharding(mesh, SP("data", None))),
    k=5,
)
assert np.asarray(tops).shape == (8, 5)
print("sharded train step + topk on device: OK")

print("TPU_SMOKE_OK")
"""


def test_fused_kernels_match_xla_on_device():
    env = dict(os.environ)
    # undo the conftest's in-process CPU forcing for the child
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=_REPO,
        env=env,
        timeout=1200,
    )
    if "TPU_SMOKE_SKIP" in out.stdout:
        pytest.skip(out.stdout.strip().splitlines()[-1])
    assert "TPU_SMOKE_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-3000:])
