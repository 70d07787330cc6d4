"""Per-op probe: fused GRU train kernel at H=256 with a bb=64 batch tile
vs the XLA scan — the gate measurement for extending train_block_b's
candidate list (H=256 currently falls back to XLA because bb>=128
exceeds VMEM; bb=64 fits at ~9.7e6 B).

Usage: python scripts/gru256_probe.py [--B 1024] [--H 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--L", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seqrec_tpu.ops.pallas_rnn_train import gru_scan_train

    B, H, L = args.B, args.H, args.L
    G = 3 * H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, G)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, L)) < 0.9).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, G)).astype(np.float32) * 0.1)
    h0 = jnp.zeros((B, H), jnp.float32)

    def xla_scan(x, mask, w, h0):
        def step(h, xm):
            x_t, m = xm
            hid = jnp.dot(h, w, preferred_element_type=jnp.float32)
            r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
            u = jax.nn.sigmoid(x_t[:, H:2 * H] + hid[:, H:2 * H])
            c = jnp.tanh(x_t[:, 2 * H:] + r * hid[:, 2 * H:])
            h_new = (1 - u) * h + u * c
            return jnp.where(m[:, None] > 0, h_new, h), None

        h, _ = jax.lax.scan(step, h0, (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask, 0, 1)))
        return h

    def bench(fn, label, reps=30):
        loss = lambda x: fn(x, mask, w, h0).sum()  # noqa: E731
        g = jax.jit(jax.grad(loss))
        out = g(x)
        _ = float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(out * 0.999 + x * 0.001)  # fresh inputs, same shapes
        _ = float(out.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / reps
        return {"label": label, "us_per_grad": round(dt * 1e6, 1)}

    rows = [bench(xla_scan, "xla_scan")]
    rows.append(
        bench(
            lambda x, m, w, h0: gru_scan_train(x, m, w, h0, 0.0, 64),
            "pallas_bb64",
        )
    )

    # LSTM H=256 at bb=64 also fits VMEM (13.6e6 B modeled); measure it
    # against the XLA LSTM scan with the same protocol
    from seqrec_tpu.ops.pallas_lstm_train import lstm_scan_train

    G4 = 4 * H
    xl = jnp.asarray(rng.normal(size=(B, L, G4)).astype(np.float32) * 0.1)
    wl = jnp.asarray(rng.normal(size=(H, G4)).astype(np.float32) * 0.1)
    peep = jnp.asarray(rng.normal(size=(3, H)).astype(np.float32) * 0.1)
    c0 = jnp.zeros((B, H), jnp.float32)

    def lstm_xla(x, mask, w, h0):
        def step(carry, xm):
            h, c = carry
            x_t, m = xm
            pre = x_t + jnp.dot(h, w, preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(pre[:, :H] + peep[0] * c)
            f = jax.nn.sigmoid(pre[:, H:2 * H] + peep[1] * c)
            c_new = f * c + i * jnp.tanh(pre[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(pre[:, 3 * H:] + peep[2] * c_new)
            h_new = o * jnp.tanh(c_new)
            mm = m[:, None] > 0
            return (jnp.where(mm, h_new, h), jnp.where(mm, c_new, c)), None

        (h, _), _ = jax.lax.scan(
            step, (h0, c0),
            (jnp.swapaxes(x, 0, 1), jnp.swapaxes(mask, 0, 1)),
        )
        return h

    def bench_l(fn, label, reps=30):
        loss = lambda x: fn(x, mask, wl, h0).sum()  # noqa: E731
        gfn = jax.jit(jax.grad(loss))
        out = gfn(xl)
        _ = float(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = gfn(out * 0.999 + xl * 0.001)
        _ = float(out.reshape(-1)[0])
        return {"label": label, "us_per_grad": round((time.perf_counter() - t0) / reps * 1e6, 1)}

    rows.append(bench_l(lstm_xla, "lstm_xla_scan"))
    rows.append(
        bench_l(
            lambda x, m, w, h0: lstm_scan_train(x, m, w, peep, h0, c0, 0.0, 64),
            "lstm_pallas_bb64",
        )
    )
    print(json.dumps({"B": B, "H": H, "L": L, "rows": rows}))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
