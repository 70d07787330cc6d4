"""Serving-path bench: batched masked top-10 at large catalogs.

Measures the production scoring+mask+top-k dispatch (the test.py /
validation hot path, reference rnn_base.py:132-159) at a 200k-item
catalog, B=512 chunks — the shape where round 3 recorded 41k users/s on
XLA's three-pass (matmul, mask-scatter, lax.top_k full sort). Compares:

- grouped: the exact two-level selection (ops/core.grouped_top_k)
- lax:     the plain lax.top_k path (control, SEQREC_NO_GROUPED_TOPK)

Timing: median wall-clock over windows with a scalar pull per window
(block_until_ready does not reliably block through the remote-TPU
tunnel), fresh h per dispatch so terminal-side caching cannot kick in.

Usage: python scripts/serving_bench.py [--items 200000] [--batch 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(topk_fn, h_stream, w, b, seen, sm, k, windows=5, per_window=8):
    import jax  # noqa: F401

    out = topk_fn(next(h_stream), w, b, seen, sm)
    _ = np.asarray(out[0])  # full sync
    rates = []
    B = seen.shape[0]
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(per_window):
            out = topk_fn(next(h_stream), w, b, seen, sm)
        _ = np.asarray(out[0])
        rates.append(B * per_window / (time.perf_counter() - t0))
    return float(np.median(rates)), [round(r) for r in rates]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seqrec_tpu.ops import core

    B, H, N, k = args.batch, args.hidden, args.items, args.k
    key = jax.random.PRNGKey(0)
    kw, kb, kh = jax.random.split(key, 3)
    w = jax.random.normal(kw, (H, N), jnp.float32)
    b = jax.random.normal(kb, (N,), jnp.float32)
    rng = np.random.default_rng(0)
    seen = jnp.asarray(rng.integers(0, N, size=(B, 30)).astype(np.int32))
    sm = jnp.asarray(np.ones((B, 30), dtype=np.float32))

    def h_stream():
        k = kh
        while True:
            k, sub = jax.random.split(k)
            yield jax.random.normal(sub, (B, H), jnp.float32)

    def device_us(topk_fn, h_stream, n=8):
        """Per-dispatch device time from an xplane trace (the e2e wall
        clock through the remote tunnel is link-dominated: ~10 ms of
        fixed dispatch overhead per chunk at these sizes)."""
        import glob as globmod
        import json as jsonmod
        import shutil

        try:
            from xprof.convert import raw_to_tool_data as rtd
        except Exception:
            return None
        tdir = "/tmp/seqrec_serving_trace"
        shutil.rmtree(tdir, ignore_errors=True)
        out = topk_fn(next(h_stream), w, b, seen, sm)
        _ = np.asarray(out[0])
        jax.profiler.start_trace(tdir)
        for _ in range(n):
            out = topk_fn(next(h_stream), w, b, seen, sm)
        _ = np.asarray(out[0])
        jax.profiler.stop_trace()
        try:
            files = globmod.glob(tdir + "/**/*.xplane.pb", recursive=True)
            data, _ = rtd.xspace_to_tool_data(files, "trace_viewer", {})
            events = jsonmod.loads(data).get("traceEvents", [])
            dev = sum(
                e.get("dur", 0)
                for e in events
                if e.get("ph") == "X" and e.get("name", "").startswith("jit_topk")
            )
            return dev / n if dev > 0 else None
        except Exception:
            return None
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

    def run(min_items):
        old = core.GROUPED_TOPK_MIN_ITEMS
        core.GROUPED_TOPK_MIN_ITEMS = min_items

        @jax.jit
        def topk(h, w, b, seen, sm):
            scores = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            ids = core.masked_top_k(scores, k, seen, sm)
            return ids, scores[:, 0]  # scalar-pull handle

        try:
            rate, windows = measure(topk, h_stream(), w, b, seen, sm, k)
            dev = device_us(topk, h_stream())
        finally:
            core.GROUPED_TOPK_MIN_ITEMS = old
        return rate, windows, dev

    grouped, gw, gdev = run(1)
    plain, pw, pdev = run(10**9)
    print(
        json.dumps(
            {
                "metric": "serving_topk_users_per_s",
                "items": N,
                "batch": B,
                "grouped": round(grouped, 1),
                "grouped_windows": gw,
                "grouped_device_us_per_chunk": round(gdev, 1) if gdev else None,
                "lax_topk": round(plain, 1),
                "lax_windows": pw,
                "lax_device_us_per_chunk": round(pdev, 1) if pdev else None,
                "speedup_e2e": round(grouped / plain, 2),
                "speedup_device": round(pdev / gdev, 2) if gdev and pdev else None,
            }
        )
    )
    sys.stdout.flush()
    import os

    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
