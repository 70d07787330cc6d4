"""Adaptive-sampling throughput: on-device vs host Rendle'14 draws.

Measures BPRMF training samples/s at ML-1M scale with the fused
on-device adaptive path (default) against the host vectorized sampler
(device_adaptive=False) — the round-3 gap item: uniform paths were fully
on-device while the adaptive default still round-tripped every 512
samples (factorization.py round-3 rationale).

Usage: python scripts/adaptive_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _ensure_dataset
    from seqrec_tpu.data import DataHandler
    from seqrec_tpu.models.factorization import BPRMF

    handler = DataHandler(_ensure_dataset() + "/")

    def run(device_adaptive: bool, seconds: float = 6.0):
        model = BPRMF(k=32, adaptive_sampling=True, sampling_bias=500,
                      init_sigma=0.1, seed=0)
        model.device_adaptive = device_adaptive
        model.prepare_model(handler)
        model.change_data_format(handler)
        model.init_model()
        # warmup (compile)
        n = 0
        _, got = model.training_step(0)
        n += got
        import jax

        jax.block_until_ready(model.V)
        t0 = time.perf_counter()
        total = 0
        while time.perf_counter() - t0 < seconds:
            cost, got = model.training_step(n)
            n += got
            total += got
        float(cost)  # force a real sync through the remote tunnel
        dt = time.perf_counter() - t0
        return total / dt

    dev = run(True)
    host = run(False)
    print(
        json.dumps(
            {
                "metric": "bprmf_adaptive_samples_per_s",
                "device": round(dev, 1),
                "host": round(host, 1),
                "speedup": round(dev / host, 2),
            }
        )
    )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
