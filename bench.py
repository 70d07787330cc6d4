"""Benchmark: training throughput of the flagship RNN-CCE model.

Prints ONE JSON line:
  {"metric": "train_sequences_per_s_per_chip", "value": N,
   "unit": "sequences/s/chip", "vs_baseline": N}

Setup (ML-1M-scale, reference parity config per BASELINE.md):
GRU hidden 50, max_length 30, full-softmax CCE over a ~3.7k-item catalog.

- ``value``: END-TO-END sequences/s of the real training loop (prefetch-
  threaded packed batch generation + async jitted train steps) on the
  default device (the real TPU chip under the driver) at batch 256 —
  batch size is a free deployment parameter; the reference's B=16 is a
  CPU-bound choice, not part of the task definition.
- ``vs_baseline``: ratio against a baseline throughput measured at the
  reference's own operating point (batch 16) on CPU — a stand-in for the
  Theano/OpenBLAS reference, which cannot run in this image (Python 2).
  The baseline number is measured once and cached in bench_baseline.json
  next to this file; delete the cache to re-measure.

Usage: python bench.py [--quick] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

N_ITEMS = 3700
HIDDEN = 50
MAX_LEN = 30
_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def make_model(batch_size: int):
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_one_hot import RNNOneHot
    from seqrec_tpu.models.updates import Adam

    model = RNNOneHot(
        recurrent_layer=RecurrentLayers(layer_type="GRU", layers=[HIDDEN]),
        updater=Adam(0.001),
        max_length=MAX_LEN,
        batch_size=batch_size,
        seed=0,
    )
    model._prepare_networks(N_ITEMS)
    model.params = model._init_params()
    model._build_functions()
    return model


def make_batch(batch_size: int, rng):
    lengths = rng.integers(5, MAX_LEN + 1, size=batch_size)
    ids = rng.integers(0, N_ITEMS, size=(batch_size, MAX_LEN, 1)).astype(np.int32)
    mask = (np.arange(MAX_LEN)[None, :] < lengths[:, None]).astype(np.float32)
    targets = rng.integers(0, N_ITEMS, size=(batch_size,)).astype(np.int32)
    pop = np.ones((batch_size,), dtype=np.float32)
    return {"ids": ids, "mask": mask, "targets": targets, "target_pop": pop}


def measure(model, batch, steps: int, device=None) -> float:
    """Steady-state sequences/s of the jitted train step (device only)."""
    import jax

    params, opt_state = model.params, model.opt_state
    if device is not None:
        params = jax.device_put(params, device)
        batch = jax.device_put(batch, device)
    if opt_state is None:
        opt_state = model._opt.init(params)

    step = model._train_step
    # warmup: compile + 2 steps
    for _ in range(3):
        params, opt_state, cost = step(params, opt_state, batch)
    jax.block_until_ready(cost)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, cost = step(params, opt_state, batch)
    jax.block_until_ready(cost)
    dt = time.perf_counter() - t0
    return batch["ids"].shape[0] * steps / dt


def measure_end_to_end(model, steps: int) -> float:
    """sequences/s of the REAL training loop: prefetch-threaded packed
    batch generation + async train steps, on an ML-1M-scale synthetic
    dataset (cached under /tmp)."""
    import jax

    from seqrec_tpu.data import DataHandler
    from seqrec_tpu.data.synthetic import make_dataset

    cache = "/tmp/seqrec_bench_data"
    if not os.path.isfile(os.path.join(cache, "data", "stats")):
        make_dataset(
            cache, n_users=2000, n_items=N_ITEMS, min_len=20, max_len=200,
            markov_strength=0.45, seed=11,
        )
    handler = DataHandler(cache + "/")
    model.set_dataset(handler)
    K = 256  # steps per dispatch: amortize the remote-dispatch overhead
    # (index-wire payloads are 2 x int32[K,B], so large K is cheap)
    # the real training-loop pipeline: packed batch assembly, K-step
    # stacking and the host->device transfer all happen in the prefetch
    # thread; the timed loop only enqueues device steps.
    gen = model._payload_pipeline(
        handler.training_set, np.random.default_rng(5), K
    )
    if model.opt_state is None:
        model.opt_state = model._opt.init(model.params)
    # warmup: compile
    for _ in range(2):
        cost = model.train_function_stacked(next(gen))
    jax.block_until_ready(cost)
    # measure in windows and take the median window rate: the device is
    # reached over a shared tunnel whose latency hiccups would otherwise
    # dominate a single long measurement
    n_dispatch = max(1, steps // K)
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            cost = model.train_function_stacked(next(gen))
        jax.block_until_ready(cost)
        windows.append(
            model.batch_size * n_dispatch * K / (time.perf_counter() - t0)
        )
    return float(np.median(windows))


def measure_cpu_baseline(steps: int) -> float:
    """Reference operating point (batch 16) on one CPU host.

    Runs in an isolated ``JAX_PLATFORMS=cpu`` subprocess: mixing the CPU
    backend into a process that already initialized the remote TPU
    platform deadlocks (the CPU compile never returns), so the baseline
    must never share a process with the TPU measurement.
    """
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline-worker",
         "--steps", str(steps)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(line)
        except ValueError:
            continue
    raise RuntimeError(f"cpu baseline worker failed: {out.stderr[-2000:]}")


def _cpu_baseline_worker(steps: int) -> None:
    import jax

    cpu = jax.devices("cpu")[0]
    model = make_model(16)
    batch = make_batch(16, np.random.default_rng(1))
    print(measure(model, batch, steps, device=cpu))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--cpu-baseline-worker", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    steps = 256 if args.quick else args.steps
    if args.cpu_baseline_worker:
        _cpu_baseline_worker(args.steps)
        return

    # main measurement on the default device (TPU under the driver):
    # the full training loop (host packed batching + async device steps)
    model = make_model(args.batch)
    value = measure_end_to_end(model, steps)

    # baseline: cached CPU measurement at the reference operating point
    if os.path.isfile(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            baseline = json.load(f)["cpu_b16_sequences_per_s"]
    else:
        baseline = measure_cpu_baseline(max(10, steps // 2))
        with open(_BASELINE_CACHE, "w") as f:
            json.dump(
                {
                    "cpu_b16_sequences_per_s": baseline,
                    "note": "JAX-CPU at the reference operating point "
                    "(GRU-50, L=30, batch 16, full CCE softmax, 3700 items); "
                    "stand-in for the Theano/OpenBLAS reference.",
                },
                f,
                indent=2,
            )

    print(
        json.dumps(
            {
                "metric": "train_sequences_per_s_per_chip",
                "value": round(value, 2),
                "unit": "sequences/s/chip",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )
    # the measurement is done and the line is out: exit without running
    # interpreter teardown, which intermittently SIGABRTs in the
    # experimental remote-TPU client while the prefetch threads unwind
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
