"""Benchmark: training throughput of the flagship RNN-CCE model.

Prints ONE JSON line whose headline fields follow the driver contract:
  {"metric": "train_sequences_per_s_per_chip", "value": N,
   "unit": "sequences/s/chip", "vs_baseline": N, ...}

plus self-describing extras:
  e2e_b16_sequences_per_s   end-to-end rate at the reference's own
                            operating point (batch 16, index wire)
  device_only_b256          device compute rate of the fused K-step
                            dispatch, from an xplane DEVICE trace (the
                            remote-TPU tunnel makes wall-clock timing of
                            device work unreliable: RTT fluctuates
                            0.1-30ms and identical repeated executions
                            can be served from a terminal-side cache)
  mfu_pct                   analytic model-FLOP utilization of the e2e
                            rate (tiny models leave the MXU mostly idle
                            by construction — the number is honest, not
                            flattering)
  windows_b256              the raw per-window e2e rates (tunnel
                            variance is visible here; the headline is
                            their median)

Setup (ML-1M-scale, reference parity config per BASELINE.md):
GRU hidden 50, max_length 30, full-softmax CCE over a ~3.7k-item catalog.

- ``value``: END-TO-END sequences/s of the real training loop (prefetch-
  threaded index-wire batch generation + fused K-step device dispatches)
  at batch 256 — batch size is a free deployment parameter; the
  reference's B=16 is a CPU-bound choice, not part of the task
  definition. The honest same-operating-point comparison is
  ``e2e_b16_sequences_per_s`` vs the CPU baseline.
- ``vs_baseline``: ratio of ``e2e_b16_sequences_per_s`` against the
  baseline measured at the SAME operating point (batch 16) on CPU — a
  stand-in for the Theano/OpenBLAS reference, which cannot run in this
  image (Python 2). Measured once, cached in bench_baseline.json.

Round-1 note: BENCH_r01 recorded 8.63M seq/s where BASELINE.md claimed
18-21M for the same path. Both numbers were wall-clock medians through
the shared tunnel; the spread is tunnel throughput variance between
sessions (see ``windows_b256`` for the in-run spread). The device-only
trace number is the stable one.

Usage: python bench.py [--quick] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

N_ITEMS = 3700
HIDDEN = 50
MAX_LEN = 30
K_DISPATCH = 256  # optimizer steps fused per device dispatch
_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
_TRACE_DIR = "/tmp/seqrec_bench_trace"


def make_updater(opt: str):
    from seqrec_tpu.models.updates import Adagrad, Adam

    if opt == "adam":
        return Adam(0.001)
    if opt == "adam_bf16m":
        return Adam(0.001, moment_dtype="bfloat16")
    if opt == "adagrad":
        return Adagrad(0.1)
    raise ValueError(opt)


def make_model(
    batch_size: int,
    hidden: int = HIDDEN,
    n_items: int = N_ITEMS,
    compute_dtype: str = "float32",
    device_init: bool = False,
    tower: str = "GRU",
    opt: str = "adam",
    emb: int = 0,
    family: str = "cce",
    L: int = MAX_LEN,
    sampling: int = 256,
):
    from seqrec_tpu.models.recurrent import RecurrentLayers
    from seqrec_tpu.models.rnn_margin import RNNMargin
    from seqrec_tpu.models.rnn_one_hot import RNNOneHot
    from seqrec_tpu.models.rnn_sampling import RNNSampling

    common = dict(
        recurrent_layer=RecurrentLayers(
            layer_type=tower, layers=[hidden], embedding_size=emb
        ),
        updater=make_updater(opt),
        max_length=L,
        batch_size=batch_size,
        seed=0,
        compute_dtype=compute_dtype,
    )
    if family == "cce":
        model = RNNOneHot(**common)
    elif family == "margin":
        model = RNNMargin(loss_function="hinge", **common)
    elif family == "bpr":
        model = RNNSampling(loss_function="BPR", sampling=sampling, **common)
    elif family == "cluster":
        from seqrec_tpu.models.cluster import RNNCluster

        model = RNNCluster(
            n_clusters=10, loss="Blackout", sampling=sampling, **common
        )
    else:
        raise ValueError(family)
    model._prepare_networks(n_items)
    if device_init:
        model.params = _device_init_params(
            hidden, n_items, tower, emb,
            n_clusters=10 if family == "cluster" else 0,
        )
    else:
        model.params = model._init_params()
    model._build_functions()
    return model


def _device_init_params(
    H: int, N: int, tower: str = "GRU", emb: int = 0, n_clusters: int = 0
):
    """Flagship CCE parameter pytree initialized ON DEVICE.

    The host-side `_init_params` + transfer costs minutes through the
    remote-TPU tunnel at 10^5-catalog shapes (~6 MB/s effective for the
    ~2.4 GB params+opt-state of H=256/N=200k); the matrix bench only
    measures throughput, so value-parity of the init doesn't matter —
    shapes and dtypes do. Mirrors RecurrentLayers.init_params's layout
    (GRU: 3 gate sections; LSTM: 4 plus cell state and peepholes)."""
    import jax
    import jax.numpy as jnp

    G = 4 if tower == "LSTM" else 3

    def init(key):
        ks = jax.random.split(key, 10)
        limit = (6.0 / (H + N)) ** 0.5
        in_dim = emb if emb else N
        layer = {
            "W_in": 0.1 * jax.random.normal(ks[0], (in_dim, G * H), jnp.float32),
            "W_hid": 0.1 * jax.random.normal(ks[1], (H, G * H), jnp.float32),
            "b": jnp.zeros((G * H,), jnp.float32),
            "h0": jnp.zeros((H,), jnp.float32),
        }
        if tower == "LSTM":
            layer["c0"] = jnp.zeros((H,), jnp.float32)
            layer["w_ci"] = 0.1 * jax.random.normal(ks[3], (H,), jnp.float32)
            layer["w_cf"] = 0.1 * jax.random.normal(ks[4], (H,), jnp.float32)
            layer["w_co"] = 0.1 * jax.random.normal(ks[5], (H,), jnp.float32)
        tower_tree = {"layer0_fwd": layer}
        if emb:
            tower_tree["embedding"] = 0.1 * jax.random.normal(
                ks[6], (N, emb), jnp.float32
            )
        params = {
            "tower": tower_tree,
            "W_out": jax.random.uniform(
                ks[2], (H, N), jnp.float32, -limit, limit
            ),
            "b_out": jnp.zeros((N,), jnp.float32),
        }
        if n_clusters:
            limit_cs = (6.0 / (H + n_clusters)) ** 0.5
            params["W_cs"] = jax.random.uniform(
                ks[8], (H, n_clusters), jnp.float32, -limit_cs, limit_cs
            )
            params["cluster_repartition"] = 0.1 * jax.random.normal(
                ks[9], (N, n_clusters), jnp.float32
            )
        return params

    return jax.jit(init)(jax.random.PRNGKey(0))


def make_batch(batch_size: int, rng):
    lengths = rng.integers(5, MAX_LEN + 1, size=batch_size)
    ids = rng.integers(0, N_ITEMS, size=(batch_size, MAX_LEN, 1)).astype(np.int32)
    mask = (np.arange(MAX_LEN)[None, :] < lengths[:, None]).astype(np.float32)
    targets = rng.integers(0, N_ITEMS, size=(batch_size,)).astype(np.int32)
    pop = np.ones((batch_size,), dtype=np.float32)
    return {"ids": ids, "mask": mask, "targets": targets, "target_pop": pop}


def measure(model, batch, steps: int, device=None) -> float:
    """Steady-state sequences/s of the jitted train step."""
    import jax

    params, opt_state = model.params, model.opt_state
    if device is not None:
        params = jax.device_put(params, device)
        batch = jax.device_put(batch, device)
    if opt_state is None:
        opt_state = model._opt.init(params)

    step = model._train_step
    for _ in range(3):
        params, opt_state, cost = step(params, opt_state, batch)
    jax.block_until_ready(cost)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, cost = step(params, opt_state, batch)
    jax.block_until_ready(cost)
    dt = time.perf_counter() - t0
    return batch["ids"].shape[0] * steps / dt


def _ensure_dataset() -> str:
    from seqrec_tpu.data.synthetic import make_dataset

    cache = "/tmp/seqrec_bench_data"
    if not os.path.isfile(os.path.join(cache, "data", "stats")):
        make_dataset(
            cache, n_users=2000, n_items=N_ITEMS, min_len=20, max_len=200,
            markov_strength=0.45, seed=11,
        )
    return cache


def _pipeline(model, handler, K: int):
    from seqrec_tpu.data import DataHandler  # noqa: F401 (import keeps lazy deps warm)

    model.set_dataset(handler)
    if model.mesh is not None and model.opt_state is None:
        model._shard_state()  # sharded params + opt state (mesh rows)
    gen = model._payload_pipeline(
        handler.training_set, np.random.default_rng(5), K
    )
    if model.opt_state is None:
        import jax

        model.opt_state = model._opt.init(model.params)
    return gen


def measure_end_to_end(model, handler, steps: int, windows: int = 5, K: int = K_DISPATCH):
    """(median sequences/s, per-window rates) of the REAL training loop:
    prefetch-threaded index-wire batch generation + fused K-step device
    dispatches. Every dispatch carries FRESH (rows, cuts) payloads, so
    terminal-side result caching cannot kick in."""
    import jax
    gen = _pipeline(model, handler, K)
    for _ in range(2):
        cost = model.train_function_stacked(next(gen))
    float(cost)  # NB: block_until_ready does NOT reliably block through
    # the remote tunnel (measured e2e "rates" above the device-only rate
    # in round 1/2); pulling the scalar cost forces a real sync.
    n_dispatch = max(2, steps // K)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            cost = model.train_function_stacked(next(gen))
        float(cost)
        rates.append(
            model.batch_size * n_dispatch * K / (time.perf_counter() - t0)
        )
    return float(np.median(rates)), [round(r, 1) for r in rates]


def measure_device_only(model, handler, n_dispatch: int = 3, K: int = K_DISPATCH):
    """Device-compute sequences/s of the fused dispatch, from an xplane
    device trace (wall clock through the tunnel is unreliable). Returns
    None when the trace tooling is unavailable."""
    import jax

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception:
        return None
    gen = _pipeline(model, handler, K)
    cost = model.train_function_stacked(next(gen))
    jax.block_until_ready(cost)

    shutil.rmtree(_TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(_TRACE_DIR)
    for _ in range(n_dispatch):
        cost = model.train_function_stacked(next(gen))
    jax.block_until_ready(cost)
    jax.profiler.stop_trace()
    try:
        files = glob.glob(_TRACE_DIR + "/**/*.xplane.pb", recursive=True)
        data, _ = rtd.xspace_to_tool_data(files, "trace_viewer", {})
        events = json.loads(data).get("traceEvents", [])
        # the jit_<name>(hash) spans in this tool's output are the device
        # execution spans (validated against per-op xplane sums on the
        # fused GRU kernels, 2026-08-20)
        dev_us = sum(
            e.get("dur", 0)
            for e in events
            if e.get("ph") == "X" and e.get("name", "").startswith("jit_train_multi")
        )
        if dev_us <= 0:
            return None
        return model.batch_size * K * n_dispatch / (dev_us * 1e-6)
    except Exception:
        return None
    finally:
        shutil.rmtree(_TRACE_DIR, ignore_errors=True)


def flops_per_sequence(
    H: int = HIDDEN, N: int = N_ITEMS, L: int = MAX_LEN, tower: str = "GRU",
    family: str = "cce", B: int = 0, S: int = 256,
) -> float:
    """Analytic fwd+bwd model FLOPs per trained sequence (recurrent tower
    + output head; gather-sum input contributes no matmul FLOPs).

    The CCE and margin heads score the full catalog (2·H·N); the sampled
    head scores only the B targets + S shared negatives
    (2·H·(B+S) per example — rnn_sampling.py's [B,H]x[H,B+S] matmul)."""
    G = 4 if tower == "LSTM" else 3
    head = 2 * H * (B + S) if family in ("bpr", "cluster") else 2 * H * N
    fwd = 2 * H * (G * H) * L + head  # time scan + output head
    return 3.0 * fwd  # backward ~2x forward


# ----------------------------------------------------------------------
# MXU-shape matrix: {H} x {catalog} x {dtype} at deployment batch sizes,
# plus the round-4 optimizer-traffic rows. The parity config (GRU-50 /
# 3.7k catalog) leaves the MXU ~97.5% idle by construction; these shapes
# are where the TPU-first design (bf16 catalog matmuls, fused Pallas
# train scan, index wire) actually engages.
#
# Round-3 finding (BASELINE.md): at H=256/200k the step is bound by
# dense-Adam HBM traffic (~5.7 GB/step of moment+param passes vs ~3.6 ms
# of matmul), capping MFU at 17.8%. The round-4 rows measure the two
# countermeasures: (a) batch scaling — the optimizer pass is per-STEP, so
# B=2048..8192 amortizes it per-sample near-linearly; (b) reduced
# optimizer state — adagrad (one accumulator) and bf16-moment Adam (half
# the moment bytes). bf16 matmuls are re-measured at the winning config.
# ----------------------------------------------------------------------
MATRIX_BATCH = 1024
MATRIX_K = 32

_USERS = {50_000: 20_000, 200_000: 50_000}


def matrix_configs():
    """Row configs: dicts with H/catalog/dtype and optional B (default
    MATRIX_BATCH), opt (default adam), tower (default GRU)."""
    rows = []
    # round-3 base grid: H x catalog x dtype at B=1024, adam
    for H in (128, 256):
        for N in (50_000, 200_000):
            for dtype in ("f32", "bf16"):
                rows.append({"H": H, "catalog": N, "dtype": dtype})
    # (a) batch scaling at the MFU-peak shape
    for B in (2048, 4096, 8192):
        rows.append({"H": 256, "catalog": 200_000, "dtype": "f32", "B": B})
    # (b) reduced-state optimizers at the same shape
    for opt in ("adagrad", "adam_bf16m"):
        rows.append({"H": 256, "catalog": 200_000, "dtype": "f32", "opt": opt})
        rows.append(
            {"H": 256, "catalog": 200_000, "dtype": "f32", "opt": opt, "B": 4096}
        )
    # the combined ceiling: biggest batch + cheapest optimizer state
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "f32", "opt": "adagrad", "B": 8192}
    )
    # factorized embedding input (--r_emb, reference parity flag): the
    # input-table gather/scatter at D=3H rows runs far below streaming
    # speed (measured: D=768 gather 5.6 ms vs D=128 0.62 ms for the
    # same row count; scatter 12.7 vs 2.9 ms) — E=128 shrinks both and
    # adds one cheap E->3H matmul
    rows.append(
        {
            "H": 256,
            "catalog": 200_000,
            "dtype": "f32",
            "opt": "adagrad",
            "B": 8192,
            "emb": 128,
        }
    )
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "f32", "B": 1024, "emb": 128}
    )
    # at the emb ceiling the step is finally matmul-heavy (~49% f32
    # MFU): re-try bf16 matmuls where they can actually pay
    rows.append(
        {
            "H": 256,
            "catalog": 200_000,
            "dtype": "bf16",
            "opt": "adagrad",
            "B": 8192,
            "emb": 128,
        }
    )
    # bf16 matmuls re-measured once the optimizer share shrinks
    rows.append({"H": 256, "catalog": 200_000, "dtype": "bf16", "B": 4096})
    rows.append(
        {
            "H": 256,
            "catalog": 200_000,
            "dtype": "bf16",
            "B": 4096,
            "opt": "adam_bf16m",
        }
    )
    # LSTM e2e rows (pallas_lstm_train engages at H>=128)
    for N in (50_000, 200_000):
        rows.append({"H": 128, "catalog": N, "dtype": "f32", "tower": "LSTM"})
    # XLA-scan controls (SEQREC_NO_PALLAS): the train kernels' e2e
    # contribution, measured rather than asserted from per-op traces
    for tower in ("GRU", "LSTM"):
        rows.append(
            {
                "H": 128,
                "catalog": 200_000,
                "dtype": "f32",
                "tower": tower,
                "no_pallas": True,
            }
        )
    # streaming-CCE attribution: rows above run with the streaming
    # (flash-style) loss wherever the model gates it on (catalog >=
    # 16k); these dense-loss controls pin SEQREC_NO_STREAMING_CCE at the
    # MFU-critical shape, and the extra B=8192 rows chase the combined
    # ceiling (batch amortization + reduced opt state + streaming loss)
    for B in (1024, 8192):
        rows.append(
            {
                "H": 256,
                "catalog": 200_000,
                "dtype": "f32",
                "B": B,
                "no_stream": True,
            }
        )
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192, "opt": "adam_bf16m"}
    )
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "bf16", "B": 8192, "opt": "adam_bf16m"}
    )
    # ------------------------------------------------------------------
    # round-5 rows
    # ------------------------------------------------------------------
    # (1) mesh-1x1: the SHARDED streaming CCE (shard_map local scans +
    # psum'd LSE stats) through the full GSPMD train step — per-chip
    # overhead of the scaling path vs the unsharded rows above
    rows.append({"H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192, "mesh": "1x1"})
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "mesh": "1x1",
        }
    )
    # (2) margin family at MXU shapes: the new streaming margin head vs
    # its dense [B, n_items] Y/Wt control (the B=8192 dense control is
    # expected to OOM — ~3 x 6.5 GB of intermediates — and is recorded
    # as an error row on purpose)
    for B, opt in ((1024, "adam"), (8192, "adagrad")):
        rows.append(
            {
                "H": 256, "catalog": 200_000, "dtype": "f32", "B": B,
                "opt": opt, "family": "margin",
            }
        )
        rows.append(
            {
                "H": 256, "catalog": 200_000, "dtype": "f32", "B": B,
                "opt": opt, "family": "margin", "no_stream_margin": True,
                # the B=8192 dense control is infeasible BY DESIGN
                # (~20 GB of [B, n_items] intermediates); its error row
                # is reusable evidence, not a transient failure
                "expect_infeasible": B == 8192,
            }
        )
    # margin + the emb128 input lever (the margin trace shows the same
    # one-hot W_in gather/scatter bound as CCE: 25.8 ms of an 87 ms step)
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "family": "margin",
        }
    )
    # (3) sampled-loss refresh with the round-4 levers (the only prior
    # number, 68k, predates remat / batch scaling / adagrad)
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "f32", "B": 1024, "family": "bpr"}
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "family": "bpr",
        }
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "family": "bpr",
        }
    )
    # sharded streaming margin through the full GSPMD step on one chip
    # (the CCE mesh rows' counterpart for the margin head)
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "family": "margin", "mesh": "1x1",
        }
    )
    # cluster family (Blackout over shared negatives + the soft cluster
    # membership machinery) — completes loss-family coverage at the
    # MXU shape
    rows.append(
        {"H": 256, "catalog": 200_000, "dtype": "f32", "B": 1024, "family": "cluster"}
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "family": "cluster",
        }
    )
    # (4) sequence-length axis: the reference's code default is
    # max_length=200 (rnn_base.py:24); every prior row is L=30. L=100
    # runs on the standard matrix dataset (seq lens 20-100); L=200 needs
    # the long dataset (120-250). B drops at L=200: the [B, L, 3H]
    # gathered input stream is 5 GB at B=8192.
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "L": 100,
        }
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 8192,
            "opt": "adagrad", "emb": 128, "L": 100,
        }
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 2048,
            "opt": "adagrad", "L": 200, "dataset": "long",
        }
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 4096,
            "opt": "adagrad", "emb": 128, "L": 200, "dataset": "long",
        }
    )
    rows.append(
        {
            "H": 256, "catalog": 200_000, "dtype": "f32", "B": 2048,
            "opt": "adagrad", "emb": 128, "L": 200, "dataset": "long",
        }
    )
    return rows


def _ensure_matrix_dataset(n_items: int, n_users: int) -> str:
    from seqrec_tpu.data.synthetic import make_dataset

    cache = f"/tmp/seqrec_matrix_{n_items // 1000}k"
    if not os.path.isfile(os.path.join(cache, "data", "stats")):
        make_dataset(
            cache, n_users=n_users, n_items=n_items, min_len=20, max_len=100,
            markov_strength=0.5, seed=3 + n_items % 7, val_size=100,
            test_size=100, vectorized=True,
        )
    return cache + "/"


def _ensure_matrix_dataset_long(n_items: int) -> str:
    """Long-sequence variant for the L=200 matrix rows (the standard
    matrix dataset caps sequences at 100 interactions; the reference's
    code-default max_length is 200, rnn_base.py:24)."""
    from seqrec_tpu.data.synthetic import make_dataset

    cache = f"/tmp/seqrec_matrix_{n_items // 1000}k_long"
    if not os.path.isfile(os.path.join(cache, "data", "stats")):
        make_dataset(
            cache, n_users=20_000, n_items=n_items, min_len=120, max_len=250,
            markov_strength=0.5, seed=17, val_size=100, test_size=100,
            vectorized=True,
        )
    return cache + "/"


_MATRIX_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_matrix.json"
)


def load_or_run_matrix(force: bool = False):
    """The matrix result, from the committed artifact when present.

    A full live matrix run costs 30-60 min: each (H, catalog, dtype)
    config pays a server-side XLA compile through the remote-TPU tunnel
    measured between 230 s and >580 s for the SAME program (shared
    compile-server queue; the persistent jax compilation cache writes
    entries but reload through the tunnel is not reliably faster). The
    steady-state rates themselves are stable (<2% across sessions, same
    protocol as the headline bench), so the matrix is measured once per
    round via ``--matrix-only`` and embedded with provenance."""
    if not force and os.path.isfile(_MATRIX_CACHE):
        with open(_MATRIX_CACHE) as f:
            return json.load(f)
    result = {
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "protocol": "e2e index-wire training loop, K=32, 3 windows of 2 "
        "fused dispatches each (median), device-only from xplane trace; "
        "B=1024, L=30, GRU, adam, CCE unless the row key says otherwise; "
        "MFU vs dtype peak (197/98.5 TFLOP/s bf16/f32, v5e)",
        "rows": run_matrix(),
    }
    with open(_MATRIX_CACHE, "w") as f:
        json.dump(result, f, indent=2)
    return result


def pallas_train_engaged(tower: str, H: int, B: int) -> bool:
    """The production gating predicate (single source of truth in
    recurrent.train_kernel_engages) so matrix rows record whether the
    shape engaged the fused custom-VJP scan."""
    from seqrec_tpu.models.recurrent import train_kernel_engages

    return train_kernel_engages(tower, B, H)


def _row_key(cfg: dict) -> str:
    key = "{}-{}-{}-{}-B{}".format(
        cfg.get("tower", "GRU"),
        cfg["H"],
        cfg["catalog"],
        cfg["dtype"],
        cfg.get("B", MATRIX_BATCH),
    )
    if cfg.get("opt", "adam") != "adam":
        key += "-" + cfg["opt"]
    if cfg.get("emb"):
        key += f"-emb{cfg['emb']}"
    if cfg.get("no_pallas"):
        key += "-xla"
    if cfg.get("no_stream"):
        key += "-densecce"
    if cfg.get("family", "cce") != "cce":
        key += "-" + cfg["family"]
    if cfg.get("no_stream_margin"):
        key += "-densemargin"
    if cfg.get("L"):
        key += f"-L{cfg['L']}"
    if cfg.get("mesh"):
        key += f"-mesh{cfg['mesh']}"
    return key


def run_matrix(windows: int = 3, n_dispatch: int = 2):
    """e2e + device-only rate and MFU for each MXU-relevant config
    (see matrix_configs for the row list and rationale).

    MFU is computed against the peak of the dtype the catalog matmul
    (the dominant FLOP term) runs in: 197 TFLOP/s bf16, 98.5 f32 (v5e).

    Resumable: each finished config is appended to a partial file so an
    interrupted run (the per-config compile takes minutes through the
    tunnel) picks up where it left off. A config that exhausts HBM is
    recorded as an ``error`` row rather than aborting the matrix.
    """
    from seqrec_tpu.data import DataHandler

    partial = _MATRIX_CACHE + ".partial"
    done = {}
    # seed the resume cache from the committed artifact: steady-state
    # rates are stable across sessions (<2%, measured r3->r4), so rows
    # measured under the same protocol are NOT re-paid — only configs
    # not yet in bench_matrix.json run live (each costs a 230-580 s
    # tunnel compile). Delete bench_matrix.json to force a full re-run.
    # error rows are NOT reused — a transient failure (tunnel/compile-
    # server 500) must re-measure on the next invocation rather than
    # freeze into the artifact — EXCEPT for configs marked
    # expect_infeasible, whose error row is the deliberate result
    infeasible_keys = {
        _row_key(c) for c in matrix_configs() if c.get("expect_infeasible")
    }

    def _reusable(row):
        key = row.get("key") or _row_key(row)
        return not row.get("error") or key in infeasible_keys

    if os.path.isfile(_MATRIX_CACHE):
        with open(_MATRIX_CACHE) as f:
            for row in json.load(f).get("rows", []):
                if _reusable(row):
                    done[row.get("key") or _row_key(row)] = row
    if os.path.isfile(partial):
        with open(partial) as f:
            for line in f:
                row = json.loads(line)
                if _reusable(row):
                    done[row.get("key") or _row_key(row)] = row

    rows = []
    handlers: dict = {}
    for cfg in matrix_configs():
        key = _row_key(cfg)
        if key in done:
            rows.append(done[key])
            continue
        hidden, n_items = cfg["H"], cfg["catalog"]
        B = cfg.get("B", MATRIX_BATCH)
        tower = cfg.get("tower", "GRU")
        opt = cfg.get("opt", "adam")
        family = cfg.get("family", "cce")
        L = cfg.get("L", MAX_LEN)
        dtype = "bfloat16" if cfg["dtype"] == "bf16" else "float32"
        hkey = (n_items, cfg.get("dataset", ""))
        if hkey not in handlers:
            if cfg.get("dataset") == "long":
                handlers[hkey] = DataHandler(
                    _ensure_matrix_dataset_long(n_items)
                )
            else:
                handlers[hkey] = DataHandler(
                    _ensure_matrix_dataset(n_items, _USERS[n_items])
                )
        handler = handlers[hkey]
        row = {
            "key": key,
            "H": hidden,
            "catalog": int(handler.n_items),
            "dtype": cfg["dtype"],
            "B": B,
            "tower": tower,
            "opt": opt,
        }
        if family != "cce":
            row["family"] = family
        if cfg.get("L"):
            row["L"] = L
        if cfg.get("mesh"):
            row["mesh"] = cfg["mesh"]
        if cfg.get("emb"):
            row["emb"] = cfg["emb"]
        if cfg.get("no_pallas"):
            row["no_pallas"] = True
        if cfg.get("no_stream"):
            row["no_stream"] = True
        if cfg.get("no_stream_margin"):
            row["no_stream_margin"] = True
        prev_np = os.environ.get("SEQREC_NO_PALLAS")
        prev_ns = os.environ.get("SEQREC_NO_STREAMING_CCE")
        prev_nm = os.environ.get("SEQREC_NO_STREAMING_MARGIN")
        try:
            if cfg.get("no_pallas"):
                # read at trace time (recurrent._pallas_available), so
                # setting it before the model's functions are built (and
                # first traced) pins this row to the XLA scan
                os.environ["SEQREC_NO_PALLAS"] = "1"
            if cfg.get("no_stream"):
                os.environ["SEQREC_NO_STREAMING_CCE"] = "1"
            if cfg.get("no_stream_margin"):
                os.environ["SEQREC_NO_STREAMING_MARGIN"] = "1"
            model = make_model(
                B, hidden=hidden, n_items=handler.n_items,
                compute_dtype=dtype, device_init=True, tower=tower, opt=opt,
                emb=cfg.get("emb", 0), family=family, L=L,
            )
            if cfg.get("mesh"):
                from seqrec_tpu.parallel import make_mesh

                nd, nm = (int(x) for x in cfg["mesh"].split("x"))
                model.set_mesh(make_mesh(n_data=nd, n_model=nm))
            value, win = measure_end_to_end(
                model, handler, steps=n_dispatch * MATRIX_K,
                windows=windows, K=MATRIX_K,
            )
            # reuse the SAME compiled model for the device trace — the
            # program is identical, so a fresh compile would only pay
            # the tunnel's 230-580 s compile queue again
            dev_only = measure_device_only(model, handler, K=MATRIX_K)
            peak = 197e12 if dtype == "bfloat16" else 197e12 / 2
            mfu = (
                (dev_only or value)
                * flops_per_sequence(
                    hidden, handler.n_items, L=L, tower=tower,
                    family=family, B=B,
                )
            ) / peak * 100.0
            from seqrec_tpu.ops.streaming_cce import STREAMING_CCE_MIN_ITEMS

            row.update(
                e2e_seq_per_s=round(value, 1),
                device_only=round(dev_only, 1) if dev_only else None,
                mfu_pct=round(mfu, 2),
                pallas_train=pallas_train_engaged(tower, hidden, B),
                # MFU counts MODEL flops: the streaming loss's extra
                # recompute pass is (correctly) charged as overhead
                streaming_cce=bool(
                    family == "cce"
                    and not cfg.get("no_stream")
                    and handler.n_items >= STREAMING_CCE_MIN_ITEMS
                ),
                windows=win,
            )
            if family == "margin":
                row["streaming_margin"] = not cfg.get("no_stream_margin")
        except Exception as exc:
            # record the failure and keep the matrix going: OOMs are
            # expected for deliberately infeasible control rows (e.g.
            # dense margin at B=8192), and the remote compile server
            # itself 500s when the server-side compile exhausts memory
            msg = str(exc)
            if "RESOURCE_EXHAUSTED" in msg or "exhausted" in msg.lower():
                kind = "RESOURCE_EXHAUSTED"
            else:
                kind = type(exc).__name__
            row.update(error=kind, detail=msg[:300])
            print(f"matrix row {key} failed: {kind}", file=sys.stderr, flush=True)
        finally:
            if cfg.get("no_pallas"):
                if prev_np is None:
                    os.environ.pop("SEQREC_NO_PALLAS", None)
                else:
                    os.environ["SEQREC_NO_PALLAS"] = prev_np
            if cfg.get("no_stream"):
                if prev_ns is None:
                    os.environ.pop("SEQREC_NO_STREAMING_CCE", None)
                else:
                    os.environ["SEQREC_NO_STREAMING_CCE"] = prev_ns
            if cfg.get("no_stream_margin"):
                if prev_nm is None:
                    os.environ.pop("SEQREC_NO_STREAMING_MARGIN", None)
                else:
                    os.environ["SEQREC_NO_STREAMING_MARGIN"] = prev_nm
        rows.append(row)
        with open(partial, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps({"matrix_row": row}), file=sys.stderr, flush=True)
    if os.path.isfile(partial):
        os.remove(partial)
    return rows


def measure_cpu_baseline(steps: int) -> float:
    """Reference operating point (batch 16) on one CPU host, isolated in
    a JAX_PLATFORMS=cpu subprocess (mixing CPU into a TPU-initialized
    process deadlocks the compile)."""
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
    ap.add_argument("--matrix-only", action="store_true",
                    help="Run only the MXU-shape matrix and print it.")
    ap.add_argument("--no-matrix", action="store_true",
                    help="Skip the MXU-shape matrix (parity headline only).")
    args = ap.parse_args()
    steps = 256 if args.quick else args.steps
    if args.cpu_baseline_worker:
        _cpu_baseline_worker(args.steps)
        return

    from seqrec_tpu.data import DataHandler

    if args.matrix_only:
        print(
            json.dumps(
                {
                    "metric": "mxu_shape_matrix",
                    "matrix": load_or_run_matrix(force=True),
                }
            )
        )
        sys.stdout.flush()
        os._exit(0)

    handler = DataHandler(_ensure_dataset() + "/")

    # deployment operating point: e2e loop at B=256
    model = make_model(args.batch)
    value, windows = measure_end_to_end(model, handler, steps)

    # reference operating point: e2e loop at B=16 (same fused pipeline)
    model16 = make_model(16)
    e2e_b16, _ = measure_end_to_end(model16, handler, max(steps, 2048), windows=3)

    # device-only rate from a device trace (tunnel-noise-free)
    dev_only = measure_device_only(make_model(args.batch), handler)

    # single-chip GSPMD overhead: the SAME e2e loop through a 1x1 mesh
    # (sharded params/payloads/step) vs the unsharded number above — the
    # baseline for any pod-scaling projection
    mesh_e2e = None
    try:
        from seqrec_tpu.parallel import make_mesh

        mesh_model = make_model(args.batch)
        mesh_model.set_mesh(make_mesh(n_data=1, n_model=1))
        mesh_e2e, _ = measure_end_to_end(mesh_model, handler, steps, windows=3)
    except Exception as exc:  # pragma: no cover - env dependent
        print(f"mesh 1x1 row skipped: {exc}", file=sys.stderr)

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

    peak_flops = 197e12 / 2  # v5e bf16 peak halved for f32
    # MFU from the device-only trace rate when available (the e2e
    # wall-clock rate carries tunnel variance); fall back to e2e
    mfu = ((dev_only or value) * flops_per_sequence()) / peak_flops * 100.0

    # MXU-relevant-shape matrix (H x catalog x dtype at B=1024); from
    # the committed artifact when present (see load_or_run_matrix for
    # why a live matrix is not run inside every bench invocation).
    # SUMMARIZED in the final line, never inlined: the driver keeps only
    # a short tail of stdout, and inlining the full matrix made the
    # round-3/4 BENCH artifacts machine-unreadable (parsed: null). The
    # full rows live in bench_matrix.json.
    matrix = None if (args.quick or args.no_matrix) else load_or_run_matrix()
    matrix_summary = None
    if matrix:
        rows = matrix["rows"] if isinstance(matrix, dict) else matrix
        ok_rows = [r for r in rows if r.get("mfu_pct") is not None]
        matrix_summary = {"rows": len(rows), "artifact": "bench_matrix.json"}
        if ok_rows:
            best = max(ok_rows, key=lambda r: r["mfu_pct"])
            matrix_summary.update(
                ceiling_key=best["key"],
                ceiling_seq_per_s=best["e2e_seq_per_s"],
                ceiling_mfu_pct=best["mfu_pct"],
            )

    print(
        json.dumps(
            {
                "metric": "train_sequences_per_s_per_chip",
                "value": round(value, 2),
                "unit": "sequences/s/chip",
                "vs_baseline": round(e2e_b16 / baseline, 3),
                "e2e_b16_sequences_per_s": round(e2e_b16, 2),
                "device_only_b256": round(dev_only, 2) if dev_only else None,
                "mfu_pct": round(mfu, 3),
                "windows_b256": [round(w, 1) for w in windows],
                "mesh_1x1_e2e": round(mesh_e2e, 2) if mesh_e2e else None,
                "cpu_b16_baseline": round(baseline, 2),
                "config": f"GRU-{HIDDEN} L={MAX_LEN} catalog={N_ITEMS} "
                f"B={args.batch} K={K_DISPATCH} index-wire f32",
                "matrix": matrix_summary,
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
