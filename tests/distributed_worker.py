"""Worker process for the REAL 2-process jax.distributed test.

Spawned by tests/test_distributed.py with
``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` set
and 4 virtual CPU devices per process. Asserts the multi-host machinery
actually engages (no silent degradation to per-host standalone runs —
the failure mode ``init_distributed`` is designed to surface), then
drives the real ``train.py --mesh auto`` CLI so the sharded training
loop, the cross-process collectives, and the ``process_allgather``
checkpoint gather all execute under a genuine multi-process runtime.

Reference counterpart: none — the reference is single-process by design
(SURVEY.md §2.9); this validates the framework's own pod machinery.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from seqrec_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    make_pod_mesh,
)


def main() -> None:
    # init must engage BEFORE any backend query (distributed.py:43-46)
    assert init_distributed(), "init_distributed() degraded to standalone"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert len(jax.devices()) == 8

    mesh = make_pod_mesh()
    assert dict(mesh.shape) == {"data": 2, "model": 4}, dict(mesh.shape)
    # the "model" axis (per-step all-to-all/psum traffic) must lie within
    # one host's devices; only "data" (one grad all-reduce) spans hosts
    for row in mesh.devices:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"model axis spans processes: {procs}"

    # the real CLI path: make_cli_mesh re-enters init_distributed (the
    # idempotent RuntimeError branch) and builds the same pod mesh
    import train as train_cli

    data_dir = os.environ["SEQREC_TEST_DATASET"]
    common = [
        "-d", data_dir, "--r_t", "GRU", "--r_l", "8", "--max_length", "10",
        "-b", "8", "--u_l", "0.01", "--progress", "12",
        "--save", "All", "--metrics", "sps,recall", "--mesh", "auto",
        "--dir", f"proc{jax.process_index()}/",
    ]

    # leg 1: CCE (full-catalog softmax, no host-RNG per-step extras)
    res = train_cli.main(
        common + ["-m", "RNN", "--loss", "CCE", "--max_iter", "24"]
    )
    assert res[0]["sps"] is not None

    # leg 2: RNNSampling/BPR — the per-step negative-sample sets are
    # drawn by the HOST RNG and ship as index-wire extras; every process
    # must assemble bit-identical payloads (parallel/mesh.put_global
    # precondition). A seed or call-order divergence between processes
    # corrupts the run silently — this leg makes it loud.
    res = train_cli.main(
        common
        + ["-m", "RNN", "--loss", "BPR", "--sampling", "8", "--max_iter", "24"]
    )
    assert res[0]["sps"] is not None

    # leg 2b: RNNCluster — the family with the MOST host-RNG per-step
    # extras (sample sets, cluster samples, noise seeds AND the
    # epoch-boundary temperature schedule); every process must walk the
    # identical schedule and RNG stream
    res = train_cli.main(
        common
        + [
            "-m", "RNN", "--clusters", "3", "--loss", "Blackout",
            "--sampling", "8", "--max_iter", "24",
        ]
    )
    assert res[0]["sps"] is not None

    # leg 3: multi-process --load_last_model resume of leg 1 — the
    # checkpoint written by the process_allgather save must reload and
    # reshard under the same pod mesh, and training must CONTINUE (the
    # epoch offset comes from the loaded filename)
    import glob

    save_dir = os.path.join(data_dir, "models", f"proc{jax.process_index()}")
    before = set(glob.glob(os.path.join(save_dir, "*")))
    res = train_cli.main(
        common
        + [
            "-m", "RNN", "--loss", "CCE", "--max_iter", "24",
            "--load_last_model",
        ]
    )
    assert res[0]["sps"] is not None
    after = set(glob.glob(os.path.join(save_dir, "*")))
    assert after > before, "resume leg wrote no new checkpoints"

    print("WORKER_OK", jax.process_index(), flush=True)


if __name__ == "__main__":
    main()
