"""A REAL 2-process jax.distributed run (localhost coordinator, CPU).

Everything else in the suite exercises sharding on a single-process
virtual mesh; this test spawns two OS processes with 4 virtual CPU
devices each and drives ``train.py --mesh auto`` end-to-end in both,
validating exactly the code that must not be wrong on a pod:

- ``init_distributed`` engages (and the worker FAILS if it silently
  degrades to standalone — the assert in distributed_worker.py);
- ``make_pod_mesh`` lays the "model" axis within each host's local
  devices (parallel/distributed.py:85-98);
- the sharded train step runs with cross-process collectives;
- the ``process_allgather`` checkpoint gather (models/base.py
  ``_gather_leaf``) writes a COMPLETE archive on every host, and the two
  hosts' archives are identical.
"""

import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train(tmp_path_factory):
    from seqrec_tpu.data.synthetic import make_dataset

    data_dir = make_dataset(
        str(tmp_path_factory.mktemp("dist_ds")),
        n_users=120, n_items=60, min_len=8, max_len=24, seed=3,
    )

    port = _free_port()
    env_base = {
        k: v
        for k, v in os.environ.items()
        # scrub inherited JAX/XLA config so the workers see ONLY the
        # multi-process CPU environment they are given
        if not (k.startswith("JAX_") or k == "XLA_FLAGS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            SEQREC_TEST_DATASET=data_dir,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    # every host wrote a complete checkpoint set (CCE leg + sampled-BPR
    # leg + the resume leg's continuation files), and they are identical
    from seqrec_tpu.models.base import pytree_load

    fa = sorted(glob.glob(data_dir + "models/proc0/*"))
    fb = sorted(glob.glob(data_dir + "models/proc1/*"))
    assert fa, outs[0][-2000:]
    assert [os.path.basename(f) for f in fa] == [os.path.basename(f) for f in fb]
    # both families present (filename encodes the loss/model config)
    names = " ".join(os.path.basename(f) for f in fa)
    assert "bpr" in names.lower(), names
    for file_a, file_b in zip(fa, fb):
        ta, tb = pytree_load(file_a), pytree_load(file_b)
        for key in ("W_out", "b_out"):
            np.testing.assert_array_equal(ta["params"][key], tb["params"][key])
        # the gathered archive is full-catalog-shaped (not a local shard)
        assert ta["params"]["W_out"].shape == (8, 60)
