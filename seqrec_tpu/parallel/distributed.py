"""Multi-host initialization and mesh layout helpers.

The reference is strictly single-process (SURVEY.md §2.9); this module is
the multi-host entry point for pod-slice training:

- every host runs the same ``train.py`` invocation;
- :func:`init_distributed` wires the hosts into one JAX runtime (the
  coordinator address/process ids come from the TPU environment or from
  the standard ``JAX_COORDINATOR_ADDRESS`` / ``JAX_PROCESS_ID`` /
  ``JAX_NUM_PROCESSES`` variables);
- :func:`make_pod_mesh` lays out the ("data", "model") mesh so that the
  "model" axis (the catalog-table shards, which all-to-all / psum every
  step) stays WITHIN a host's ICI domain, and the "data" axis (which only
  all-reduces gradients once per step) spans hosts over DCN — the
  standard bandwidth-hierarchy-respecting layout.

Single-host runs need none of this; `seqrec_tpu.parallel.make_mesh` over
`jax.devices()` is enough. Multi-host numerical parity with single-host
is covered by the virtual-mesh tests (tests/test_parallel.py), which is
as far as a single-chip container can validate (BASELINE.md notes the
≥2-host scaling-efficiency measurement as future hardware work).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def init_distributed() -> bool:
    """Initialize jax.distributed when a multi-process env is detected.

    Returns True when running distributed. Safe to call unconditionally
    (no-ops on single-process environments).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    # NOTE: do not touch jax.process_count()/jax.devices() before the
    # initialize() attempt — any backend query initializes the local
    # runtime and guarantees initialize() raises, silently degrading a
    # multi-host launch into per-host standalone runs
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    try:
        if addr and nproc and pid:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        elif len(workers) > 1:
            # multi-worker TPU pod slice: jax auto-detects the coordinator
            # from the TPU environment. (A single-name TPU_WORKER_HOSTNAMES
            # is a one-host slice — e.g. the axon tunnel sets "localhost" —
            # and needs no distributed runtime.)
            jax.distributed.initialize()
        else:
            return False
    except RuntimeError as exc:
        # two cases raise RuntimeError: (a) initialize() was already
        # called — idempotent re-entry, process_count reports the real
        # cluster size; (b) a jax computation already initialized the
        # local backend — the multi-host env asked for a distributed run
        # that can no longer happen, so fail loudly rather than letting
        # every host train standalone with duplicated work
        if jax.process_count() > 1:
            return True
        raise RuntimeError(
            "multi-host environment variables are set but the JAX backend "
            "was already initialized single-process; call "
            "init_distributed() before any other JAX operation"
        ) from exc
    except Exception as exc:  # pragma: no cover - env dependent
        print("jax.distributed initialization skipped:", exc)
        return False
    return jax.process_count() > 1


def make_pod_mesh(n_model: int | None = None) -> Mesh:
    """("data", "model") mesh over all processes' devices, with the
    "model" axis packed inside each host's local devices."""
    devices = jax.devices()
    local = jax.local_device_count()
    if n_model is None:
        n_model = 1
        for cand in (8, 4, 2, 1):
            if local % cand == 0:
                n_model = cand
                break
    n_data = len(devices) // n_model
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))
