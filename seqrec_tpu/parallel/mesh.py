"""Device mesh + sharding rules for the RNN family.

The reference is strictly single-device (SURVEY.md §2.9); this module is
the green-field TPU scaling design mandated by BASELINE.json's north star:

- 2-D logical mesh ``("data", "model")``. Dense recurrent towers are
  replicated and run data-parallel over the batch axis; the two big
  catalog-sized tables shard over "model":

  * the sparse input table ``W_in`` of the first recurrent layer (rows =
    item/feature ids) → row-sharded ``P("model", None)``;
  * the output/softmax table ``W_out`` (columns = items) → column-sharded
    ``P(None, "model")`` with its bias ``P("model")``.

- Under jit, GSPMD propagates these shardings through the gather-sum,
  the time scan and the loss; the full-softmax log-sum-exp becomes a
  partial reduction + psum over "model", and batch collectives (grad
  all-reduce) ride the "data" axis. Collectives ride ICI when the mesh
  is laid out within a slice.

All helpers are device-count agnostic: they work identically on a real
pod slice and on the virtual CPU mesh used by the test suite
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int | None = None, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the given devices.

    With only a total device count available the default split puts the
    catalog ("model") axis innermost so its collectives ride the
    fastest links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        # favor model-sharding the catalog tables on small meshes
        n_model = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0:
                n_model = cand
                break
        n_data = n // n_model
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# ----------------------------------------------------------------------
# sharding rules
# ----------------------------------------------------------------------
def _spec_for_param(path: tuple, leaf) -> P:
    """Sharding spec by parameter path within the model pytree."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = keys[-1] if keys else ""
    # catalog-sized output tables
    if name == "W_out":
        return P(None, "model")
    if name == "b_out":
        return P("model")
    # item-id-indexed input tables: first recurrent layer in sparse mode,
    # or the explicit embedding table
    if name == "embedding":
        return P("model", None)
    if name == "W_in" and any(k == "layer0_fwd" or k == "layer0_bwd" for k in keys):
        return P("model", None)
    # cluster / factorization item tables (row = item)
    if name in ("item_embeddings", "cluster_repartition", "V", "H", "item_bias"):
        return P("model") if np.ndim(leaf) == 1 else P("model", None)
    return P()  # replicate dense tower weights


def _divisible(spec: P, leaf, mesh: Mesh) -> bool:
    """GSPMD device_put needs every sharded dimension to divide evenly."""
    shape = np.shape(leaf)
    for axis, names in enumerate(spec):
        if names is None:
            continue
        for name in (names,) if isinstance(names, str) else names:
            if shape[axis] % mesh.shape[name]:
                return False
    return True


def param_sharding(params, mesh: Mesh, verbose: bool = True):
    """NamedSharding pytree for a model parameter pytree.

    Tables whose catalog dimension does not divide the "model" axis fall
    back to replication (catalog sizes are arbitrary — e.g. ML-1M's 3706
    items on a 4-way model axis); everything else still shards, and the
    batch stays data-parallel."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        spec = _spec_for_param(path, leaf)
        if spec != P() and not _divisible(spec, leaf, mesh):
            if verbose:
                name = "/".join(
                    getattr(p, "key", getattr(p, "name", str(p))) for p in path
                )
                print(
                    f"mesh: {name} {np.shape(leaf)} does not divide the "
                    f"model axis ({mesh.shape['model']}); replicating"
                )
            spec = P()
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(flat[1], specs)


# batch fields shared across the whole batch (negative-sample sets, the
# margin default-target vector, per-step scalars) — replicated, never
# sharded over "data"
_REPLICATED_BATCH_KEYS = {
    "samples",
    "cluster_samples",
    "default_target",
    "scale",
    "noise_seed",
    "dropout_seed",
}


def batch_sharding(batch: dict, mesh: Mesh):
    """Batch arrays shard over "data" on their leading (batch) axis;
    batch-independent arrays (shared negative samples, default targets)
    replicate."""
    out = {}
    for k, v in batch.items():
        if k in _REPLICATED_BATCH_KEYS or np.ndim(v) == 0:
            out[k] = NamedSharding(mesh, P())
        else:
            out[k] = NamedSharding(
                mesh, P("data", *([None] * (np.ndim(v) - 1)))
            )
    return out


def stacked_batch_sharding(payload: dict, mesh: Mesh):
    """Sharding for a [K, B, ...] stacked K-step dispatch payload:
    per-example arrays shard over "data" on the batch axis (axis 1);
    per-step shared fields ([K]-leading scalars, [K, S] sample sets)
    replicate. Covers both the index wire (rows/cuts) and the stacked
    compact wire (ids/lengths/targets/...)."""
    out = {}
    for k, v in payload.items():
        nd = np.ndim(v)
        if k not in _REPLICATED_BATCH_KEYS and nd >= 2:
            spec = [None] * nd
            spec[1] = "data"
            out[k] = NamedSharding(mesh, P(*spec))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def store_sharding(store: dict, mesh: Mesh):
    """The device-resident sequence store replicates across the mesh
    (it is a few MB and every data shard gathers its own rows)."""
    return {k: NamedSharding(mesh, P()) for k in store}


def index_payload_sharding(payload: dict, mesh: Mesh, stacked: bool = True):
    """Index-wire payloads: (rows, cuts) shard over "data" on the batch
    axis (axis 1 for stacked [K, B] payloads); per-step extras — sample
    sets, scales, noise seeds — replicate."""
    axis = 1 if stacked else 0
    out = {}
    for k, v in payload.items():
        if k in ("rows", "cuts"):
            spec = [None] * np.ndim(v)
            spec[axis] = "data"
            out[k] = NamedSharding(mesh, P(*spec))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def put_global(x, sharding):
    """Host→device transfer of identical-on-every-process host data,
    valid on BOTH single- and multi-process meshes.

    On a multi-process mesh ``jax.device_put(np_array, sharding)`` issues
    a hidden ``multihost_utils.assert_equal`` — a cross-process allgather
    of the payload (jax dispatch.py ``_device_put_sharding_impl``). That
    is (a) a full extra copy of every batch over DCN and (b) a DEADLOCK
    when called from the prefetch thread, whose collectives interleave
    unordered with the main thread's. Instead, every process passes the
    same full global array and ``make_array_from_process_local_data``
    extracts the local shards with no communication at all
    (``global_shape == local_data.shape`` mode).

    The identical-data precondition holds throughout: batch sampling is
    driven by seeded generators (base.py ``train``), params/opt-state
    come from the same seed or the same checkpoint, and eval inputs are
    deterministic half-splits.
    """
    leaves = jax.tree_util.tree_leaves(
        sharding, is_leaf=lambda s: isinstance(s, jax.sharding.Sharding)
    )
    if all(s.is_fully_addressable for s in leaves):
        return jax.device_put(x, sharding)
    shapes = jax.tree_util.tree_map(np.shape, x)
    return jax.make_array_from_process_local_data(sharding, x, shapes)


def host_global(x) -> np.ndarray:
    """Full host copy of a device array, multi-process safe.

    ``np.asarray`` raises on arrays with non-addressable shards (e.g.
    eval top-k results sharded over a cross-host "data" axis); gather
    those with ``process_allgather`` — a collective, so call sites must
    be reached symmetrically by every process (all of ours are: eval
    loops and checkpoint saves run unconditionally on each host)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def shard_params(params, mesh: Mesh):
    return put_global(params, param_sharding(params, mesh))


def shard_batch(batch: dict, mesh: Mesh):
    return put_global(batch, batch_sharding(batch, mesh))
