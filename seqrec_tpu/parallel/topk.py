"""Sharded catalog scoring + top-k over the mesh "model" axis.

With the output table column-sharded (``W_out: P(None, "model")``), each
shard scores only its slice of the catalog, masks the seen items that
fall in its range, takes a LOCAL top-k, and only ``k`` candidates per
shard cross the interconnect (an all-gather of ``[B, k]``) before a final
merge — instead of all-gathering ``[B, n_items]`` logits. This is the
distributed analog of the reference's full-catalog argpartition
(rnn_base.py:154-159) and the serving-side companion of the row-sharded
embedding design (SURVEY.md §7).

Implementation notes:
- global seen ids are localized by subtracting the shard offset; the
  scatter of -inf drops out-of-range indices under jit (JAX scatter OOB
  semantics), so no explicit range mask is needed;
- the merge is a ``lax.top_k`` over the ``k·n_shards`` gathered
  candidates, giving exactly the global top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import inspect

from jax import shard_map

# the replication-checker kwarg was renamed check_rep -> check_vma
_CHECK_KW = (
    {"check_vma": False}
    if "check_vma" in inspect.signature(shard_map).parameters
    else {"check_rep": False}
)


def sharded_score_topk(
    mesh: Mesh,
    h,
    w_out,
    b_out,
    seen_ids,
    seen_mask,
    k: int = 10,
):
    """Global top-k ids over a column-sharded output table.

    h: [B, H] (sharded over "data"); w_out: [H, N] (columns over "model");
    b_out: [N]; seen_ids/seen_mask: [B, S].
    Returns int32 [B, k], sorted best-first.
    """

    def local(h, w, b, seen, sm):
        n_local = w.shape[1]
        shard = jax.lax.axis_index("model")
        offset = shard * n_local

        scores = (
            jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        )  # [B, n_local]
        local_seen = seen - offset
        # negative indices would WRAP (numpy semantics); redirect anything
        # outside this shard's range to n_local, which mode="drop" discards
        in_range = (local_seen >= 0) & (local_seen < n_local)
        local_seen = jnp.where(in_range, local_seen, n_local)
        updates = jnp.where(sm > 0, jnp.float32(-jnp.inf), 0.0)
        batch = jnp.arange(scores.shape[0])[:, None]
        scores = scores.at[batch, local_seen].add(
            updates, mode="drop", unique_indices=False
        )
        # large local shards route through the exact two-level selection
        # (XLA TopK is a full per-row sort on TPU — see ops/core.py)
        from seqrec_tpu.ops.core import (
            _GROUP,
            GROUPED_TOPK_MIN_ITEMS,
            grouped_top_k,
        )

        if n_local >= GROUPED_TOPK_MIN_ITEMS and n_local >= k * _GROUP:
            vals, ids = grouped_top_k(scores, k)
        else:
            vals, ids = jax.lax.top_k(scores, k)
        ids = ids + offset

        # k candidates per shard cross the ICI; merge to the global top-k
        all_vals = jax.lax.all_gather(vals, "model", axis=1, tiled=True)
        all_ids = jax.lax.all_gather(ids, "model", axis=1, tiled=True)
        mvals, midx = jax.lax.top_k(all_vals, k)
        return jnp.take_along_axis(all_ids, midx, axis=1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None),
            P(None, "model"),
            P("model"),
            P("data", None),
            P("data", None),
        ),
        out_specs=P("data", None),
        # the merged top-k is replicated across "model" after the
        # all_gather; the checker can't infer that statically
        **_CHECK_KW,
    )
    return fn(h, w_out, b_out, seen_ids, seen_mask)


def make_sharded_topk_fn(mesh: Mesh, k: int = 10):
    """jitted closure over the mesh for repeated use."""
    return jax.jit(partial(sharded_score_topk, mesh, k=k))
