"""Streaming (chunked-scan) multi-target margin losses.

The reference's margin head (rnn_margin.py:61-68,109) evaluates an
elementwise margin loss against dense per-example target (``Y``) and
weight (``Wt``) matrices over the whole catalog and sums over items:
``loss_i = sum_j f(pred_ij, Y_ij, Wt_ij)``. The repo's dense path
materializes ``Y``/``Wt``/``pred`` as ``[B, n_items]`` device arrays —
at B=8192 over a 200k catalog that is 3 x 6.5 GB of HBM-round-tripped
intermediates per step, the same memory bound ``streaming_cce`` removed
from the CCE head (BASELINE.md round 4).

This op computes the same math chunk by chunk. ``Y`` and ``Wt`` are
pure FUNCTIONS of the column id — default target everywhere except
target ids (Y=1, Wt=-1) and, when interactions are unique, seen ids
(both 0) — so each ``[B, chunk]`` slice is rebuilt on the fly from the
packed ``[B, T]`` target / ``[B, L]`` seen id arrays with two chunk-
local scatters (an extra swallow column absorbs ids outside the chunk),
used, and discarded in registers:

- forward: ``lax.scan`` over column chunks accumulating the [B]
  per-example loss; padded catalog columns are killed by an explicit
  validity mask (NOT via Wt=0: the logsig loss maps weight 0 to log 2,
  which would bias the reported cost);
- backward (hand VJP): a second scan recomputes each chunk's
  predictions and Y/Wt slices, gets the chunk's ``dpred`` from a
  chunk-local ``jax.vjp`` of the elementwise loss (exact, no hand-coded
  derivatives), and contracts immediately into ``dh``, the ``dW``
  column slice and ``db`` — predictions never reach HBM.

``sharded_streaming_margin`` composes the op with a ("data", "model")
mesh exactly like ``sharded_streaming_cce``, but simpler: the margin
losses have no cross-column coupling (no softmax normalizer), so the
only forward collective is a psum of the per-example loss partials over
"model".

Math parity vs the dense path (all three losses, unique and non-unique,
pad tails) is tested in tests/test_streaming_margin.py; mesh parity in
tests/test_parallel.py.

Reference: /root/reference/neural_networks/rnn_margin.py:61-68 (losses),
112-149 (Y/W assembly semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from seqrec_tpu.ops import losses
from seqrec_tpu.ops.streaming_cce import _pad_cols, _vary, pick_chunk

# same routing threshold as the CCE head: below it the [B, N] dense
# intermediates fit in cache-sized working sets and the single fused
# XLA pass wins
STREAMING_MARGIN_MIN_ITEMS = 16384


def _chunk_yw(def_c1, tgt_ids, seen_ids, w_neg, c0, chunk, unique):
    """[B, chunk+1] Y and Wt slices for columns [c0, c0+chunk); the
    trailing swallow column absorbs out-of-chunk ids."""
    B = tgt_ids.shape[0]
    b_idx = jnp.arange(B)[:, None]
    tl = jnp.where(
        (tgt_ids >= c0) & (tgt_ids < c0 + chunk), tgt_ids - c0, chunk
    )
    Y = jnp.broadcast_to(def_c1, (B, chunk + 1))
    Y = Y.at[b_idx, tl].set(1.0)
    Wt = jnp.broadcast_to(w_neg[:, None], (B, chunk + 1))
    Wt = Wt.at[b_idx, tl].set(-1.0)
    if unique:
        sl = jnp.where(
            (seen_ids >= c0) & (seen_ids < c0 + chunk), seen_ids - c0, chunk
        )
        Y = Y.at[b_idx, sl].set(0.0)
        Wt = Wt.at[b_idx, sl].set(0.0)
    return Y[:, :chunk], Wt[:, :chunk]


def _chunk_pred(h_c, Wp, bp, i, chunk, compute_dtype):
    W_c = jax.lax.dynamic_slice_in_dim(Wp, i * chunk, chunk, axis=1)
    b_c = jax.lax.dynamic_slice_in_dim(bp, i * chunk, chunk, axis=0)
    return (
        jnp.dot(h_c, W_c.astype(compute_dtype), preferred_element_type=jnp.float32)
        + b_c,
        W_c,
    )


def _chunk_valid(i, chunk, n_valid):
    """[chunk] float mask of real (non-pad) columns for chunk i."""
    cols = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
    return (cols < n_valid).astype(jnp.float32)


def _loss_scan(
    h_c, Wp, bp, defp1, tgt_ids, seen_ids, w_neg,
    loss_name, unique, chunk, n_chunks, n_valid, compute_dtype, vma_axes=(),
):
    B = h_c.shape[0]
    f = losses.MARGIN_LOSSES[loss_name]

    def body(acc, i):
        pred, _ = _chunk_pred(h_c, Wp, bp, i, chunk, compute_dtype)
        def_c1 = jax.lax.dynamic_slice_in_dim(defp1, i * chunk, chunk + 1, axis=0)
        def_c1 = def_c1.at[-1].set(0.0)  # swallow column, any value
        Y, Wt = _chunk_yw(def_c1, tgt_ids, seen_ids, w_neg, i * chunk, chunk, unique)
        valid = _chunk_valid(i, chunk, n_valid)
        # the dense losses sum over their LAST axis; feeding [B, chunk, 1]
        # makes that sum a no-op and yields the [B, chunk] PER-COLUMN
        # values, so pad columns can be masked on the value (not via
        # Wt=0, which logsig maps to log 2) before the chunk sum
        val = f(pred[..., None], Y[..., None], Wt[..., None])
        return acc + (val * valid[None, :]).sum(axis=1), None

    acc, _ = jax.lax.scan(
        body,
        _vary(jnp.zeros((B,), jnp.float32), vma_axes),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )
    return acc


def _margin_grad_scan(
    h_c, Wp, bp, defp1, tgt_ids, seen_ids, w_neg, gcol,
    loss_name, unique, chunk, n_chunks, n_valid, compute_dtype, vma_axes=(),
):
    B, H = h_c.shape[0], Wp.shape[0]
    Np = n_chunks * chunk
    f = losses.MARGIN_LOSSES[loss_name]

    def body(carry, i):
        dh, dW, db = carry
        pred, W_c = _chunk_pred(h_c, Wp, bp, i, chunk, compute_dtype)
        def_c1 = jax.lax.dynamic_slice_in_dim(defp1, i * chunk, chunk + 1, axis=0)
        def_c1 = def_c1.at[-1].set(0.0)
        Y, Wt = _chunk_yw(def_c1, tgt_ids, seen_ids, w_neg, i * chunk, chunk, unique)
        valid = _chunk_valid(i, chunk, n_valid)

        def chunk_loss(p):
            val = f(p[..., None], Y[..., None], Wt[..., None])
            return (val * valid[None, :]).sum(axis=1)

        _, pull = jax.vjp(chunk_loss, pred)
        (dpred,) = pull(gcol[:, 0])
        dpred = dpred.astype(compute_dtype)
        dW_c = jnp.dot(h_c.T, dpred, preferred_element_type=jnp.float32)
        db_c = dpred.sum(axis=0, dtype=jnp.float32)
        dh = dh + jnp.dot(
            dpred, W_c.astype(compute_dtype).T, preferred_element_type=jnp.float32
        )
        dW = jax.lax.dynamic_update_slice_in_dim(dW, dW_c, i * chunk, axis=1)
        db = jax.lax.dynamic_update_slice_in_dim(db, db_c, i * chunk, axis=0)
        return (dh, dW, db), None

    (dh, dW, db), _ = jax.lax.scan(
        body,
        _vary(
            (
                jnp.zeros(h_c.shape, jnp.float32),
                jnp.zeros((H, Np), jnp.float32),
                jnp.zeros((Np,), jnp.float32),
            ),
            vma_axes,
        ),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )
    return dh, dW, db


def _pad_default(default_target, n_chunks, chunk):
    """default_target padded to Np + 1 so every chunk can slice
    [i*chunk, i*chunk + chunk + 1) without going out of bounds."""
    Np = n_chunks * chunk
    return jnp.pad(default_target, (0, Np + 1 - default_target.shape[0]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def streaming_margin(
    h, W, b, tgt_ids, seen_ids, w_neg, default_target,
    loss_name: str, unique: bool, chunk: int = 1024, compute_dtype=jnp.float32,
):
    """Per-example margin loss ``[B]`` — identical math to the dense
    ``MARGIN_LOSSES[loss_name](h@W+b, Y, Wt)`` with Y/Wt assembled from
    the packed id arrays, but with no [B, n_items] materialization."""
    loss, _ = _m_fwd(
        h, W, b, tgt_ids, seen_ids, w_neg, default_target,
        loss_name, unique, chunk, compute_dtype,
    )
    return loss


def _m_fwd(h, W, b, tgt_ids, seen_ids, w_neg, default_target,
           loss_name, unique, chunk, compute_dtype):
    N = W.shape[1]
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    defp1 = _pad_default(default_target, n_chunks, chunk)
    loss = _loss_scan(
        h.astype(compute_dtype), Wp, bp, defp1, tgt_ids, seen_ids, w_neg,
        loss_name, unique, chunk, n_chunks, N, compute_dtype,
    )
    return loss, (h, W, b, tgt_ids, seen_ids, w_neg, default_target)


def _m_bwd(loss_name, unique, chunk, compute_dtype, res, g):
    h, W, b, tgt_ids, seen_ids, w_neg, default_target = res
    N = W.shape[1]
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    defp1 = _pad_default(default_target, n_chunks, chunk)
    dh, dW, db = _margin_grad_scan(
        h.astype(compute_dtype), Wp, bp, defp1, tgt_ids, seen_ids, w_neg,
        g[:, None], loss_name, unique, chunk, n_chunks, N, compute_dtype,
    )
    return (
        dh.astype(h.dtype),
        dW[:, :N].astype(W.dtype),
        db[:N].astype(b.dtype),
        None, None, None, None,
    )


streaming_margin.defvjp(
    lambda h, W, b, t, s, wn, dt, ln, u, c, cd: _m_fwd(
        h, W, b, t, s, wn, dt, ln, u, c, cd
    ),
    _m_bwd,
)


# ----------------------------------------------------------------------
# mesh-sharded composition
# ----------------------------------------------------------------------
def sharded_streaming_margin(
    h, W, b, tgt_ids, seen_ids, w_neg, default_target, mesh,
    loss_name: str, unique: bool, chunk: int | None = None,
    compute_dtype=jnp.float32,
):
    """``streaming_margin`` over a ("data", "model") mesh: W column-
    sharded, b and default_target sharded over "model", h and the id
    arrays data-sharded. Each model shard scans its local columns with
    ids shifted by its column offset; per-example loss partials psum
    over "model" (the margin losses are column-separable sums)."""
    n_model = mesh.shape["model"]
    N = W.shape[1]
    if N % n_model:
        raise ValueError(
            f"catalog {N} does not divide the model axis ({n_model}); "
            "use streaming_margin with a replicated W instead"
        )
    if chunk is None:
        chunk = pick_chunk(N // n_model)
    return _sharded_margin(
        h, W, b, tgt_ids, seen_ids, w_neg, default_target, mesh,
        loss_name, unique, chunk, compute_dtype,
    )


def _shift_ids(ids, col0, N_local):
    """Shard-relative ids; out-of-shard ids map to -1 (never matches a
    chunk window, so the swallow column absorbs them)."""
    rel = ids - col0
    return jnp.where((rel >= 0) & (rel < N_local), rel, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _sharded_margin(h, W, b, tgt_ids, seen_ids, w_neg, default_target,
                    mesh, loss_name, unique, chunk, compute_dtype):
    loss, _ = _shm_fwd(
        h, W, b, tgt_ids, seen_ids, w_neg, default_target, mesh,
        loss_name, unique, chunk, compute_dtype,
    )
    return loss


def _shm_fwd(h, W, b, tgt_ids, seen_ids, w_neg, default_target, mesh,
             loss_name, unique, chunk, compute_dtype):
    from jax.sharding import PartitionSpec as P

    def local(h_l, W_l, b_l, t_l, s_l, wn_l, d_l):
        N_local = W_l.shape[1]
        col0 = jax.lax.axis_index("model").astype(jnp.int32) * N_local
        Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
        defp1 = _pad_default(d_l, n_chunks, chunk)
        part = _loss_scan(
            h_l.astype(compute_dtype), Wp, bp, defp1,
            _shift_ids(t_l, col0, N_local), _shift_ids(s_l, col0, N_local),
            wn_l, loss_name, unique, chunk, n_chunks, N_local, compute_dtype,
            vma_axes=("data", "model"),
        )
        return jax.lax.psum(part, "model")

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None), P(None, "model"), P("model"),
            P("data", None), P("data", None), P("data"), P("model"),
        ),
        out_specs=P("data"),
    )
    loss = run(h, W, b, tgt_ids, seen_ids, w_neg, default_target)
    return loss, (h, W, b, tgt_ids, seen_ids, w_neg, default_target)


def _shm_bwd(mesh, loss_name, unique, chunk, compute_dtype, res, g):
    from jax.sharding import PartitionSpec as P

    h, W, b, tgt_ids, seen_ids, w_neg, default_target = res

    def local(h_l, W_l, b_l, t_l, s_l, wn_l, d_l, g_l):
        N_local = W_l.shape[1]
        col0 = jax.lax.axis_index("model").astype(jnp.int32) * N_local
        # the chunk-local jax.vjp pullback type-checks the cotangent's
        # varying-manual-axes against the chunk output (which varies
        # over "model" through W); promote g explicitly
        g_l = jax.lax.pcast(g_l, "model", to="varying")
        Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
        defp1 = _pad_default(d_l, n_chunks, chunk)
        dh_p, dWp, dbp = _margin_grad_scan(
            h_l.astype(compute_dtype), Wp, bp, defp1,
            _shift_ids(t_l, col0, N_local), _shift_ids(s_l, col0, N_local),
            wn_l, g_l[:, None], loss_name, unique, chunk, n_chunks, N_local,
            compute_dtype, vma_axes=("data", "model"),
        )
        dh = jax.lax.psum(dh_p, "model")
        dW = jax.lax.psum(dWp[:, :N_local], "data")
        db = jax.lax.psum(dbp[:N_local], "data")
        return dh, dW, db

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None), P(None, "model"), P("model"),
            P("data", None), P("data", None), P("data"), P("model"),
            P("data"),
        ),
        out_specs=(P("data", None), P(None, "model"), P("model")),
    )
    dh, dW, db = run(h, W, b, tgt_ids, seen_ids, w_neg, default_target, g)
    return (
        dh.astype(h.dtype), dW.astype(W.dtype), db.astype(b.dtype),
        None, None, None, None,
    )


_sharded_margin.defvjp(
    lambda h, W, b, t, s, wn, dt, mesh, ln, u, c, cd: _shm_fwd(
        h, W, b, t, s, wn, dt, mesh, ln, u, c, cd
    ),
    _shm_bwd,
)
