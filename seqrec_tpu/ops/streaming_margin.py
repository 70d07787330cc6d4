"""Streaming (chunked-scan) multi-target margin losses.

The reference's margin head (rnn_margin.py:61-68,109) evaluates an
elementwise margin loss against dense per-example target (``Y``) and
weight (``Wt``) matrices over the whole catalog and sums over items:
``loss_i = sum_j f(pred_ij, Y_ij, Wt_ij)``. The repo's dense path
materializes ``Y``/``Wt``/``pred`` as ``[B, n_items]`` device arrays —
at B=8192 over a 200k catalog that is 3 x 6.5 GB of HBM-round-tripped
intermediates per step, the same memory bound ``streaming_cce`` removed
from the CCE head (BASELINE.md round 4).

Key observation: Y and Wt are the DEFAULT values (``default_target[j]``,
``w_neg``) on all but the ~T+L special columns per example (targets:
Y=1, Wt=-1; seen items when interactions are unique: both 0). So the
loss splits exactly:

  loss = sum_j f(pred_j, default_j, w_neg)              # uniform part
       + sum_{j in special} [f(pred_j, Y_j, Wt_j)
                             - f(pred_j, default_j, w_neg)]  # correction

- The UNIFORM part is the custom-VJP chunked scan (this module's
  ``streaming_margin_uniform``): per column chunk one [B,chunk] matmul
  + elementwise f, accumulated into a [B] carry; the backward recomputes
  each chunk and contracts its dpred (chunk-local ``jax.vjp`` of the
  elementwise loss — exact, no hand-coded derivatives) straight into
  dh / the dW column slice / db. No [B, n_items] intermediate, and —
  unlike a scatter-assembled Y/Wt — NO serialized per-id scatters in the
  hot loop (a first implementation scattered Y/Wt per chunk and measured
  2.3x SLOWER than the dense path on TPU; the decomposition removes
  every scatter).
- The CORRECTION touches T+L columns per example: one [B,K] column
  gather + tiny matmul, built with plain jnp ops and differentiated by
  ordinary autodiff (``margin_special_correction``). Duplicate ids and
  the dense path's precedence (seen overrides target; scatters of a
  constant are idempotent across duplicate slots) are reproduced with
  explicit first-occurrence masks.

``sharded_streaming_margin_uniform`` composes the uniform op with a
("data", "model") mesh like ``sharded_streaming_cce``, but simpler: the
margin losses have no cross-column coupling, so the only forward
collective is a psum of the per-example partials over "model". The
correction's sharded-W column gather is left to GSPMD (same pattern as
the sampled loss's negative-column gather, mesh-parity-tested in
tests/test_parallel.py).

Math parity vs the dense path (all three losses, unique and non-unique,
pad tails, duplicate ids) is tested in tests/test_streaming_margin.py;
mesh parity in tests/test_parallel.py.

Reference: /root/reference/neural_networks/rnn_margin.py:61-68 (losses),
112-149 (Y/W assembly semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from seqrec_tpu.ops import losses
from seqrec_tpu.ops.streaming_cce import (
    _chunk_logits as _chunk_pred,  # ([B,chunk] preds, [H,chunk] W slice)
    _pad_cols,
    _vary,
    pick_chunk,
)

# same routing threshold as the CCE head: below it the [B, N] dense
# intermediates fit in cache-sized working sets and the single fused
# XLA pass wins
STREAMING_MARGIN_MIN_ITEMS = 16384


def _f_cols(loss_name, pred, Y, Wt):
    """Per-COLUMN margin loss values [same shape as pred]: the dense
    losses sum over their last axis, so a trailing singleton makes that
    sum a no-op and yields the elementwise values."""
    f = losses.MARGIN_LOSSES[loss_name]
    return f(pred[..., None], Y[..., None], Wt[..., None])


def _pad_default(default_target, Np):
    return jnp.pad(default_target, (0, Np - default_target.shape[0]))


def _uniform_scan(
    h_c, Wp, bp, defp, w_neg, loss_name, chunk, n_chunks, n_valid,
    compute_dtype, vma_axes=(),
):
    B = h_c.shape[0]

    def body(acc, i):
        pred, _ = _chunk_pred(h_c, Wp, bp, i, chunk, compute_dtype)
        def_c = jax.lax.dynamic_slice_in_dim(defp, i * chunk, chunk, axis=0)
        cols = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = (cols < n_valid).astype(jnp.float32)
        val = _f_cols(
            loss_name, pred, def_c[None, :], jnp.broadcast_to(w_neg[:, None], pred.shape)
        )
        # pad columns masked on the VALUE (not via Wt=0: logsig maps
        # weight 0 to log 2, which would bias the reported cost)
        return acc + (val * valid[None, :]).sum(axis=1), None

    acc, _ = jax.lax.scan(
        body,
        _vary(jnp.zeros((B,), jnp.float32), vma_axes),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )
    return acc


def _uniform_grad_scan(
    h_c, Wp, bp, defp, w_neg, gcol, loss_name, chunk, n_chunks, n_valid,
    compute_dtype, vma_axes=(),
):
    H = Wp.shape[0]
    Np = n_chunks * chunk

    def body(carry, i):
        dh, dW, db = carry
        pred, W_c = _chunk_pred(h_c, Wp, bp, i, chunk, compute_dtype)
        def_c = jax.lax.dynamic_slice_in_dim(defp, i * chunk, chunk, axis=0)
        cols = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = (cols < n_valid).astype(jnp.float32)
        Wt = jnp.broadcast_to(w_neg[:, None], pred.shape)

        def chunk_loss(p):
            return (
                _f_cols(loss_name, p, def_c[None, :], Wt) * valid[None, :]
            ).sum(axis=1)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def streaming_margin_uniform(
    h, W, b, w_neg, default_target,
    loss_name: str, chunk: int = 1024, compute_dtype=jnp.float32,
):
    """[B] per-example uniform margin loss: every catalog column at its
    default target/weight, no [B, n_items] materialization."""
    loss, _ = _u_fwd(h, W, b, w_neg, default_target, loss_name, chunk, compute_dtype)
    return loss


def _u_fwd(h, W, b, w_neg, default_target, loss_name, chunk, compute_dtype):
    N = W.shape[1]
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    defp = _pad_default(default_target, n_chunks * chunk)
    loss = _uniform_scan(
        h.astype(compute_dtype), Wp, bp, defp, w_neg,
        loss_name, chunk, n_chunks, N, compute_dtype,
    )
    return loss, (h, W, b, w_neg, default_target)


def _u_bwd(loss_name, chunk, compute_dtype, res, g):
    h, W, b, w_neg, default_target = res
    N = W.shape[1]
    Wp, bp, n_chunks = _pad_cols(W, b, chunk)
    defp = _pad_default(default_target, n_chunks * chunk)
    dh, dW, db = _uniform_grad_scan(
        h.astype(compute_dtype), Wp, bp, defp, w_neg, g[:, None],
        loss_name, chunk, n_chunks, N, compute_dtype,
    )
    return (
        dh.astype(h.dtype),
        dW[:, :N].astype(W.dtype),
        db[:N].astype(b.dtype),
        None, None,
    )


streaming_margin_uniform.defvjp(
    lambda h, W, b, wn, dt, ln, c, cd: _u_fwd(h, W, b, wn, dt, ln, c, cd),
    _u_bwd,
)


# ----------------------------------------------------------------------
# special-column correction (plain autodiff)
# ----------------------------------------------------------------------
def _first_occurrence(ids, valid):
    """[B, K] mask: slot k is the first valid slot in its row with this
    id (the dense scatter writes a CONSTANT per group, so duplicate
    slots are idempotent — the correction must count each id once)."""
    K = ids.shape[1]
    same = ids[:, :, None] == ids[:, None, :]  # [B, K, K]
    earlier = jnp.tril(jnp.ones((K, K), bool), k=-1)
    dup = (same & earlier & valid[:, None, :]).any(axis=2)
    return valid & ~dup


def margin_special_correction(
    h, W, b, tgt_ids, seen_ids, w_neg, default_target,
    loss_name: str, unique: bool, n_items: int, compute_dtype=jnp.float32,
):
    """[B] correction moving the special columns from their default
    (Y=default, Wt=w_neg) to their true values: targets (1, -1), seen
    items (0, 0) when interactions are unique, with the dense path's
    precedence (seen overrides target) and duplicate idempotence.

    Plain jnp: one [B, K] column gather + tiny matmul; autodiff handles
    the backward (a scatter-add of K columns into dW)."""
    B, T = tgt_ids.shape
    L = seen_ids.shape[1]

    t_valid = (tgt_ids >= 0) & (tgt_ids < n_items)
    s_valid = (seen_ids >= 0) & (seen_ids < n_items)
    t_keep = _first_occurrence(tgt_ids, t_valid)
    if unique:
        s_keep = _first_occurrence(seen_ids, s_valid)
        # seen overrides target: drop target slots whose id is seen
        overridden = (
            (tgt_ids[:, :, None] == seen_ids[:, None, :]) & s_valid[:, None, :]
        ).any(axis=2)
        t_keep = t_keep & ~overridden
    else:
        s_keep = jnp.zeros_like(s_valid)

    ids = jnp.concatenate([tgt_ids, seen_ids], axis=1)  # [B, K]
    keep = jnp.concatenate([t_keep, s_keep], axis=1)
    safe = jnp.clip(ids, 0, n_items - 1)

    # pred at the special columns: ROW-gather from W^T (sublane-dim
    # rows — a direct column gather of [H, N] walks the lane dimension
    # and measured 3.6 ms/step at B=8192/K=31, with the einsum's
    # mul-reduce layout adding ~13 ms more; the [B, K, H] row layout
    # feeds a batched dot_general instead) + bias
    # same compute dtype as the uniform scan's chunk matmuls: the
    # decomposition subtracts the default-valued term the scan added,
    # so both predictions must be computed at the same precision
    Wg = W.T[safe].astype(compute_dtype)  # [B, K, H]
    pred = (
        jax.lax.dot_general(
            Wg, h.astype(compute_dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        + b[safe]
    )

    Yd = default_target[safe]
    Wd = jnp.broadcast_to(w_neg[:, None], pred.shape)
    f_def = _f_cols(loss_name, pred, Yd, Wd)

    Yv = jnp.concatenate(
        [jnp.ones((B, T), jnp.float32), jnp.zeros((B, L), jnp.float32)], axis=1
    )
    Wv = jnp.concatenate(
        [jnp.full((B, T), -1.0, jnp.float32), jnp.zeros((B, L), jnp.float32)],
        axis=1,
    )
    f_true = _f_cols(loss_name, pred, Yv, Wv)
    return ((f_true - f_def) * keep).sum(axis=1)


# ----------------------------------------------------------------------
# public composition (dense-path signature)
# ----------------------------------------------------------------------
def streaming_margin(
    h, W, b, tgt_ids, seen_ids, w_neg, default_target,
    loss_name: str, unique: bool, chunk: int = 1024, compute_dtype=jnp.float32,
):
    """Per-example margin loss ``[B]`` — identical math to the dense
    ``MARGIN_LOSSES[loss_name](h@W+b, Y, Wt)`` with Y/Wt assembled from
    the packed id arrays (out-of-range ids = padding), but with no
    [B, n_items] materialization: uniform chunked scan + special-column
    correction."""
    uniform = streaming_margin_uniform(
        h, W, b, w_neg, default_target, loss_name, chunk, compute_dtype
    )
    corr = margin_special_correction(
        h, W, b, tgt_ids, seen_ids, w_neg, default_target,
        loss_name, unique, W.shape[1], compute_dtype,
    )
    return uniform + corr


# ----------------------------------------------------------------------
# mesh-sharded composition
# ----------------------------------------------------------------------
def sharded_streaming_margin_uniform(
    h, W, b, w_neg, default_target, mesh,
    loss_name: str, chunk: int | None = None, compute_dtype=jnp.float32,
):
    """``streaming_margin_uniform`` over a ("data", "model") mesh: W
    column-sharded, b/default_target over "model", h/w_neg data-sharded.
    Per-example loss partials psum over "model" (the margin losses are
    column-separable sums)."""
    n_model = mesh.shape["model"]
    N = W.shape[1]
    if N % n_model:
        raise ValueError(
            f"catalog {N} does not divide the model axis ({n_model}); "
            "use streaming_margin_uniform with a replicated W instead"
        )
    if chunk is None:
        chunk = pick_chunk(N // n_model)
    return _sharded_uniform(
        h, W, b, w_neg, default_target, mesh, loss_name, chunk, compute_dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _sharded_uniform(h, W, b, w_neg, default_target, mesh,
                     loss_name, chunk, compute_dtype):
    loss, _ = _shu_fwd(
        h, W, b, w_neg, default_target, mesh, loss_name, chunk, compute_dtype
    )
    return loss


def _shu_fwd(h, W, b, w_neg, default_target, mesh, loss_name, chunk, compute_dtype):
    from jax.sharding import PartitionSpec as P

    def local(h_l, W_l, b_l, wn_l, d_l):
        N_local = W_l.shape[1]
        Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
        defp = _pad_default(d_l, n_chunks * chunk)
        part = _uniform_scan(
            h_l.astype(compute_dtype), Wp, bp, defp, wn_l,
            loss_name, chunk, n_chunks, N_local, compute_dtype,
            vma_axes=("data", "model"),
        )
        return jax.lax.psum(part, "model")

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None), P(None, "model"), P("model"), P("data"), P("model"),
        ),
        out_specs=P("data"),
    )
    loss = run(h, W, b, w_neg, default_target)
    return loss, (h, W, b, w_neg, default_target)


def _shu_bwd(mesh, loss_name, chunk, compute_dtype, res, g):
    from jax.sharding import PartitionSpec as P

    h, W, b, w_neg, default_target = res

    def local(h_l, W_l, b_l, wn_l, d_l, g_l):
        N_local = W_l.shape[1]
        # the chunk-local jax.vjp pullback type-checks the cotangent's
        # varying-manual-axes against the chunk output (which varies
        # over "model" through W); promote g explicitly
        g_l = jax.lax.pcast(g_l, "model", to="varying")
        Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
        defp = _pad_default(d_l, n_chunks * chunk)
        dh_p, dWp, dbp = _uniform_grad_scan(
            h_l.astype(compute_dtype), Wp, bp, defp, wn_l, g_l[:, None],
            loss_name, chunk, n_chunks, N_local, compute_dtype,
            vma_axes=("data", "model"),
        )
        dh = jax.lax.psum(dh_p, "model")
        dW = jax.lax.psum(dWp[:, :N_local], "data")
        db = jax.lax.psum(dbp[:N_local], "data")
        return dh, dW, db

    run = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None), P(None, "model"), P("model"), P("data"), P("model"),
            P("data"),
        ),
        out_specs=(P("data", None), P(None, "model"), P("model")),
    )
    dh, dW, db = run(h, W, b, w_neg, default_target, g)
    return (
        dh.astype(h.dtype), dW.astype(W.dtype), db.astype(b.dtype),
        None, None,
    )


_sharded_uniform.defvjp(
    lambda h, W, b, wn, dt, mesh, ln, c, cd: _shu_fwd(
        h, W, b, wn, dt, mesh, ln, c, cd
    ),
    _shu_bwd,
)


def sharded_streaming_margin(
    h, W, b, tgt_ids, seen_ids, w_neg, default_target, mesh,
    loss_name: str, unique: bool, chunk: int | None = None,
    compute_dtype=jnp.float32,
):
    """Sharded uniform scan + the special-column correction (the
    correction's K-column gather from the sharded W is left to GSPMD —
    the same access pattern as the sampled loss's negative columns)."""
    uniform = sharded_streaming_margin_uniform(
        h, W, b, w_neg, default_target, mesh, loss_name, chunk, compute_dtype
    )
    corr = margin_special_correction(
        h, W, b, tgt_ids, seen_ids, w_neg, default_target,
        loss_name, unique, W.shape[1], compute_dtype,
    )
    return uniform + corr
