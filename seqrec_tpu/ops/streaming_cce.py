"""Streaming (flash-style) full-catalog cross-entropy.

The reference's CCE head (rnn_one_hot.py:65-71) scores every catalog item:
``loss_i = logsumexp_j(h_i·W_j + b_j) - (h_i·W_t + b_t)``. The naive
implementation materializes the ``[B, n_items]`` logit matrix in HBM —
at B=8192 over a 200k-item catalog that is 6.5 GB written at the forward,
re-read by the backward, plus a same-sized dlogits matrix written and
re-read by BOTH backward matmuls: ~25-30 GB of HBM traffic per step for
an array that is pure intermediate. The round-3 bench matrix measured the
step as memory-bound exactly here (bf16 matmuls were a no-op e2e at every
10^5-catalog shape).

This op computes the SAME math without ever materializing the logits:

- forward: ``lax.scan`` over column chunks of ``W``/``b``; each chunk's
  logits live only in registers/VMEM while an online log-sum-exp
  (running max ``m``, running sum ``s`` — the flash-softmax recurrence)
  and the target-logit extraction are updated;
- backward (hand-written VJP): a second scan recomputes each chunk's
  logits, forms ``p = exp(logit - m - log s)`` and the per-chunk
  ``dlogits = g·(p - onehot)`` in registers, and immediately contracts it
  into ``dh`` (accumulated carry), the chunk's ``dW`` slice, and ``db``.

HBM traffic drops to: read ``W`` twice, write ``dW`` once, plus the
[B, H] activations — the logits never round-trip. The cost is one extra
forward matmul pass in the backward (the standard flash/remat trade:
4 matmul passes instead of 3). For the matmul-FLOP-dominated shapes this
op targets (catalog >= ~16k), the traffic saved is an order of magnitude
more than the extra pass costs.

Sharding: ``sharded_streaming_cce`` composes the same op with a
("data", "model") mesh via ``jax.shard_map``: each model shard runs the
column-chunk scan over ITS ``[H, N/m]`` slice of ``W_out`` only, and the
online (m, s) log-sum-exp stats plus the target logit combine across
shards with a pmax/psum over "model" (the flash recurrence is
associative across shards, so the global stats are exact). The backward
recomputes each local chunk against the GLOBAL logz, contracts straight
into the LOCAL ``dW`` slice (never communicated over "model" — it is
psum'd over "data" like any data-parallel gradient), and psums the
``dh`` partials over "model". Under GSPMD alone the chunked
dynamic-slice scan would fight the partitioner — shard_map makes the
per-shard scan explicit and leaves GSPMD out of it.

The math is validated against the dense path in
tests/test_streaming_cce.py (forward, grads, non-divisible chunk tails,
bf16 compute dtype) and against the single-device streaming op on the
virtual 8-device mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# catalogs at least this large route RNNOneHot through the streaming op
# (below it, the [B, N] intermediate fits comfortably in cache-sized
# working sets and the dense path's single fused pass wins)
STREAMING_CCE_MIN_ITEMS = 16384

# column-chunk width: 8 MXU lane groups; [B, CHUNK] f32 chunk logits at
# B=8192 are 32 MB of VMEM-resident intermediate per scan step, well
# inside the ~100 MB/step sweet spot XLA tiles without spilling
CHUNK_COLS = 1024


def pick_chunk(N: int, lo: int = 512, hi: int = 2048) -> int:
    """Largest chunk in [lo, hi] that divides N, else CHUNK_COLS.

    A dividing chunk lets the scan reshape ``W`` without the
    pad-to-multiple copy (two [H, N] HBM round trips per step — fwd and
    bwd each pad); most catalog sizes have a divisor in range (200000 →
    2000, 50000 → 2000)."""
    for c in range(min(hi, N), lo - 1, -1):
        if N % c == 0:
            return c
    return CHUNK_COLS


def _pad_cols(W: jax.Array, b: jax.Array, chunk: int):
    """Pad the column dim to a chunk multiple. Pad bias = -1e30 so padded
    columns contribute exp(-inf)=0 to the sum-exp and can never be a max
    (targets are always < N, so they never select a pad column)."""
    N = W.shape[1]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)))
        b = jnp.pad(b, (0, pad), constant_values=-1e30)
    return W, b, n_chunks


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def streaming_cce(h, W, b, targets, chunk: int = CHUNK_COLS, compute_dtype=jnp.float32):
    """Per-example CCE ``[B]`` from ``h [B,H]``, ``W [H,N]``, ``b [N]``,
    int targets ``[B]`` — identical math to
    ``losses.log_softmax_cce(h@W+b, targets)`` with no [B, N]
    materialization."""
    loss, _ = _fwd(h, W, b, targets, chunk, compute_dtype)
    return loss


def _chunk_logits(h_c, Wp, bp, i, chunk, compute_dtype):
    """([B, chunk] logits, [H, chunk] weight slice) of chunk i via
    dynamic_slice — the chunks are read straight out of the (padded)
    weight matrix, so no transposed [n_chunks, H, chunk] scan-xs copy
    of W (2x [H, N] HBM round trips per step, fwd + bwd) is ever
    built. Shared by the CCE and margin chunk scans."""
    W_c = jax.lax.dynamic_slice_in_dim(Wp, i * chunk, chunk, axis=1)
    b_c = jax.lax.dynamic_slice_in_dim(bp, i * chunk, chunk, axis=0)
    logits = (
        jnp.dot(h_c, W_c.astype(compute_dtype), preferred_element_type=jnp.float32)
        + b_c
    )
    return logits, W_c


def _vary(x, vma_axes):
    """Mark a constant as device-varying over ``vma_axes`` — required
    for scan carry inits inside shard_map under the VMA type system
    (the body's outputs are varying, so the init must be too)."""
    return jax.lax.pcast(x, vma_axes, to="varying") if vma_axes else x


def _stats_scan(h_c, Wp, bp, chunk, n_chunks, compute_dtype, vma_axes=()):
    """Online (m, s) log-sum-exp stats over the column chunks of
    (Wp, bp). The target logit is deliberately NOT extracted here: a
    per-chunk ``take_along_axis`` is a lane-dimension gather that
    measured 8 ms/step at the H=256/200k/B=8192 ceiling shape — half
    the cost of the forward matmul pass itself (device trace,
    2026-08-21). ``_target_logit`` computes it outside the scan with
    one B-column gather instead (16.0 -> 7.85 ms/forward)."""
    B = h_c.shape[0]

    init = _vary(
        (
            jnp.full((B,), -1e30, jnp.float32),
            jnp.zeros((B,), jnp.float32),
        ),
        vma_axes,
    )

    def scan_body(carry, i):
        m, s = carry
        logits, _ = _chunk_logits(h_c, Wp, bp, i, chunk, compute_dtype)
        cm = logits.max(axis=-1)
        m_new = jnp.maximum(m, cm)
        # flash-softmax rescale; m starts at -1e30 with s=0, so the
        # first chunk's exp(m - m_new) underflows to 0 against s=0
        s_new = s * jnp.exp(m - m_new) + jnp.exp(logits - m_new[:, None]).sum(-1)
        return (m_new, s_new), None

    (m, s), _ = jax.lax.scan(
        scan_body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return m, s


def _target_logit(h_c, W, b, targets, compute_dtype, n_valid=None):
    """[B] logit of each example's target column: one gather of B
    columns of W + a length-H dot per example. ``n_valid`` masks
    out-of-range (foreign-shard) targets to 0; WITHOUT ``n_valid``
    every target must be a real column id in [0, N) — the clamp-free
    unsharded path would silently fold a clipped column's logit into
    the loss for a sentinel id (the model always passes valid ids)."""
    safe = (
        targets if n_valid is None else jnp.clip(targets, 0, n_valid - 1)
    )
    cols = jnp.take(W, safe, axis=1).astype(compute_dtype)  # [H, B]
    tl = (
        jnp.einsum("bh,hb->b", h_c, cols, preferred_element_type=jnp.float32)
        + b[safe]
    )
    if n_valid is not None:
        tl = jnp.where((targets >= 0) & (targets < n_valid), tl, 0.0)
    return tl


def _kernel_engages(B: int, H: int, compute_dtype) -> bool:
    """Whether the fused Pallas streaming-CCE kernels run for this
    shape: TPU backend, f32 compute, lane-aligned H, and the backward's
    VMEM-resident dh block fits. The XLA chunk scan is the fallback
    everywhere else (and inside shard_map — the sharded op keeps the
    scan). Measured on v5e at the ceiling shape (H=256/200k/B=8192,
    adagrad, emb128): 164.0k vs 161.8k seq/s (+1.4%) with bitwise loss
    parity — XLA's own consumer fusion already captures most of the
    benefit; the kernel's win is the scratch-resident flash stats and
    one-DMA-per-chunk weight streaming."""
    import os

    if os.environ.get("SEQREC_NO_PALLAS"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover - backend init failure
        return False
    from seqrec_tpu.ops.pallas_streaming_cce import fits_vmem

    return (
        compute_dtype in (jnp.float32, "float32")
        and H % 128 == 0
        and fits_vmem(B, H)
    )


def _fwd(h, W, b, targets, chunk, compute_dtype):
    h_c = h.astype(compute_dtype)
    B, H = h.shape
    if _kernel_engages(B, H, compute_dtype):
        from seqrec_tpu.ops.pallas_streaming_cce import CHUNK_C, stats_pallas

        Wp, bp, _ = _pad_cols(W, b, CHUNK_C)
        m, s = stats_pallas(h_c, Wp, bp)
    else:
        Wp, bp, n_chunks = _pad_cols(W, b, chunk)
        m, s = _stats_scan(h_c, Wp, bp, chunk, n_chunks, compute_dtype)
    tl = _target_logit(h_c, W, b, targets, compute_dtype)
    loss = jnp.log(s) + m - tl
    # residuals: the [B]-sized softmax stats — NOT the logits
    return loss, (h, W, b, targets, m, s)


def _grad_scan(
    h_c, Wp, bp, targets, logz, gcol, chunk, n_chunks, compute_dtype,
    n_valid=None, vma_axes=(),
):
    """Chunked backward accumulation. Returns (dh, dWp, dbp) in f32 with
    dWp/dbp still padded to the chunk multiple. ``targets`` relative to
    column 0 of ``Wp`` (as in ``_stats_scan``, including the ``n_valid``
    pad-column guard); ``logz``/``gcol`` are [B, 1] columns of the
    GLOBAL log-partition and upstream cotangent."""
    H = Wp.shape[0]
    Np = n_chunks * chunk
    if n_valid is not None:
        targets = jnp.where(targets < n_valid, targets, -1)
    t_col = targets[:, None]

    def body(carry, i):
        dh, dW, db = carry
        logits, W_c = _chunk_logits(h_c, Wp, bp, i, chunk, compute_dtype)
        p = jnp.exp(logits - logz)  # softmax slice, in registers
        local = t_col - i * chunk
        hit = (local >= 0) & (local < chunk)
        onehot = (
            (jnp.arange(chunk, dtype=jnp.int32)[None, :] == local) & hit
        )
        dlogits = (gcol * (p - onehot)).astype(compute_dtype)
        dW_c = jnp.dot(
            h_c.T, dlogits, preferred_element_type=jnp.float32
        )  # [H, chunk]
        db_c = dlogits.sum(axis=0, dtype=jnp.float32)
        dh = dh + jnp.dot(
            dlogits, W_c.astype(compute_dtype).T,
            preferred_element_type=jnp.float32,
        )
        # in-place accumulation into the carried gradient buffers (XLA
        # donates scan carries, so these are true in-place column writes
        # — no [n_chunks, H, chunk] ys stack + transpose at the end)
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


def _bwd(chunk, compute_dtype, res, g):
    h, W, b, targets, m, s = res
    B, H = h.shape
    N = W.shape[1]
    logz = m + jnp.log(s)
    if _kernel_engages(B, H, compute_dtype):
        from seqrec_tpu.ops.pallas_streaming_cce import CHUNK_C, grads_pallas

        Wp, bp, _ = _pad_cols(W, b, CHUNK_C)
        dh, dW, db = grads_pallas(
            h.astype(compute_dtype), Wp, bp, targets, logz, g
        )
    else:
        Wp, bp, n_chunks = _pad_cols(W, b, chunk)
        dh, dW, db = _grad_scan(
            h.astype(compute_dtype), Wp, bp, targets, logz[:, None],
            g[:, None], chunk, n_chunks, compute_dtype,
        )
    return (
        dh.astype(h.dtype),
        dW[:, :N].astype(W.dtype),
        db[:N].astype(b.dtype),
        None,
    )


streaming_cce.defvjp(
    lambda h, W, b, t, chunk, cdt: _fwd(h, W, b, t, chunk, cdt),
    _bwd,
)


# ----------------------------------------------------------------------
# mesh-sharded composition
# ----------------------------------------------------------------------
def sharded_streaming_cce(
    h, W, b, targets, mesh, chunk: int | None = None, compute_dtype=jnp.float32
):
    """``streaming_cce`` over a ("data", "model") mesh.

    ``W [H, N]`` column-sharded P(None, "model"), ``b [N]`` P("model"),
    ``h [B, H]`` / ``targets [B]`` data-sharded. Each model shard scans
    only its [H, N/m] slice; the online LSE stats and the target logit
    psum/pmax over "model" (exact — the flash combine is associative);
    the hand-VJP contracts each shard's chunks straight into its LOCAL
    dW slice. Requires N % mesh["model"] == 0 (the same condition under
    which ``parallel.mesh.param_sharding`` shards W_out at all — callers
    with a non-dividing catalog keep W replicated and can use the plain
    ``streaming_cce``, which GSPMD data-parallelizes as-is)."""
    n_model = mesh.shape["model"]
    N = W.shape[1]
    if N % n_model:
        raise ValueError(
            f"catalog {N} does not divide the model axis ({n_model}); "
            "use streaming_cce with a replicated W instead"
        )
    if chunk is None:
        chunk = pick_chunk(N // n_model)
    return _sharded_cce(h, W, b, targets, mesh, chunk, compute_dtype)


def _sharded_kernel_engages(B: int, H: int, compute_dtype) -> bool:
    """Pallas streaming kernels INSIDE the shard_map bodies. Default ON
    for single-process meshes (measured: bitwise parity with the scan
    on chip, and the mesh-1x1 ceiling closes from −3.1% to −0.1% of the
    unsharded rate); multi-process meshes keep the XLA scan unless
    SEQREC_PALLAS_STREAMING_SHARDED=1 opts in (each pallas_call is
    shard-local so it should compose, but no multi-host TPU is
    reachable to prove it)."""
    import os

    if (
        jax.process_count() > 1
        and not os.environ.get("SEQREC_PALLAS_STREAMING_SHARDED")
    ):
        return False
    return _kernel_engages(B, H, compute_dtype)


def _local_stats(h_l, W_l, b_l, t_l, chunk, compute_dtype):
    """Per-(data, model) shard forward: local chunk scan + cross-shard
    flash combine. Returns (loss, m, s) — all invariant over "model"."""
    N_local = W_l.shape[1]
    col0 = jax.lax.axis_index("model").astype(jnp.int32) * N_local
    h_c = h_l.astype(compute_dtype)
    if _sharded_kernel_engages(h_l.shape[0], h_l.shape[1], compute_dtype):
        from seqrec_tpu.ops.pallas_streaming_cce import CHUNK_C, stats_pallas

        Wp, bp, _ = _pad_cols(W_l, b_l, CHUNK_C)
        m_l, s_l = stats_pallas(h_c, Wp, bp, vma=("data", "model"))
    else:
        Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
        m_l, s_l = _stats_scan(
            h_c, Wp, bp, chunk, n_chunks, compute_dtype,
            vma_axes=("data", "model"),
        )
    tl_l = _target_logit(h_c, W_l, b_l, t_l - col0, compute_dtype, n_valid=N_local)
    m = jax.lax.pmax(m_l, "model")
    s = jax.lax.psum(s_l * jnp.exp(m_l - m), "model")
    tl = jax.lax.psum(tl_l, "model")  # exactly one shard owns the target
    return jnp.log(s) + m - tl, m, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _sharded_cce(h, W, b, targets, mesh, chunk, compute_dtype):
    loss, _ = _sh_fwd(h, W, b, targets, mesh, chunk, compute_dtype)
    return loss


def _sh_fwd(h, W, b, targets, mesh, chunk, compute_dtype):
    from jax.sharding import PartitionSpec as P

    run = jax.shard_map(
        functools.partial(_local_stats, chunk=chunk, compute_dtype=compute_dtype),
        mesh=mesh,
        in_specs=(P("data", None), P(None, "model"), P("model"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
    )
    loss, m, s = run(h, W, b, targets)
    return loss, (h, W, b, targets, m, s)


def _sh_bwd(mesh, chunk, compute_dtype, res, g):
    from jax.sharding import PartitionSpec as P

    h, W, b, targets, m, s = res

    def local_bwd(h_l, W_l, b_l, t_l, m_l, s_l, g_l):
        N_local = W_l.shape[1]
        col0 = jax.lax.axis_index("model").astype(jnp.int32) * N_local
        if _sharded_kernel_engages(h_l.shape[0], h_l.shape[1], compute_dtype):
            from seqrec_tpu.ops.pallas_streaming_cce import (
                CHUNK_C,
                grads_pallas,
            )

            Wp, bp, _ = _pad_cols(W_l, b_l, CHUNK_C)
            # shard-relative targets; out-of-shard ids -> -1 (match no column)
            t_rel = t_l - col0
            t_rel = jnp.where((t_rel >= 0) & (t_rel < N_local), t_rel, -1)
            dh_p, dWp, dbp = grads_pallas(
                h_l.astype(compute_dtype), Wp, bp, t_rel,
                m_l + jnp.log(s_l), g_l, vma=("data", "model"),
            )
        else:
            Wp, bp, n_chunks = _pad_cols(W_l, b_l, chunk)
            logz = (m_l + jnp.log(s_l))[:, None]
            dh_p, dWp, dbp = _grad_scan(
                h_l.astype(compute_dtype), Wp, bp, t_l - col0, logz,
                g_l[:, None], chunk, n_chunks, compute_dtype,
                n_valid=N_local, vma_axes=("data", "model"),
            )
        # dh sums over ALL columns -> psum the per-model-shard partials;
        # dW/db live on their model shard but sum over the batch -> psum
        # over "data" (the standard data-parallel gradient all-reduce)
        dh = jax.lax.psum(dh_p, "model")
        dW = jax.lax.psum(dWp[:, :N_local], "data")
        db = jax.lax.psum(dbp[:N_local], "data")
        return dh, dW, db

    run = jax.shard_map(
        local_bwd,
        mesh=mesh,
        in_specs=(
            P("data", None), P(None, "model"), P("model"), P("data"),
            P("data"), P("data"), P("data"),
        ),
        out_specs=(P("data", None), P(None, "model"), P("model")),
    )
    dh, dW, db = run(h, W, b, targets, m, s, g)
    return dh.astype(h.dtype), dW.astype(W.dtype), db.astype(b.dtype), None


_sharded_cce.defvjp(
    lambda h, W, b, t, mesh, chunk, cdt: _sh_fwd(h, W, b, t, mesh, chunk, cdt),
    _sh_bwd,
)
