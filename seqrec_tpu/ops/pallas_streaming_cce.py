"""Pallas TPU kernels for the streaming (flash-style) full-catalog CCE.

The XLA `lax.scan` form of the streaming loss (ops/streaming_cce.py)
already removes the [B, n_items] logit materialization, but the device
trace of the round-5 ceiling (50.1 ms/step at H=256/200k/B=8192) still
charges ~11 ms/step to the scan's separate VPU fusion passes (chunk
max/exp/sum in the forward; softmax/dlogits assembly in the backward)
and scan bookkeeping — work XLA schedules as separate passes over each
[B, chunk] logit block after the matmul writes it. These kernels fuse
the elementwise work into the tiles while the MXU output is still in
VMEM, with the online (m, s) stats living in VMEM scratch across the
whole grid:

- ``stats_pallas``: forward — grid (column-chunks OUTER, batch-tiles
  INNER) so each [H, C] weight block is DMA'd once per chunk (the
  [B, H] activations re-stream per chunk: 98 x 8 MB ≈ 1 ms, vs 16 x
  200 MB if the batch were outer); per tile one MXU dot + fused
  max/exp/sum updates the scratch-resident flash stats; the [B, 1]
  m/s outputs flush once at the last grid step.
- ``grads_pallas``: backward — same grid order; the [H, C] dW block
  stays output-resident across all batch tiles of its chunk (+= over
  "i"), db likewise; dh is a single full-array [B, H] output block
  (constant index map — resident for the whole grid, zeroed at the
  first step, row-slices accumulated per tile). The target one-hot is
  rebuilt from a broadcasted iota comparison — no gather anywhere.

VMEM budget (f32, bb=512, C=1024, H=256, B=8192): h 0.5 MB x2, W 1 MB
x2, logits/dlogits ~2 MB each, dh 8 MB (bwd only), dW block 1 MB, m/s
scratch 64 KB — within the ~16 MB/core VMEM. ``fits_vmem`` gates the
caller; the XLA scan remains the fallback everywhere else (CPU tests
run these kernels in interpret mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch tile and column chunk; C must be a lane multiple, bb a sublane
# multiple. (512, 1024) measured best among VMEM-fitting options.
BLOCK_B = 512
CHUNK_C = 1024

# dh is kept as one VMEM-resident output block in the backward kernel
_DH_VMEM_LIMIT = 8 * 1024 * 1024


def fits_vmem(B: int, H: int) -> bool:
    """Whether the backward kernel's resident [B, H] dh block fits."""
    return B * H * 4 <= _DH_VMEM_LIMIT


# ----------------------------------------------------------------------
# forward: online (m, s) over column chunks
# ----------------------------------------------------------------------
def _fwd_kernel(h_ref, w_ref, b_ref, m_out, s_out, m_acc, s_acc):
    j = pl.program_id(0)  # column chunk (outer)
    i = pl.program_id(1)  # batch tile (inner)
    nj = pl.num_programs(0)
    bb = h_ref.shape[0]
    row0 = i * bb

    @pl.when(j == 0)
    def _():
        m_acc[pl.ds(row0, bb), :] = jnp.full((bb, 1), -1e30, jnp.float32)
        s_acc[pl.ds(row0, bb), :] = jnp.zeros((bb, 1), jnp.float32)

    logits = (
        jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    m_old = m_acc[pl.ds(row0, bb), :]
    s_old = s_acc[pl.ds(row0, bb), :]
    cm = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, cm)
    s_new = s_old * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_acc[pl.ds(row0, bb), :] = m_new
    s_acc[pl.ds(row0, bb), :] = s_new

    @pl.when(j == nj - 1)
    def _():
        m_out[:] = m_acc[pl.ds(row0, bb), :]
        s_out[:] = s_acc[pl.ds(row0, bb), :]


def stats_pallas(
    h, Wp, bp, block_b=BLOCK_B, chunk=CHUNK_C, interpret=False, vma=None
):
    """(m, s) [B] online log-sum-exp stats of ``h @ Wp + bp``.

    ``Wp``/``bp`` pre-padded to a ``chunk`` multiple (pad bias -1e30);
    B is padded here to a ``block_b`` multiple. ``vma``: the varying
    mesh axes of the output when called inside shard_map (the VMA
    checker requires it on pallas_call out shapes)."""
    B, H = h.shape
    Np = Wp.shape[1]
    pad_b = (-B) % block_b
    if pad_b:
        h = jnp.pad(h, ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    n_chunks = Np // chunk
    _sds = functools.partial(jax.ShapeDtypeStruct, **(
        {"vma": frozenset(vma)} if vma else {}
    ))

    m, s = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            _sds((Bp, 1), jnp.float32),
            _sds((Bp, 1), jnp.float32),
        ),
        grid=(n_chunks, Bp // block_b),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, 1), jnp.float32),
            pltpu.VMEM((Bp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h, Wp, bp.reshape(1, -1))
    return m[:B, 0], s[:B, 0]


# ----------------------------------------------------------------------
# backward: dh, dW, db from recomputed chunks
# ----------------------------------------------------------------------
def _bwd_kernel(
    h_ref, w_ref, b_ref, t_ref, logz_ref, g_ref,
    dh_out, dw_out, db_out, *, chunk,
):
    j = pl.program_id(0)  # column chunk (outer)
    i = pl.program_id(1)  # batch tile (inner)
    bb = h_ref.shape[0]
    row0 = i * bb

    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _():
        dh_out[:] = jnp.zeros_like(dh_out)

    logits = (
        jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    p = jnp.exp(logits - logz_ref[:])  # [bb, C] softmax slice
    cols = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (bb, chunk), 1)
    onehot = (cols == t_ref[:]).astype(jnp.float32)
    dlogits = g_ref[:] * (p - onehot)  # [bb, C]

    dw_c = jnp.dot(h_ref[:].T, dlogits, preferred_element_type=jnp.float32)
    db_c = jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_out[:] = dw_c
        db_out[:] = db_c

    @pl.when(i > 0)
    def _():
        dw_out[:] += dw_c
        db_out[:] += db_c

    dh_out[pl.ds(row0, bb), :] += jnp.dot(
        dlogits, w_ref[:].T, preferred_element_type=jnp.float32
    )


def grads_pallas(
    h, Wp, bp, targets, logz, g, block_b=BLOCK_B, chunk=CHUNK_C,
    interpret=False, vma=None,
):
    """(dh [B, H], dWp [H, Np], dbp [Np]) of the streaming CCE.

    ``targets`` relative ids with out-of-range ids < 0 (never match a
    column); ``logz``/``g`` are [B] global log-partition and upstream
    cotangent. Pad columns (bias -1e30) produce p = 0 and never match a
    target, so their dW/db land exactly 0."""
    B, H = h.shape
    Np = Wp.shape[1]
    pad_b = (-B) % block_b
    if pad_b:
        h = jnp.pad(h, ((0, pad_b), (0, 0)))
        targets = jnp.pad(targets, (0, pad_b), constant_values=-1)
        logz = jnp.pad(logz, (0, pad_b))
        g = jnp.pad(g, (0, pad_b))  # zero cotangent: pad rows contribute 0
    Bp = B + pad_b
    n_chunks = Np // chunk

    _sds = functools.partial(jax.ShapeDtypeStruct, **(
        {"vma": frozenset(vma)} if vma else {}
    ))
    dh, dW, db = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk),
        out_shape=(
            _sds((Bp, H), jnp.float32),
            _sds((H, Np), jnp.float32),
            _sds((1, Np), jnp.float32),
        ),
        grid=(n_chunks, Bp // block_b),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bp, H), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        h,
        Wp,
        bp.reshape(1, -1),
        targets.reshape(-1, 1).astype(jnp.int32),
        logz.reshape(-1, 1).astype(jnp.float32),
        g.reshape(-1, 1).astype(jnp.float32),
    )
    return dh[:B], dW, db[0]
