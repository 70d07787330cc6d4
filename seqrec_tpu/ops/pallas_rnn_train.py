"""Pallas TPU kernels: fused GRU scan with a custom VJP (training path).

Extends seqrec_tpu/ops/pallas_rnn.py to training: the forward kernel
additionally streams the pre-step hidden states ``h_{t-1}`` to HBM (the
only residual kept), and a backward kernel reruns time in reverse,
RECOMPUTING the gates from ``x_pre[t]`` and ``h_{t-1}`` instead of
storing them — trading one extra ``[TB,H]·[H,3H]`` matmul per step for a
3× cut in residual traffic (the classic remat trade on TPU, where HBM
bandwidth, not FLOPs, is the bottleneck).

Both kernels run a 2-D grid ``(batch tile, time chunk)`` so only one time
chunk of ``x_pre``/``dx``/``hs`` is VMEM-resident at a time (a whole-L
block overflows the ~16MB VMEM at production batch sizes). The hidden /
cotangent carry lives in VMEM scratch across chunks; the backward kernel
walks chunks in reverse simply by reversing the chunk index in its
BlockSpec index maps (TPU grids execute sequentially, so cross-chunk
carries are well-defined). Time is padded to a chunk multiple with
mask=0 steps, which both directions treat as identity.

Gradient-clipping parity: Lasagne's ``grad_clipping`` clips the
cotangents of the hidden pre-activations during backprop
(sparse_lstm.py:768-772); the backward kernel applies the same clip to
``d(hid)`` before propagating through ``W_hid``. The ``x_pre`` cotangent
clip is applied by the caller (seqrec_tpu.ops.core.grad_clip).

Backward math (per unmasked step, gate order reset|update|candidate):
  du    = dh·(c − h₋);  dc = dh·u;  dh₋ += dh·(1−u)
  dcpre = dc·(1−c²);    dr = dcpre·hidc;  dhidc = dcpre·r
  dupre = du·u(1−u);    drpre = dr·r(1−r)
  dhid  = [drpre, dupre, dhidc]  (clipped)
  dh₋  += dhid·W_hidᵀ;  dW_hid += h₋ᵀ·dhid;  dx[t] = [drpre, dupre, dcpre]
Masked steps pass ``dh`` through untouched and contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_CHUNK = 8


def train_block_b(B: int, H: int, G: int) -> int | None:
    """Largest batch tile whose BACKWARD-kernel VMEM footprint fits:
    grid-varying blocks (x [chunk,bb,G], hs [chunk,bb,H], dx [chunk,bb,G])
    double-buffer; w/dw/dw_acc are fixed. None = use the XLA scan.
    Empirical anchors (v5e): H=192/bb=128 compiles (12.3e6 B),
    H=256/bb=128 is rejected (17.1e6 B); H=128/bb=256 compiles (15.3e6 B)
    and measured 1.44x the XLA scan."""
    fixed = 3 * H * G * 4  # w + dw + dw_acc
    # capped at 256: bb=512 at H=64 compiles to 20.8e6 B of scoped vmem
    # (the footprint model under-counts ~40% at large tiles) and is
    # rejected by the compiler; every (bb<=256, fitting) anchor compiles
    for cand in (256, 128):
        if cand > max(B, 128):
            continue
        variable = TIME_CHUNK * cand * (2 * G + H) * 4 * 2
        if variable + fixed <= 15.5e6:
            return cand
    return None


def _fwd_kernel(
    x_ref, mask_ref, w_ref, h0_ref, out_ref, hs_ref, h_carry, *, chunk: int, n_chunks: int
):
    """x/hs [CL, TB, ·] (one time chunk), carry [TB, H] scratch."""
    H = h0_ref.shape[-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_carry[:] = h0_ref[:]

    def step(t, h):
        hs_ref[t] = h  # residual: h_{t-1}
        x_t = x_ref[t]
        hid = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_t[:, H : 2 * H] + hid[:, H : 2 * H])
        c = jnp.tanh(x_t[:, 2 * H :] + r * hid[:, 2 * H :])
        h_new = (1.0 - u) * h + u * c
        m = mask_ref[t][:, None]
        return jnp.where(m > 0, h_new, h)

    h_carry[:] = jax.lax.fori_loop(0, chunk, step, h_carry[:])

    @pl.when(j == n_chunks - 1)
    def _():
        out_ref[:] = h_carry[:]


def _bwd_kernel(
    x_ref, mask_ref, w_ref, hs_ref, dh_ref,
    dx_ref, dh0_ref, dw_ref,
    dh_carry, dw_acc,
    *, chunk: int, n_chunks: int, grad_clip: float,
):
    """Time chunks arrive REVERSED via the index maps; within a chunk the
    loop runs t = chunk-1 .. 0. ``dw_ref`` is a shared accumulator block."""
    H = dh_ref.shape[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_carry[:] = dh_ref[:]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)

    def step(tt, dh):
        t = chunk - 1 - tt
        x_t = x_ref[t]
        h_prev = hs_ref[t]
        m = mask_ref[t][:, None]

        # recompute forward gates
        hid = jnp.dot(h_prev, w_ref[:], preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_t[:, H : 2 * H] + hid[:, H : 2 * H])
        hidc = hid[:, 2 * H :]
        c = jnp.tanh(x_t[:, 2 * H :] + r * hidc)

        du = dh * (c - h_prev)
        dc = dh * u
        dh_direct = dh * (1.0 - u)
        dcpre = dc * (1.0 - c * c)
        dr = dcpre * hidc
        dhidc = dcpre * r
        dupre = du * u * (1.0 - u)
        drpre = dr * r * (1.0 - r)

        dhid = jnp.concatenate([drpre, dupre, dhidc], axis=-1)
        if grad_clip:
            dhid = jnp.clip(dhid, -grad_clip, grad_clip)
        dhid = jnp.where(m > 0, dhid, 0.0)

        dx_t = jnp.concatenate([drpre, dupre, dcpre], axis=-1)
        dx_ref[t] = jnp.where(m > 0, dx_t, 0.0)

        dw_acc[:] += jax.lax.dot_general(
            h_prev, dhid,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_prev = dh_direct + jax.lax.dot_general(
            dhid, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(m > 0, dh_prev, dh)

    dh_carry[:] = jax.lax.fori_loop(0, chunk, step, dh_carry[:])

    @pl.when(j == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_carry[:]
        dw_ref[:] = dw_acc[:]


def _pad_time(x_t, m_t, chunk):
    L = x_t.shape[0]
    pad = (-L) % chunk
    if pad:
        x_t = jnp.pad(x_t, ((0, pad), (0, 0), (0, 0)))
        m_t = jnp.pad(m_t, ((0, pad), (0, 0)))  # mask 0 ⇒ identity steps
    return x_t, m_t, L + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gru_scan_train(x_pre, mask, w_hid, h0, grad_clip=0.0, block_b=None, interpret=False):
    """Differentiable fused GRU scan; returns the final hidden state [B, H].

    Measured on TPU v5e (device traces, B=256, L=30, f32, us per
    value_and_grad, 2026-08-20): H=128 pallas 62.4 vs XLA 89.7 -> 1.44x;
    at H=50 padded to 64 the pad overhead eats the win (54.6 vs 51.8,
    0.95x), so the caller keeps XLA for ragged hidden sizes."""
    h, _ = _gru_train_fwd(x_pre, mask, w_hid, h0, grad_clip, block_b, interpret)
    return h


def _gru_train_fwd(x_pre, mask, w_hid, h0, grad_clip, block_b, interpret):
    B, L, G = x_pre.shape
    H = h0.shape[-1]
    if block_b is None:
        block_b = train_block_b(B, H, G)
        assert block_b is not None, f"train blocks exceed VMEM at {(B, L, G)}"
    pad_b = (-B) % block_b
    if pad_b:
        x_pre = jnp.pad(x_pre, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    x_t = jnp.swapaxes(x_pre, 0, 1)
    m_t = jnp.swapaxes(mask, 0, 1)
    x_t, m_t, Lp = _pad_time(x_t, m_t, TIME_CHUNK)
    n_chunks = Lp // TIME_CHUNK

    h, hs = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=TIME_CHUNK, n_chunks=n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H), x_pre.dtype),
            jax.ShapeDtypeStruct((Lp, Bp, H), x_pre.dtype),
        ),
        grid=(Bp // block_b, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (TIME_CHUNK, block_b, G), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TIME_CHUNK, block_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIME_CHUNK, block_b, H), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, H), jnp.float32)],
        interpret=interpret,
    )(x_t, m_t, w_hid, h0)
    return h[:B], (x_t, m_t, w_hid, hs, B, Bp, L)


def _gru_train_bwd(grad_clip, block_b, interpret, res, dh):
    x_t, m_t, w_hid, hs, B, Bp, L_orig = res
    Lp, _, G = x_t.shape
    H = w_hid.shape[0]
    if block_b is None:  # same deterministic choice the forward made
        block_b = train_block_b(B, H, G)
    n_chunks = Lp // TIME_CHUNK
    if Bp != B:
        dh = jnp.pad(dh, ((0, Bp - B), (0, 0)))

    rev = lambda j: n_chunks - 1 - j  # walk time chunks backwards

    dx_t, dh0, dw = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk=TIME_CHUNK, n_chunks=n_chunks, grad_clip=grad_clip
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Bp, G), x_t.dtype),
            jax.ShapeDtypeStruct((Bp, H), x_t.dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ),
        grid=(Bp // block_b, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (TIME_CHUNK, block_b, G),
                lambda i, j: (rev(j), i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TIME_CHUNK, block_b), lambda i, j: (rev(j), i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIME_CHUNK, block_b, H),
                lambda i, j: (rev(j), i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (TIME_CHUNK, block_b, G),
                lambda i, j: (rev(j), i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, m_t, w_hid, hs, dh)

    dx = jnp.swapaxes(dx_t, 0, 1)[:B, :L_orig]
    return dx, None, dw.astype(w_hid.dtype), dh0[:B]


gru_scan_train.defvjp(_gru_train_fwd, _gru_train_bwd)
