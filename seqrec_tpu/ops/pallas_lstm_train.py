"""Pallas TPU kernel: fused LSTM scan with a custom VJP (training path).

The LSTM twin of seqrec_tpu/ops/pallas_rnn_train.py: the forward kernel
streams the pre-step states ``h_{t-1}``/``c_{t-1}`` to HBM (the only
residuals kept) and the backward kernel reruns time in reverse,
RECOMPUTING the gates from ``x_pre[t]``, ``h_{t-1}`` and ``c_{t-1}``.
Same 2-D grid ``(batch tile, time chunk)``, same reversed-index-map chunk
walk, same mask-as-identity time padding.

Cell math parity with ``RecurrentLayers._lstm_step`` (Lasagne gate order
in|forget|cell|out with peepholes, sparse_lstm.py):

  pre   = x_t + h₋·W                      (pre-activation, [TB, 4H])
  i     = σ(pre_i + c₋·w_ci);  f = σ(pre_f + c₋·w_cf);  g = tanh(pre_g)
  c     = f·c₋ + i·g
  o     = σ(pre_o + c·w_co);   h = o·tanh(c)

Backward (per unmasked step; dh, dc are the running cotangents):
  do    = dh·tanh(c);          dc += dh·o·(1 − tanh²(c))
  dpre_o= do·o(1−o);           dc += dpre_o·w_co
  di    = dc·g;  df = dc·c₋;  dg = dc·i;  dc₋ = dc·f
  dpre_i= di·i(1−i);           dc₋ += dpre_i·w_ci
  dpre_f= df·f(1−f);           dc₋ += dpre_f·w_cf
  dpre_g= dg·(1−g²)
  dpre  = [dpre_i, dpre_f, dpre_g, dpre_o]   (clipped — Lasagne clips the
          cotangent of the SUMMED pre-activation, so the clipped value
          feeds both dx[t] and the hidden path, matching _lstm_step's
          ``maybe_grad_clip(x_pre + h·W)``)
  dx[t] = dpre;  dh₋ = dpre·Wᵀ;  dW += h₋ᵀ·dpre
  dw_ci += Σ dpre_i·c₋;  dw_cf += Σ dpre_f·c₋;  dw_co += Σ dpre_o·c
Masked steps pass (dh, dc) through untouched and contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqrec_tpu.ops.pallas_rnn_train import TIME_CHUNK, _pad_time


def lstm_train_block_b(B: int, H: int, G: int) -> int | None:
    """Largest batch tile whose backward footprint fits VMEM: the LSTM
    backward streams x, dx (G-wide) and hs, cs (H-wide) chunks (the extra
    cs stream is the ``2*H`` term below, vs the GRU model's ``H``)."""
    fixed = 3 * H * G * 4  # w + dw + dw_acc
    # capped at 256: bb=512 at H=64 compiles to 20.8e6 B of scoped vmem
    # (the footprint model under-counts ~40% at large tiles) and is
    # rejected by the compiler. NB: the 15.5e6 threshold and the
    # under-count margin are anchors inherited from the GRU backward
    # (pallas_rnn_train.train_block_b); with the LSTM's larger modeled
    # footprint they admit bb=128 at H=128 (11.3e6 B — the measured
    # 1.37-1.59x win region of BASELINE.md) and reject H>=256 onto the
    # XLA scan. Device validation of the admitted tiles lives in
    # tests/test_tpu_smoke.py (every fused kernel is compiled and
    # numerics-checked on the real chip at its gated-on shapes).
    for cand in (256, 128):
        if cand > max(B, 128):
            continue
        variable = TIME_CHUNK * cand * (2 * G + 2 * H) * 4 * 2
        if variable + fixed <= 15.5e6:
            return cand
    return None


def _gates(x_t, h, c, w_ref, peep_ref, H):
    pre = x_t + jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, :H] + c * peep_ref[0, :])
    f = jax.nn.sigmoid(pre[:, H : 2 * H] + c * peep_ref[1, :])
    g = jnp.tanh(pre[:, 2 * H : 3 * H])
    c_new = f * c + i * g
    o = jax.nn.sigmoid(pre[:, 3 * H :] + c_new * peep_ref[2, :])
    return i, f, g, c_new, o


def _fwd_kernel(
    x_ref, mask_ref, w_ref, peep_ref, h0_ref, c0_ref,
    out_ref, hs_ref, cs_ref, h_carry, c_carry,
    *, chunk: int, n_chunks: int,
):
    H = h0_ref.shape[-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_carry[:] = h0_ref[:]
        c_carry[:] = c0_ref[:]

    def step(t, carry):
        h, c = carry
        hs_ref[t] = h
        cs_ref[t] = c
        i, f, g, c_new, o = _gates(x_ref[t], h, c, w_ref, peep_ref, H)
        h_new = o * jnp.tanh(c_new)
        keep = mask_ref[t][:, None] > 0
        return jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)

    h, c = jax.lax.fori_loop(0, chunk, step, (h_carry[:], c_carry[:]))
    h_carry[:] = h
    c_carry[:] = c

    @pl.when(j == n_chunks - 1)
    def _():
        out_ref[:] = h_carry[:]


def _bwd_kernel(
    x_ref, mask_ref, w_ref, peep_ref, hs_ref, cs_ref, dh_in_ref,
    dx_ref, dh0_ref, dc0_ref, dw_ref, dpeep_ref,
    dh_carry, dc_carry, dw_acc, dpeep_acc,
    *, chunk: int, n_chunks: int, grad_clip: float,
):
    H = dh_in_ref.shape[-1]
    i_id = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_carry[:] = dh_in_ref[:]
        dc_carry[:] = jnp.zeros_like(dc_carry)

    @pl.when(jnp.logical_and(i_id == 0, j == 0))
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        dpeep_acc[:] = jnp.zeros_like(dpeep_acc)

    def step(tt, carry):
        dh, dc = carry
        t = chunk - 1 - tt
        x_t = x_ref[t]
        h_prev = hs_ref[t]
        c_prev = cs_ref[t]
        m = mask_ref[t][:, None]

        i, f, g, c_new, o = _gates(x_t, h_prev, c_prev, w_ref, peep_ref, H)
        tanh_c = jnp.tanh(c_new)

        do = dh * tanh_c
        dc_t = dc + dh * o * (1.0 - tanh_c * tanh_c)
        dpre_o = do * o * (1.0 - o)
        dc_t = dc_t + dpre_o * peep_ref[2, :]
        di = dc_t * g
        df = dc_t * c_prev
        dg = dc_t * i
        dc_prev = dc_t * f
        dpre_i = di * i * (1.0 - i)
        dpre_f = df * f * (1.0 - f)
        dc_prev = dc_prev + dpre_i * peep_ref[0, :] + dpre_f * peep_ref[1, :]
        dpre_g = dg * (1.0 - g * g)

        # the clip wraps ``x + h·W`` in the cell (maybe_grad_clip in
        # _lstm_step), so only the dx / dh paths see clipped cotangents;
        # the peephole grads branch off BEFORE the clip
        keep0 = m > 0
        dpeep_acc[0, :] += jnp.sum(jnp.where(keep0, dpre_i * c_prev, 0.0), axis=0)
        dpeep_acc[1, :] += jnp.sum(jnp.where(keep0, dpre_f * c_prev, 0.0), axis=0)
        dpeep_acc[2, :] += jnp.sum(jnp.where(keep0, dpre_o * c_new, 0.0), axis=0)

        dpre = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        if grad_clip:
            dpre = jnp.clip(dpre, -grad_clip, grad_clip)
        dpre = jnp.where(m > 0, dpre, 0.0)
        dx_ref[t] = dpre

        dw_acc[:] += jax.lax.dot_general(
            h_prev, dpre,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_prev = jax.lax.dot_general(
            dpre, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        keep = m > 0
        return (
            jnp.where(keep, dh_prev, dh),
            jnp.where(keep, dc_prev, dc),
        )

    dh, dc = jax.lax.fori_loop(0, chunk, step, (dh_carry[:], dc_carry[:]))
    dh_carry[:] = dh
    dc_carry[:] = dc

    @pl.when(j == n_chunks - 1)
    def _():
        dh0_ref[:] = dh_carry[:]
        dc0_ref[:] = dc_carry[:]
        dw_ref[:] = dw_acc[:]
        dpeep_ref[:] = dpeep_acc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def lstm_scan_train(
    x_pre, mask, w_hid, peepholes, h0, c0,
    grad_clip=0.0, block_b=None, interpret=False,
):
    """Differentiable fused LSTM scan; returns the final hidden state [B, H].

    peepholes: [3, H] stacked (w_ci, w_cf, w_co)."""
    h, _ = _lstm_train_fwd(
        x_pre, mask, w_hid, peepholes, h0, c0, grad_clip, block_b, interpret
    )
    return h


def _lstm_train_fwd(x_pre, mask, w_hid, peep, h0, c0, grad_clip, block_b, interpret):
    B, L, G = x_pre.shape
    H = h0.shape[-1]
    if block_b is None:
        block_b = lstm_train_block_b(B, H, G)
        assert block_b is not None, f"train blocks exceed VMEM at {(B, L, G)}"
    pad_b = (-B) % block_b
    if pad_b:
        x_pre = jnp.pad(x_pre, ((0, pad_b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_b), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad_b), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    x_t = jnp.swapaxes(x_pre, 0, 1)
    m_t = jnp.swapaxes(mask, 0, 1)
    x_t, m_t, Lp = _pad_time(x_t, m_t, TIME_CHUNK)
    n_chunks = Lp // TIME_CHUNK

    h, hs, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, chunk=TIME_CHUNK, n_chunks=n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H), x_pre.dtype),
            jax.ShapeDtypeStruct((Lp, Bp, H), x_pre.dtype),
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
            pl.BlockSpec((3, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIME_CHUNK, block_b, H), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TIME_CHUNK, block_b, H), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, m_t, w_hid, peep, h0, c0)
    return h[:B], (x_t, m_t, w_hid, peep, hs, cs, B, Bp, L)


def _lstm_train_bwd(grad_clip, block_b, interpret, res, dh):
    x_t, m_t, w_hid, peep, hs, cs, B, Bp, L_orig = res
    Lp, _, G = x_t.shape
    H = w_hid.shape[0]
    if block_b is None:  # same deterministic choice the forward made
        block_b = lstm_train_block_b(B, H, G)
    n_chunks = Lp // TIME_CHUNK
    if Bp != B:
        dh = jnp.pad(dh, ((0, Bp - B), (0, 0)))

    rev = lambda j: n_chunks - 1 - j  # noqa: E731

    dx_t, dh0, dc0, dw, dpeep = pl.pallas_call(
        functools.partial(
            _bwd_kernel, chunk=TIME_CHUNK, n_chunks=n_chunks, grad_clip=grad_clip
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, Bp, G), x_t.dtype),
            jax.ShapeDtypeStruct((Bp, H), x_t.dtype),
            jax.ShapeDtypeStruct((Bp, H), x_t.dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
            jax.ShapeDtypeStruct((3, H), jnp.float32),
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
            pl.BlockSpec((3, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TIME_CHUNK, block_b, H),
                lambda i, j: (rev(j), i, 0),
                memory_space=pltpu.VMEM,
            ),
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
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, H), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((H, G), jnp.float32),
            pltpu.VMEM((3, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_t, m_t, w_hid, peep, hs, cs, dh)

    dx = jnp.swapaxes(dx_t, 0, 1)[:B, :L_orig]
    return (
        dx,
        None,
        dw.astype(w_hid.dtype),
        dpeep.astype(peep.dtype),
        dh0[:B],
        dc0[:B],
    )


lstm_scan_train.defvjp(_lstm_train_fwd, _lstm_train_bwd)
