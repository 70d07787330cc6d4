"""Pallas TPU kernel: fused GRU scan over time.

The recurrent hot loop of the framework (SURVEY.md §3.1): given the
precomputed input contributions ``x_pre[B, L, 3H]`` (the gather-sum of the
sparse input table — sparse_lstm.py:755's ``x·W_in`` trick), advance the
hidden state through all ``L`` timesteps.

This kernel keeps the hidden state, the ``W_hid`` gate matrix and one
batch-tile of ``x_pre`` resident in VMEM for the whole sequence, so the
only HBM traffic is the initial tile load and the final state store.
Grid is over batch tiles; each program runs a ``fori_loop`` over time
with one fused ``[TB,H]·[H,3H]`` MXU matmul per step.

Measured on TPU v5e via device traces (B=256, L=30, f32, us/op,
2026-08-20; the remote tunnel makes wall-clock timing useless, so these
are xplane device-time sums over 20 chained invocations):

  GRU fwd  H=50 (padded 64, bb=256): pallas 13.1 vs XLA 34.0 -> 2.6x
  GRU fwd  H=128 (bb=128):           pallas 23.6 vs XLA 47.6 -> 2.0x
  LSTM fwd H=128 (bb=128):           pallas 40.4 vs XLA 71.2 -> 1.8x

Forward-only: training uses seqrec_tpu/ops/pallas_rnn_train.py (custom
VJP) where it wins and the XLA scan elsewhere; see the gating table in
seqrec_tpu/models/recurrent.py:_run_layer. Equivalence with the scan
path is asserted in tests (interpret mode on CPU).

Gate math parity with seqrec_tpu.models.recurrent.RecurrentLayers._gru_step
(Lasagne GRU formulation, gate order reset|update|candidate; masked steps
carry the previous state through).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the double-buffered x_pre block (the dominant buffer).
# The v5e scoped-vmem limit is 16 MiB (16.78e6 B); the other blocks
# (w, mask, h, out) need well under 1 MiB at these shapes. Empirical
# anchors (v5e, 2026-08-20): a 15.73e6 B x block (LSTM H=128, bb=128)
# compiles and runs; 23.59e6 B (GRU H=256, bb=128) is rejected by the
# compiler with a scoped-vmem OOM.
_X_VMEM_BUDGET = int(16.0e6)


def auto_block_b(B: int, L: int, G: int) -> int | None:
    """Largest batch tile (multiple of 128) whose [L, bb, G] x_pre block
    double-buffers within the VMEM budget; None = does not fit at the
    minimum tile (caller should fall back to the XLA scan).

    Bigger tiles mean fewer sequential grid iterations — measured 1.7x
    on the fused GRU at H=64 going from bb=128 to bb=256 (v5e)."""
    for cand in (512, 384, 256, 128):
        if cand > max(B, 128):
            continue
        if L * cand * G * 4 * 2 <= _X_VMEM_BUDGET:
            return cand
    return None


def pad_gate_sections(H: int, Hp: int, x_pre, w_hid, *vecs):
    """Zero-pad a ragged hidden size H up to the lane-aligned Hp in every
    per-gate section: x_pre [B, L, n*H] -> [B, L, n*Hp], w_hid [H, n*H] ->
    [Hp, n*Hp], and each [H]- or [..., H]-shaped vector -> Hp.

    Zero pad rows/cols keep the pad lanes of the hidden state exactly 0
    through every step (gates see 0 pre-activations; the candidate/cell
    contributions are 0), so real lanes compute bit-identical values."""
    B, L, G = x_pre.shape
    n = G // H
    pad = Hp - H
    x_p = jnp.pad(
        x_pre.reshape(B, L, n, H), ((0, 0), (0, 0), (0, 0), (0, pad))
    ).reshape(B, L, n * Hp)
    w_p = jnp.pad(
        w_hid.reshape(H, n, H), ((0, pad), (0, 0), (0, pad))
    ).reshape(Hp, n * Hp)
    vecs_p = tuple(
        jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)]) for v in vecs
    )
    return (x_p, w_p) + vecs_p


def _gru_scan_kernel(x_ref, mask_ref, w_ref, h0_ref, out_ref, *, seq_len: int):
    """One batch tile: x [L, TB, 3H], mask [L, TB], w [H, 3H], h0/out [TB, H].

    Time is the LEADING (untiled) dimension so the per-step dynamic index
    stays off the sublane/lane dims (a Mosaic layout requirement)."""
    H = h0_ref.shape[-1]

    def step(t, h):
        x_t = x_ref[t]  # [TB, 3H]
        hid = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)  # [TB, 3H]
        r = jax.nn.sigmoid(x_t[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_t[:, H : 2 * H] + hid[:, H : 2 * H])
        c = jnp.tanh(x_t[:, 2 * H :] + r * hid[:, 2 * H :])
        h_new = (1.0 - u) * h + u * c
        m = mask_ref[t][:, None]
        return jnp.where(m > 0, h_new, h)

    out_ref[:] = jax.lax.fori_loop(0, seq_len, step, h0_ref[:])


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def gru_scan(x_pre, mask, w_hid, h0, *, block_b: int | None = None, interpret: bool = False):
    """Fused GRU forward over time.

    x_pre: [B, L, 3H] precomputed input gate contributions (+ bias).
    mask:  [B, L] validity mask.
    w_hid: [H, 3H] hidden-to-gate weights.
    h0:    [B, H] initial state.
    Returns final hidden state [B, H].

    ``block_b`` is the batch tile and doubles as the mask lane dimension,
    so it must be a multiple of 128 (Mosaic tiling constraint); the batch
    is padded up to a tile multiple. None = auto (largest VMEM-fitting).
    """
    B, L, G = x_pre.shape
    H = h0.shape[-1]
    assert G == 3 * H, (G, H)
    if block_b is None:
        block_b = auto_block_b(B, L, G)
        assert block_b is not None, f"x_pre block exceeds VMEM at {(B, L, G)}"
    pad = (-B) % block_b
    if pad:
        x_pre = jnp.pad(x_pre, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
    Bp = B + pad
    # time-major layout so the in-kernel dynamic time index hits dim 0
    x_t_major = jnp.swapaxes(x_pre, 0, 1)  # [L, Bp, 3H]
    mask_t_major = jnp.swapaxes(mask, 0, 1)  # [L, Bp]

    out = pl.pallas_call(
        functools.partial(_gru_scan_kernel, seq_len=L),
        out_shape=jax.ShapeDtypeStruct((Bp, H), x_pre.dtype),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((L, block_b, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * L * H * G,
            bytes_accessed=(Bp * L * G + Bp * L + H * G + 2 * Bp * H) * 4,
            transcendentals=Bp * L * H * 3,
        ),
    )(x_t_major, mask_t_major, w_hid, h0)
    return out[:B]


# ----------------------------------------------------------------------
# LSTM (peepholes; gate order in|forget|cell|out, parity with
# seqrec_tpu.models.recurrent.RecurrentLayers._lstm_step)
# ----------------------------------------------------------------------
def _lstm_scan_kernel(
    x_ref, mask_ref, w_ref, peep_ref, h0_ref, c0_ref, out_ref, *, seq_len: int
):
    """x [L, TB, 4H], mask [L, TB], w [H, 4H], peep [3, H] (ci, cf, co)."""
    H = h0_ref.shape[-1]

    def step(t, carry):
        h, c = carry
        x_t = x_ref[t]
        pre = x_t + jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :H] + c * peep_ref[0, :])
        f = jax.nn.sigmoid(pre[:, H : 2 * H] + c * peep_ref[1, :])
        g = jnp.tanh(pre[:, 2 * H : 3 * H])
        c_new = f * c + i * g
        o = jax.nn.sigmoid(pre[:, 3 * H :] + c_new * peep_ref[2, :])
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[t][:, None]
        keep = m > 0
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c))

    h, _ = jax.lax.fori_loop(0, seq_len, step, (h0_ref[:], c0_ref[:]))
    out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def lstm_scan(
    x_pre, mask, w_hid, peepholes, h0, c0, *, block_b: int | None = None, interpret: bool = False
):
    """Fused LSTM forward over time (final hidden state [B, H]).

    peepholes: [3, H] stacked (w_ci, w_cf, w_co)."""
    B, L, G = x_pre.shape
    H = h0.shape[-1]
    assert G == 4 * H, (G, H)
    if block_b is None:
        block_b = auto_block_b(B, L, G)
        assert block_b is not None, f"x_pre block exceeds VMEM at {(B, L, G)}"
    pad = (-B) % block_b
    if pad:
        x_pre = jnp.pad(x_pre, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    Bp = B + pad
    x_t = jnp.swapaxes(x_pre, 0, 1)
    m_t = jnp.swapaxes(mask, 0, 1)

    out = pl.pallas_call(
        functools.partial(_lstm_scan_kernel, seq_len=L),
        out_shape=jax.ShapeDtypeStruct((Bp, H), x_pre.dtype),
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((L, block_b, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_t, m_t, w_hid, peepholes, h0, c0)
    return out[:B]
