"""Pallas TPU kernel: fused catalog scoring + seen-item masking + top-k.

The evaluation/serving hot path (rnn_base.py:132-159 and the validation
sweep): ``scores = h·W_out + b``; mask already-seen items; take the top-k.
Done naively this materializes ``[B, n_items]`` logits in HBM, reads them
back for the mask scatter, and again for ``lax.top_k`` — three passes over
the biggest tensor in the model. This kernel fuses all three: the catalog
dimension is tiled through VMEM, each tile's logits are computed on the
MXU, seen ids are masked with a broadcast compare (no scatter), and a
running sorted top-k per row is maintained in VMEM scratch via
extract-max + insertion (k is small and static, default 10).

Ranking parity: softmax is order-preserving per row, so ranking raw
logits matches the reference's softmax-then-argpartition
(rnn_one_hot.py:65 + rnn_base.py:154-159). Masked items get -inf.

The same kernel serves the mesh-sharded path: with ``W_out`` column-
sharded over "model", shard_map runs the kernel per shard and a host-side
(or XLA) merge of the per-shard top-k results gives the global top-k —
k·n_shards values instead of n_items cross the shard boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

# Catalog-size gate for the fused kernel, from v5e wall-clock sweeps at
# B=512/H=256 (2026-08-21): the kernel's per-tile cost is dominated by
# the k extract-max passes + k^2 insertion slots, which scale with the
# number of catalog tiles — 2.4 ms (tie with XLA) at 3.7k items, 1.2x
# slower at 12.8k, 1.5x at 50k, and 1.6x at 200k even with tuned tiles
# (block_b=256, block_n=2048; the bb=16 default was 16x slower there).
# XLA's three-pass (matmul, mask-scatter, lax.top_k) streams [B, N]
# through HBM at full bandwidth, so it wins once N is large enough that
# per-tile overhead beats the extra HBM passes. Device traces at the
# reference catalog (3.7k, eval chunks) still show the fused kernel
# 2.6x ahead — keep it there, fall back above the crossover.
FUSED_TOPK_MAX_ITEMS = 8192


def auto_topk_blocks(B: int, N: int) -> tuple:
    """(block_b, block_n): large batch tiles amortize the per-grid-cell
    insertion overhead (measured 192 -> 54 ms at N=200k moving bb 16 ->
    128); wider catalog tiles cut the tile count once N is large."""
    block_b = min(256, B)
    block_n = 512 if N <= 8192 else 2048
    return block_b, block_n


def _topk_kernel(
    h_ref, w_ref, b_ref, seen_ref, seen_mask_ref, outv_ref, outi_ref,
    topv, topi, *, k: int, n_tiles: int, tile_n: int, n_items: int,
):
    """Grid: (B tiles, N tiles); N innermost. Running top-k in scratch."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        topv[:] = jnp.full_like(topv, NEG_INF)
        topi[:] = jnp.zeros_like(topi)

    # score one catalog tile on the MXU
    scores = (
        jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[0, :]
    )  # [TB, TN]
    tb, tn = scores.shape
    base = j * tile_n
    col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (tb, tn), 1)

    # mask padding columns (catalog padded up to a tile multiple)
    scores = jnp.where(col_ids < n_items, scores, NEG_INF)

    # mask seen items: broadcast compare against the S seen ids per row
    seen = seen_ref[:]  # [TB, S] int32
    sm = seen_mask_ref[:]  # [TB, S]
    S = seen.shape[1]
    hit = jnp.zeros((tb, tn), dtype=jnp.bool_)
    for s in range(S):
        sid = seen[:, s][:, None]
        valid = sm[:, s][:, None] > 0
        hit = hit | ((col_ids == sid) & valid)
    scores = jnp.where(hit, NEG_INF, scores)

    # extract the tile's k best and insert into the running sorted top-k
    for _ in range(k):
        cur_max = jnp.max(scores, axis=1)  # [TB]
        is_max = scores == cur_max[:, None]
        # first max position in the tile
        big = jnp.where(is_max, col_ids, n_items + tile_n)
        cur_idx = jnp.min(big, axis=1).astype(jnp.int32)
        # clear it for the next extraction
        scores = jnp.where(is_max & (col_ids == cur_idx[:, None]), NEG_INF, scores)

        v, idx = cur_max, cur_idx
        for slot in range(k):
            sv = topv[:, slot]
            si = topi[:, slot]
            take = v > sv
            topv[:, slot] = jnp.where(take, v, sv)
            topi[:, slot] = jnp.where(take, idx, si)
            v = jnp.where(take, sv, v)
            idx = jnp.where(take, si, idx)

    @pl.when(j == n_tiles - 1)
    def _():
        outv_ref[:] = topv[:]
        outi_ref[:] = topi[:]


@functools.partial(jax.jit, static_argnames=("k", "block_b", "block_n", "interpret"))
def fused_score_topk(
    h,
    w_out,
    b_out,
    seen_ids,
    seen_mask,
    *,
    k: int = 10,
    block_b: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
):
    """Top-k item ids (sorted best-first) and their scores.

    h: [B, H]; w_out: [H, N]; b_out: [N];
    seen_ids: int32 [B, S] (ids to exclude); seen_mask: [B, S].
    Returns (values [B, k], ids int32 [B, k]).
    """
    B, H = h.shape
    N = w_out.shape[1]
    auto_b, auto_n = auto_topk_blocks(B, N)
    block_b = auto_b if block_b is None else block_b
    block_n = auto_n if block_n is None else block_n
    block_b = min(block_b, B)
    # VMEM guard: w tile + scores tile must fit alongside h/seen/top-k
    while block_n > 512 and (H + block_b) * block_n * 4 > 12e6:
        block_n //= 2
    pad_b = (-B) % block_b
    pad_n = (-N) % block_n
    if pad_b:
        h = jnp.pad(h, ((0, pad_b), (0, 0)))
        seen_ids = jnp.pad(seen_ids, ((0, pad_b), (0, 0)))
        seen_mask = jnp.pad(seen_mask, ((0, pad_b), (0, 0)))
    if pad_n:
        w_out = jnp.pad(w_out, ((0, 0), (0, pad_n)))
        b_out = jnp.pad(b_out, (0, pad_n))
    b_out = b_out.reshape(1, -1)
    Bp, Np = B + pad_b, N + pad_n
    n_tiles = Np // block_n
    S = seen_ids.shape[1]

    values, ids = pl.pallas_call(
        functools.partial(
            _topk_kernel, k=k, n_tiles=n_tiles, tile_n=block_n, n_items=N
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, k), jnp.float32),
            jax.ShapeDtypeStruct((Bp, k), jnp.int32),
        ),
        grid=(Bp // block_b, n_tiles),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, k), jnp.float32),
            pltpu.VMEM((block_b, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * H * Np,
            bytes_accessed=(Bp * H + H * Np + Np + 2 * Bp * S + 2 * Bp * k) * 4,
            transcendentals=0,
        ),
    )(h, w_out, b_out, seen_ids, seen_mask)
    return values[:B], ids[:B]
