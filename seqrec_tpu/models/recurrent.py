"""Recurrent tower: GRU / LSTM / Vanilla stacks as pure JAX functions.

Re-designs the reference's recurrent machinery
(/root/reference/neural_networks/recurrent_layers.py:18-104 and the
OHE-input layers in sparse_lstm.py) TPU-first:

- The sparse one-hot input trick — ``x·W_in`` replaced by a gather-sum of
  ``W_in`` rows over the active feature ids (sparse_lstm.py:368,755,1133) —
  becomes a batched embedding gather over a packed ``[B, L, F]`` id tensor,
  computed for ALL timesteps at once (one big MXU-friendly lookup) before
  the time scan.
- The per-timestep recurrence runs as a ``jax.lax.scan`` with a fused cell
  (all gates in one ``[H, G·H]`` matmul); masked steps carry the previous
  state through (sparse_lstm.py:417-425).
- ``grad_clipping`` clips cotangents of the pre-activations via a
  ``custom_vjp``, mirroring Lasagne's ``theano.gradient.grad_clip``.
- Bidirectional stacks run a second scan on the time-flipped sequence and
  concatenate (recurrent_layers.py:72-78).
- Cell equations follow Lasagne's formulations (GRU per Cho et al.:
  ``h' = (1-u)⊙h + u⊙c`` with reset applied to ``h·W_hc``; LSTM with
  peephole connections; Vanilla with tanh), with learned initial states
  (``learn_init=True``, recurrent_layers.py:91-92).

Parameter layout per layer (pytree dict):
  ``W_in  [D_in or n_ids, G*H]`` — input weights (gather table for layer 0
  in sparse mode), ``W_hid [H, G*H]``, ``b [G*H]``, ``h0 [H]``
  (+ ``c0 [H]``, ``w_ci/w_cf/w_co [H]`` for LSTM).
Gate order: GRU (reset, update, candidate); LSTM (in, forget, cell, out).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.ops.core import gather_sum, maybe_grad_clip

GATE_COUNT = {"GRU": 3, "LSTM": 4, "Vanilla": 1}


def _pallas_available() -> bool:
    """Fused Pallas kernels run on TPU only (XLA scan elsewhere)."""
    import os

    if os.environ.get("SEQREC_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def train_kernel_engages(tower: str, B: int, H: int) -> bool:
    """Whether the fused custom-VJP train scan runs for this shape —
    the SINGLE source of truth for the gating also applied inside
    ``apply`` (VMEM fit + measured win regions + platform); bench.py
    reports it per matrix row."""
    if not _pallas_available():
        return False
    Hp = -(-H // 64) * 64
    G = 4 if tower == "LSTM" else 3
    if tower == "LSTM":
        from seqrec_tpu.ops.pallas_lstm_train import lstm_train_block_b

        fits = lstm_train_block_b(B, Hp, G * Hp) is not None
        wins = Hp >= 128
    else:
        from seqrec_tpu.ops.pallas_rnn_train import train_block_b

        fits = train_block_b(B, Hp, G * Hp) is not None
        wins = Hp >= 128 or B <= 256
    return bool(fits and H == Hp and B >= 64 and wins)


def recurrent_layers_command_parser(parser) -> None:
    parser.add_argument(
        "--r_t",
        dest="recurrent_layer_type",
        choices=["LSTM", "GRU", "Vanilla"],
        help="Type of recurrent layer",
        default="GRU",
    )
    parser.add_argument(
        "--r_l", help="Layers' size, (eg: 100-50-50)", default="50", type=str
    )
    parser.add_argument("--r_bi", help="Bidirectional layers.", action="store_true")
    parser.add_argument(
        "--r_emb",
        help="Add an embedding layer before the RNN (size of the embedding; <1 disables).",
        type=int,
        default=0,
    )


def get_recurrent_layers(args) -> "RecurrentLayers":
    return RecurrentLayers(
        layer_type=args.recurrent_layer_type,
        layers=[int(x) for x in args.r_l.split("-")],
        bidirectional=args.r_bi,
        embedding_size=args.r_emb,
    )


class RecurrentLayers:
    """Configuration + init/apply for the recurrent stack."""

    def __init__(
        self,
        layer_type: str = "LSTM",
        layers=(32,),
        bidirectional: bool = False,
        embedding_size: int = 0,
        grad_clipping: float = 100,
    ):
        if layer_type not in GATE_COUNT:
            raise ValueError("Unknown layer type")
        self.layer_type = layer_type
        self.layers = list(layers)
        self.bidirectional = bidirectional
        self.embedding_size = embedding_size
        self.grad_clip = grad_clipping
        self.set_name()

    def set_name(self) -> None:
        """Filename fragment; format parity with recurrent_layers.py:28-39."""
        self.name = ""
        if self.bidirectional:
            self.name += "b" + self.layer_type + "_"
        elif self.layer_type != "LSTM":
            self.name += self.layer_type + "_"
        self.name += "gc" + str(self.grad_clip) + "_"
        if self.embedding_size > 0:
            self.name += "e" + str(self.embedding_size)
        self.name += "h" + "-".join(map(str, self.layers))

    # ------------------------------------------------------------------
    @property
    def output_size(self) -> int:
        return self.layers[-1] * (2 if self.bidirectional else 1)

    def init_params(self, rng: np.random.Generator, true_input_size: int) -> dict:
        """Build the parameter pytree (numpy; moved to device by jit).

        ``true_input_size`` is the number of sparse input ids
        (n_items + optional feature ids). Weight init follows Lasagne
        defaults: recurrent Gate weights ~ N(0, 0.1), biases 0.
        """
        G = GATE_COUNT[self.layer_type]
        params: dict = {}

        def normal(*shape):
            return rng.normal(0.0, 0.1, size=shape).astype(np.float32)

        if self.embedding_size > 0:
            # reference: EmbeddingLayer (init Normal(0.1) per Lasagne default)
            params["embedding"] = normal(true_input_size, self.embedding_size)
            first_in = self.embedding_size
            sparse_first = False
        else:
            first_in = true_input_size
            sparse_first = True
        self._sparse_first = sparse_first

        dirs = ["fwd", "bwd"] if self.bidirectional else ["fwd"]
        in_dim = first_in
        for li, h in enumerate(self.layers):
            for d in dirs:
                layer: dict = {
                    "W_in": normal(in_dim, G * h),
                    "W_hid": normal(h, G * h),
                    "b": np.zeros(G * h, dtype=np.float32),
                    "h0": np.zeros(h, dtype=np.float32),
                }
                if self.layer_type == "LSTM":
                    layer["c0"] = np.zeros(h, dtype=np.float32)
                    layer["w_ci"] = normal(h)
                    layer["w_cf"] = normal(h)
                    layer["w_co"] = normal(h)
                params[f"layer{li}_{d}"] = layer
            in_dim = h * (2 if self.bidirectional else 1)
        return params

    # ------------------------------------------------------------------
    def apply(
        self,
        params: dict,
        inputs,
        mask,
        id_mask=None,
        only_return_final: bool = True,
        fast: bool = False,
    ):
        """Run the stack.

        inputs: int32 ``[B, L, F]`` sparse feature ids (default mode), or
                float ``[B, L, D]`` dense features when the first layer is
                dense (movie-features mode).
        mask:   float ``[B, L]`` (1 = valid step).
        id_mask: optional float ``[B, L, F]`` for padded feature slots.

        Returns ``[B, H_out]`` (final state) or ``[B, L, H_out]``.
        """
        sparse = jnp.issubdtype(inputs.dtype, jnp.integer)
        if self.embedding_size > 0:
            if not sparse:
                raise ValueError("Embedding layer only works with sparse inputs")
            emb = gather_sum(params["embedding"], inputs, id_mask)  # [B, L, E]
            x, sparse = emb, False

        else:
            x = inputs

        n_layers = len(self.layers)
        for li in range(n_layers):
            last = li == n_layers - 1
            orf = only_return_final and last
            if self.bidirectional:
                f = self._run_layer(
                    params[f"layer{li}_fwd"], x, mask, id_mask, sparse, orf, False,
                    fast=fast,
                )
                b = self._run_layer(
                    params[f"layer{li}_bwd"], x, mask, id_mask, sparse, orf, True,
                    fast=fast,
                )
                x = jnp.concatenate([f, b], axis=-1)
            else:
                x = self._run_layer(
                    params[f"layer{li}_fwd"], x, mask, id_mask, sparse, orf, False,
                    fast=fast,
                )
            sparse = False  # deeper layers are densely encoded
            id_mask = None
        return x

    # ------------------------------------------------------------------
    def _run_layer(
        self, lp, x, mask, id_mask, sparse, only_return_final, backwards, fast=False
    ):
        """One unidirectional recurrent layer over time."""
        # Precompute the input contribution for every timestep at once:
        # sparse mode = the OHE gather-sum trick; dense mode = one big matmul.
        if sparse:
            x_pre = gather_sum(lp["W_in"], x, id_mask) + lp["b"]
        else:
            x_pre = (
                jnp.einsum(
                    "bld,dg->blg", x, lp["W_in"], preferred_element_type=jnp.float32
                )
                + lp["b"]
            )
        x_pre = maybe_grad_clip(x_pre, self.grad_clip)

        # Fused Pallas time scans on TPU. ``fast=True`` = forward-only
        # (eval/serving); ``fast="train"`` = the custom-VJP variant whose
        # backward recomputes gates and applies the Lasagne-parity
        # hidden-cotangent clip.
        #
        # Gating, from v5e device-trace measurements (see the tables in
        # ops/pallas_rnn.py and ops/pallas_rnn_train.py):
        #  - eval (fast=True): ALWAYS fused for GRU/LSTM; ragged hidden
        #    sizes (the reference's H=50) are zero-padded to the 64-lane
        #    boundary inside the fused path (2.6x XLA at H=50->64,
        #    2x at H=128, 1.8x LSTM H=128);
        #  - train: GRU at lane-aligned H (the pad overhead makes
        #    padded-H training a wash, 0.95x) and B >= 64 (batch tiles
        #    are 128-wide); LSTM train at H >= 128 (custom-VJP kernel);
        #  - bidirectional towers take the SAME fused paths: a backwards
        #    scan is the forward kernel on time-flipped inputs (flip
        #    applied below once a kernel is selected);
        #  - Vanilla stays on the XLA scan by design: its cell is ONE
        #    [B,H]x[H,H] matmul + tanh, which XLA already emits as a
        #    single fused step — the Pallas win on GRU/LSTM comes from
        #    fusing 3-4 gate nonlinearities around one big matmul and
        #    keeping the carry VMEM-resident, a structure Vanilla
        #    doesn't have (and no reference workload defaults to it);
        #  - either: fall back to XLA when the x_pre block cannot fit
        #    VMEM even at the minimum 128-row tile (auto_block_b None).
        if (
            fast
            and only_return_final
            and self.layer_type in ("GRU", "LSTM")
            and _pallas_available()
        ):
            from seqrec_tpu.ops.pallas_rnn import auto_block_b, pad_gate_sections

            B, L = x_pre.shape[0], x_pre.shape[1]
            H = lp["h0"].shape[0]
            Hp = -(-H // 64) * 64
            n_gates = 4 if self.layer_type == "LSTM" else 3
            if fast == "train":
                # the train kernels stream time in chunks, so their VMEM
                # gate is the backward footprint, not the full-L block.
                # Measured win regions (v5e device traces, us/grad):
                # GRU H=128: 1.44x at B=256, 1.22x e2e at B=1024; H=64:
                # 1.43x at B=256 but 0.74x at B=1024. LSTM: 1.37x
                # (B=256) / 1.59x (B=1024) at H=128; 0.72x at H=64 —
                # small hidden sizes stay on XLA. Single source of
                # truth: train_kernel_engages (bench.py reports it).
                engaged = train_kernel_engages(self.layer_type, B, H)
            else:
                engaged = auto_block_b(B, L, n_gates * Hp) is not None
            if engaged:
                if backwards:
                    # a backwards final state IS the forward kernel's
                    # final state on the time-flipped inputs; the flip is
                    # a cheap XLA op whose VJP (another flip) wraps the
                    # kernel's custom VJP transparently, so fused eval
                    # AND fused train cover the bidirectional towers
                    x_pre = jnp.flip(x_pre, axis=1)
                    mask = jnp.flip(mask, axis=1)
                h0 = jnp.broadcast_to(lp["h0"], (B, H))
                if self.layer_type == "LSTM":
                    c0 = jnp.broadcast_to(lp["c0"], (B, H))
                    peep = jnp.stack([lp["w_ci"], lp["w_cf"], lp["w_co"]])
                    if fast == "train":
                        from seqrec_tpu.ops.pallas_lstm_train import lstm_scan_train

                        # NB: the cell clips x+h·W jointly (_lstm_step),
                        # and x_pre was already clipped above — matching
                        # the XLA path, the kernel clip covers the rest
                        return lstm_scan_train(
                            x_pre, mask, lp["W_hid"], peep, h0, c0,
                            float(self.grad_clip),
                        )
                    from seqrec_tpu.ops.pallas_rnn import lstm_scan

                    if H != Hp:
                        x_p, w_p, peep, h0, c0 = pad_gate_sections(
                            H, Hp, x_pre, lp["W_hid"], peep, h0, c0
                        )
                        return lstm_scan(x_p, mask, w_p, peep, h0, c0)[:, :H]
                    return lstm_scan(x_pre, mask, lp["W_hid"], peep, h0, c0)
                if fast == "train":
                    from seqrec_tpu.ops.pallas_rnn_train import gru_scan_train

                    return gru_scan_train(
                        x_pre, mask, lp["W_hid"], h0, float(self.grad_clip)
                    )
                from seqrec_tpu.ops.pallas_rnn import gru_scan

                if H != Hp:
                    x_p, w_p, h0 = pad_gate_sections(
                        H, Hp, x_pre, lp["W_hid"], h0
                    )
                    return gru_scan(x_p, mask, w_p, h0)[:, :H]
                return gru_scan(x_pre, mask, lp["W_hid"], h0)

        B = x_pre.shape[0]
        if backwards:
            x_pre = jnp.flip(x_pre, axis=1)
            mask_t = jnp.flip(mask, axis=1)
        else:
            mask_t = mask

        xs = (jnp.swapaxes(x_pre, 0, 1), jnp.swapaxes(mask_t, 0, 1)[..., None])

        h0 = jnp.broadcast_to(lp["h0"], (B, lp["h0"].shape[0]))
        if self.layer_type == "LSTM":
            c0 = jnp.broadcast_to(lp["c0"], (B, lp["c0"].shape[0]))
            carry0 = (h0, c0)
            step = partial(self._lstm_step, lp)
        elif self.layer_type == "GRU":
            carry0 = h0
            step = partial(self._gru_step, lp)
        else:
            carry0 = h0
            step = partial(self._vanilla_step, lp)

        def scan_fn(carry, inp):
            new_carry = step(carry, inp[0], inp[1])
            out = new_carry[0] if self.layer_type == "LSTM" else new_carry
            return new_carry, (None if only_return_final else out)

        if fast == "train":
            # remat the cell: scan-of-AD stores every per-step
            # intermediate (gates, pre-activations — ~4 [B, G] tensors
            # per timestep), which at B=8192/H=256 made the XLA tower
            # scan the largest single step component (32.6 ms of a 90
            # ms step, device trace 2026-08-21). Recomputing the gates
            # from (h_{t-1}, x_t) in the backward costs one extra
            # [B,H]x[H,G] matmul per step — the same trade the fused
            # Pallas train kernels make — and cuts the residual stream
            # to the carry alone. Gated on the residual volume: at
            # small shapes the recompute costs more than the cached
            # residuals save (measured -5% on the GRU-50/B=256 parity
            # config vs +8..23% at the 10^5-catalog matrix shapes).
            L_steps = x_pre.shape[1]
            G_width = x_pre.shape[-1]
            resid_bytes = 4 * B * L_steps * G_width * 4
            if resid_bytes > 128e6:
                # prevent_cse=False: under lax.scan the CSE barrier is
                # unnecessary (documented) and would block fusing the
                # recomputed gate chain with its matmul
                scan_fn = jax.checkpoint(scan_fn, prevent_cse=False)

        carry, ys = jax.lax.scan(scan_fn, carry0, xs)
        if only_return_final:
            return carry[0] if self.layer_type == "LSTM" else carry
        ys = jnp.swapaxes(ys, 0, 1)  # [B, L, H]
        if backwards:
            ys = jnp.flip(ys, axis=1)
        return ys

    # ------------------------------------------------------------------
    # cell steps; m is [B, 1], masked steps keep previous state
    # (sparse_lstm.py:417-425)
    # ------------------------------------------------------------------
    def _gru_step(self, lp, h, x_pre, m):
        H = h.shape[-1]
        hid = maybe_grad_clip(
            jnp.dot(h, lp["W_hid"], preferred_element_type=jnp.float32),
            self.grad_clip,
        )
        r = jax.nn.sigmoid(x_pre[:, :H] + hid[:, :H])
        u = jax.nn.sigmoid(x_pre[:, H : 2 * H] + hid[:, H : 2 * H])
        c = jnp.tanh(x_pre[:, 2 * H :] + r * hid[:, 2 * H :])
        h_new = (1.0 - u) * h + u * c
        return jnp.where(m > 0, h_new, h)

    def _lstm_step(self, lp, carry, x_pre, m):
        h, c = carry
        H = h.shape[-1]
        pre = x_pre + jnp.dot(h, lp["W_hid"], preferred_element_type=jnp.float32)
        pre = maybe_grad_clip(pre, self.grad_clip)
        i = jax.nn.sigmoid(pre[:, :H] + c * lp["w_ci"])
        f = jax.nn.sigmoid(pre[:, H : 2 * H] + c * lp["w_cf"])
        g = jnp.tanh(pre[:, 2 * H : 3 * H])
        c_new = f * c + i * g
        o = jax.nn.sigmoid(pre[:, 3 * H :] + c_new * lp["w_co"])
        h_new = o * jnp.tanh(c_new)
        keep = m > 0
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c))

    def _vanilla_step(self, lp, h, x_pre, m):
        pre = x_pre + jnp.dot(h, lp["W_hid"], preferred_element_type=jnp.float32)
        pre = maybe_grad_clip(pre, self.grad_clip)
        h_new = jnp.tanh(pre)
        return jnp.where(m > 0, h_new, h)
