"""RNN with sampled losses (BPR / TOP1 / Blackout).

TPU-first re-design of /root/reference/neural_networks/rnn_sampling.py:14-194
and the BlackoutLayer (sparse_lstm.py:23-56): at train time only the columns
of the output table belonging to the batch targets and to ``S`` shared
negative samples are scored — a gather of ``B+S`` rows of ``W_out^T``
followed by one ``[B,H]·[H,B+S]`` matmul, instead of the full-catalog
matmul. The diagonal of the left ``[B,B]`` block scores each example's own
target (rnn_sampling.py:137 uses ``arange(B)`` as CCE targets).

Sampling happens host-side per batch: uniform over the catalog, or
popularity-biased ``pop^sampling_bias`` via cumsum + searchsorted
(rnn_sampling.py:159-163,188-191). Deterministic test scores apply a softmax
over the full catalog (rnn_sampling.py:140-157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops import losses


class RNNSampling(RNNBase):
    # softmax head: fused Pallas scoring+top-k applies at eval
    fused_eval_head = True

    def __init__(
        self,
        loss_function: str = "Blackout",
        sampling=32,
        last_layer_tanh: bool = False,
        last_layer_init: float = 1.0,
        diversity_bias: float = 0.0,
        sampling_bias: float = 0.0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.last_layer_init = last_layer_init
        self.last_layer_tanh = last_layer_tanh
        self.diversity_bias = float(diversity_bias)
        self.sampling = sampling
        self.sampling_bias = sampling_bias
        loss_function = loss_function or "Blackout"
        if loss_function not in losses.SAMPLED_LOSSES:
            raise ValueError("Unknown loss function")
        self.loss_function_name = loss_function
        self.name = "RNN with sampling loss"

    def _get_model_filename(self, epochs) -> str:
        filename = "rnn_sampling_" + self.loss_function_name + "_"
        if self.sampling_bias > 0.0:
            filename += "p" + str(self.sampling_bias)
        filename += (
            "s"
            + str(self.sampling)
            + "_ini"
            + str(self.last_layer_init)
            + "_db"
            + str(self.diversity_bias)
        )
        return filename + "_" + self._common_filename(epochs)

    # ------------------------------------------------------------------
    def _prepare_networks(self, n_items: int) -> None:
        self.n_items = n_items
        if self.sampling < 1:
            self.effective_sampling = int(self.sampling * n_items)
        else:
            self.effective_sampling = int(self.sampling)

    def _init_params(self) -> dict:
        rng = self.rng
        tower = self.recurrent_layer.init_params(rng, self._input_size())
        h_out = self.recurrent_layer.output_size
        limit = self.last_layer_init * np.sqrt(6.0 / (h_out + self.n_items))
        return {
            "tower": tower,
            "W_out": rng.uniform(-limit, limit, size=(h_out, self.n_items)).astype(
                np.float32
            ),
            "b_out": np.zeros(self.n_items, dtype=np.float32),
        }

    # ------------------------------------------------------------------
    def _loss(self, params, batch):
        h = self.recurrent_layer.apply(
            params["tower"], batch["ids"], batch["mask"], batch.get("id_mask"),
            fast="train",
        )
        cols = jnp.concatenate([batch["targets"], batch["samples"]])
        w_cols = jnp.take(params["W_out"], cols, axis=1)
        b_cols = jnp.take(params["b_out"], cols)
        scores = jnp.dot(h, w_cols, preferred_element_type=jnp.float32) + b_cols
        if self.last_layer_tanh and self.loss_function_name != "Blackout":
            scores = jnp.tanh(scores)
        B = batch["targets"].shape[0]
        per_example = losses.SAMPLED_LOSSES[self.loss_function_name](scores, B)
        return (per_example / batch["target_pop"]).mean()

    def _scores(self, params, ids, id_mask, mask):
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        logits = self._out_matmul(h, params["W_out"], params["b_out"])
        return jax.nn.softmax(logits, axis=-1)

    def _rank_scores(self, params, ids, id_mask, mask):
        # ranking raw logits == ranking the softmax (base._rank_scores)
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        return self._out_matmul(h, params["W_out"], params["b_out"])

    # ------------------------------------------------------------------
    def _draw_samples(self) -> np.ndarray:
        if self.sampling_bias > 0:
            if not hasattr(self, "_cumsum"):
                self._cumsum = np.cumsum(
                    np.power(self.dataset.item_popularity, self.sampling_bias)
                )
            u = self.rng.uniform(0, self._cumsum[-1], size=self.effective_sampling)
            return np.searchsorted(self._cumsum, u, side="right").astype(np.int32)
        return self.rng.choice(self.n_items, self.effective_sampling).astype(np.int32)

    def _finalize_packed_batch(self, packed, target_ratings):
        packed["target_pop"] = (
            self.dataset.item_popularity[packed["targets"]] ** self.diversity_bias
        ).astype(np.float32)
        packed["samples"] = self._draw_samples()
        return packed

    def _restack_wire(self, batch, n_stack):
        out = super()._restack_wire(batch, n_stack)
        # negative samples are shared within one optimizer step but must
        # be fresh across the K fused steps
        out["samples"] = np.stack(
            [np.asarray(batch["samples"])]
            + [self._draw_samples() for _ in range(n_stack - 1)]
        )
        return out

    # index wire: the batch derives on device from (store, rows, cuts)
    # plus the host-drawn negative-sample sets shipped as an extra
    index_wire_ok = True

    def _resolve_lazy_specs(self):
        """Sampled losses score ONLY the target+sample columns, so the
        head gradient is column-sparse: ~B+S of n_items columns per
        step. --lazy_updates therefore moves the HEAD (W_out columns +
        b_out entries) onto the lazy path — where the touched set is
        ~1k slices, the sparse update wins (unlike the ~30k-row input
        table, which measured slower lazy; BASELINE.md). The input
        table keeps dense Adam."""
        if self._resolve_lazy_path() is None:
            return None

        def cols(batch):
            return jnp.concatenate([batch["targets"], batch["samples"]])

        return [
            {"path": ("W_out",), "axis": 1, "ids": cols},
            {"path": ("b_out",), "axis": 0, "ids": cols},
        ]

    def _index_payload_extras(self, k):
        # always [k, S]: a stacked K=1 dispatch still scans the k axis
        return {"samples": np.stack([self._draw_samples() for _ in range(k)])}

    def _prepare_input(self, sequences):
        ids, id_mask, mask = self._encode_sequences(
            [s[1] for s in sequences], user_ids=[s[0] for s in sequences]
        )
        targets = np.array([s[2][0][0] for s in sequences], dtype=np.int32)
        pop = (
            self.dataset.item_popularity[targets] ** self.diversity_bias
        ).astype(np.float32)
        batch = {
            "ids": ids,
            "mask": mask,
            "targets": targets,
            "target_pop": pop,
            "samples": self._draw_samples(),
        }
        if id_mask is not None:
            batch["id_mask"] = id_mask
        return batch
