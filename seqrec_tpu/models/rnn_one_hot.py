"""RNN with full-catalog categorical cross-entropy (the parity flagship).

Re-designs /root/reference/neural_networks/rnn_one_hot.py:13-106 TPU-first:
the recurrent tower feeds a dense output layer over the whole catalog and
the per-example CCE is divided by ``target_popularity^diversity_bias``
(rnn_one_hot.py:71,103). The output matmul ``[B,H]·[H,n_items]`` is the
dominant FLOP cost and is exactly the shape XLA tiles onto the MXU; under
pjit the ``W_out`` columns shard over the mesh "model" axis and the
log-sum-exp reduces with a psum.

Regularization applies to the output bias only, L2 for positive values and
L1 for negative ones (rnn_one_hot.py:73-78).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops import losses


class RNNOneHot(RNNBase):
    def __init__(self, diversity_bias: float = 0.0, regularization: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        self.diversity_bias = float(diversity_bias)
        self.regularization = float(regularization)
        self.name = "RNN with categorical cross entropy"

    def _get_model_filename(self, epochs) -> str:
        return (
            "rnn_cce_db"
            + str(self.diversity_bias)
            + "_r"
            + str(self.regularization)
            + "_"
            + self._common_filename(epochs)
        )

    # ------------------------------------------------------------------
    def _prepare_networks(self, n_items: int) -> None:
        self.n_items = n_items

    def _init_params(self) -> dict:
        rng = self.rng
        tower = self.recurrent_layer.init_params(rng, self._input_size())
        h_out = self.recurrent_layer.output_size
        # DenseLayer defaults: GlorotUniform W, zero b
        limit = np.sqrt(6.0 / (h_out + self.n_items))
        return {
            "tower": tower,
            "W_out": rng.uniform(-limit, limit, size=(h_out, self.n_items)).astype(
                np.float32
            ),
            "b_out": np.zeros(self.n_items, dtype=np.float32),
        }

    # ------------------------------------------------------------------
    def _logits(self, params, ids, id_mask, mask, fast=False):
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=fast)
        return self._out_matmul(h, params["W_out"], params["b_out"])

    def _use_streaming_head(self) -> bool:
        """Large catalogs route the training loss through the streaming
        (flash-style) CCE: the [B, n_items] logit matrix never reaches
        HBM (ops/streaming_cce.py — the measured memory bound at
        10^5-item catalogs). Under a mesh with W_out column-sharded, the
        sharded composition scans each shard's column slice and psums
        the online LSE stats (ops/streaming_cce.sharded_streaming_cce);
        a catalog that does not divide the model axis leaves W_out
        replicated (parallel.mesh.param_sharding) and the plain op runs
        data-parallel under GSPMD. SEQREC_NO_STREAMING_CCE=1 pins the
        dense path (bench controls)."""
        import os

        from seqrec_tpu.ops.streaming_cce import STREAMING_CCE_MIN_ITEMS

        if os.environ.get("SEQREC_NO_STREAMING_CCE"):
            return False
        return self.n_items >= STREAMING_CCE_MIN_ITEMS

    def _loss(self, params, batch):
        if self._use_streaming_head():
            from seqrec_tpu.ops.streaming_cce import (
                pick_chunk,
                sharded_streaming_cce,
                streaming_cce,
            )

            h = self.recurrent_layer.apply(
                params["tower"], batch["ids"], batch["mask"],
                batch.get("id_mask"), fast="train",
            )
            if (
                self.mesh is not None
                and self.n_items % self.mesh.shape["model"] == 0
            ):
                per_ex = sharded_streaming_cce(
                    h, params["W_out"], params["b_out"], batch["targets"],
                    self.mesh, compute_dtype=self.compute_dtype,
                )
            else:
                # static args passed positionally: custom_vjp's
                # nondiff_argnums binds by position
                per_ex = streaming_cce(
                    h, params["W_out"], params["b_out"], batch["targets"],
                    pick_chunk(self.n_items), self.compute_dtype,
                )
            cost = (per_ex / batch["target_pop"]).mean()
        else:
            logits = self._logits(
                params, batch["ids"], batch.get("id_mask"), batch["mask"],
                fast="train",
            )
            cost = losses.diversity_biased_cce(
                logits, batch["targets"], batch["target_pop"]
            )
        if self.regularization > 0.0:
            cost = cost + self.regularization * jnp.sum(jnp.square(params["b_out"]))
        elif self.regularization < 0.0:
            cost = cost - self.regularization * jnp.sum(jnp.abs(params["b_out"]))
        return cost

    def _scores(self, params, ids, id_mask, mask):
        # deterministic output = softmax over the catalog (rnn_one_hot.py:65)
        return jax.nn.softmax(self._logits(params, ids, id_mask, mask, fast=True), axis=-1)

    def _rank_scores(self, params, ids, id_mask, mask):
        # ranking raw logits == ranking the softmax (base._rank_scores)
        return self._logits(params, ids, id_mask, mask, fast=True)

    def _finalize_packed_batch(self, packed, target_ratings):
        packed["target_pop"] = (
            self.dataset.item_popularity[packed["targets"]] ** self.diversity_bias
        ).astype(np.float32)
        return packed

    # the whole CCE batch is derivable on device from (store, rows,
    # cuts): target_pop is a per-item table lookup (base _make_pop_db)
    index_wire_ok = True

    # softmax head: ranking raw logits == ranking _scores, so the fused
    # Pallas scoring+mask+top-k kernel applies (see RNNBase._fused_topk)
    fused_eval_head = True

    # ------------------------------------------------------------------
    def _prepare_input(self, sequences):
        """sequences: list of [user_id, input_sequence, targets]
        (rnn_one_hot.py:83-106, minus the dense one-hot assembly)."""
        ids, id_mask, mask = self._encode_sequences(
            [s[1] for s in sequences], user_ids=[s[0] for s in sequences]
        )
        targets = np.array(
            [s[2][0][0] for s in sequences], dtype=np.int32
        )  # first and only target
        pop = (
            self.dataset.item_popularity[targets] ** self.diversity_bias
        ).astype(np.float32)
        batch = {"ids": ids, "mask": mask, "targets": targets, "target_pop": pop}
        if id_mask is not None:
            batch["id_mask"] = id_mask
        return batch
