"""RNN with multi-target margin losses (hinge / logit / logsig).

TPU-first re-design of /root/reference/neural_networks/rnn_margin.py:13-161.
The reference assembles dense per-example target (``Y``) and weight
matrices ``[B, n_items]`` on the host (rnn_margin.py:112-149); here only the
packed target/seen id arrays cross the host→device boundary and the dense
matrices are materialized on device by scatters into an ``n_items+1``-wide
buffer (the extra column swallows padded ids), fused by XLA into the loss.

Semantics preserved:
- negative weight ``w = balance·|T| / (n_items - |T| - |seq|)``
  (rnn_margin.py:134);
- targets weight −1, seen items weight 0 when interactions are unique
  (rnn_margin.py:136-139);
- default target 0, or the popularity-based
  ``min(1-p, (1-min_access)·p/min_access)`` (rnn_margin.py:151-161);
- loss sums over the catalog, mean over the batch (rnn_margin.py:61-68,109).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops import losses


class RNNMargin(RNNBase):
    # identity head: fused Pallas scoring+top-k applies at eval
    fused_eval_head = True

    def __init__(
        self,
        loss_function: str = "hinge",
        balance: float = 1.0,
        popularity_based: bool = False,
        min_access: float = 0.05,
        n_targets: int = 1,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.balance = balance
        self.popularity_based = popularity_based
        self.min_access = min_access
        self.n_targets = n_targets
        loss_function = loss_function or "hinge"
        if loss_function not in losses.MARGIN_LOSSES:
            raise ValueError("Unknown loss function")
        self.loss_function_name = loss_function
        self.name = "RNN multi-targets"

    def _get_model_filename(self, epochs) -> str:
        filename = (
            "rnn_multitarget_" + self.loss_function_name + "_b" + str(self.balance)
        )
        if self.popularity_based:
            filename += "_pb_ma" + str(self.min_access)
        return filename + "_" + self._common_filename(epochs)

    # ------------------------------------------------------------------
    def _prepare_networks(self, n_items: int) -> None:
        self.n_items = n_items

    def set_dataset(self, dataset) -> None:
        super().set_dataset(dataset)
        if self.popularity_based:
            num_users = dataset.training_set.n_users
            view_prob = dataset.item_popularity / num_users
            self._default_target = np.minimum(
                1 - view_prob, (1 - self.min_access) * view_prob / self.min_access
            ).astype(np.float32)
        else:
            self._default_target = np.zeros(self.n_items, dtype=np.float32)

    def _init_params(self) -> dict:
        rng = self.rng
        tower = self.recurrent_layer.init_params(rng, self._input_size())
        h_out = self.recurrent_layer.output_size
        limit = np.sqrt(6.0 / (h_out + self.n_items))
        return {
            "tower": tower,
            "W_out": rng.uniform(-limit, limit, size=(h_out, self.n_items)).astype(
                np.float32
            ),
            "b_out": np.zeros(self.n_items, dtype=np.float32),
        }

    # ------------------------------------------------------------------
    def _use_streaming_head(self) -> bool:
        """Large catalogs route the margin loss through the chunked-scan
        op (ops/streaming_margin.py): the [B, n_items] Y/Wt/prediction
        matrices never reach HBM — the same memory bound the streaming
        CCE removed from the one-hot head. SEQREC_NO_STREAMING_MARGIN=1
        pins the dense path (bench controls)."""
        import os

        from seqrec_tpu.ops.streaming_margin import STREAMING_MARGIN_MIN_ITEMS

        if os.environ.get("SEQREC_NO_STREAMING_MARGIN"):
            return False
        return self.n_items >= STREAMING_MARGIN_MIN_ITEMS

    def _loss(self, params, batch):
        if self._use_streaming_head():
            return self._streaming_loss(params, batch)
        h = self.recurrent_layer.apply(
            params["tower"], batch["ids"], batch["mask"], batch.get("id_mask"),
            fast="train",
        )
        predictions = self._out_matmul(h, params["W_out"], params["b_out"])
        B = predictions.shape[0]
        n1 = self.n_items + 1  # extra column swallows padded scatter ids
        b_idx = jnp.arange(B)[:, None]

        tgt_ids = batch["target_ids"]  # [B, T], padded slots point at n_items
        seen_ids = batch["seen_ids"]  # [B, L], padded slots point at n_items

        t_count = batch["t_count"]  # [B] float
        seq_len = batch["mask"].sum(axis=1)
        w_neg = self.balance * t_count / (self.n_items - t_count - seq_len)

        # default_target is a per-model constant ([n_items], set at
        # prepare time); capture it in the jit instead of shipping it
        # over the device link with every batch
        default_target = batch.get("default_target")
        if default_target is None:
            default_target = jnp.asarray(self._default_target)
        Y = jnp.broadcast_to(
            jnp.concatenate([default_target, jnp.zeros((1,), jnp.float32)]),
            (B, n1),
        )
        Y = Y.at[b_idx, tgt_ids].set(1.0)
        W = jnp.broadcast_to(w_neg[:, None], (B, n1))
        W = W.at[b_idx, tgt_ids].set(-1.0)
        if self.interactions_are_unique:
            Y = Y.at[b_idx, seen_ids].set(0.0)
            W = W.at[b_idx, seen_ids].set(0.0)

        loss = losses.MARGIN_LOSSES[self.loss_function_name](
            predictions, Y[:, : self.n_items], W[:, : self.n_items]
        )
        return loss.mean()

    def _streaming_loss(self, params, batch):
        from seqrec_tpu.ops.streaming_margin import (
            pick_chunk,
            sharded_streaming_margin,
            streaming_margin,
        )

        h = self.recurrent_layer.apply(
            params["tower"], batch["ids"], batch["mask"], batch.get("id_mask"),
            fast="train",
        )
        t_count = batch["t_count"]
        seq_len = batch["mask"].sum(axis=1)
        w_neg = self.balance * t_count / (self.n_items - t_count - seq_len)
        default_target = batch.get("default_target")
        if default_target is None:
            default_target = jnp.asarray(self._default_target)
        if self.mesh is not None and self.n_items % self.mesh.shape["model"] == 0:
            per_ex = sharded_streaming_margin(
                h, params["W_out"], params["b_out"], batch["target_ids"],
                batch["seen_ids"], w_neg, default_target, self.mesh,
                self.loss_function_name, self.interactions_are_unique,
                compute_dtype=self.compute_dtype,
            )
        else:
            per_ex = streaming_margin(
                h, params["W_out"], params["b_out"], batch["target_ids"],
                batch["seen_ids"], w_neg, default_target,
                self.loss_function_name, self.interactions_are_unique,
                pick_chunk(self.n_items), self.compute_dtype,
            )
        return per_ex.mean()

    def _scores(self, params, ids, id_mask, mask):
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        return self._out_matmul(h, params["W_out"], params["b_out"])

    def _finalize_packed_batch(self, packed, target_ratings):
        B = len(packed["targets"])
        packed["target_ids"] = packed["targets"].reshape(B, 1)
        packed["t_count"] = np.ones(B, dtype=np.float32)
        packed["seen_ids"] = np.where(
            packed["mask"] > 0, packed["ids"][:, :, 0], self.n_items
        ).astype(np.int32)
        del packed["targets"]
        return packed

    # index wire: every margin batch field (single-target ids, counts,
    # seen-item sets) derives on device from (store, rows, cuts)
    index_wire_ok = True

    def _expand_index_wire(self, batch, store):
        import jax.numpy as jnp

        out = super()._expand_index_wire(batch, store)
        B = out["targets"].shape[0]
        out["target_ids"] = out["targets"].reshape(B, 1)
        out["t_count"] = jnp.ones(B, jnp.float32)
        out["seen_ids"] = jnp.where(
            out["mask"] > 0, out["ids"][:, :, 0], self.n_items
        ).astype(jnp.int32)
        del out["targets"], out["target_pop"]
        return out

    # ------------------------------------------------------------------
    def _prepare_input(self, sequences):
        ids, id_mask, mask = self._encode_sequences(
            [s[1] for s in sequences], user_ids=[s[0] for s in sequences]
        )
        B = len(sequences)
        T = max(1, self.target_selection.n_targets)
        target_ids = np.full((B, T), self.n_items, dtype=np.int32)
        t_count = np.zeros(B, dtype=np.float32)
        seen_ids = np.full((B, self.max_length), self.n_items, dtype=np.int32)
        for i, (user_id, in_seq, target) in enumerate(sequences):
            t = [int(x[0]) for x in target[:T]]
            target_ids[i, : len(t)] = t
            t_count[i] = len(t)
            s = [int(x[0]) for x in in_seq[: self.max_length]]
            seen_ids[i, : len(s)] = s
        batch = {
            "ids": ids,
            "mask": mask,
            "target_ids": target_ids,
            "t_count": t_count,
            "seen_ids": seen_ids,
            "default_target": self._default_target,
        }
        if id_mask is not None:
            batch["id_mask"] = id_mask
        return batch
