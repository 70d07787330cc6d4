"""Stacked denoising autoencoder over bag-of-items inputs.

TPU-first re-design of
/root/reference/neural_networks/stacked_denoising_autoencoder.py:21-160:
multi-hot item vector in → dense stack with dropout → sigmoid catalog
output; MSE against the full (un-dropped) one-hot. Input denoising drops
items from the bag in the batch generator (stacked_denoising_autoencoder.py:143).

Only padded item-id lists cross the host→device boundary; the dense
one-hot input/target vectors are materialized on device by scatters
(fused by XLA), instead of the reference's host-side ``[B, n_items]``
numpy assembly.

Divergence: the reference's batch generator yields after every sequence,
re-yielding half-filled batch buffers (stacked_denoising_autoencoder.py:139-149);
here every batch is full.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops.core import pad_bucket


def _bucket(n: int) -> int:
    return pad_bucket(n, floor=16)


class StackedDenoisingAutoencoder(RNNBase):
    lazy_table_ok = False  # dense multi-hot input, no gather table

    def __init__(self, layers=(20,), input_dropout=0.2, dropout=0.5, **kwargs):
        super().__init__(**kwargs)
        self.layers = list(layers)
        self.input_dropout = input_dropout
        self.dropout = dropout
        self.name = "Stacked Denoising Autoencoder"
        self._dropout_seed = 0

    def _get_model_filename(self, epochs) -> str:
        filename = "sda_bs" + str(self.batch_size) + "_ne" + str(epochs)
        filename += "_h" + "-".join(map(str, self.layers))
        filename += "_" + self.updater.name
        if not self.use_ratings_features:
            filename += "_nf"
        if self.use_ratings_features:
            filename += "_rf"
        return filename

    # ------------------------------------------------------------------
    def _prepare_networks(self, n_items: int) -> None:
        self.n_items = n_items

    def _input_size(self) -> int:
        return self.n_items

    def _init_params(self) -> dict:
        rng = self.rng
        params: dict = {}
        in_dim = self.n_items
        for li, h in enumerate(self.layers):
            limit = np.sqrt(6.0 / (in_dim + h))
            params[f"W{li}"] = rng.uniform(-limit, limit, size=(in_dim, h)).astype(
                np.float32
            )
            params[f"b{li}"] = np.zeros(h, dtype=np.float32)
            in_dim = h
        limit = np.sqrt(6.0 / (in_dim + self.n_items))
        params["W_out"] = rng.uniform(
            -limit, limit, size=(in_dim, self.n_items)
        ).astype(np.float32)
        params["b_out"] = np.zeros(self.n_items, dtype=np.float32)
        return params

    # ------------------------------------------------------------------
    def _bag(self, ids, mask):
        """[B, L] padded ids (+mask) → multi-hot [B, n_items] on device."""
        B = ids.shape[0]
        n1 = self.n_items + 1  # extra column swallows padded ids
        bag = jnp.zeros((B, n1), jnp.float32)
        safe = jnp.where(mask > 0, ids, self.n_items)
        bag = bag.at[jnp.arange(B)[:, None], safe].set(1.0)
        return bag[:, : self.n_items]

    def _forward(self, params, x, dropout_key=None):
        h = x
        for li in range(len(self.layers)):
            # DenseLayer default nonlinearity is rectify (lasagne)
            h = jax.nn.relu(h @ params[f"W{li}"] + params[f"b{li}"])
            if dropout_key is not None and self.dropout:
                dropout_key, sub = jax.random.split(dropout_key)
                keep = jax.random.bernoulli(sub, 1.0 - self.dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)
        return jax.nn.sigmoid(h @ params["W_out"] + params["b_out"])

    def _loss(self, params, batch):
        x = self._bag(batch["x_ids"], batch["x_mask"])
        y = self._bag(batch["y_ids"], batch["y_mask"])
        key = jax.random.PRNGKey(batch["dropout_seed"])
        out = self._forward(params, x, dropout_key=key)
        return jnp.square(out - y).mean()

    def _scores(self, params, ids, id_mask, mask):
        # deterministic path: no dropout
        x = self._bag(ids[..., 0] if ids.ndim == 3 else ids, mask)
        return self._forward(params, x)

    # ------------------------------------------------------------------
    # batching: whole sequences, denoised input vs full target
    # (stacked_denoising_autoencoder.py:126-149)
    # ------------------------------------------------------------------
    def _fast_batching_ok(self) -> bool:
        return False  # SDAE has its own bag-of-items batch layout
    def _encode_bag(self, seq_lists, pad):
        B = len(seq_lists)
        ids = np.zeros((B, pad), dtype=np.int32)
        mask = np.zeros((B, pad), dtype=np.float32)
        for i, items in enumerate(seq_lists):
            items = items[:pad]
            ids[i, : len(items)] = items
            mask[i, : len(items)] = 1.0
        return ids, mask

    def _gen_mini_batch(self, sequence_generator, test=False, **kwargs):
        while True:
            if test:
                sequence, user_id = next(sequence_generator)
                half = len(sequence) // 2
                seq_items = [i[0] for i in sequence[:half]]
                pad = _bucket(len(seq_items))
                x_ids, x_mask = self._encode_bag([seq_items], pad)
                yield {"ids": x_ids, "mask": x_mask}, [
                    i[0] for i in sequence[half:]
                ]
                continue

            xs, ys = [], []
            for _ in range(self.batch_size):
                sequence, user_id = next(sequence_generator)
                items = [i[0] for i in sequence]
                xs.append(
                    [i for i in items if self.rng.random() >= self.input_dropout]
                )
                ys.append(items)
            pad = _bucket(max(1, max(len(y) for y in ys)))
            x_ids, x_mask = self._encode_bag(xs, pad)
            y_ids, y_mask = self._encode_bag(ys, pad)
            self._dropout_seed += 1
            yield {
                "x_ids": x_ids,
                "x_mask": x_mask,
                "y_ids": y_ids,
                "y_mask": y_mask,
                "dropout_seed": np.int32(self._dropout_seed),
            }

    # eval encoding: the SDAE consumes the ENTIRE first half of the
    # sequence as an order-free bag (stacked_denoising_autoencoder.py:147-149)
    # — never truncated to the timestep models' max_length. Used by both
    # the staged batched eval (base._stage_eval_inputs) and the single-user
    # predict path; ids keep a trailing feature axis so the shared compact
    # wire (base.topk_wire_fn) can rebuild masks/seen-ids unchanged.
    def _encode_sequences(self, seqs, user_ids=None):
        pad = _bucket(max(1, max(len(s) for s in seqs)))
        items = [[int(x[0]) for x in s] for s in seqs]
        ids, mask = self._encode_bag(items, pad)
        return ids[..., None], None, mask

    def _input_window(self, sequence):
        return sequence

    # batched eval: input = first-half bag, goal = suffix
    def _iter_test_instances(self, sequence_generator):
        for sequence, user_id in sequence_generator:
            half = len(sequence) // 2
            if half == 0:
                continue
            goal = [i[0] for i in sequence[half:]]
            yield sequence[:half], goal, user_id
