"""Clustered-softmax models: RNNCluster and FISMCluster.

TPU-first re-design of /root/reference/neural_networks/rnn_cluster.py and
fism_cluster.py. Two jointly-trained objectives share one jitted step:

1. item scoring — sampled (Blackout-style) scores over the batch targets
   plus shared negative samples (rnn_cluster.py:222-228);
2. cluster assignment — a user-side cluster-selection head (scaled
   softmax over ``h·W_cs``, optional gaussian exploration noise,
   rnn_cluster.py:235-239) against a shared item-side
   ``cluster_repartition`` matrix whose membership nonlinearity depends on
   ``cluster_type`` ∈ {softmax, sigmoid, mix} (rnn_cluster.py:241-248).

Gradient partition matches the reference's two-optimizer scheme
(rnn_cluster.py:258-273): the recommendation loss only updates the
tower/output tables (the cluster loss sees a stop-gradient of the user
representation), and the cluster loss only updates ``W_cs`` and
``cluster_repartition``. The softmax/sigmoid temperature ``T_scale``
grows geometrically once per epoch up to ``max_scale``
(rnn_cluster.py:398-406) and is fed to the step as batch data.

At test time ``prepare_tests`` hardens the soft memberships into
per-cluster item lists and sliced embedding/bias arrays
(rnn_cluster.py:461-487); prediction picks the argmax cluster and scores
only its items, returning ``(recommendations, cluster_size)`` for the
ASSR metric (rnn_cluster.py:489-513).

FISMCluster replaces the recurrent tower with a FISM user representation:
the bag of input items scaled by ``1/len^alpha`` through an item-embedding
table (the reference's scipy-CSR ``SparseLayer``, fism_cluster.py:99-103,
becomes a mask-weighted gather-sum on device), with L2/L1 regularization
on all network params (fism_cluster.py:113-116) and forced target
shuffling (fism_cluster.py:42).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops import losses
from seqrec_tpu.ops.core import pad_bucket
from seqrec_tpu.utils import evaluation


def _bucket(n: int, lo: int = 16) -> int:
    return pad_bucket(n, floor=lo)


class RNNCluster(RNNBase):
    def __init__(
        self,
        n_clusters: int = 10,
        loss: str = "Blackout",
        cluster_type: str = "mix",
        sampling=100,
        cluster_sampling=-1,
        sampling_bias: float = 0.0,
        predict_with_clusters: bool = True,
        cluster_selection_noise: float = 0.0,
        init_scale: float = 1.0,
        scale_growing_rate: float = 1.0,
        max_scale: float = 50,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.n_clusters = n_clusters
        self.init_scale = float(init_scale)
        self.effective_scale = float(init_scale)
        self.scale_growing_rate = float(scale_growing_rate)
        self.max_scale = float(max_scale)
        self.cluster_type = cluster_type
        self.sampling_bias = sampling_bias
        self.loss = loss
        self.cluster_selection_noise = cluster_selection_noise
        self.predict_with_clusters = predict_with_clusters
        if loss not in losses.CLUSTER_LOSSES:
            raise ValueError("Unknown cluster loss")
        self.n_samples = int(sampling)
        self.n_cluster_samples = int(cluster_sampling)
        self._noise_seed = 0

        self.name = "RNN Cluster with categorical cross entropy"
        self.metrics = {
            "recall": {"direction": 1},
            "cluster_recall": {"direction": 1},
            "sps": {"direction": 1},
            "cluster_sps": {"direction": 1},
            "ignored_items": {"direction": -1},
            "assr": {"direction": 1},
            "cluster_use": {"direction": 1},
            "cluster_use_std": {"direction": -1},
            "cluster_size": {"direction": 1},
        }

    # ------------------------------------------------------------------
    def _get_model_filename(self, epochs) -> str:
        filename = "rnn_clusters" + str(self.n_clusters) + "_sc" + str(self.init_scale)
        if self.scale_growing_rate != 1.0:
            filename += "-" + str(self.scale_growing_rate) + "-" + str(self.max_scale)
        filename += "_"
        if self.sampling_bias > 0.0:
            filename += "p" + str(self.sampling_bias)
        filename += "s" + str(self.n_samples)
        if self.n_cluster_samples > 0:
            filename += "_"
            if self.sampling_bias > 0.0:
                filename += "p" + str(self.sampling_bias)
            filename += "cs" + str(self.n_cluster_samples)
        if self.cluster_type == "softmax":
            filename += "_softmax"
        elif self.cluster_type == "mix":
            filename += "_mix"
        if self.cluster_selection_noise > 0.0:
            filename += "_n" + str(self.cluster_selection_noise)
        filename += "_c" + self.loss
        return filename + "_" + self._common_filename(epochs)

    # ------------------------------------------------------------------
    def _prepare_networks(self, n_items: int) -> None:
        self.n_items = n_items

    def _init_params(self) -> dict:
        rng = self.rng
        tower = self.recurrent_layer.init_params(rng, self._input_size())
        h_out = self.recurrent_layer.output_size
        limit = np.sqrt(6.0 / (h_out + self.n_items))
        limit_cs = np.sqrt(6.0 / (h_out + self.n_clusters))
        return {
            "tower": tower,
            "W_out": rng.uniform(-limit, limit, size=(h_out, self.n_items)).astype(np.float32),
            "b_out": np.zeros(self.n_items, dtype=np.float32),
            "W_cs": rng.uniform(
                -limit_cs, limit_cs, size=(h_out, self.n_clusters)
            ).astype(np.float32),
            # 0.1·N(0,1) init (rnn_cluster.py:182-189)
            "cluster_repartition": (
                0.1 * rng.standard_normal((self.n_items, self.n_clusters))
            ).astype(np.float32),
        }

    # ------------------------------------------------------------------
    def _user_representation(self, params, batch):
        return self.recurrent_layer.apply(
            params["tower"], batch["ids"], batch["mask"], batch.get("id_mask"),
            fast="train",
        )

    def _membership(self, logits, scale):
        """Soft cluster membership by cluster_type (rnn_cluster.py:241-248)."""
        if self.cluster_type == "softmax":
            return jax.nn.softmax(scale * logits, axis=-1)
        if self.cluster_type == "mix":
            return jax.nn.softmax(scale * logits, axis=-1) + jax.nn.sigmoid(
                scale * logits
            )
        return jax.nn.sigmoid(scale * logits)

    def _loss(self, params, batch):
        h = self._user_representation(params, batch)
        B = batch["targets"].shape[0]
        loss_fn = losses.CLUSTER_LOSSES[self.loss]
        scale = batch["scale"]

        # objective 1: item scoring on targets + samples
        cols = jnp.concatenate([batch["targets"], batch["samples"]])
        scores = (
            jnp.dot(h, jnp.take(params["W_out"], cols, axis=1),
                    preferred_element_type=jnp.float32)
            + jnp.take(params["b_out"], cols)
        )
        cost = loss_fn(scores, B).mean()
        cost = cost + self._regularization(params)

        # objective 2: cluster assignment (tower frozen via stop_gradient)
        hc = jax.lax.stop_gradient(h)
        sel_logits = jnp.dot(hc, params["W_cs"], preferred_element_type=jnp.float32)
        if self.cluster_selection_noise > 0.0:
            key = jax.random.PRNGKey(batch["noise_seed"])
            sel_logits = sel_logits + self.cluster_selection_noise * jax.random.normal(
                key, sel_logits.shape
            )
        selection = jax.nn.softmax(scale * sel_logits, axis=-1)
        cols2 = jnp.concatenate([batch["targets"], batch["cluster_samples"]])
        membership = self._membership(params["cluster_repartition"][cols2], scale)
        cluster_score = selection @ membership.T
        cost_clusters = loss_fn(cluster_score, B).mean()

        return cost + cost_clusters

    def _regularization(self, params):
        return 0.0

    def _scores(self, params, ids, id_mask, mask):
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        logits = (
            jnp.dot(h, params["W_out"], preferred_element_type=jnp.float32)
            + params["b_out"]
        )
        return jax.nn.softmax(logits, axis=-1)

    def _cluster_assignments(self, params, ids, id_mask, mask):
        """(softmax item scores, argmax cluster, hard membership matrix)."""
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        probs = jax.nn.softmax(
            jnp.dot(h, params["W_out"], preferred_element_type=jnp.float32)
            + params["b_out"],
            axis=-1,
        )
        c_sel = jnp.argmax(
            jnp.dot(h, params["W_cs"], preferred_element_type=jnp.float32), axis=-1
        )
        hard = self._hard_clusters(params["cluster_repartition"])
        return probs, c_sel, hard

    def _hard_clusters(self, repartition):
        """100×-temperature hardening (rnn_cluster.py:275-282)."""
        if self.cluster_type == "softmax":
            return jax.nn.softmax(100.0 * repartition, axis=-1)
        if self.cluster_type == "mix":
            return jnp.clip(
                jax.nn.softmax(100.0 * repartition, axis=-1)
                + jax.nn.sigmoid(100.0 * repartition),
                0,
                1,
            )
        return jax.nn.sigmoid(100.0 * repartition)

    # ------------------------------------------------------------------
    # batching
    # ------------------------------------------------------------------
    def _popularity_samples(self, n):
        if not hasattr(self, "_cumsum"):
            self._cumsum = np.cumsum(
                np.power(self.dataset.item_popularity, self.sampling_bias)
            )
        u = self.rng.uniform(0, self._cumsum[-1], size=n)
        return np.searchsorted(self._cumsum, u, side="right").astype(np.int32)

    def _draw_sample_sets(self):
        if self.sampling_bias > 0.0:
            samples = self._popularity_samples(self.n_samples)
            cluster_samples = (
                self._popularity_samples(self.n_cluster_samples)
                if self.n_cluster_samples > 0
                else samples
            )
        else:
            samples = self.rng.choice(self.n_items, self.n_samples).astype(np.int32)
            cluster_samples = (
                self.rng.choice(self.n_items, self.n_cluster_samples).astype(np.int32)
                if self.n_cluster_samples > 0
                else samples
            )
        return samples, cluster_samples

    def _update_scale(self) -> None:
        """Geometric temperature schedule, grown at every epoch *boundary*
        (rnn_cluster.py:398-406; the documented contract at
        rnn_cluster.py:61-62 is "after each training epoch").

        The reference's literal condition (`epochs > _last_epoch + 1` with
        `_last_epoch` seeded from the first batch's fractional epoch) delays
        the first growth to ~1.5 epochs; we track floor(epochs) so each
        crossing of an integer boundary applies exactly one growth step.
        The reference also stores ``max_scale`` but never applies it
        (rnn_cluster.py:402 has no clamp); we honor the documented clamp.
        """
        epoch = int(self.dataset.training_set.epochs)
        if not hasattr(self, "_last_epoch"):
            self._last_epoch = epoch
        elif epoch > self._last_epoch and self.scale_growing_rate != 1.0:
            steps = epoch - self._last_epoch
            self.effective_scale = min(
                self.max_scale, self.effective_scale * self.scale_growing_rate ** steps
            )
            self._last_epoch = epoch
            print("New scale: ", self.effective_scale)

    def _finalize_packed_batch(self, packed, target_ratings):
        samples, cluster_samples = self._draw_sample_sets()
        self._update_scale()
        self._noise_seed += 1
        packed["samples"] = samples
        packed["cluster_samples"] = cluster_samples
        packed["scale"] = np.float32(self.effective_scale)
        packed["noise_seed"] = np.int32(self._noise_seed)
        return packed

    def _restack_wire(self, batch, n_stack):
        out = super()._restack_wire(batch, n_stack)
        # sample sets and the selection-noise seed are per optimizer
        # step: redraw/advance them for each of the K fused steps
        samples = [np.asarray(batch["samples"])]
        cluster_samples = [np.asarray(batch["cluster_samples"])]
        seeds = [np.int32(batch["noise_seed"])]
        for _ in range(n_stack - 1):
            s, cs = self._draw_sample_sets()
            self._noise_seed += 1
            samples.append(s)
            cluster_samples.append(cs)
            seeds.append(np.int32(self._noise_seed))
        out["samples"] = np.stack(samples)
        out["cluster_samples"] = np.stack(cluster_samples)
        out["noise_seed"] = np.asarray(seeds, dtype=np.int32)
        return out

    # index wire: sample sets / noise seeds / the temperature scale stay
    # host-side (same RNG + schedule call order as the packed path) and
    # ship as per-step extras; sequence fields assemble on device.
    # FISMCluster stays ineligible via its max_length=inf.
    index_wire_ok = True

    def _index_payload_extras(self, k):
        samples, cluster_samples, seeds = [], [], []
        for _ in range(k):
            s, cs = self._draw_sample_sets()
            self._noise_seed += 1
            samples.append(s)
            cluster_samples.append(cs)
            seeds.append(np.int32(self._noise_seed))
        self._update_scale()
        scale = np.float32(self.effective_scale)
        # always leading-k (a stacked K=1 dispatch still scans the axis);
        # the unstacked wire squeezes in _gen_index_mini_batch
        return {
            "samples": np.stack(samples),
            "cluster_samples": np.stack(cluster_samples),
            "scale": np.broadcast_to(scale, (k,)).copy(),
            "noise_seed": np.asarray(seeds, dtype=np.int32),
        }

    def _prepare_input(self, sequences):
        ids, id_mask, mask = self._encode_sequences(
            [s[1] for s in sequences], user_ids=[s[0] for s in sequences]
        )
        targets = np.array([s[2][0][0] for s in sequences], dtype=np.int32)
        samples, cluster_samples = self._draw_sample_sets()
        self._update_scale()
        self._noise_seed += 1
        batch = {
            "ids": ids,
            "mask": mask,
            "targets": targets,
            "samples": samples,
            "cluster_samples": cluster_samples,
            "scale": np.float32(self.effective_scale),
            "noise_seed": np.int32(self._noise_seed),
        }
        if id_mask is not None:
            batch["id_mask"] = id_mask
        return batch

    # ------------------------------------------------------------------
    # validation (cluster metric set, rnn_cluster.py:409-445), batched
    # ------------------------------------------------------------------
    def _cluster_eval_topk(self, params, ids, id_mask, mask, seen, seen_mask):
        """Device-side validation pass: instead of shipping the full
        ``[chunk, n_items]`` softmax to the host (wrong shape at 10^5
        catalogs), return only ``[chunk, 10]`` top-k ids (unrestricted
        and cluster-restricted), the argmax cluster and the used-item
        count — everything the cluster metric set needs
        (rnn_cluster.py:409-445)."""
        probs, c_sel, hard = self._cluster_assignments(params, ids, id_mask, mask)
        if self.interactions_are_unique:
            # zero the already-seen items (softmax probs are >= 0)
            b = jnp.arange(probs.shape[0])[:, None]
            safe = jnp.where(seen_mask > 0, seen, probs.shape[1])
            probs = probs.at[b, safe].set(0.0, mode="drop")
        used_rows = jnp.take(hard.T, c_sel, axis=0)  # [B, n_items]
        _, top1 = jax.lax.top_k(probs, 10)
        _, top2 = jax.lax.top_k(probs * used_rows, 10)
        return top1, top2, c_sel, used_rows.sum(axis=1)

    def _compute_validation_metrics(self, metrics):
        from seqrec_tpu.parallel import host_global

        if not hasattr(self, "_cluster_eval_jit"):
            self._cluster_eval_jit = jax.jit(self._cluster_eval_topk)
        clusters = np.zeros(self.n_clusters, dtype="int")
        used_items = []
        ev = evaluation.Evaluator(self.dataset, k=10)
        ev_clusters = evaluation.Evaluator(self.dataset, k=10)

        instances = list(
            self._iter_test_instances(self.dataset.validation_set(epochs=1))
        )
        if not instances:
            for m in self.metrics:
                metrics[m].append(0)
            return metrics
        chunk = self.eval_batch_size
        for c0 in range(0, len(instances), chunk):
            part = instances[c0 : c0 + chunk]
            seqs = [seq for seq, _, _ in part]
            users = [u for _, _, u in part]
            pad = chunk - len(part)
            ids, id_mask, mask = self._encode_sequences(
                seqs + [seqs[-1]] * pad, user_ids=users + [users[-1]] * pad
            )
            # seen-item wire: the encoded ids may be truncated to
            # max_length, but the reference masks the WHOLE input
            # sequence (rnn_cluster.py:300-302) — ship the full id lists
            S = max(1, max(len(s) for s in seqs))
            seen = np.zeros((chunk, S), dtype=np.int32)
            seen_mask = np.zeros((chunk, S), dtype=np.float32)
            for row, seq in enumerate(seqs):
                items = [int(i[0]) for i in seq]
                seen[row, : len(items)] = items
                seen_mask[row, : len(items)] = 1.0
            top1, top2, c_sel, used_count = self._cluster_eval_jit(
                self.params, ids, id_mask, mask, seen, seen_mask
            )
            top1 = host_global(top1)
            top2 = host_global(top2)
            c_sel = host_global(c_sel)
            used_count = host_global(used_count)
            for row, (seq, goal, _) in enumerate(part):
                ev.add_instance(goal, top1[row].tolist())
                ev_clusters.add_instance(goal, top2[row].tolist())
                clusters[c_sel[row]] += 1
                used_items.append(used_count[row])

        repartition = np.asarray(self.params["cluster_repartition"])
        if self.cluster_type == "softmax":
            ignored_items = 0
            cluster_size = np.histogram(
                repartition.argmax(axis=1), bins=range(self.n_clusters + 1)
            )[0].tolist()
        elif self.cluster_type == "mix":
            ignored_items = 0
            sig_clusters = repartition > 0.0
            softmax_clusters = repartition.argmax(axis=1)
            for i in range(self.n_items):
                sig_clusters[i, softmax_clusters[i]] = True
            cluster_size = sig_clusters.sum(axis=0)
        else:
            ignored_items = (repartition.max(axis=1) < 0.0).sum()
            cluster_size = (repartition > 0.0).sum(axis=0)

        metrics["recall"].append(ev.average_recall())
        metrics["cluster_recall"].append(ev_clusters.average_recall())
        metrics["sps"].append(ev.sps())
        metrics["cluster_sps"].append(ev_clusters.sps())
        metrics["assr"].append(self.n_items / np.mean(used_items))
        metrics["ignored_items"].append(ignored_items)
        metrics["cluster_use"].append(clusters)
        metrics["cluster_use_std"].append(np.std(clusters))
        metrics["cluster_size"].append(cluster_size)
        return metrics

    # ------------------------------------------------------------------
    # test-time clustering (rnn_cluster.py:461-513)
    # ------------------------------------------------------------------
    def prepare_tests(self) -> None:
        cluster_membership = np.asarray(self.params["cluster_repartition"])
        item_embeddings = np.asarray(self.params["W_out"])
        item_bias = np.asarray(self.params["b_out"])
        self.clusters = [[] for _ in range(self.n_clusters)]
        for i in range(cluster_membership.shape[0]):
            no_cluster = True
            best_cluster = 0
            best_val = cluster_membership[i, 0]
            for j in range(self.n_clusters):
                if cluster_membership[i, j] > 0:
                    self.clusters[j].append(i)
                    no_cluster = False
                elif cluster_membership[i, j] > best_val:
                    best_val = cluster_membership[i, j]
                    best_cluster = j
            if no_cluster:
                self.clusters[best_cluster].append(i)
        self.clusters = [np.array(c, dtype=np.int64) for c in self.clusters]
        self.clusters_reverse_index = [
            {int(c[j]): j for j in range(len(c))} for c in self.clusters
        ]
        self.clusters_embeddings = [item_embeddings[:, c] for c in self.clusters]
        self.clusters_bias = [item_bias[c] for c in self.clusters]

    def _build_rep_jit(self) -> None:
        def rep_fn(params, ids, id_mask, mask):
            h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
            c = jnp.argmax(
                jnp.dot(h, params["W_cs"], preferred_element_type=jnp.float32),
                axis=-1,
            )
            return h, c

        self._rep_jit = jax.jit(rep_fn)

    def _predict_representation(self, sequence, user_id=None):
        seq = sequence[-min(self.max_length, len(sequence)) :] if np.isfinite(
            self.max_length
        ) else sequence
        ids, id_mask, mask = self._encode_sequences(
            [seq], user_ids=None if user_id is None else [user_id]
        )
        if not hasattr(self, "_rep_jit"):
            self._build_rep_jit()
        h, c = self._rep_jit(self.params, ids, id_mask, mask)
        return np.asarray(h)[0], int(np.asarray(c)[0])

    def _batch_representations(self, seqs, user_ids=None):
        """(h [B,H], argmax cluster [B]) for a list of input sequences:
        chunked device passes instead of one call per user."""
        if not hasattr(self, "_rep_jit"):
            self._build_rep_jit()
        chunk = self.eval_batch_size
        hs, cs = [], []
        for c0 in range(0, len(seqs), chunk):
            part = seqs[c0 : c0 + chunk]
            enc = part + [part[-1]] * (chunk - len(part))
            users_p = None
            if user_ids is not None:
                users = list(user_ids[c0 : c0 + chunk])
                users_p = users + [users[-1]] * (chunk - len(part))
            if np.isfinite(self.max_length):
                L = int(self.max_length)
                enc = [s[-min(L, len(s)) :] for s in enc]
            ids, id_mask, mask = self._encode_sequences(enc, user_ids=users_p)
            h, c = self._rep_jit(self.params, ids, id_mask, mask)
            hs.append(np.asarray(h)[: len(part)])
            cs.append(np.asarray(c)[: len(part)])
        return np.concatenate(hs), np.concatenate(cs)

    def top_k_batch_clustered(self, seqs, k=10, user_ids=None):
        """Batched test-time prediction (replaces the per-user loop the
        reference uses at test.py:61-76 / rnn_cluster.py:489-513): one
        chunked device pass yields every user's representation + argmax
        cluster, then users are GROUPED BY CLUSTER and each group scored
        with a single matmul against that cluster's sliced embedding
        table. Returns (recommendation lists, items-in-cluster counts —
        the ASSR datapoints)."""
        if not seqs:
            return [], []
        h, c = self._batch_representations(seqs, user_ids=user_ids)
        B = len(seqs)
        if not self.predict_with_clusters:
            w_out = np.asarray(self.params["W_out"])
            b_out = np.asarray(self.params["b_out"])
            scores = h @ w_out + b_out
            for row, seq in enumerate(seqs):
                if self.interactions_are_unique:
                    scores[row, [int(i[0]) for i in seq]] = -np.inf
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, range(kk), axis=1)[:, :kk]
            return [list(map(int, t)) for t in top], [self.n_items] * B
        if not hasattr(self, "clusters"):
            self.prepare_tests()
        recs: list = [None] * B
        ns = [0] * B
        for cl in range(self.n_clusters):
            rows = np.where(c == cl)[0]
            if len(rows) == 0:
                continue
            members = self.clusters[cl]
            rev = self.clusters_reverse_index[cl]
            scores = h[rows] @ self.clusters_embeddings[cl] + self.clusters_bias[cl]
            eff_k = min(k, len(members))
            for rr, row in enumerate(rows):
                if self.interactions_are_unique:
                    ex = [
                        rev[int(i[0])] for i in seqs[row] if int(i[0]) in rev
                    ]
                    scores[rr, ex] = -np.inf
                top = np.argpartition(-scores[rr], range(eff_k))[:eff_k]
                recs[row] = [int(members[t]) for t in top]
                ns[row] = len(members)
        return recs, ns

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        should_exclude = (
            [int(i[0]) for i in sequence] if self.interactions_are_unique else []
        )
        should_exclude.extend(exclude)

        u, c = self._predict_representation(sequence, user_id=user_id)
        if self.predict_with_clusters:
            if not hasattr(self, "clusters"):
                self.prepare_tests()
            scores = u @ self.clusters_embeddings[c] + self.clusters_bias[c]
            cluster_index_exclude = [
                self.clusters_reverse_index[c][i]
                for i in should_exclude
                if i in self.clusters_reverse_index[c]
            ]
            scores[cluster_index_exclude] = -np.inf
            effective_k = min(k, len(self.clusters[c]))
            return (
                list(
                    self.clusters[c][
                        np.argpartition(-scores, range(effective_k))[:effective_k]
                    ]
                ),
                len(self.clusters[c]),
            )
        # cache the host copy: device->host pulls are expensive through
        # the remote-TPU tunnel and this runs per test user
        if not hasattr(self, "_np_out"):
            self._np_out = (
                np.asarray(self.params["W_out"]),
                np.asarray(self.params["b_out"]),
            )
        w_out, b_out = self._np_out
        scores = u @ w_out + b_out
        scores[should_exclude] = -np.inf
        return list(np.argpartition(-scores, range(k))[:k]), self.n_items

    def load(self, filename: str) -> None:
        super().load(filename)
        if hasattr(self, "_np_out"):
            del self._np_out
        self.prepare_tests()

    def _print_progress(
        self, iterations, epochs, start_time, train_costs, metrics, validation_metrics
    ):
        import sys
        from time import time as _t

        print(self.name, iterations, "batchs, ", epochs, " epochs in", _t() - start_time, "s")
        print("Last train cost : ", train_costs[-1])
        for m in self.metrics.keys():
            print(m, ": ", metrics[m][-1])
        print("-----------------")
        print(
            iterations, epochs, _t() - start_time, train_costs[-1],
            metrics["sps"][-1], metrics["cluster_sps"][-1], metrics["recall"][-1],
            metrics["cluster_recall"][-1], metrics["assr"][-1],
            metrics["ignored_items"][-1], metrics["cluster_use_std"][-1],
            file=sys.stderr,
        )


# ======================================================================
class FISMCluster(RNNCluster):
    """FISM user representation + the cluster machinery
    (fism_cluster.py:19-318)."""

    lazy_table_ok = False  # no recurrent tower (bag representation)

    def __init__(self, h=100, alpha=0.5, reg=0.00025, max_length=np.inf, **kwargs):
        # FISM consumes the whole history regardless of the CLI max_length
        # (fism_cluster.py:36-37)
        super().__init__(max_length=np.inf, **kwargs)
        self.n_hidden = h
        self.alpha = alpha
        self.reg = reg
        self.target_selection.shuffle = True
        self.name = "FISM Cluster with categorical cross entropy"
        self.recurrent_layer.name = ""

    def _get_model_filename(self, epochs) -> str:
        filename = "fism_clusters" + str(self.n_clusters) + "_sc" + str(self.init_scale)
        if self.scale_growing_rate != 1.0:
            filename += "-" + str(self.scale_growing_rate) + "-" + str(self.max_scale)
        filename += "_h" + str(self.n_hidden) + "_a" + str(self.alpha) + "_"
        if self.sampling_bias > 0.0:
            filename += "p" + str(self.sampling_bias)
        filename += "s" + str(self.n_samples)
        if self.n_cluster_samples > 0:
            filename += "_"
            if self.sampling_bias > 0.0:
                filename += "p" + str(self.sampling_bias)
            filename += "cs" + str(self.n_cluster_samples)
        if self.cluster_type == "softmax":
            filename += "_softmax"
        elif self.cluster_type == "mix":
            filename += "_mix"
        if self.cluster_selection_noise > 0.0:
            filename += "_n" + str(self.cluster_selection_noise)
        if self.reg != 0.0:
            filename += "_r" + str(self.reg)
        filename += "_c" + self.loss
        return filename + "_" + self._common_filename(epochs)

    # ------------------------------------------------------------------
    def _init_params(self) -> dict:
        rng = self.rng
        limit_emb = np.sqrt(6.0 / (self.n_items + self.n_hidden))
        limit = np.sqrt(6.0 / (self.n_hidden + self.n_items))
        limit_cs = np.sqrt(6.0 / (self.n_hidden + self.n_clusters))
        return {
            "item_embeddings": rng.uniform(
                -limit_emb, limit_emb, size=(self.n_items, self.n_hidden)
            ).astype(np.float32),
            "W_out": rng.uniform(
                -limit, limit, size=(self.n_hidden, self.n_items)
            ).astype(np.float32),
            "b_out": np.zeros(self.n_items, dtype=np.float32),
            "W_cs": rng.uniform(
                -limit_cs, limit_cs, size=(self.n_hidden, self.n_clusters)
            ).astype(np.float32),
            "cluster_repartition": (
                0.1 * rng.standard_normal((self.n_items, self.n_clusters))
            ).astype(np.float32),
        }

    def _user_representation(self, params, batch):
        # bag of items scaled by 1/len^alpha (fism_cluster.py:262-265)
        return self._rep_from_arrays(params, batch["ids"], batch["mask"])

    def _regularization(self, params):
        net = (params["item_embeddings"], params["W_out"], params["b_out"])
        if self.reg > 0.0:
            return self.reg * sum(jnp.sum(jnp.square(p)) for p in net)
        if self.reg < 0.0:
            return -self.reg * sum(jnp.sum(jnp.abs(p)) for p in net)
        return 0.0

    # FISM input is the bag, not a timestep tensor --------------------
    def _encode_sequences(self, seqs, user_ids=None):
        pad = _bucket(max(1, max(len(s) for s in seqs)))
        B = len(seqs)
        ids = np.zeros((B, pad), dtype=np.int32)
        mask = np.zeros((B, pad), dtype=np.float32)
        for i, seq in enumerate(seqs):
            items = [int(x[0]) for x in seq[:pad]]
            ids[i, : len(items)] = items
            mask[i, : len(items)] = 1.0
        return ids, None, mask

    def _rep_from_arrays(self, params, ids, mask):
        counts = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
        weights = mask / jnp.power(counts, self.alpha)
        return jnp.einsum(
            "bl,blk->bk",
            weights,
            params["item_embeddings"][jnp.minimum(ids, self.n_items - 1)],
        )

    def _scores(self, params, ids, id_mask, mask):
        h = self._rep_from_arrays(params, ids, mask)
        return jax.nn.softmax(
            jnp.dot(h, params["W_out"], preferred_element_type=jnp.float32)
            + params["b_out"],
            axis=-1,
        )

    def _cluster_assignments(self, params, ids, id_mask, mask):
        h = self._rep_from_arrays(params, ids, mask)
        probs = jax.nn.softmax(
            jnp.dot(h, params["W_out"], preferred_element_type=jnp.float32)
            + params["b_out"],
            axis=-1,
        )
        c_sel = jnp.argmax(
            jnp.dot(h, params["W_cs"], preferred_element_type=jnp.float32), axis=-1
        )
        return probs, c_sel, self._hard_clusters(params["cluster_repartition"])

    def _predict_representation(self, sequence, user_id=None):
        ids, _, mask = self._encode_sequences([sequence])
        if not hasattr(self, "_rep_jit"):
            self._build_rep_jit()
        h, c = self._rep_jit(self.params, ids, None, mask)
        return np.asarray(h)[0], int(np.asarray(c)[0])

    def _build_rep_jit(self) -> None:
        def rep_fn(params, ids, id_mask, mask):
            h = self._rep_from_arrays(params, ids, mask)
            c = jnp.argmax(
                jnp.dot(h, params["W_cs"], preferred_element_type=jnp.float32),
                axis=-1,
            )
            return h, c

        self._rep_jit = jax.jit(rep_fn)
