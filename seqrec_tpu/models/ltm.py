"""Latent Trajectory Modeling over item-sequence word2vec embeddings.

Re-designs /root/reference/word2vec/ltm.py:15-306, replacing the gensim
CBOW dependency with an in-package JAX implementation (SURVEY.md §7 step 7):

- CBOW with negative sampling (gensim defaults: cbow_mean, negative=5,
  reduced-window sampling, unigram^0.75 noise distribution, linear lr
  decay) trained as vectorized jitted SGD steps over position batches.
- One ``train()`` iteration = one epoch over the training sequences
  (ltm.py:129,177-180).
- Trajectory prediction: user translation vector = EWMA of consecutive
  item-embedding deltas with damping ``alpha`` (ltm.py:62-69); predict =
  cosine-nearest items to (last item + trajectory), or the mean of the
  last ``window/2`` embeddings with ``use_trajectory=False``
  (ltm.py:76-92).
"""

from __future__ import annotations

import os
from functools import partial
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.utils import evaluation


class LTM:
    def __init__(
        self,
        use_trajectory: bool = True,
        alpha: float = 0.8,
        k: int = 32,
        window: int = 5,
        learning_rate: float = 0.025,
        negative: int = 5,
        min_alpha: float = 0.0001,
        seed: int = 42,
        batch_positions: int = 2048,
    ):
        self.use_trajectory = use_trajectory
        self.alpha = alpha
        self.k = k
        self.window = window
        self.learning_rate = learning_rate
        self.negative = negative
        self.min_alpha = min_alpha
        self.rng = np.random.default_rng(seed)
        self.batch_positions = batch_positions

        self.name = "Latent Trajectory Modeling"
        self.max_length = np.inf
        self.metrics = {
            "recall": {"direction": 1},
            "sps": {"direction": 1},
            "user_coverage": {"direction": 1},
            "item_coverage": {"direction": 1},
            "ndcg": {"direction": 1},
            "blockbuster_share": {"direction": -1},
        }

    def _get_model_filename(self, epochs) -> str:
        filename = (
            "ltm_ne" + str(epochs) + "_lr" + str(self.learning_rate)
            + "_k" + str(self.k) + "_w" + str(self.window)
        )
        if self.use_trajectory:
            filename += "_ut" + str(self.alpha)
        return filename + ".npz"

    def prepare_model(self, dataset) -> None:
        self.dataset = dataset
        self.n_items = dataset.n_items

    def set_dataset(self, dataset) -> None:
        self.dataset = dataset

    # ------------------------------------------------------------------
    # CBOW training
    # ------------------------------------------------------------------
    def _init_w2v(self) -> None:
        n, k = self.n_items, self.k
        self.syn0 = jnp.asarray(
            (self.rng.random((n, k)) - 0.5) / k, jnp.float32
        )  # gensim init: U(-0.5/k, 0.5/k)
        self.syn1neg = jnp.zeros((n, k), jnp.float32)

    def _init_training_aux(self) -> None:
        pop = np.maximum(1, np.asarray(self.dataset.item_popularity))
        noise = np.power(pop, 0.75)
        self._noise_cdf = np.cumsum(noise / noise.sum())
        self._cbow_step = jax.jit(
            partial(self._cbow_chunk, self.negative), donate_argnums=(0, 1)
        )

    @staticmethod
    def _cbow_chunk(negative, syn0, syn1neg, ctx, ctx_mask, center, negs, row_mask, lr):
        """One vectorized CBOW/negative-sampling step (gensim-equivalent).

        ctx: [N, C] context ids (padded; mask 0), center: [N],
        negs: [N, S] noise ids, row_mask: [N] (0 = padding row from the
        fixed-size batch slicing; its updates and loss are zeroed)."""
        counts = jnp.maximum(ctx_mask.sum(-1, keepdims=True), 1.0)
        ctx_vecs = syn0[ctx] * ctx_mask[..., None]
        h = ctx_vecs.sum(axis=1) / counts  # cbow_mean=1

        # positive + negatives share the update form: g = (label - σ(h·v)) * lr
        targets = jnp.concatenate([center[:, None], negs], axis=1)  # [N, 1+S]
        labels = jnp.concatenate(
            [jnp.ones_like(center[:, None], jnp.float32),
             jnp.zeros(negs.shape, jnp.float32)],
            axis=1,
        )
        v = syn1neg[targets]  # [N, 1+S, k]
        f = jax.nn.sigmoid(jnp.einsum("nsk,nk->ns", v, h))
        g = (labels - f) * lr * row_mask[:, None]  # [N, 1+S]

        # hidden-layer error propagated back to all context words
        neu1e = jnp.einsum("ns,nsk->nk", g, v)  # [N, k]
        syn1neg = syn1neg.at[targets.reshape(-1)].add(
            (g[..., None] * h[:, None, :]).reshape(-1, h.shape[-1])
        )
        ctx_update = (neu1e / counts)[:, None, :] * ctx_mask[..., None]
        syn0 = syn0.at[ctx.reshape(-1)].add(
            ctx_update.reshape(-1, h.shape[-1])
        )
        nll = -jnp.log(jnp.clip(jnp.where(labels > 0, f, 1 - f), 1e-7, 1.0))
        denom = jnp.maximum(row_mask.sum() * nll.shape[1], 1.0)
        loss = (nll * row_mask[:, None]).sum() / denom
        return syn0, syn1neg, loss

    def _epoch_positions(self):
        """All (context, center) positions of one epoch in ONE numpy pass.

        The reduced-window draws (gensim's b ~ U{1..window}) are a single
        ``rng.integers`` array per epoch and the contexts are assembled by
        gathers from the packed store — replacing the reference-shaped
        per-token Python loop (one RNG call + list append per token). The
        sampling distribution is unchanged; the RNG *stream* differs from
        the loop version (one array draw vs per-token draws).

        Yields fixed-size [batch_positions] slices so the jitted CBOW step
        compiles exactly once; the final slice is zero-padded with
        ``row_mask`` marking real rows."""
        store = self.dataset.training_set.store
        order = self.rng.permutation(len(store))
        lens = store.lengths[order].astype(np.int64)
        offs = store.offsets[order].astype(np.int64)
        total = int(lens.sum())
        pos_off = np.repeat(offs, lens)  # flat-store offset of each position's sequence
        pos_len = np.repeat(lens, lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        t = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)

        b = self.rng.integers(1, self.window + 1, size=total)
        lo = np.maximum(0, t - b)
        hi = np.minimum(pos_len, t + b + 1)
        C = 2 * self.window
        j = np.arange(C, dtype=np.int64)[None, :]
        p = lo[:, None] + j
        p = p + (p >= t[:, None])  # skip the center position
        valid = p < hi[:, None]
        ctx = np.where(
            valid, store.items[np.where(valid, pos_off[:, None] + p, 0)], 0
        ).astype(np.int32)
        mask = valid.astype(np.float32)
        center = store.items[pos_off + t].astype(np.int32)
        keep = valid.any(axis=1)  # drop empty-context positions (length-1 seqs)
        ctx, mask, center = ctx[keep], mask[keep], center[keep]

        N = self.batch_positions
        n_total = len(center)
        for c0 in range(0, n_total, N):
            m = min(N, n_total - c0)
            if m < N:
                pad = N - m
                yield (
                    np.concatenate([ctx[c0:], np.zeros((pad, C), np.int32)]),
                    np.concatenate([mask[c0:], np.zeros((pad, C), np.float32)]),
                    np.concatenate([center[c0:], np.zeros(pad, np.int32)]),
                    np.concatenate(
                        [np.ones(m, np.float32), np.zeros(pad, np.float32)]
                    ),
                )
            else:
                yield (
                    ctx[c0 : c0 + N],
                    mask[c0 : c0 + N],
                    center[c0 : c0 + N],
                    np.ones(N, np.float32),
                )

    def _train_one_epoch(self, lr: float) -> float:
        losses = []
        for ctx, ctx_mask, center, row_mask in self._epoch_positions():
            u = self.rng.random((len(center), self.negative))
            negs = np.searchsorted(self._noise_cdf, u, side="right").astype(np.int32)
            self.syn0, self.syn1neg, loss = self._cbow_step(
                self.syn0, self.syn1neg, ctx, ctx_mask, center, negs,
                row_mask, np.float32(lr),
            )
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else 0.0

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------
    def user_features(self, sequence) -> np.ndarray:
        """EWMA of consecutive item-embedding deltas (ltm.py:62-69)."""
        syn0 = np.asarray(self.syn0)
        features = np.zeros(self.k)
        for i in range(1, len(sequence)):
            features = self.alpha * features + (1 - self.alpha) * (
                syn0[int(sequence[i][0])] - syn0[int(sequence[i - 1][0])]
            )
        return features

    def _query_features(self, sequence, syn0) -> np.ndarray:
        if self.use_trajectory:
            # nearest items to (last item + trajectory); similar_by_vector
            # on the raw trajectory alone matches gensim usage at ltm.py:88
            ids = np.fromiter((int(i[0]) for i in sequence), dtype=np.int64)
            if len(ids) < 2:
                return np.zeros(self.k, dtype=syn0.dtype)
            # EWMA of consecutive deltas, closed form: (1-α)·Σ α^(n-1-i)·d_i
            d = syn0[ids[1:]] - syn0[ids[:-1]]
            wts = (1 - self.alpha) * np.power(
                self.alpha, np.arange(len(d) - 1, -1, -1, dtype=np.float64)
            ).astype(syn0.dtype)
            return wts @ d
        return np.mean(
            [syn0[int(sequence[-i - 1][0])] for i in range(self.window // 2)],
            axis=0,
        )

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        syn0 = np.asarray(self.syn0)
        f = self._query_features(sequence, syn0)
        norms = np.linalg.norm(syn0, axis=1)
        norms[norms == 0] = 1.0
        scores = (syn0 / norms[:, None]) @ f
        topn = k + len(sequence) + len(exclude)
        top = np.argpartition(-scores, range(min(topn, len(scores))))[:topn]
        seen = {int(i[0]) for i in sequence}
        out = [int(i) for i in top if int(i) not in exclude and int(i) not in seen]
        return out[:k]

    def top_k_batch(self, instances, k=10):
        """Batched prediction: one [B,k]·[k,n] matmul against the
        normalized embedding table for ALL queried users, instead of one
        full-catalog pass per user (ltm.py:216-231's loop)."""
        if not instances:
            return []
        syn0 = np.asarray(self.syn0)
        seqs = [s for s, _ in instances]
        feats = np.stack([self._query_features(s, syn0) for s in seqs])
        norms = np.linalg.norm(syn0, axis=1)
        norms[norms == 0] = 1.0
        scores = feats @ (syn0 / norms[:, None]).T  # [B, n_items]
        for row, seq in zip(scores, seqs):
            row[[int(i[0]) for i in seq]] = -np.inf
        return np.argpartition(-scores, range(k), axis=1)[:, :k]

    # ------------------------------------------------------------------
    # training loop: one iteration = one epoch (ltm.py:129)
    # ------------------------------------------------------------------
    get_pareto_front = RNNBase.get_pareto_front
    load_last = RNNBase.load_last

    def _compute_validation_metrics(self, metrics):
        ev = evaluation.Evaluator(self.dataset, k=10)
        instances, goals = [], []
        for sequence, user_id in self.dataset.validation_set(epochs=1):
            half = len(sequence) // 2
            instances.append((sequence[:half], user_id))
            goals.append([i[0] for i in sequence[half:]])
        for top_k, goal in zip(self.top_k_batch(instances), goals):
            ev.add_instance(goal, list(top_k))
        for m, fn in (
            ("recall", ev.average_recall),
            ("sps", ev.sps),
            ("ndcg", ev.average_ndcg),
            ("user_coverage", ev.user_coverage),
            ("item_coverage", ev.item_coverage),
            ("blockbuster_share", ev.blockbuster_share),
        ):
            metrics[m].append(fn())
        return metrics

    def train(
        self,
        dataset,
        max_time=np.inf,
        progress=2.0,
        time_based_progress=False,
        autosave="All",
        save_dir="",
        min_iterations=0,
        max_iter=np.inf,
        max_progress_interval=np.inf,
        load_last_model=False,
        early_stopping=None,
        validation_metrics=("sps",),
    ):
        validation_metrics = list(validation_metrics)
        self.set_dataset(dataset)
        if len(set(validation_metrics) & set(self.metrics.keys())) < len(
            validation_metrics
        ):
            raise ValueError(
                "Incorrect validation metrics. Metrics must be chosen among: "
                + ", ".join(self.metrics.keys())
            )

        iterations = 0
        epochs_offset = 0
        if load_last_model:
            epochs_offset = self.load_last(save_dir)
        if not hasattr(self, "syn0"):
            self._init_w2v()
        if not hasattr(self, "_cbow_step"):
            self._init_training_aux()

        start_time = time()
        next_save = int(progress)
        epochs = []
        train_costs = []
        metrics = {name: [] for name in self.metrics.keys()}
        filename = {}

        while time() - start_time < max_time and iterations < max_iter:
            # linear lr decay across the run (gensim-style, bounded below)
            frac = iterations / max(max_iter, 1) if np.isfinite(max_iter) else 0.0
            lr = max(self.min_alpha, self.learning_rate * (1 - frac))
            cost = self._train_one_epoch(lr)
            train_costs.append(cost)
            iterations += 1

            if time_based_progress:
                progress_indicator = int(time() - start_time)
            else:
                progress_indicator = iterations

            if progress_indicator >= next_save:
                if progress_indicator >= min_iterations:
                    epochs.append(epochs_offset + iterations)
                    metrics = self._compute_validation_metrics(metrics)
                    RNNBase._print_progress(
                        self, iterations, epochs[-1], start_time, train_costs,
                        metrics, validation_metrics,
                    )

                    run_nb = len(metrics[list(self.metrics.keys())[0]]) - 1
                    if autosave == "All":
                        filename[run_nb] = save_dir + self._get_model_filename(
                            round(epochs[-1], 3)
                        )
                        self.save(filename[run_nb])
                    elif autosave == "Best":
                        pareto_runs = self.get_pareto_front(metrics, validation_metrics)
                        if run_nb in pareto_runs:
                            filename[run_nb] = save_dir + self._get_model_filename(
                                round(epochs[-1], 3)
                            )
                            self.save(filename[run_nb])
                            to_delete = [r for r in filename if r not in pareto_runs]
                            for run in to_delete:
                                try:
                                    os.remove(filename[run])
                                except OSError:
                                    print("Warning : Previous model could not be deleted")
                                del filename[run]

                    if early_stopping is not None:
                        if all(
                            early_stopping(epochs, metrics[m])
                            for m in validation_metrics
                        ):
                            break

                if isinstance(progress, int):
                    next_save += min(progress, max_progress_interval)
                else:
                    next_save += min(max_progress_interval, next_save * (progress - 1))

        if not metrics[validation_metrics[0]]:
            return ({m: None for m in self.metrics}, time() - start_time, None)
        best_run = np.argmax(
            np.array(metrics[validation_metrics[0]])
            * self.metrics[validation_metrics[0]]["direction"]
        )
        return (
            {m: metrics[m][best_run] for m in self.metrics.keys()},
            time() - start_time,
            filename.get(best_run),
        )

    # ------------------------------------------------------------------
    def save(self, filename: str) -> None:
        print("Save model in " + filename)
        if os.path.dirname(filename) and not os.path.exists(os.path.dirname(filename)):
            os.makedirs(os.path.dirname(filename))
        np.savez(
            open(filename, "wb"),
            syn0=np.asarray(self.syn0),
            syn1neg=np.asarray(self.syn1neg),
        )

    def load(self, filename: str) -> None:
        f = np.load(filename)
        self.syn0 = jnp.asarray(f["syn0"])
        self.syn1neg = jnp.asarray(f["syn1neg"])
