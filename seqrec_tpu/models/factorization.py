"""Factorization family: BPR-MF, FPMC, FISM, Fossil.

TPU-first re-design of /root/reference/factorization/ (mf_base.py,
bprmf.py, fpmc.py, fism.py, fossil.py). The reference iterates ONE
python/numpy SGD sample per ``training_step`` call — the hot loop is
interpreter overhead (SURVEY.md §3.2). Here each device step processes a
vector of ``samples_per_step`` independent SGD samples inside one jitted
function: gathers of the touched factor rows, the closed-form update, and
scatter-adds back into the tables (colliding indices within a chunk
accumulate rather than chain — the batched-SGD semantics divergence
flagged in SURVEY.md §7; hyperparameters transfer at these chunk sizes).

Sampling stays host-side numpy, vectorized per chunk: uniform negatives
with rejection, or the Rendle'14 adaptive scheme (exponential-rank draw in
factor-sorted item lists, factor chosen ∝ |V_u|·var(H); bprmf.py:73-99)
including the reference's signed-index trick (negative sign ⇒ index from
the other end of the ranking, bprmf.py:91).

The training-loop contract (progress checkpoints, autosave pareto, early
stop, per-epoch lr annealing, stderr TSV) matches mf_base.py:82-212, with
iteration counts measured in samples so checkpoint cadence is comparable.

Parity notes:
- ``delta = 1 - 1/(1+exp(clip(x_false-x_true)))`` ≡ σ(clip(x_false−x_true))
  (bprmf.py:54); Fossil's ``1/(1+exp(-clip(...)))`` is the same value
  (fossil.py:75).
- FISM's leave-one-out filter uses ``is not`` on numpy scalars and is
  therefore a no-op in the reference (fism.py:116); we implement the
  intended exclusion by value.
"""

from __future__ import annotations

import os
from functools import partial
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.models.base import RNNBase
from seqrec_tpu.ops.core import pad_bucket as _bucket
from seqrec_tpu.utils import evaluation


def _sigmoid(x):
    return jax.nn.sigmoid(x)


class MFBase:
    """Shared train-loop/eval/checkpoint logic for the factorization family."""

    samples_per_step = 512

    def __init__(self, reg=0.0025, learning_rate=0.05, annealing=1.0, init_sigma=1, seed=42):
        self.name = "Base for matrix factorization"
        self.reg = reg
        self.learning_rate = learning_rate
        self.init_learning_rate = learning_rate
        self.annealing_rate = annealing
        self.init_sigma = init_sigma
        self.max_length = np.inf  # compatibility with the RNN drivers
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # eval-only mesh (set_mesh): MF TRAINING stays single-device by
        # design — the reference's sampled-SGD chunks have no batch axis
        # worth sharding and the tables fit one chip — but the catalog
        # scoring + top-k at validation/test shards over "model"
        self.mesh = None
        self.metrics = {
            "recall": {"direction": 1},
            "sps": {"direction": 1},
            "user_coverage": {"direction": 1},
            "item_coverage": {"direction": 1},
            "ndcg": {"direction": 1},
            "blockbuster_share": {"direction": -1},
        }

    # ------------------------------------------------------------------
    def prepare_model(self, dataset) -> None:
        self.dataset = dataset
        self.n_items = dataset.n_items
        self.n_users = dataset.n_users

    def change_data_format(self, dataset) -> None:
        """Sequence file → per-user (offset, length) index + flat item array
        (mf_base.py:41-54), built from the packed SequenceStore."""
        store = dataset.training_set.store
        self.users = np.zeros((self.n_users, 2), dtype=np.int64)
        for row in range(len(store)):
            uid = int(store.user_ids[row])
            self.users[uid] = [store.offsets[row], store.offsets[row + 1] - store.offsets[row]]
        self.items = store.items.astype(np.int64)
        # users with >= 2 interactions, for sampling (bprmf.py:79-80)
        self._eligible_users = np.where(self.users[:, 1] >= 2)[0]
        # binary user x item CSR for vectorized membership tests
        # (rows follow the store's sequence order, NOT ascending user id)
        import scipy.sparse as ssp

        seg_rows = np.repeat(
            store.user_ids.astype(np.int64), np.diff(store.offsets)
        )
        self._user_item = ssp.coo_matrix(
            (
                np.ones(len(self.items), dtype=np.int8),
                (seg_rows, self.items),
            ),
            shape=(self.n_users, self.n_items),
        ).tocsr()

    def _is_member(self, users, items) -> np.ndarray:
        """Vectorized ``item in user's history`` test."""
        return np.asarray(self._user_item[users, items]).ravel() > 0

    def _np(self, name: str) -> np.ndarray:
        """Host-side cached copy of a device parameter array.

        Prediction/validation runs in numpy; without caching every
        ``top_k_recommendations`` call would re-transfer the tables
        device→host (per validation user!), which is pathologically slow
        through the remote-TPU tunnel. The cache keys on array identity,
        so it refreshes automatically after each training chunk (the jit
        step returns new arrays)."""
        cache = self.__dict__.setdefault("_np_cache", {})
        arr = getattr(self, name)
        hit = cache.get(name)
        if hit is not None and hit[0] is arr:
            return hit[1]
        val = np.asarray(arr)
        cache[name] = (arr, val)
        return val

    # subclass hooks -----------------------------------------------------
    def init_model(self):  # pragma: no cover
        raise NotImplementedError

    def training_step(self, iterations) -> tuple[float, int]:
        """Run one vectorized chunk; returns (mean cost, samples consumed)."""
        raise NotImplementedError

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):  # pragma: no cover
        raise NotImplementedError

    # ------------------------------------------------------------------
    def get_pareto_front(self, metrics, metrics_names):
        return RNNBase.get_pareto_front(self, metrics, metrics_names)

    # batched prediction ------------------------------------------------
    @staticmethod
    def _bag_sums(V, seqs):
        """Per-user sums of V rows over each sequence's items, via one
        flat gather + scatter-add. Returns (sums [B,k], lens [B],
        flat item ids, ends [B] exclusive offsets into flat)."""
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        total = int(lens.sum())
        flat = np.fromiter(
            (int(i[0]) for s in seqs for i in s), dtype=np.int64, count=total
        )
        rows = np.repeat(np.arange(len(seqs)), lens)
        sums = np.zeros((len(seqs), V.shape[1]), dtype=V.dtype)
        np.add.at(sums, rows, V[flat])
        return sums, lens, flat, np.cumsum(lens)

    def _batch_scores(self, user_ids, seqs):
        """[B, n_items] scores for a batch of (user, input-sequence)
        pairs, or None when the model has no vectorized scorer (falls
        back to per-user ``top_k_recommendations``)."""
        return None

    # eval-time device scoring ------------------------------------------
    # Threshold above which the catalog scoring + top-k runs on device
    # even without a mesh (one [B, F] transfer + fused masked top-k beat
    # the host's [B, n_items] matmul + argpartition at 10^5 catalogs)
    DEVICE_TOPK_MIN_ITEMS = 16384

    def set_mesh(self, mesh) -> None:
        """Accept a ("data", "model") mesh for EVAL sharding.

        Training stays single-device (documented decision: the sampled
        SGD chunks are latency-bound on [n]-sized gathers, not
        catalog-sized matmuls, and the factor tables fit one chip), but
        validation/test scoring shards the [F, n_items] output table
        over "model" and merges k candidates per shard
        (parallel/topk.py:sharded_score_topk)."""
        self.mesh = mesh
        self.__dict__.pop("_sharded_topk_fns", None)  # jitted closures are mesh-bound

    def _rep_rows(self, user_ids, seqs):
        """[B, F] user-representation rows (numpy) such that scores =
        rep @ W + b with (W, b) = ``_device_out_table``. None = the
        model has no factored scorer (lazy fallbacks)."""
        return None

    def _device_out_table(self):
        """(W [F, n_items] device array, bias [n_items] or None)."""
        return None

    def _use_device_topk(self) -> bool:
        import os

        if os.environ.get("SEQREC_NO_DEVICE_TOPK"):
            return False
        return self.mesh is not None or self.n_items >= self.DEVICE_TOPK_MIN_ITEMS

    # eval rows scored per device call: bounds the [chunk, n_items]
    # score block (~800 MB at 200k items / f32) regardless of how many
    # validation/test users the caller packs into one top_k_batch call
    _DEVICE_TOPK_ROW_CHUNK = 1024

    def _device_topk_batch(self, user_ids, seqs, k):
        n = len(seqs)
        C = self._DEVICE_TOPK_ROW_CHUNK
        if n > C:
            import numpy as _np

            parts = [
                self._device_topk_batch(user_ids[i : i + C], seqs[i : i + C], k)
                for i in range(0, n, C)
            ]
            return None if any(p is None for p in parts) else _np.concatenate(parts)
        import jax.numpy as jnp

        rep = self._rep_rows(user_ids, seqs)
        table = self._device_out_table()
        if rep is None or table is None:
            return None
        W, b = table
        W = jnp.asarray(W, jnp.float32)
        b = (
            jnp.zeros((W.shape[1],), jnp.float32)
            if b is None
            else jnp.asarray(b, jnp.float32)
        )
        B = rep.shape[0]
        # round the seen-set width up to a multiple of 16: the jitted
        # sharded top-k recompiles per distinct shape, and eval batches
        # vary their longest sequence
        S = max(1, max((len(s) for s in seqs), default=1))
        S = -(-S // 16) * 16
        seen = np.zeros((B, S), np.int32)
        sm = np.zeros((B, S), np.float32)
        for r, s in enumerate(seqs):
            ids = [int(i[0]) for i in s]
            seen[r, : len(ids)] = ids
            sm[r, : len(ids)] = 1.0
        if self.mesh is not None and self.n_items % self.mesh.shape["model"] == 0:
            from seqrec_tpu.parallel.topk import make_sharded_topk_fn

            n_data = self.mesh.shape["data"]
            pad = (-B) % n_data
            if pad:  # shard_map needs the batch to divide "data"
                rep = np.concatenate(
                    [rep, np.zeros((pad, rep.shape[1]), rep.dtype)]
                )
                seen = np.concatenate([seen, np.zeros((pad, S), np.int32)])
                sm = np.concatenate([sm, np.zeros((pad, S), np.float32)])
            # the JITTED closure — an eager shard_map call re-traces and
            # re-dispatches per invocation (measured 250x slower than
            # the jitted path at 200k items)
            cache = self.__dict__.setdefault("_sharded_topk_fns", {})
            fn = cache.get(k)
            if fn is None:
                fn = cache[k] = make_sharded_topk_fn(self.mesh, k=k)
            out = fn(
                jnp.asarray(rep, jnp.float32), W, b,
                jnp.asarray(seen), jnp.asarray(sm),
            )
            return np.asarray(out)[:B]
        from seqrec_tpu.ops.core import masked_top_k

        scores = jnp.asarray(rep, jnp.float32) @ W + b
        return np.asarray(masked_top_k(scores, k, jnp.asarray(seen), jnp.asarray(sm)))

    def top_k_batch(self, instances, k=10):
        """Vectorized top-k for ``[(sequence, user_id), ...]``: one
        whole-matrix scoring pass + one argpartition, instead of the
        reference's one full-catalog scoring call per user
        (mf_base.py:66-80). Large catalogs (or an eval mesh) route
        through the device scorer instead of host numpy."""
        if not instances:
            return []
        user_ids = np.array([int(u) for _, u in instances], dtype=np.int64)
        seqs = [s for s, _ in instances]
        if self._use_device_topk():
            out = self._device_topk_batch(user_ids, seqs, k)
            if out is not None:
                return out
        scores = self._batch_scores(user_ids, seqs)
        if scores is None:
            return [
                self.top_k_recommendations(seq, user_id=int(uid), k=k)
                for seq, uid in instances
            ]
        for row, seq in zip(scores, seqs):
            row[[int(i[0]) for i in seq]] = -np.inf
        return np.argpartition(-scores, range(k), axis=1)[:, :k]

    def _compute_validation_metrics(self, metrics):
        ev = evaluation.Evaluator(self.dataset, k=10)
        instances, goals = [], []
        for sequence, user_id in self.dataset.validation_set(epochs=1):
            half = len(sequence) // 2
            instances.append((sequence[:half], user_id))
            goals.append([i[0] for i in sequence[half:]])
        for (top_k, goal) in zip(self.top_k_batch(instances), goals):
            ev.add_instance(goal, list(top_k))
        metrics["recall"].append(ev.average_recall())
        metrics["sps"].append(ev.sps())
        metrics["ndcg"].append(ev.average_ndcg())
        metrics["user_coverage"].append(ev.user_coverage())
        metrics["item_coverage"].append(ev.item_coverage())
        metrics["blockbuster_share"].append(ev.blockbuster_share())
        return metrics

    _print_progress = RNNBase._print_progress
    load_last = RNNBase.load_last

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
        self.change_data_format(dataset)
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
        if epochs_offset == 0:
            self.init_model()

        start_time = time()
        next_save = int(progress)
        train_costs = []
        cost_sum = None  # device-side running sum: ONE host pull per checkpoint
        cost_count = 0
        epochs = []
        metrics = {name: [] for name in self.metrics.keys()}
        filename = {}
        n_interactions = dataset.training_set.n_interactions
        next_anneal = n_interactions

        while time() - start_time < max_time and iterations < max_iter:
            # cost stays a device array so consecutive chunks pipeline
            # (host-side sampling overlaps device compute)
            cost, consumed = self.training_step(iterations)
            cost_sum = cost if cost_sum is None else cost_sum + cost
            cost_count += 1
            iterations += consumed

            # lr annealing once per epoch-worth of samples (mf_base.py:152-153)
            while iterations >= next_anneal:
                self.learning_rate *= self.annealing_rate
                next_anneal += n_interactions

            if time_based_progress:
                progress_indicator = int(time() - start_time)
            else:
                progress_indicator = iterations

            if progress_indicator >= next_save:
                if progress_indicator >= min_iterations:
                    epochs.append(epochs_offset + iterations / n_interactions)
                    train_costs.append(float(cost_sum) / max(cost_count, 1))
                    if np.isnan(train_costs[-1]):
                        # divergence abort, as in the reference
                        # (fism.py:85-86; rnn_base.py:291-292)
                        raise ValueError("Cost is NaN")
                    cost_sum, cost_count = None, 0
                    metrics = self._compute_validation_metrics(metrics)
                    self._print_progress(
                        iterations, epochs[-1], start_time, train_costs, metrics, validation_metrics
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
                            early_stopping(epochs, metrics[m]) for m in validation_metrics
                        ):
                            break

                while next_save <= progress_indicator:
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
    def _save_arrays(self, filename: str, **arrays) -> None:
        print("Save model in " + filename)
        if os.path.dirname(filename) and not os.path.exists(os.path.dirname(filename)):
            os.makedirs(os.path.dirname(filename))
        np.savez(open(filename, "wb"), **{k: np.asarray(v) for k, v in arrays.items()})

    # host-side sampling helpers ----------------------------------------
    # ------------------------------------------------------------------
    # on-device sampling (uniform path): the per-user index tables live
    # in HBM and each dispatch fuses ``chunks_per_dispatch`` sample+SGD
    # chunks in one scan — the host leaves the hot loop entirely. The
    # adaptive (Rendle'14) scheme keeps its host implementation (factor
    # rank tables + exponential-rank draws are recomputed from fresh
    # device params every n·ln(n) samples, an inherently host-paced
    # schedule). Device sampling uses JAX PRNG: the sampling
    # DISTRIBUTION matches the host path; the stream does not.
    chunks_per_dispatch = 16
    _NEG_REJECTION_ROUNDS = 8  # all membership-tested in one pass
    # adaptive (Rendle'14) draws also run on device by default — the
    # rank-table refresh is a device argsort, so the host leaves the
    # adaptive hot loop too. Set False for the host reference path
    # (kept as the distribution oracle and for A/B measurement).
    device_adaptive = True

    def _upload_sample_store(self) -> None:
        import jax

        sorted_items = self.items.copy()
        for off, ln in self.users:
            if ln > 1:
                sorted_items[off : off + ln].sort()
        max_len = int(self.users[:, 1].max()) if len(self.users) else 2
        self._bs_trips = int(np.ceil(np.log2(max(2, max_len)))) + 2
        self._dev_sample_store = jax.device_put(
            {
                "eligible": self._eligible_users.astype(np.int32),
                "offs": self.users[:, 0].astype(np.int32),
                "lens": self.users[:, 1].astype(np.int32),
                "items": self.items.astype(np.int32),
                "sorted_items": sorted_items.astype(np.int32),
            }
        )
        self._sample_key = jax.random.PRNGKey(self.seed)

    @staticmethod
    def _device_member(st: dict, cand, u, trips: int):
        """``cand in user u's history`` on device: lower-bound binary
        search within each user's sorted segment of the flat item array
        (the device twin of ``_is_member``)."""
        offs = st["offs"][u]
        lens = st["lens"][u]
        T = st["sorted_items"].shape[0]

        def body(_, lohi):
            lo, hi = lohi
            cont = lo < hi
            mid = (lo + hi) // 2
            v = st["sorted_items"][jnp.clip(mid, 0, T - 1)]
            right = v < cand
            lo2 = jnp.where(right, mid + 1, lo)
            hi2 = jnp.where(right, hi, mid)
            return jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi)

        lo, _ = jax.lax.fori_loop(0, trips, body, (offs, offs + lens))
        at = st["sorted_items"][jnp.clip(lo, 0, T - 1)]
        return (lo < offs + lens) & (at == cand)

    def _device_negatives(self, st: dict, key, u, trips: int):
        """Uniform negatives outside each user's history: draw R rounds
        of candidates up front, membership-test them all in one pass and
        keep the first non-member per sample (the device twin of the
        host rejection loop; residual member probability is
        density^R)."""
        R = self._NEG_REJECTION_ROUNDS
        n = u.shape[0]
        key, kfb = jax.random.split(key)
        cands = jax.random.randint(key, (R, n), 0, self.n_items)
        bad = self._device_member(
            st, cands.reshape(-1), jnp.tile(u, R), trips
        ).reshape(R, n)
        first = jnp.argmin(bad, axis=0)  # first False per column
        rows = jnp.arange(n)
        chosen = cands[first, rows]
        # all-rejected tail (density^R): redraw those columns instead of
        # emitting a member; lax.cond skips the second membership pass
        # whenever every column accepted (the overwhelmingly common case)
        all_bad = bad.all(axis=0)

        def _redraw(_):
            uc = jax.random.randint(kfb, (4, n), 0, self.n_items)
            ub = self._device_member(
                st, uc.reshape(-1), jnp.tile(u, 4), trips
            ).reshape(4, n)
            return jnp.where(all_bad, uc[jnp.argmin(ub, axis=0), rows], chosen)

        return jax.lax.cond(jnp.any(all_bad), _redraw, lambda _: chosen, None)

    def _sample_users(self, n: int) -> np.ndarray:
        return self.rng.choice(self._eligible_users, size=n)

    # on-device adaptive (Rendle'14) draws --------------------------------
    # The reference's default sampler (bprmf.py:15-19, 73-99) draws a
    # rank ~ Exp(bias), a factor ∝ |factor|·var, and looks the item up in
    # the factor-sorted rank table, rejecting forbidden candidates. The
    # host twin above (_adaptive_negatives_vec) vectorizes that loop; the
    # device path below removes the host from the hot loop entirely:
    # the rank tables are REFRESHED on device (argsort of the live factor
    # matrix — no host transfer) and the draws+rejection fuse into the
    # same dispatch as the SGD chunks. The sampling DISTRIBUTION matches
    # the host path (the truncated exponential is sampled by inverse CDF
    # instead of redraw-until, which is the same distribution); the RNG
    # stream does not — same contract as the uniform device path.
    # 16 rounds (vs the uniform path's 8): the adaptive distribution
    # concentrates on high-rank items, which can overlap a user's
    # history far more than the uniform density, so the residual
    # probability of emitting a seen item (rejected-mass^R per draw)
    # needs the extra headroom. Draws are cheap; the membership test is
    # a vectorized binary search.
    _ADAPTIVE_REJECTION_ROUNDS = 16

    def _device_adaptive_draw(self, key, weights, signs, ranks, reject_fn):
        """One adaptive negative per row of ``weights``.

        weights/signs: [n, F] per-sample factor tables (|factors|·var and
        their signs); ranks: [N, F] device rank table; reject_fn(cand
        [R, n]) -> bool mask. R pre-drawn rounds, first accepted
        candidate kept (residual acceptance failure = density^R, same
        bound as the uniform path's _device_negatives)."""
        R = self._ADAPTIVE_REJECTION_ROUNDS
        n, F = weights.shape
        N = self.n_items
        lam = float(self.sampling_bias)
        k1, k2, k3 = jax.random.split(key, 3)
        if lam <= 0.0:
            # host parity: rng.exponential(scale=0) returns all zeros,
            # i.e. always the top-ranked item per factor
            rank = jnp.zeros((R, n), jnp.int32)
        else:
            # rank ~ Exp(lam) conditioned on rank < N, by inverse CDF —
            # the distribution of the host's redraw-while->=N loop
            # (bprmf.py:88)
            v = jax.random.uniform(k1, (R, n))
            fmax = 1.0 - np.exp(-N / lam)
            rank = jnp.floor(-lam * jnp.log1p(-v * fmax)).astype(jnp.int32)
            rank = jnp.minimum(rank, N - 1)  # float-rounding guard
        # factor ~ Categorical(weights) per row (CDF inversion, fresh
        # draw per rejection round like the host path)
        cum = jnp.cumsum(weights, axis=1)  # [n, F]
        rnd = jax.random.uniform(k2, (R, n)) * cum[:, -1]
        f = jnp.minimum((cum[None] < rnd[..., None]).sum(-1), F - 1)  # [R,n]
        rows = jnp.arange(n)
        sgn = signs[rows[None, :], f]
        # numpy signed-index trick (bprmf.py:91): sign<0 indexes the
        # ranking from the other end; ranks[-r] == ranks[N-r], r=0 -> 0
        idx = jnp.where(sgn < 0, (N - rank) % N, rank)
        cand = ranks[idx, f]  # [R, n]
        bad = reject_fn(cand)
        first = jnp.argmin(bad, axis=0)  # first non-rejected per column
        chosen = cand[first, rows]
        # all-R-rejected tail: the host/reference sampler redraws until
        # accepted, so emitting a rejected candidate (argmin of all-True
        # = 0) would be a tail divergence from the reference
        # distribution. Fall back to uniform non-member draws for those
        # columns; lax.cond skips the extra membership pass entirely in
        # the overwhelmingly common case where every column accepted.
        all_bad = bad.all(axis=0)

        def _uniform_fallback(_):
            ucand = jax.random.randint(k3, (4, n), 0, N)
            ubad = reject_fn(ucand)
            ufirst = jnp.argmin(ubad, axis=0)
            return jnp.where(all_bad, ucand[ufirst, rows], chosen)

        return jax.lax.cond(
            jnp.any(all_bad), _uniform_fallback, lambda _: chosen, None
        )

    def _adaptive_negatives_vec(self, weights, signs, reject_fn) -> np.ndarray:
        """Vectorized Rendle'14 adaptive negative sampling
        (bprmf.py:73-99; fpmc.py:86-114).

        Per sample: draw rank ~ Exp(sampling_bias) (re-drawn while
        ≥ n_items), draw a factor f ∝ ``weights`` row, take the item at
        the signed rank in the factor-sorted ranking (negative sign ⇒
        index from the other end, bprmf.py:91), and re-draw both on
        rejection. All draws are whole-array; each rejection round
        re-draws only the rejected tail, so the common case is ONE pass
        (the per-sample rejection probability is the user's history
        density, typically well under 1%).

        ``weights``/``signs``: [n, F] per-sample factor tables;
        ``reject_fn(todo_indices, candidates) -> rejected mask``.
        """
        n, F = weights.shape
        cum = np.cumsum(weights, axis=1)  # [n, F] per-row factor CDF
        out = np.empty(n, dtype=np.int64)
        todo = np.arange(n)
        rounds = 0
        while len(todo):
            rounds += 1
            if rounds > 1000:  # the reference would spin forever too
                raise RuntimeError(
                    "adaptive sampling rejected 1000 consecutive draws "
                    f"for {len(todo)} samples"
                )
            m = len(todo)
            rank = self.rng.exponential(scale=self.sampling_bias, size=m)
            while True:
                bad = rank >= self.n_items
                nb = int(bad.sum())
                if not nb:
                    break
                rank[bad] = self.rng.exponential(scale=self.sampling_bias, size=nb)
            c = cum[todo]
            rnd = self.rng.random(m) * c[:, -1]
            f = np.minimum((c < rnd[:, None]).sum(axis=1), F - 1)
            idx = rank.astype(np.int64) * signs[todo, f].astype(np.int64)
            cand = self.ranks[idx, f]
            rejected = np.asarray(reject_fn(todo, cand), dtype=bool)
            keep = ~rejected
            out[todo[keep]] = cand[keep]
            todo = todo[rejected]
        return out

    def _uniform_negatives_for_users(self, users: np.ndarray) -> np.ndarray:
        """Uniform negatives not in each user's FULL history (CSR-backed
        vectorized rejection; equivalent to bprmf.py:95-97)."""
        n = len(users)
        out = self.rng.integers(0, self.n_items, size=n)
        for _ in range(30):
            bad = self._is_member(users, out)
            if not bad.any():
                break
            out[bad] = self.rng.integers(0, self.n_items, size=int(bad.sum()))
        return out

    # bucketed device sampling for the basket models (FISM/Fossil) ------
    def _upload_bucket_store(self) -> None:
        """Device-resident per-length-bucket user lists.

        Basket gathers need a STATIC pad per compiled dispatch; grouping
        eligible users by the power-of-two bucket of their history
        length lets each dispatch compile for one pad (a handful of
        buckets total) instead of the global maximum. A dispatch draws
        its bucket with probability proportional to the bucket's
        population and users uniformly within it, so the marginal
        per-sample user distribution stays uniform over eligible users
        (samples within one dispatch are length-correlated — an SGD
        ordering effect only)."""
        import jax

        if not hasattr(self, "_dev_sample_store"):
            self._upload_sample_store()
        lens = self.users[self._eligible_users, 1].astype(int)
        pads = np.array([_bucket(int(ln)) for ln in lens])
        self._bucket_users = {}
        self._bucket_probs = {}
        total = len(self._eligible_users)
        for P in np.unique(pads):
            sel = self._eligible_users[pads == P].astype(np.int32)
            self._bucket_users[int(P)] = jax.device_put(sel)
            self._bucket_probs[int(P)] = len(sel) / total
        self._bucket_steps: dict = {}

    def _draw_bucket(self) -> int:
        keys = sorted(self._bucket_probs)
        probs = np.array([self._bucket_probs[k] for k in keys])
        return int(self.rng.choice(keys, p=probs))


# ======================================================================
class BPRMF(MFBase):
    """BPR-MF (Rendle'09) with optional adaptive sampling (Rendle'14).
    Math parity: bprmf.py:36-99."""

    def __init__(self, k=32, adaptive_sampling=True, sampling_bias=500, **kwargs):
        super().__init__(**kwargs)
        self.name = "BPRMF"
        self.k = k
        self.adaptive_sampling = adaptive_sampling
        self.sampling_bias = sampling_bias

    def _get_model_filename(self, epochs):
        filename = (
            "bprmf_ne" + str(epochs) + "_lr" + str(self.init_learning_rate)
            + "_an" + str(self.annealing_rate) + "_k" + str(self.k)
            + "_reg" + str(self.reg) + "_ini" + str(self.init_sigma)
        )
        if self.adaptive_sampling:
            filename += "_as" + str(self.sampling_bias)
        return filename + ".npz"

    def init_model(self):
        self.V = jnp.asarray(
            self.init_sigma * self.rng.standard_normal((self.n_users, self.k)), jnp.float32
        )
        self.H = jnp.asarray(
            self.init_sigma * self.rng.standard_normal((self.n_items, self.k)), jnp.float32
        )
        self.bias = jnp.zeros(self.n_items, jnp.float32)
        self._step = jax.jit(partial(self._sgd_chunk, self.reg), donate_argnums=(0, 1, 2))

    @staticmethod
    def _sgd_chunk(reg, V, H, bias, u, i, j, lr):
        Vu, Hi, Hj = V[u], H[i], H[j]
        x_true = bias[i] + jnp.sum(Vu * Hi, axis=-1)
        x_false = bias[j] + jnp.sum(Vu * Hj, axis=-1)
        delta = _sigmoid(jnp.clip(x_false - x_true, -10, 10))[:, None]
        V = V.at[u].add(lr * (delta * (Hi - Hj) - reg * Vu))
        H = H.at[i].add(lr * (delta * Vu - reg * Hi))
        H = H.at[j].add(lr * (-delta * Vu - reg / 10 * Hj))
        d = delta[:, 0]
        bias = bias.at[i].add(lr * (d - reg * bias[i]))
        bias = bias.at[j].add(lr * (-d - reg * bias[j]))
        return V, H, bias, d.mean()

    # ------------------------------------------------------------------
    def compute_factor_rankings(self):
        """bprmf.py:66-71."""
        H = self._np("H")
        self.ranks = np.argsort(H, axis=0)
        self.var = np.var(H, axis=0)

    def _adaptive_negatives(self, users):
        """Whole-chunk adaptive negatives: per-sample factor tables from
        the user rows of V, rejection = CSR membership in the user's
        history (bprmf.py:95-97)."""
        Vu = self._np("V")[users]
        return self._adaptive_negatives_vec(
            np.abs(Vu) * self.var,
            np.sign(Vu),
            lambda todo, cand: self._is_member(users[todo], cand),
        )

    def _adaptive_negatives_loop(self, users, user_item_rows):
        """Reference-shaped per-sample loop (bprmf.py:73-99); kept as the
        distribution oracle for tests — never on the training path."""
        n = len(users)
        V = self._np("V")
        out = np.empty(n, dtype=np.int64)
        for s in range(n):
            u = users[s]
            forbidden = user_item_rows[s]
            factor_prob = np.abs(V[u]) * self.var
            p = factor_prob / factor_prob.sum()
            signs = np.sign(V[u])
            while True:
                rank = self.rng.exponential(scale=self.sampling_bias)
                while rank >= self.n_items:
                    rank = self.rng.exponential(scale=self.sampling_bias)
                f = self.rng.choice(self.k, p=p)
                # signed-index trick (bprmf.py:91): negative sign indexes
                # the ranking from the other end
                false_item = self.ranks[int(int(rank) * signs[f]), f]
                if false_item not in forbidden:
                    break
            out[s] = false_item
        return out

    def _sample_chunk(self, n):
        users = self._sample_users(n)
        offs, lens = self.users[users, 0], self.users[users, 1]
        true_items = self.items[offs + self.rng.integers(0, lens)]
        if self.adaptive_sampling:
            false_items = self._adaptive_negatives(users)
        else:
            false_items = self._uniform_negatives_for_users(users)
        return users, true_items, false_items

    def _build_device_step(self):
        st = self._dev_sample_store
        n = self.samples_per_step
        K = self.chunks_per_dispatch
        trips = self._bs_trips
        E = len(self._eligible_users)
        reg = self.reg
        sgd = self._sgd_chunk

        def sample(key):
            k1, k2, k3 = jax.random.split(key, 3)
            u = st["eligible"][jax.random.randint(k1, (n,), 0, E)]
            offs, lens = st["offs"][u], st["lens"][u]
            i = st["items"][offs + jax.random.randint(k2, (n,), 0, lens)]
            j = self._device_negatives(st, k3, u, trips)
            return u, i, j

        def multi(V, H, bias, key, lr):
            def body(carry, k):
                V, H, bias = carry
                u, i, j = sample(k)
                V, H, bias, c = sgd(reg, V, H, bias, u, i, j, lr)
                return (V, H, bias), c

            (V, H, bias), costs = jax.lax.scan(
                body, (V, H, bias), jax.random.split(key, K)
            )
            return V, H, bias, costs.mean()

        self._multi_step = jax.jit(multi, donate_argnums=(0, 1, 2))

    def _build_adaptive_device_step(self):
        """Adaptive twin of ``_build_device_step``: the Rendle'14 draws
        (exp-rank + factor-categorical + signed rank-table lookup +
        history-membership rejection) fuse into the same K-chunk SGD
        dispatch; the rank table arrives as a device argument refreshed
        by ``_device_rank_refresh`` every n·ln(n) samples."""
        st = self._dev_sample_store
        n = self.samples_per_step
        K = self.chunks_per_dispatch
        trips = self._bs_trips
        E = len(self._eligible_users)
        reg = self.reg
        sgd = self._sgd_chunk
        R = self._ADAPTIVE_REJECTION_ROUNDS

        def sample(key, V, ranks, var):
            k1, k2, k3 = jax.random.split(key, 3)
            u = st["eligible"][jax.random.randint(k1, (n,), 0, E)]
            offs, lens = st["offs"][u], st["lens"][u]
            i = st["items"][offs + jax.random.randint(k2, (n,), 0, lens)]
            Vu = V[u]  # LIVE user factors (the host path also re-reads V
            # each chunk; only the rank table is stale between refreshes)
            j = self._device_adaptive_draw(
                k3,
                jnp.abs(Vu) * var,
                jnp.sign(Vu),
                ranks,
                lambda cand: self._device_member(
                    st, cand.reshape(-1), jnp.tile(u, cand.shape[0]), trips
                ).reshape(cand.shape),
            )
            return u, i, j

        def multi(V, H, bias, ranks, var, key, lr):
            def body(carry, k):
                V, H, bias = carry
                u, i, j = sample(k, V, ranks, var)
                V, H, bias, c = sgd(reg, V, H, bias, u, i, j, lr)
                return (V, H, bias), c

            (V, H, bias), costs = jax.lax.scan(
                body, (V, H, bias), jax.random.split(key, K)
            )
            return V, H, bias, costs.mean()

        self._multi_step_adaptive = jax.jit(multi, donate_argnums=(0, 1, 2))

    def _device_rank_refresh(self):
        """Rank-table refresh entirely ON DEVICE: argsort + var of the
        live item-factor matrix (the host path's compute_factor_rankings
        pulls H to the host and argsorts there — bprmf.py:66-71)."""
        if not hasattr(self, "_rank_refresh_fn"):
            self._rank_refresh_fn = jax.jit(
                lambda H: (
                    jnp.argsort(H, axis=0).astype(jnp.int32),
                    jnp.var(H, axis=0),
                )
            )
        self._dev_ranks, self._dev_var = self._rank_refresh_fn(self.H)

    def training_step(self, iterations):
        n = self.samples_per_step
        if not self.adaptive_sampling:
            # uniform sampling runs entirely on device: K fused
            # (sample + SGD) chunks per dispatch
            if not hasattr(self, "_multi_step"):
                self._upload_sample_store()
                self._build_device_step()
            self._sample_key, sub = jax.random.split(self._sample_key)
            self.V, self.H, self.bias, cost = self._multi_step(
                self.V, self.H, self.bias, sub, np.float32(self.learning_rate)
            )
            return cost, n * self.chunks_per_dispatch
        if self.device_adaptive:
            if not hasattr(self, "_multi_step_adaptive"):
                self._upload_sample_store()
                self._build_adaptive_device_step()
                self._next_rank_refresh = -1
            if iterations >= self._next_rank_refresh:
                self._device_rank_refresh()
                self._next_rank_refresh = iterations + int(
                    self.n_items * np.log(self.n_items)
                )
            self._sample_key, sub = jax.random.split(self._sample_key)
            self.V, self.H, self.bias, cost = self._multi_step_adaptive(
                self.V, self.H, self.bias, self._dev_ranks, self._dev_var,
                sub, np.float32(self.learning_rate),
            )
            return cost, n * self.chunks_per_dispatch
        if iterations % int(self.n_items * np.log(self.n_items)) < n or not hasattr(
            self, "ranks"
        ):
            self.compute_factor_rankings()
        u, i, j = self._sample_chunk(n)
        self.V, self.H, self.bias, cost = self._step(
            self.V, self.H, self.bias, u, i, j, np.float32(self.learning_rate)
        )
        return cost, n

    # ------------------------------------------------------------------
    def _rep_rows(self, user_ids, seqs):
        return self._np("V")[user_ids]

    def _device_out_table(self):
        import jax.numpy as jnp

        return jnp.asarray(self.H).T, self.bias

    def _batch_scores(self, user_ids, seqs):
        return self._np("bias") + self._rep_rows(user_ids, seqs) @ self._np("H").T

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        V, H, bias = self._np("V"), self._np("H"), self._np("bias")
        output = bias + V[user_id] @ H.T
        output[[i[0] for i in sequence]] = -np.inf
        output[list(exclude)] = -np.inf
        return list(np.argpartition(-output, range(k))[:k])

    def save(self, filename):
        self._save_arrays(filename, V=self.V, H=self.H, bias=self.bias)

    def load(self, filename):
        # keep host arrays: prediction is numpy; training re-puts lazily
        f = np.load(filename)
        self.V = f["V"]
        self.H = f["H"]
        self.bias = f["bias"]
        self._step = jax.jit(partial(self._sgd_chunk, self.reg), donate_argnums=(0, 1, 2))


# ======================================================================
class FPMC(MFBase):
    """Factorized Personalized Markov Chains (Rendle'10). Parity: fpmc.py."""

    def __init__(self, k_cf=32, k_mc=32, adaptive_sampling=True, sampling_bias=500, **kwargs):
        super().__init__(**kwargs)
        self.name = "FPMC"
        self.k_cf = k_cf
        self.k_mc = k_mc
        self.adaptive_sampling = adaptive_sampling
        self.sampling_bias = sampling_bias

    def _get_model_filename(self, epochs):
        filename = (
            "fpmc_ne" + str(epochs) + "_lr" + str(self.init_learning_rate)
            + "_an" + str(self.annealing_rate) + "_kcf" + str(self.k_cf)
            + "_kmc" + str(self.k_mc) + "_reg" + str(self.reg)
            + "_ini" + str(self.init_sigma)
        )
        if self.adaptive_sampling:
            filename += "_as" + str(self.sampling_bias)
        return filename + ".npz"

    def init_model(self):
        rnd = self.rng.standard_normal
        s = self.init_sigma
        self.V_user_item = jnp.asarray(s * rnd((self.n_users, self.k_cf)), jnp.float32)
        self.V_item_user = jnp.asarray(s * rnd((self.n_items, self.k_cf)), jnp.float32)
        self.V_prev_next = jnp.asarray(s * rnd((self.n_items, self.k_mc)), jnp.float32)
        self.V_next_prev = jnp.asarray(s * rnd((self.n_items, self.k_mc)), jnp.float32)
        self._step = jax.jit(
            partial(self._sgd_chunk, self.reg), donate_argnums=(0, 1, 2, 3)
        )

    @staticmethod
    def _sgd_chunk(reg, VUI, VIU, VPN, VNP, u, p, i, j, lr):
        VUIu, VIUi, VIUj = VUI[u], VIU[i], VIU[j]
        VPNp, VNPi, VNPj = VPN[p], VNP[i], VNP[j]
        x_true = jnp.sum(VUIu * VIUi, -1) + jnp.sum(VPNp * VNPi, -1)
        x_false = jnp.sum(VUIu * VIUj, -1) + jnp.sum(VPNp * VNPj, -1)
        delta = _sigmoid(jnp.clip(x_false - x_true, -10, 10))[:, None]
        VUI = VUI.at[u].add(lr * (delta * (VIUi - VIUj) - reg * VUIu))
        VIU = VIU.at[i].add(lr * (delta * VUIu - reg * VIUi))
        VIU = VIU.at[j].add(lr * (-delta * VUIu - reg * VIUj))
        VPN = VPN.at[p].add(lr * (delta * (VNPi - VNPj) - reg * VPNp))
        VNP = VNP.at[i].add(lr * (delta * VPNp - reg * VNPi))
        VNP = VNP.at[j].add(lr * (-delta * VPNp - reg * VNPj))
        return VUI, VIU, VPN, VNP, delta[:, 0].mean()

    def compute_factor_rankings(self):
        """fpmc.py:74-84."""
        VIU, VNP = self._np("V_item_user"), self._np("V_next_prev")
        self.ranks = np.concatenate((np.argsort(VIU, axis=0), np.argsort(VNP, axis=0)), axis=1)
        self.var = np.concatenate((np.var(VIU, axis=0), np.var(VNP, axis=0)))

    def _sample_chunk(self, n):
        users = self._sample_users(n)
        offs, lens = self.users[users, 0], self.users[users, 1]
        r = self.rng.integers(0, lens - 1)
        prevs = self.items[offs + r]
        trues = self.items[offs + r + 1]
        if self.adaptive_sampling:
            # whole-chunk adaptive draw over the concatenated CF+MC
            # factor tables (fpmc.py:86-114); rejection = sampled the
            # true next item
            concat = np.concatenate(
                (self._np("V_user_item")[users], self._np("V_prev_next")[prevs]),
                axis=1,
            )
            falses = self._adaptive_negatives_vec(
                np.abs(concat) * self.var,
                np.sign(concat),
                lambda todo, cand: cand == trues[todo],
            )
        else:
            falses = self.rng.integers(0, self.n_items - 1, size=n)
            falses[falses >= trues] += 1  # ensure false != true (fpmc.py:110-112)
        return users, prevs, trues, falses

    def _build_device_step(self):
        """Fused on-device (sample + SGD) dispatch for the uniform path:
        (user, prev, next) position draws from the HBM-resident index
        store and shifted-uniform negatives (false != true,
        fpmc.py:110-112) — no host sampling between checkpoints, same
        pattern as BPRMF._build_device_step."""
        st = self._dev_sample_store
        n = self.samples_per_step
        K = self.chunks_per_dispatch
        E = len(self._eligible_users)
        reg = self.reg
        sgd = self._sgd_chunk
        n_items = self.n_items

        def sample(key):
            k1, k2, k3 = jax.random.split(key, 3)
            u = st["eligible"][jax.random.randint(k1, (n,), 0, E)]
            offs, lens = st["offs"][u], st["lens"][u]
            r = jax.random.randint(k2, (n,), 0, lens - 1)
            p = st["items"][offs + r]
            i = st["items"][offs + r + 1]
            j = jax.random.randint(k3, (n,), 0, n_items - 1)
            j = jnp.where(j >= i, j + 1, j)
            return u, p, i, j

        def multi(VUI, VIU, VPN, VNP, key, lr):
            def body(carry, k):
                u, p, i, j = sample(k)
                out = sgd(reg, *carry, u, p, i, j, lr)
                return tuple(out[:-1]), out[-1]

            carry, costs = jax.lax.scan(
                body, (VUI, VIU, VPN, VNP), jax.random.split(key, K)
            )
            return (*carry, costs.mean())

        self._multi_step = jax.jit(multi, donate_argnums=(0, 1, 2, 3))

    def _build_adaptive_device_step(self):
        """Adaptive twin over the CONCATENATED CF+MC factor tables
        (fpmc.py:86-114): weights come from the live [VUI[u] ‖ VPN[p]]
        rows, the rank table is the column-concatenated argsorts of
        VIU/VNP refreshed on device, rejection = drew the true next
        item."""
        st = self._dev_sample_store
        n = self.samples_per_step
        K = self.chunks_per_dispatch
        E = len(self._eligible_users)
        reg = self.reg
        sgd = self._sgd_chunk

        def sample(key, VUI, VPN, ranks, var):
            k1, k2, k3 = jax.random.split(key, 3)
            u = st["eligible"][jax.random.randint(k1, (n,), 0, E)]
            offs, lens = st["offs"][u], st["lens"][u]
            r = jax.random.randint(k2, (n,), 0, lens - 1)
            p = st["items"][offs + r]
            i = st["items"][offs + r + 1]
            concat = jnp.concatenate((VUI[u], VPN[p]), axis=1)
            j = self._device_adaptive_draw(
                k3,
                jnp.abs(concat) * var,
                jnp.sign(concat),
                ranks,
                lambda cand: cand == i[None, :],
            )
            return u, p, i, j

        def multi(VUI, VIU, VPN, VNP, ranks, var, key, lr):
            def body(carry, k):
                VUI, VIU, VPN, VNP = carry
                u, p, i, j = sample(k, VUI, VPN, ranks, var)
                out = sgd(reg, VUI, VIU, VPN, VNP, u, p, i, j, lr)
                return tuple(out[:-1]), out[-1]

            carry, costs = jax.lax.scan(
                body,
                (VUI, VIU, VPN, VNP),
                jax.random.split(key, K),
            )
            return (*carry, costs.mean())

        self._multi_step_adaptive = jax.jit(multi, donate_argnums=(0, 1, 2, 3))

    def _device_rank_refresh(self):
        """Device argsort+var of VIU/VNP, column-concatenated like the
        host compute_factor_rankings (fpmc.py:74-84)."""
        if not hasattr(self, "_rank_refresh_fn"):
            self._rank_refresh_fn = jax.jit(
                lambda A, B: (
                    jnp.concatenate(
                        (
                            jnp.argsort(A, axis=0).astype(jnp.int32),
                            jnp.argsort(B, axis=0).astype(jnp.int32),
                        ),
                        axis=1,
                    ),
                    jnp.concatenate((jnp.var(A, axis=0), jnp.var(B, axis=0))),
                )
            )
        self._dev_ranks, self._dev_var = self._rank_refresh_fn(
            self.V_item_user, self.V_next_prev
        )

    def training_step(self, iterations):
        n = self.samples_per_step
        if not self.adaptive_sampling:
            if not hasattr(self, "_multi_step"):
                self._upload_sample_store()
                self._build_device_step()
            self._sample_key, sub = jax.random.split(self._sample_key)
            (
                self.V_user_item,
                self.V_item_user,
                self.V_prev_next,
                self.V_next_prev,
                cost,
            ) = self._multi_step(
                self.V_user_item,
                self.V_item_user,
                self.V_prev_next,
                self.V_next_prev,
                sub,
                np.float32(self.learning_rate),
            )
            return cost, n * self.chunks_per_dispatch
        if self.device_adaptive:
            if not hasattr(self, "_multi_step_adaptive"):
                self._upload_sample_store()
                self._build_adaptive_device_step()
                self._next_rank_refresh = -1
            if iterations >= self._next_rank_refresh:
                self._device_rank_refresh()
                self._next_rank_refresh = iterations + int(
                    self.n_items * np.log(self.n_items)
                )
            self._sample_key, sub = jax.random.split(self._sample_key)
            (
                self.V_user_item,
                self.V_item_user,
                self.V_prev_next,
                self.V_next_prev,
                cost,
            ) = self._multi_step_adaptive(
                self.V_user_item,
                self.V_item_user,
                self.V_prev_next,
                self.V_next_prev,
                self._dev_ranks,
                self._dev_var,
                sub,
                np.float32(self.learning_rate),
            )
            return cost, n * self.chunks_per_dispatch
        if iterations % int(self.n_items * np.log(self.n_items)) < n or not hasattr(
            self, "ranks"
        ):
            self.compute_factor_rankings()
        u, p, i, j = self._sample_chunk(n)
        (
            self.V_user_item,
            self.V_item_user,
            self.V_prev_next,
            self.V_next_prev,
            cost,
        ) = self._step(
            self.V_user_item,
            self.V_item_user,
            self.V_prev_next,
            self.V_next_prev,
            u,
            p,
            i,
            j,
            np.float32(self.learning_rate),
        )
        return cost, n

    def _rep_rows(self, user_ids, seqs):
        lasts = np.array([int(s[-1][0]) for s in seqs], dtype=np.int64)
        return np.concatenate(
            (self._np("V_user_item")[user_ids], self._np("V_prev_next")[lasts]),
            axis=1,
        )

    def _device_out_table(self):
        import jax.numpy as jnp

        # [VIU ‖ VNP]^T: scores = [VUI[u] ‖ VPN[last]] @ it (fpmc.py's
        # CF + MC terms in one matmul); no bias term in FPMC
        return (
            jnp.concatenate(
                (jnp.asarray(self.V_item_user), jnp.asarray(self.V_next_prev)),
                axis=1,
            ).T,
            None,
        )

    def _batch_scores(self, user_ids, seqs):
        lasts = np.array([int(s[-1][0]) for s in seqs], dtype=np.int64)
        return (
            self._np("V_user_item")[user_ids] @ self._np("V_item_user").T
            + self._np("V_prev_next")[lasts] @ self._np("V_next_prev").T
        )

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        last_item = sequence[-1][0]
        VUI = self._np("V_user_item")
        VIU = self._np("V_item_user")
        VPN = self._np("V_prev_next")
        VNP = self._np("V_next_prev")
        output = VUI[user_id] @ VIU.T + VPN[last_item] @ VNP.T
        output[[i[0] for i in sequence]] = -np.inf
        output[list(exclude)] = -np.inf
        return list(np.argpartition(-output, range(k))[:k])

    def save(self, filename):
        self._save_arrays(
            filename,
            V_user_item=self.V_user_item,
            V_item_user=self.V_item_user,
            V_prev_next=self.V_prev_next,
            V_next_prev=self.V_next_prev,
        )

    def load(self, filename):
        f = np.load(filename)
        self.V_user_item = f["V_user_item"]
        self.V_item_user = f["V_item_user"]
        self.V_prev_next = f["V_prev_next"]
        self.V_next_prev = f["V_next_prev"]
        self._step = jax.jit(
            partial(self._sgd_chunk, self.reg), donate_argnums=(0, 1, 2, 3)
        )


# ======================================================================
def _scan_subchunks(chunk_fn, n_params: int, n_sub: int):
    """Wrap a vectorized SGD chunk into ``n_sub`` sequential sub-chunks
    scanned on device (one dispatch, params refreshed between sub-chunks).

    Needed for the basket models (FISM/Fossil): a user's whole history
    scatters into V, so a 512-sample chunk hits each hot item's row with
    dozens of colliding updates computed from the SAME stale parameters
    — the sum overshoots and diverges where the reference's per-sample
    sequential SGD (fism.py:94-96) is stable. Scanning sub-chunks keeps
    collision counts per update ~1 while staying a single device call."""

    def wrapped(*args):
        params = args[:n_params]
        lr = args[-1]
        data = [
            d.reshape(n_sub, d.shape[0] // n_sub, *d.shape[1:])
            for d in args[n_params:-1]
        ]

        def body(carry, xs):
            out = chunk_fn(*carry, *xs, lr)
            return tuple(out[:-1]), out[-1]

        params, costs = jax.lax.scan(body, tuple(params), tuple(data))
        return (*params, costs.mean())

    return wrapped


class FISM(MFBase):
    """Factored Item Similarity Model (Kabbur'13). Parity: fism.py.

    Variable-length user baskets are padded per chunk to a power-of-two
    bucket (bounded recompilation); padded slots scatter to row index
    ``n_items`` which jit drops (JAX scatter OOB semantics)."""

    def __init__(self, k=100, alpha=0.5, loss="auc", **kwargs):
        super().__init__(**kwargs)
        self.name = "FISM"
        self.k = k
        self.loss = loss
        if loss not in ("RMSE", "BPR"):
            raise ValueError("Unknown loss for FISM: " + str(loss))
        self.alpha = alpha

    def _get_model_filename(self, epochs):
        return (
            "fism_" + self.loss + "_ne" + str(epochs)
            + "_lr" + str(self.init_learning_rate) + "_an" + str(self.annealing_rate)
            + "_k" + str(self.k) + "_reg" + str(self.reg)
            + "_ini" + str(self.init_sigma) + ".npz"
        )

    def init_model(self):
        self.V = jnp.asarray(
            self.init_sigma * self.rng.standard_normal((self.n_items, self.k)), jnp.float32
        )
        self.H = jnp.asarray(
            self.init_sigma * self.rng.standard_normal((self.n_items, self.k)), jnp.float32
        )
        self.bias = jnp.zeros(self.n_items, jnp.float32)
        self._step = self._make_step()

    # basket scatters collide heavily (see _scan_subchunks); sub-chunk
    # size = samples_per_step / sub_chunks
    sub_chunks = 16

    def _make_step(self):
        chunk = partial(
            self._auc_chunk if self.loss == "BPR" else self._rmse_chunk,
            self.reg,
            self.alpha,
        )
        return jax.jit(
            _scan_subchunks(chunk, 3, self.sub_chunks), donate_argnums=(0, 1, 2)
        )

    @staticmethod
    def _auc_chunk(reg, alpha, V, H, bias, basket, bmask, i, j, lr):
        """basket excludes the true item (proper leave-one-out)."""
        counts = jnp.maximum(bmask.sum(-1), 1.0)
        scale = jnp.power(counts, -alpha)[:, None]
        Vrows = V[jnp.minimum(basket, V.shape[0] - 1)] * bmask[..., None]
        Vsum = Vrows.sum(axis=1)
        Hi, Hj = H[i], H[j]
        x_true = bias[i] + jnp.sum(scale * Vsum * Hi, -1)
        x_false = bias[j] + jnp.sum(scale * Vsum * Hj, -1)
        delta = _sigmoid(jnp.clip(x_false - x_true, -10, 10))[:, None]
        # scatter V updates over all basket rows (padded ids -> dropped)
        V_up = (
            lr
            * (
                (delta * scale)[:, None, :] * (Hi - Hj)[:, None, :]
                - reg * Vrows
            )
            * bmask[..., None]
        )
        V = V.at[basket.reshape(-1)].add(V_up.reshape(-1, V_up.shape[-1]))
        H = H.at[i].add(lr * (delta * scale * Vsum - reg * Hi))
        H = H.at[j].add(lr * (-delta * scale * Vsum - reg * Hj))
        d = delta[:, 0]
        bias = bias.at[i].add(lr * (d - reg * bias[i]))
        bias = bias.at[j].add(lr * (-d - reg * bias[j]))
        return V, H, bias, d.mean()

    @staticmethod
    def _rmse_chunk(reg, alpha, V, H, bias, basket, bmask, item, rating, lr):
        counts = jnp.maximum(bmask.sum(-1), 1.0)
        scale = jnp.power(counts, -alpha)[:, None]
        Vrows = V[jnp.minimum(basket, V.shape[0] - 1)] * bmask[..., None]
        Vsum = Vrows.sum(axis=1)
        Hi = H[item]
        pred = bias[item] + jnp.sum(scale * Vsum * Hi, -1)
        delta = (rating - pred)[:, None]
        V_up = (
            lr
            * ((delta * scale)[:, None, :] * Hi[:, None, :] - reg * Vrows)
            * bmask[..., None]
        )
        V = V.at[basket.reshape(-1)].add(V_up.reshape(-1, V_up.shape[-1]))
        H = H.at[item].add(lr * (delta * scale * Vsum - reg * Hi))
        bias = bias.at[item].add(lr * (delta[:, 0] - reg * bias[item]))
        return V, H, bias, jnp.abs(delta[:, 0]).mean()

    # ------------------------------------------------------------------
    def _sample_baskets(self, n):
        """Vectorized basket assembly: one gather over the flat item
        array instead of per-sample python slicing/choice (same sampling
        distribution; ~10x the host throughput)."""
        users = self._sample_users(n)
        offs, lens = self.users[users, 0], self.users[users, 1]
        trues = self.items[offs + self.rng.integers(0, lens)]
        pad = _bucket(int(lens.max()))
        j = np.arange(pad, dtype=np.int64)[None, :]
        valid = j < lens[:, None]
        basket = self.items[np.where(valid, offs[:, None] + j, 0)]
        # leave-one-out by value (the exclusion fism.py:116 intends)
        bmask = (valid & (basket != trues[:, None])).astype(np.float32)
        basket = np.where(bmask > 0, basket, self.n_items)
        falses = self._uniform_negatives_for_users(users)
        return basket, bmask, trues, falses

    # FISM/Fossil have no adaptive path; their uniform sampling defaults
    # to the fused on-device dispatch (set False to force host sampling)
    device_sampling = True

    def _build_bucket_step(self, P: int):
        """Fused (sample + sub-chunked SGD) dispatch compiled for basket
        pad ``P``: per scan iteration draw one sub-chunk's users from
        this length bucket, gather their baskets from the resident item
        array, draw negatives by on-device rejection, and apply the
        vectorized SGD chunk. One dispatch runs
        ``chunks_per_dispatch * sub_chunks`` iterations."""
        st = self._dev_sample_store
        users_b = self._bucket_users[P]
        nb = users_b.shape[0]
        n = max(1, self.samples_per_step // self.sub_chunks)
        K = self.chunks_per_dispatch * self.sub_chunks
        trips = self._bs_trips
        n_items = self.n_items
        bpr = self.loss == "BPR"
        chunk = partial(
            self._auc_chunk if bpr else self._rmse_chunk, self.reg, self.alpha
        )

        def sample(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            u = users_b[jax.random.randint(k1, (n,), 0, nb)]
            offs, lens = st["offs"][u], st["lens"][u]
            trues = st["items"][offs + jax.random.randint(k2, (n,), 0, lens)]
            j = jnp.arange(P)[None, :]
            valid = j < lens[:, None]
            basket = st["items"][jnp.where(valid, offs[:, None] + j, 0)]
            bmask = (valid & (basket != trues[:, None])).astype(jnp.float32)
            basket = jnp.where(bmask > 0, basket, n_items)
            falses = self._device_negatives(st, k3, u, trips)
            if bpr:
                return basket, bmask, trues, falses
            pos = jax.random.bernoulli(k4, 0.25, (n,))
            return (
                basket,
                bmask,
                jnp.where(pos, trues, falses),
                pos.astype(jnp.float32),
            )

        def multi(V, H, bias, key, lr):
            def body(carry, k):
                out = chunk(*carry, *sample(k), lr)
                return tuple(out[:-1]), out[-1]

            carry, costs = jax.lax.scan(
                body, (V, H, bias), jax.random.split(key, K)
            )
            return (*carry, costs.mean())

        return jax.jit(multi, donate_argnums=(0, 1, 2))

    def _device_training_step(self):
        if not hasattr(self, "_bucket_users"):
            self._upload_bucket_store()
        P = self._draw_bucket()
        fn = self._bucket_steps.get(P)
        if fn is None:
            fn = self._bucket_steps[P] = self._build_bucket_step(P)
        self._sample_key, sub = jax.random.split(self._sample_key)
        self.V, self.H, self.bias, cost = fn(
            self.V, self.H, self.bias, sub, np.float32(self.learning_rate)
        )
        return cost, self.samples_per_step * self.chunks_per_dispatch

    def training_step(self, iterations):
        if self.device_sampling:
            return self._device_training_step()
        n = self.samples_per_step
        basket, bmask, trues, falses = self._sample_baskets(n)
        if self.loss == "BPR":
            self.V, self.H, self.bias, cost = self._step(
                self.V, self.H, self.bias, basket, bmask, trues, falses,
                np.float32(self.learning_rate),
            )
        else:
            # 1:3 positive:negative mix (fism.py:118-126)
            pos = self.rng.random(n) < 0.25
            items = np.where(pos, trues, falses)
            ratings = pos.astype(np.float32)
            self.V, self.H, self.bias, cost = self._step(
                self.V, self.H, self.bias, basket, bmask, items, ratings,
                np.float32(self.learning_rate),
            )
        return cost, n

    def item_score(self, user_items):
        V, H, bias = self._np("V"), self._np("H"), self._np("bias")
        if not user_items:  # empty bag: 0^-alpha guard, score = bias
            return bias.copy()
        return bias + np.power(len(user_items), -self.alpha) * (
            V[user_items].sum(axis=0) @ H.T
        )

    def _rep_rows(self, user_ids, seqs):
        V = self._np("V")
        sums, lens, _, _ = self._bag_sums(V, seqs)
        # empty bags (length-1 validation sequences yield an empty first
        # half): 0^-alpha = inf would turn the zero sums row into NaNs —
        # clamp to 1 so the row scores as plain `bias`
        w = np.power(np.maximum(lens, 1).astype(np.float64), -self.alpha).astype(
            V.dtype
        )
        return sums * w[:, None]

    def _device_out_table(self):
        import jax.numpy as jnp

        return jnp.asarray(self.H).T, self.bias

    def _batch_scores(self, user_ids, seqs):
        return self._np("bias") + self._rep_rows(user_ids, seqs) @ self._np("H").T

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        user_items = [i[0] for i in sequence]
        output = self.item_score(user_items)
        output[user_items] = -np.inf
        output[list(exclude)] = -np.inf
        return list(np.argpartition(-output, range(k))[:k])

    def save(self, filename):
        self._save_arrays(filename, V=self.V, H=self.H, bias=self.bias)

    def load(self, filename):
        f = np.load(filename)
        self.V = f["V"]
        self.H = f["H"]
        self.bias = f["bias"]
        self._step = self._make_step()


# ======================================================================
class Fossil(MFBase):
    """FISM + factorized higher-order Markov chains (He & McAuley'16).
    Parity: fossil.py."""

    def __init__(self, k=32, order=1, alpha=0.2, **kwargs):
        super().__init__(**kwargs)
        self.name = "Fossil"
        self.k = k
        self.order = order
        self.alpha = alpha

    def _get_model_filename(self, epochs):
        return (
            "fossil_ne" + str(epochs) + "_lr" + str(self.init_learning_rate)
            + "_an" + str(self.annealing_rate) + "_k" + str(self.k)
            + "_o" + str(self.order) + "_reg" + str(self.reg)
            + "_ini" + str(self.init_sigma) + ".npz"
        )

    def init_model(self):
        s = self.init_sigma
        rnd = self.rng.standard_normal
        self.V = jnp.asarray(s * rnd((self.n_items, self.k)), jnp.float32)
        self.H = jnp.asarray(s * rnd((self.n_items, self.k)), jnp.float32)
        self.eta = jnp.asarray(s * rnd((self.n_users, self.order)), jnp.float32)
        self.eta_bias = jnp.zeros(self.order, jnp.float32)
        self.bias = jnp.zeros(self.n_items, jnp.float32)
        self._step = self._make_step()

    # see FISM.sub_chunks / _scan_subchunks
    sub_chunks = 16

    def _make_step(self):
        chunk = partial(self._sgd_chunk, self.reg, self.alpha, self.order)
        return jax.jit(
            _scan_subchunks(chunk, 5, self.sub_chunks),
            donate_argnums=(0, 1, 2, 3, 4),
        )

    @staticmethod
    def _sgd_chunk(reg, alpha, order, V, H, bias, eta, eta_bias, basket, bmask, recent, rmask, u, i, j, lr):
        """basket: prefix items before the target (excl. target);
        recent: the last ``order`` of them, most recent first."""
        counts = jnp.maximum(bmask.sum(-1), 1.0)
        scale = jnp.power(counts, -alpha)[:, None]
        Vrows = V[jnp.minimum(basket, V.shape[0] - 1)] * bmask[..., None]
        long_term = scale * Vrows.sum(axis=1)

        w = (eta_bias + eta[u]) * rmask  # [N, order]
        Vrecent = V[jnp.minimum(recent, V.shape[0] - 1)] * rmask[..., None]
        short_term = jnp.einsum("no,nok->nk", w, Vrecent)

        rep = long_term + short_term
        Hi, Hj = H[i], H[j]
        x_true = bias[i] + jnp.sum(rep * Hi, -1)
        x_false = bias[j] + jnp.sum(rep * Hj, -1)
        delta = _sigmoid(jnp.clip(x_false - x_true, -10, 10))[:, None]
        dH = Hi - Hj

        V_up = (
            lr * ((delta * scale)[:, None, :] * dH[:, None, :] - reg * Vrows)
            * bmask[..., None]
        )
        V = V.at[basket.reshape(-1)].add(V_up.reshape(-1, V_up.shape[-1]))
        V_up2 = lr * delta[:, None, :] * (w[..., None] * dH[:, None, :]) * rmask[..., None]
        V = V.at[recent.reshape(-1)].add(V_up2.reshape(-1, V_up2.shape[-1]))

        H = H.at[i].add(lr * (delta * rep - reg * Hi))
        H = H.at[j].add(lr * (-delta * rep - reg * Hj))
        d = delta[:, 0]
        bias = bias.at[i].add(lr * (d - reg * bias[i]))
        bias = bias.at[j].add(lr * (-d - reg * bias[j]))

        grad_eta = jnp.einsum("nok,nk->no", Vrecent, dH)  # [N, order]
        # eta_bias is GLOBAL: every sample in the chunk updates it, so a
        # summed update means an effective learning rate of lr*chunk_size
        # on this one parameter — it random-walks to divergence. Use the
        # per-position mean (≈ per-sample step size, fossil.py:96).
        n_eff = jnp.maximum(rmask.sum(axis=0), 1.0)
        eta_bias = eta_bias + lr * (
            (delta * grad_eta).sum(axis=0) / n_eff - reg * eta_bias
        )
        eta = eta.at[u].add(lr * (delta * grad_eta - reg * eta[u] * rmask))
        return V, H, bias, eta, eta_bias, d.mean()

    # ------------------------------------------------------------------
    def _sample_chunk(self, n):
        """Vectorized prefix/recent assembly (one gather over the flat
        item array; same sampling distribution as per-row slicing).
        Negatives reject against the user's FULL history (superset of the
        reference's prefix+target set, fossil.py sampling)."""
        users = self._sample_users(n)
        offs, lens = self.users[users, 0], self.users[users, 1]
        t = self.rng.integers(1, lens)  # prefix length; target = item t
        trues = self.items[offs + t]
        pad = _bucket(int(t.max()))
        j = np.arange(pad, dtype=np.int64)[None, :]
        valid = j < t[:, None]
        basket = np.where(
            valid, self.items[np.where(valid, offs[:, None] + j, 0)], self.n_items
        )
        bmask = valid.astype(np.float32)
        # the last ``order`` prefix items, most recent first
        k = np.arange(self.order, dtype=np.int64)[None, :]
        rvalid = k < t[:, None]
        ridx = np.where(rvalid, offs[:, None] + t[:, None] - 1 - k, 0)
        recent = np.where(rvalid, self.items[ridx], self.n_items)
        rmask = rvalid.astype(np.float32)
        falses = self._uniform_negatives_for_users(users)
        return users, basket, bmask, recent, rmask, trues, falses

    device_sampling = True  # see FISM.device_sampling

    def _build_bucket_step(self, P: int):
        """Fossil twin of FISM._build_bucket_step: prefix baskets (random
        cut t ∈ [1, len)), the last ``order`` prefix items most-recent-
        first, and rejection-sampled negatives — all on device."""
        st = self._dev_sample_store
        users_b = self._bucket_users[P]
        nb = users_b.shape[0]
        n = max(1, self.samples_per_step // self.sub_chunks)
        K = self.chunks_per_dispatch * self.sub_chunks
        trips = self._bs_trips
        n_items = self.n_items
        order = self.order
        chunk = partial(self._sgd_chunk, self.reg, self.alpha, order)

        def sample(key):
            k1, k2, k3 = jax.random.split(key, 3)
            u = users_b[jax.random.randint(k1, (n,), 0, nb)]
            offs, lens = st["offs"][u], st["lens"][u]
            t = jax.random.randint(k2, (n,), 1, lens)  # prefix length
            trues = st["items"][offs + t]
            j = jnp.arange(P)[None, :]
            valid = j < t[:, None]
            basket = jnp.where(
                valid,
                st["items"][jnp.where(valid, offs[:, None] + j, 0)],
                n_items,
            )
            bmask = valid.astype(jnp.float32)
            kk = jnp.arange(order)[None, :]
            rvalid = kk < t[:, None]
            ridx = jnp.where(rvalid, offs[:, None] + t[:, None] - 1 - kk, 0)
            recent = jnp.where(rvalid, st["items"][ridx], n_items)
            rmask = rvalid.astype(jnp.float32)
            falses = self._device_negatives(st, k3, u, trips)
            return basket, bmask, recent, rmask, u, trues, falses

        def multi(V, H, bias, eta, eta_bias, key, lr):
            def body(carry, k):
                out = chunk(*carry, *sample(k), lr)
                return tuple(out[:-1]), out[-1]

            carry, costs = jax.lax.scan(
                body, (V, H, bias, eta, eta_bias), jax.random.split(key, K)
            )
            return (*carry, costs.mean())

        return jax.jit(multi, donate_argnums=(0, 1, 2, 3, 4))

    def _device_training_step(self):
        if not hasattr(self, "_bucket_users"):
            self._upload_bucket_store()
        P = self._draw_bucket()
        fn = self._bucket_steps.get(P)
        if fn is None:
            fn = self._bucket_steps[P] = self._build_bucket_step(P)
        self._sample_key, sub = jax.random.split(self._sample_key)
        self.V, self.H, self.bias, self.eta, self.eta_bias, cost = fn(
            self.V, self.H, self.bias, self.eta, self.eta_bias, sub,
            np.float32(self.learning_rate),
        )
        return cost, self.samples_per_step * self.chunks_per_dispatch

    def training_step(self, iterations):
        if self.device_sampling:
            return self._device_training_step()
        n = self.samples_per_step
        users, basket, bmask, recent, rmask, trues, falses = self._sample_chunk(n)
        (
            self.V,
            self.H,
            self.bias,
            self.eta,
            self.eta_bias,
            cost,
        ) = self._step(
            self.V, self.H, self.bias, self.eta, self.eta_bias,
            basket, bmask, recent, rmask, users, trues, falses,
            np.float32(self.learning_rate),
        )
        return cost, n

    def item_score(self, user_id, user_items):
        V, H, bias = self._np("V"), self._np("H"), self._np("bias")
        eta, eta_bias = self._np("eta"), self._np("eta_bias")
        # empty-bag guard: 0^-alpha = inf * zero-sum = NaN
        long_term = np.power(max(len(user_items), 1), -self.alpha) * V[
            user_items
        ].sum(axis=0)
        effective_order = min(self.order, len(user_items))
        if user_id is None:
            w = (eta_bias + eta.mean(axis=0))[:effective_order]
        else:
            w = (eta_bias + eta[user_id])[:effective_order]
        short_term = w @ V[user_items[: -effective_order - 1 : -1]]
        return bias + (long_term + short_term) @ H.T

    def _rep_rows(self, user_ids, seqs):
        V = self._np("V")
        eta, eta_bias = self._np("eta"), self._np("eta_bias")
        sums, lens, flat, ends = self._bag_sums(V, seqs)
        # empty-bag guard as in FISM._batch_scores: clamp 0^-alpha
        long_term = sums * np.power(
            np.maximum(lens, 1).astype(np.float64), -self.alpha
        ).astype(V.dtype)[:, None]
        # the last `min(order, len)` items, most recent first, weighted by
        # the per-user short-term decay (fossil.py:42-56)
        j = np.arange(self.order, dtype=np.int64)[None, :]
        rvalid = j < np.minimum(self.order, lens)[:, None]
        recent = flat[np.where(rvalid, ends[:, None] - 1 - j, 0)]
        w = (eta_bias[None, :] + eta[user_ids]) * rvalid
        short = np.einsum("bj,bjk->bk", w, V[recent])
        return long_term + short

    def _device_out_table(self):
        import jax.numpy as jnp

        return jnp.asarray(self.H).T, self.bias

    def _batch_scores(self, user_ids, seqs):
        return self._np("bias") + self._rep_rows(user_ids, seqs) @ self._np("H").T

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        if exclude is None:
            exclude = []
        user_items = [i[0] for i in sequence]
        output = self.item_score(user_id, user_items)
        output[user_items] = -np.inf
        output[list(exclude)] = -np.inf
        return list(np.argpartition(-output, range(k))[:k])

    def save(self, filename):
        self._save_arrays(
            filename, V=self.V, H=self.H, bias=self.bias, eta=self.eta, eta_bias=self.eta_bias
        )

    def load(self, filename):
        f = np.load(filename)
        self.V = f["V"]
        self.H = f["H"]
        self.bias = f["bias"]
        self.eta = f["eta"]
        self.eta_bias = f["eta_bias"]
        self._step = self._make_step()
