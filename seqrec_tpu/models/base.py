"""RNN-family base predictor: batching, training loop, checkpointing, eval.

TPU-first re-design of /root/reference/neural_networks/rnn_base.py:58-643.
The predictor protocol is preserved — ``prepare_model(dataset)``,
``train(dataset, **opts)``, ``top_k_recommendations(...)``, ``save/load/
load_last``, ``metrics`` — so the train/test drivers stay model-agnostic.

Key departures from the reference (all TPU-motivated):

- Models are parameter pytrees + pure loss/score functions; the train step
  is one jitted function (loss → grad → optax update) with donated
  arguments instead of Theano shared-variable updates.
- Batch assembly produces packed integer arrays ``[B, L, F]`` of feature
  ids (the sparse one-hot trick) rather than dense one-hot tensors; the
  device side turns them into gate pre-activations with a single gather
  (see seqrec_tpu/models/recurrent.py).
- Validation is batched: the reference scores one user per compiled call
  (rnn_base.py:394-395); here all validation users are packed into fixed
  [chunk, L] arrays, scored and top-k'd on device in a few calls.
- Checkpoints are ``np.savez`` archives of the flattened parameter pytree;
  the reference's filename-encodes-all-hyperparameters convention
  (rnn_base.py:111-130) and ``load_last`` glob/regex resume protocol
  (rnn_base.py:481-506) are preserved so the test CLI's model-discovery
  workflow ports over. Optimizer state is intentionally not checkpointed,
  matching reference semantics (resume restarts Adam/Adagrad accumulators).
"""

from __future__ import annotations

import glob
import os
import re
import sys
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.data.noise import SequenceNoise
from seqrec_tpu.data.targets import SelectTargets
from seqrec_tpu.models.recurrent import RecurrentLayers
from seqrec_tpu.models.updates import Adagrad
from seqrec_tpu.ops.core import masked_top_k
from seqrec_tpu.utils import evaluation

# Defaults (reference rnn_base.py:24,32)
MAX_LENGTH = 200
BATCH_SIZE = 10


# npz cannot represent EXTENSION dtypes (ml_dtypes): np.savez writes a
# bfloat16 array's raw descriptor ('|V2') and np.load returns void bytes
# (verified 2026-08-21 — exact-resume of --u_moments bfloat16 state would
# silently load garbage; the same applies to any future float8 leaf).
# Encode such leaves as a same-width unsigned-integer view with the
# dtype name in a key-suffix marker, decode via ml_dtypes on load.
_DTYPE_MARK = "#dtype="
_UINT_BY_SIZE = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def pytree_save(filename: str, params) -> None:
    """Save a (nested-dict) pytree to an npz with path-encoded keys."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(prefix + (k,), v)
        else:
            arr = np.asarray(node)
            key = "/".join(prefix)
            # extension dtypes register with kind 'V' (non-structured)
            if arr.dtype.kind == "V" and arr.dtype.names is None:
                flat[key + _DTYPE_MARK + arr.dtype.name] = arr.view(
                    _UINT_BY_SIZE[arr.dtype.itemsize]
                )
            else:
                flat[key] = arr

    walk((), params)
    if os.path.dirname(filename) and not os.path.exists(os.path.dirname(filename)):
        os.makedirs(os.path.dirname(filename))
    with open(filename, "wb") as f:
        np.savez(f, **flat)


def pytree_load(filename: str) -> dict:
    """Inverse of :func:`pytree_save`."""
    import ml_dtypes

    out: dict = {}
    with np.load(filename) as data:
        for key in data.files:
            arr = data[key]
            if _DTYPE_MARK in key:
                key, _, name = key.partition(_DTYPE_MARK)
                if name == "bf16":  # legacy round-4 marker ("#bf16")
                    name = "bfloat16"
                arr = arr.view(np.dtype(getattr(ml_dtypes, name)))
            elif key.endswith("#bf16"):  # legacy round-4 marker
                key = key[: -len("#bf16")]
                arr = arr.view(ml_dtypes.bfloat16)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out


class RNNBase:
    """Base for sequence predictors trained with the generic loop."""

    def __init__(
        self,
        sequence_noise: SequenceNoise | None = None,
        recurrent_layer: RecurrentLayers | None = None,
        updater=None,
        target_selection: SelectTargets | None = None,
        interactions_are_unique: bool = True,
        use_ratings_features: bool = False,
        use_movies_features: bool = False,
        use_users_features: bool = False,
        max_length: int = MAX_LENGTH,
        batch_size: int = BATCH_SIZE,
        seed: int = 42,
        compute_dtype: str = "float32",
        lazy_updates: bool = False,
    ):
        self.sequence_noise = sequence_noise or SequenceNoise()
        self.recurrent_layer = recurrent_layer or RecurrentLayers()
        self.updater = updater or Adagrad()
        self.target_selection = target_selection or SelectTargets()
        self.interactions_are_unique = interactions_are_unique
        self.use_ratings_features = use_ratings_features
        # --mf/--uf: item/user side-feature one-hots folded into the
        # sparse input ids. The reference's implementation crashes (its
        # feature tables are None globals, rnn_base.py:26-29); here they
        # load from the dataset's data/{movie,user}_features files
        # (contract in seqrec_tpu/data/features.py).
        self.use_movies_features = use_movies_features
        self.use_users_features = use_users_features
        self._feature_tables = None
        self.max_length = max_length
        self.batch_size = batch_size
        self.seed = seed
        # bf16 halves the MXU cost of the catalog-sized output matmuls
        # (the FLOP-dominant op); accumulation stays f32 and parameters
        # stay f32, so only matmul inputs are cast.
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.rng = np.random.default_rng(seed)
        # derive the plugin RNG streams from the model seed unless the
        # caller provided explicit generators: seeded-by-default makes
        # runs reproducible, makes the mesh-vs-single-device parity
        # tests meaningful on the slow batching path (which draws
        # targets/noise per sequence), and is REQUIRED on multi-process
        # meshes, where every host must assemble identical batches
        # (parallel/mesh.put_global). The reference uses the unseeded
        # process-global `random` module here (target_selection.py:41,
        # sequence_noise.py:62) — divergence documented, not replicated.
        if not getattr(self.sequence_noise, "rng_explicit", True):
            self.sequence_noise.rng = np.random.default_rng(seed + 13)
        if not getattr(self.target_selection, "rng_explicit", True):
            self.target_selection.rng = np.random.default_rng(seed + 29)

        self.name = "RNN base"
        self.metrics = {
            "recall": {"direction": 1},
            "sps": {"direction": 1},
            "user_coverage": {"direction": 1},
            "item_coverage": {"direction": 1},
            "ndcg": {"direction": 1},
            "blockbuster_share": {"direction": -1},
        }

        # --lazy_updates: row-sparse Adam for the catalog-indexed input
        # table (see _build_functions); changes optimizer semantics for
        # untouched rows, so opt-in and encoded in the model filename
        self.lazy_updates = lazy_updates

        self.params = None
        self.opt_state = None
        self.eval_batch_size = max(batch_size, 64)
        # >1 dispatches that many optimizer steps per device RPC (scan on
        # device); amortizes remote-dispatch overhead at small batch sizes
        self.steps_per_dispatch = 1
        # ("data", "model") device mesh for sharded training/eval;
        # None = single-device (set via set_mesh / train.py --mesh)
        self.mesh = None

    # ------------------------------------------------------------------
    # featurization: packed sparse ids per timestep
    # ------------------------------------------------------------------
    @property
    def n_feature_slots(self) -> int:
        """Static number of feature ids per timestep (F). Pad slots
        (variable-size genre multi-hots) carry id -1 and are masked
        inside gather_sum."""
        F = 1 + (1 if self.use_ratings_features else 0)
        ft = self._feature_tables
        if ft is not None:
            F += ft.item_slots + ft.user_slots
        return F

    def _n_optional_features(self) -> int:
        # rating one-hot occupies 10 id slots (rnn_base.py:578-593);
        # movie/user one-hot widths come from the loaded tables
        # (rnn_base.py:546-610 semantics, data/features.py contract)
        n = 10 if self.use_ratings_features else 0
        ft = self._feature_tables
        if ft is not None:
            n += ft.n_movie_feats + ft.n_user_feats
        return n

    def _feature_offsets(self):
        """(movie_block_offset, user_block_offset) within the id space,
        mirroring the reference's enabled-blocks-only concat order
        ratings | movies | users (rnn_base.py:609-610)."""
        off = self.n_items + (10 if self.use_ratings_features else 0)
        ft = self._feature_tables
        mf_off = off
        uf_off = off + (ft.n_movie_feats if ft is not None else 0)
        return mf_off, uf_off

    def _input_size(self) -> int:
        return self.n_items + self._n_optional_features()

    def _feature_ids(self, item_id: int, rating: float):
        ids = [item_id]
        if self.use_ratings_features:
            bucket = int(round(rating * 2)) - 1
            ids.append(self.n_items + max(0, min(9, bucket)))
        return ids

    def _encode_sequences(self, seqs, user_ids=None):
        """Pack a list of [(item, rating), ...] into device-ready arrays.

        Returns (ids [B,L,F] int32, id_mask [B,L,F] f32 or None, mask [B,L] f32).
        With --mf/--uf the per-item / per-user feature-id slots are
        appended from the loaded tables (``user_ids`` required for --uf).
        """
        B, L, F = len(seqs), self.max_length, self.n_feature_slots
        ids = np.zeros((B, L, F), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        col = 1 + (1 if self.use_ratings_features else 0)
        for i, seq in enumerate(seqs):
            for t, (item, rating) in enumerate(seq[:L]):
                ids[i, t, :col] = self._feature_ids(int(item), float(rating))
            mask[i, : min(len(seq), L)] = 1.0
        ft = self._feature_tables
        if ft is not None and (ft.item_slots or ft.user_slots):
            mf_off, uf_off = self._feature_offsets()
            if ft.item_slots:
                tab = ft.item_ids[ids[:, :, 0]]  # [B, L, slots], -1 pads
                ids[:, :, col : col + ft.item_slots] = np.where(
                    tab >= 0, mf_off + tab, -1
                )
                col += ft.item_slots
            if ft.user_slots:
                if user_ids is None:
                    raise ValueError("--uf encoding needs per-sequence user ids")
                u = np.asarray([int(x) for x in user_ids], dtype=np.int64)
                ids[:, :, col:] = (uf_off + ft.user_ids[u])[:, None, :]
            # pad slots at invalid timesteps too (gather_sum masks them)
            ids[:, :, 1:][mask == 0] = -1
        id_mask = None
        if F > 1:
            id_mask = np.broadcast_to(mask[:, :, None], ids.shape).astype(np.float32)
        return ids, id_mask, mask

    # ------------------------------------------------------------------
    # model lifecycle
    # ------------------------------------------------------------------
    def prepare_model(self, dataset) -> None:
        """Must be called before train, load or top_k_recommendations."""
        if (
            self.use_movies_features or self.use_users_features
        ) and self._feature_tables is None:
            from seqrec_tpu.data.features import load_feature_tables

            self._feature_tables = load_feature_tables(
                dataset, self.use_movies_features, self.use_users_features
            )
        self._prepare_networks(dataset.n_items)

    def _prepare_networks(self, n_items: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def set_dataset(self, dataset) -> None:
        self.dataset = dataset
        self.target_selection.set_dataset(dataset)
        self._val_cache = None

    # ------------------------------------------------------------------
    # multi-device mesh (train.py --mesh; no reference counterpart —
    # SURVEY.md §2.9: the reference is strictly single-device)
    # ------------------------------------------------------------------
    def set_mesh(self, mesh) -> None:
        """Route training and eval through a ("data", "model") device
        mesh: catalog tables (input embedding rows, softmax columns)
        shard over "model", the batch over "data"; dense tower weights
        replicate and their gradients all-reduce over "data"."""
        if mesh is not None:
            n_data = mesh.shape["data"]
            if self.batch_size % n_data:
                raise ValueError(
                    f"batch_size {self.batch_size} is not divisible by the "
                    f"mesh data axis ({n_data})"
                )
            if self.eval_batch_size % n_data:
                self.eval_batch_size += n_data - self.eval_batch_size % n_data
            # NB multi-process meshes additionally require every host to
            # assemble identical batches; all sampler streams derive from
            # self.seed (see __init__'s plugin reseeding), so same config
            # ⇒ same batches on every host
        self.mesh = mesh
        self._val_cache = None

    def _shard_state(self) -> None:
        """Shard params (and optimizer state) over ``self.mesh``.

        Loaded checkpoints are host pytrees; freshly initialized params
        too. Optimizer state mirrors the param tree (optax), so a loaded
        state inherits each slot's sharding from a sharded template."""
        import jax

        from seqrec_tpu.parallel import param_sharding, put_global

        self.params = put_global(
            self.params, param_sharding(self.params, self.mesh)
        )
        if self.opt_state is None:
            self.opt_state = self._opt.init(self.params)
        else:
            template = self._opt.init(self.params)
            self.opt_state = jax.tree_util.tree_map(
                lambda loaded, tmpl: put_global(loaded, tmpl.sharding),
                self.opt_state,
                template,
            )

    def _shard_batch_gen(self, gen):
        """Wrap a host-batch generator with data-sharded device_puts."""
        from seqrec_tpu.parallel import batch_sharding, put_global

        for b in gen:
            yield put_global(b, batch_sharding(b, self.mesh))

    def _out_matmul(self, h, w_out, b_out):
        """Catalog-sized output matmul in the compute dtype (f32 accum)."""
        cdt = self.compute_dtype
        return (
            jnp.dot(h.astype(cdt), w_out.astype(cdt), preferred_element_type=jnp.float32)
            + b_out
        )

    # subclass hooks -----------------------------------------------------
    def _init_params(self) -> dict:  # pragma: no cover
        raise NotImplementedError

    def _loss(self, params, batch):  # pragma: no cover
        raise NotImplementedError

    def _scores(self, params, ids, id_mask, mask):  # pragma: no cover
        """Deterministic full-catalog scores [B, n_items]."""
        raise NotImplementedError

    def _prepare_input(self, sequences) -> dict:  # pragma: no cover
        """sequences: list of [user_id, input_sequence, targets] → batch dict."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # lazy (row-sparse) optimizer updates for the catalog input table
    # ------------------------------------------------------------------
    def _resolve_lazy_path(self):
        """Pytree path of the catalog-indexed input table, or None.

        Only the first recurrent layer's gather table (or the explicit
        embedding table) qualifies: its gradient is nonzero ONLY on the
        ≤ B·L·F rows the batch touched, while dense Adam reads+writes
        moments for all n_items rows every step — at production catalog
        sizes that optimizer traffic, not the matmuls, bounds the step
        (measured in bench_matrix.json: bf16 matmuls gain nothing at
        200k items because the step is HBM-bound)."""
        if not self.lazy_updates:
            return None
        if not self.lazy_table_ok:
            raise ValueError(
                f"--lazy_updates: {type(self).__name__} has no recurrent-"
                "tower input table"
            )
        from seqrec_tpu.models.updates import Adam

        if not isinstance(self.updater, Adam):
            raise ValueError("--lazy_updates is implemented for adam only")
        rl = self.recurrent_layer
        if rl.embedding_size > 0:
            return ("tower", "embedding")
        if rl.bidirectional:
            raise ValueError(
                "--lazy_updates: bidirectional towers have two input "
                "tables (fwd/bwd); not supported"
            )
        return ("tower", "layer0_fwd", "W_in")

    def _resolve_lazy_specs(self):
        """List of lazy-update specs ``{"path", "axis", "ids"}`` — the
        pytree leaf, the axis its touched slices live on, and a callable
        extracting the touched indices from the (expanded) batch.

        The base resolution covers the input gather table (rows =
        batch ids). Models whose OUTPUT gradient is also sparse (the
        sampled-softmax head: only the target+sample columns score)
        override this with head specs — see RNNSampling."""
        path = self._resolve_lazy_path()
        if path is None:
            return None
        return [{"path": path, "axis": 0, "ids": lambda b: b["ids"]}]

    @staticmethod
    def _split_table(tree: dict, path: tuple):
        """(tree-without-leaf, leaf) with shallow copies along ``path``."""
        out = dict(tree)
        node = out
        for key in path[:-1]:
            node[key] = dict(node[key])
            node = node[key]
        leaf = node.pop(path[-1])
        return out, leaf

    @staticmethod
    def _merge_table(tree: dict, path: tuple, leaf):
        out = dict(tree)
        node = out
        for key in path[:-1]:
            node[key] = dict(node[key])
            node = node[key]
        node[path[-1]] = leaf
        return out

    def _lazy_adam_update(self, table, m, v, count, dense_grad, ids, axis):
        """One Adam step applied ONLY to the slices ``ids`` touches
        (rows for ``axis=0``, columns for ``axis=1``).

        TF LazyAdam semantics: moments of untouched slices neither decay
        nor contribute — a documented divergence from dense Adam (which
        keeps applying m-momentum to rows after their last occurrence).
        Bias correction uses the global step count. NO dedup is needed:
        duplicate occurrences of an index gather the SAME dense-grad
        slice, so they compute bitwise-identical new values and a
        scatter-SET makes duplicates idempotent. (A sorted-dedup variant
        was measured strictly worse: a 30k-element ``jnp.sort`` costs
        more on TPU than the sparse update itself.) Traffic:
        O(touched · slice) gathers/scatters instead of O(table) moment
        reads+writes — a WIN for the ~1k-column sampled head, a LOSS for
        ~30k-row input-table updates (TPU scatters run far below HBM
        streaming speed; numbers in BASELINE.md)."""
        u = self.updater
        lr = jnp.float32(u.learning_rate)
        b1 = jnp.float32(u.beta1)
        b2 = jnp.float32(u.beta2)
        eps = jnp.float32(1e-8)  # optax.adam default (updates.Adam.make)

        N = table.shape[axis]
        flat = ids.reshape(-1).astype(jnp.int32)
        idx = jnp.where(flat < 0, N, flat)  # padded feature slots (id -1)
        safe = jnp.minimum(idx, N - 1)

        take = lambda a: jnp.take(a, safe, axis=axis)  # noqa: E731
        g = take(dense_grad)
        m_new = b1 * take(m) + (1.0 - b1) * g
        v_new = b2 * take(v) + (1.0 - b2) * g * g
        count = count + 1
        t = count.astype(jnp.float32)
        m_hat = m_new / (1.0 - b1**t)
        v_hat = v_new / (1.0 - b2**t)
        upd = -lr * m_hat / (jnp.sqrt(v_hat) + eps)

        if axis == 0:
            at = lambda a: a.at[idx]  # noqa: E731
        else:
            at = lambda a: a.at[:, idx]  # noqa: E731
        table = at(table).set(take(table) + upd, mode="drop")
        m = at(m).set(m_new, mode="drop")
        v = at(v).set(v_new, mode="drop")
        return table, m, v, count

    # ------------------------------------------------------------------
    # compiled functions
    # ------------------------------------------------------------------
    def _build_functions(self) -> None:
        inner = self._opt_inner = self.updater.make()
        specs = self._lazy_specs = self._resolve_lazy_specs()

        if not specs:
            opt = self._opt = inner
        else:
            split = self._split_table

            class _LazyTableOpt:
                """optax-shaped ``init`` so existing call sites
                (``self._opt.init(params)``) build the composite state
                ``(inner_state_without_lazy_leaves, per-spec (m, v, count))``."""

                @staticmethod
                def init(params):
                    rest = params
                    states = []
                    for sp in specs:
                        rest, table = split(rest, sp["path"])
                        states.append(
                            (
                                jnp.zeros_like(table),
                                jnp.zeros_like(table),
                                jnp.zeros((), jnp.int32),
                            )
                        )
                    return (inner.init(rest), tuple(states))

            opt = self._opt = _LazyTableOpt()

        def one_step(params, opt_state, batch):
            cost, grads = jax.value_and_grad(self._loss)(params, batch)
            if not specs:
                updates, opt_state = inner.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates
                )
                return params, opt_state, cost
            inner_state, lazy_states = opt_state
            rest_p, rest_g, tables, tgrads = params, grads, [], []
            for sp in specs:
                rest_p, table = self._split_table(rest_p, sp["path"])
                rest_g, tg = self._split_table(rest_g, sp["path"])
                tables.append(table)
                tgrads.append(tg)
            updates, inner_state = inner.update(rest_g, inner_state, rest_p)
            rest_p = jax.tree_util.tree_map(
                lambda p, u: p + u, rest_p, updates
            )
            new_states = []
            for sp, table, tg, (m, v, count) in zip(
                specs, tables, tgrads, lazy_states
            ):
                table, m, v, count = self._lazy_adam_update(
                    table, m, v, count, tg, sp["ids"](batch), sp["axis"]
                )
                rest_p = self._merge_table(rest_p, sp["path"], table)
                new_states.append((m, v, count))
            return rest_p, (inner_state, tuple(new_states)), cost

        def train_step(params, opt_state, batch):
            return one_step(params, opt_state, self._expand_wire(batch))

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def train_multi(params, opt_state, batches):
            """K optimizer steps per dispatch (batch leaves stacked on a
            leading K axis); amortizes the per-RPC dispatch overhead of
            the remote device. Returns the summed cost."""

            def body(carry, batch):
                params, opt_state, cost = one_step(
                    *carry, self._expand_wire(batch)
                )
                return (params, opt_state), cost

            (params, opt_state), costs = jax.lax.scan(body, (params, opt_state), batches)
            return params, opt_state, costs.sum()

        self._train_multi = jax.jit(train_multi, donate_argnums=(0, 1))

        def train_multi_idx(params, opt_state, store, idx):
            """Index-wire variant of ``train_multi``: the scan body first
            assembles each batch on device from the resident store."""

            def body(carry, ib):
                params, opt_state, cost = one_step(
                    *carry, self._expand_index_wire(ib, store)
                )
                return (params, opt_state), cost

            (params, opt_state), costs = jax.lax.scan(body, (params, opt_state), idx)
            return params, opt_state, costs.sum()

        self._train_multi_idx = jax.jit(train_multi_idx, donate_argnums=(0, 1))

        def score_fn(params, ids, id_mask, mask):
            return self._scores(params, ids, id_mask, mask)

        self._score_jit = jax.jit(score_fn)

        def topk_fn(params, ids, id_mask, mask, seen_ids, seen_mask, k):
            fused = self._fused_topk(params, ids, id_mask, mask, seen_ids, seen_mask, k)
            if fused is not None:
                return fused
            scores = self._rank_scores(params, ids, id_mask, mask)
            return masked_top_k(scores, k, seen_ids, seen_mask)

        self._topk_jit = jax.jit(topk_fn, static_argnums=(6,))

        def topk_wire_fn(params, ids, lengths, k):
            # compact-wire variant: 2 input leaves instead of 5 (each
            # leaf costs a transfer round trip on remote devices)
            if ids.dtype == jnp.int16:
                ids = ids.astype(jnp.int32)
            L = ids.shape[-2]
            mask = (jnp.arange(L) < lengths[:, None]).astype(jnp.float32)
            id_mask = None
            if self.n_feature_slots > 1:
                id_mask = jnp.broadcast_to(
                    mask[..., None], ids.shape
                ).astype(jnp.float32)
            if self.interactions_are_unique:
                seen_ids, seen_mask = ids[:, :, 0], mask
            else:
                seen_ids, seen_mask = None, None
            return topk_fn(params, ids, id_mask, mask, seen_ids, seen_mask, k)

        self._topk_wire_jit = jax.jit(topk_wire_fn, static_argnums=(3,))

    # subclasses with a monotone head (softmax/identity over h·W_out+b)
    # set this to route batched eval through the fused Pallas kernel
    fused_eval_head = False

    def _rank_scores(self, params, ids, id_mask, mask):
        """Scores used ONLY for top-k ranking. Monotone-head models
        override this to return raw logits: softmax is order-preserving
        per row, and skipping it saves two [B, n_items] HBM passes plus
        the exp at catalog scale (``_scores`` keeps the probability
        semantics for every other consumer)."""
        return self._scores(params, ids, id_mask, mask)

    # subclasses whose params carry the recurrent tower's sparse input
    # table (models replacing the tower — FISMCluster, SDAE — opt out)
    lazy_table_ok = True

    def _fused_topk(self, params, ids, id_mask, mask, seen_ids, seen_mask, k):
        """Single fused scoring+mask+top-k pass (Pallas, TPU).

        Valid whenever ranking raw output logits matches ranking the
        model's ``_scores`` (softmax/identity heads). Returns None to fall
        back to the two-pass XLA path."""
        from seqrec_tpu.models.recurrent import _pallas_available
        from seqrec_tpu.ops.pallas_topk import (
            FUSED_TOPK_MAX_ITEMS,
            fused_score_topk,
        )

        # the kernel unrolls k insertion steps; bail out for large k
        # (e.g. the --save_rank full-ranking path where k == n_items)
        # and for large catalogs, where XLA's streaming three-pass beats
        # the kernel's per-tile insertion overhead (measured crossover
        # in ops/pallas_topk.py FUSED_TOPK_MAX_ITEMS)
        if (
            not (self.fused_eval_head and _pallas_available())
            or seen_ids is None
            or k > 64
            or self.n_items > FUSED_TOPK_MAX_ITEMS
        ):
            return None
        h = self.recurrent_layer.apply(params["tower"], ids, mask, id_mask, fast=True)
        _, top = fused_score_topk(
            h, params["W_out"], params["b_out"], seen_ids, seen_mask, k=k
        )
        return top

    def train_function_multi(self, batches: list) -> tuple:
        """Run ``len(batches)`` optimizer steps in ONE device dispatch.

        Stacks the per-step batch dicts on a leading axis and scans over
        them on device. Returns the summed cost (device array)."""
        stacked = {
            key: np.stack([b[key] for b in batches]) for key in batches[0]
        }
        self.params, self.opt_state, cost_sum = self._train_multi(
            self.params, self.opt_state, stacked
        )
        return cost_sum

    def train_function_stacked(self, payload) -> "jax.Array":
        """Like ``train_function_multi`` but takes an already-stacked
        (and usually already device-resident) K-step payload. Index-wire
        payloads (``rows``/``cuts`` only) assemble their batches on
        device from the resident store."""
        ep = payload.pop("_epochs", None)
        if ep is not None:
            self._pipeline_epochs = float(ep)
        if "rows" in payload:
            self.params, self.opt_state, cost_sum = self._train_multi_idx(
                self.params, self.opt_state, self._dev_store, payload
            )
        else:
            self.params, self.opt_state, cost_sum = self._train_multi(
                self.params, self.opt_state, payload
            )
        return cost_sum

    def _gen_dispatch_payloads(self, batch_gen, K: int):
        """Stack K wire batches and start their host->device transfer.

        Runs inside the prefetch thread so stacking AND the transfer
        overlap the previous dispatch's device compute — the training
        loop then only enqueues ``_train_multi`` on device-resident
        buffers (``jax.device_put`` is async)."""
        import jax

        while True:
            batches = []
            for _ in range(K):
                try:
                    batches.append(next(batch_gen))
                except StopIteration:
                    return
            stacked = {
                key: np.stack([b[key] for b in batches]) for key in batches[0]
            }
            yield jax.device_put(stacked)

    def _payload_pipeline(self, training_set, rng, K: int, depth: int = 2):
        """The fast-path payload pipeline, two overlapped stages:

        thread A: packed assembly of K batches per numpy pass (n_stack)
        thread B: ``jax.device_put`` (starts the host->device transfer)
        main:     enqueue the fused K-step dispatch

        Assembly, transfer and device compute of consecutive payloads
        all run concurrently; either stage alone would serialize the
        other behind it (the transfer's host-side cost is comparable to
        the assembly cost at deployment batch sizes).

        When the model supports the index wire, both stages collapse to
        near-nothing: assembly is just the cut sampler and the transfer
        is two int32[K, B] arrays (the store lives in HBM)."""
        import jax

        if self._index_batching_ok():
            self._dev_store = self._upload_index_store(training_set)
            gen = self._gen_index_mini_batch(training_set, rng, n_stack=K)
        else:
            gen = self._gen_packed_mini_batch(training_set, rng, n_stack=K)
        host = self._prefetch(self._with_epochs(gen, training_set), depth=depth)

        def transfer(upstream):
            # explicit generator (not a genexp) so closing this stage
            # deterministically closes the upstream prefetch too
            try:
                if self.mesh is not None:
                    from seqrec_tpu.parallel import (
                        put_global,
                        stacked_batch_sharding,
                    )

                    for p in upstream:
                        ep = p.pop("_epochs", None)
                        p = put_global(p, stacked_batch_sharding(p, self.mesh))
                        if ep is not None:
                            p["_epochs"] = ep  # host-side marker, not shipped
                        yield p
                else:
                    for p in upstream:
                        ep = p.pop("_epochs", None)
                        p = jax.device_put(p)
                        if ep is not None:
                            p["_epochs"] = ep
                        yield p
            finally:
                upstream.close()

        return self._prefetch(transfer(host), depth=depth)

    def _with_epochs(self, gen, training_set):
        """Tag each batch with the generator's fractional-epochs value AS
        OF ITS ASSEMBLY. The prefetch thread runs ahead of consumption,
        so reading ``training_set.epochs`` at checkpoint time races with
        however far prefetch happens to be — nondeterministic epoch
        stamps in checkpoint filenames (and, on a multi-process mesh,
        DIFFERENT filenames per host). Consumers pop the tag and track it
        in ``self._pipeline_epochs``."""
        for b in gen:
            b["_epochs"] = float(training_set.epochs)
            yield b

    def train_function(self, batch):
        """One optimizer step; returns the batch cost WITHOUT syncing.

        The cost stays a device array so consecutive steps pipeline
        (host batch assembly overlaps device compute); the training loop
        only materializes costs — and checks for NaN — at progress
        checkpoints. (The reference syncs and NaN-checks every step,
        rnn_base.py:290-292; deferring the check to the checkpoint is
        the async-dispatch trade.)"""
        ep = batch.pop("_epochs", None)
        if ep is not None:
            self._pipeline_epochs = float(ep)
        self.params, self.opt_state, cost = self._train_step(
            self.params, self.opt_state, batch
        )
        return cost

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------
    def _device_params(self):
        """Device-resident view of ``self.params``, cached by identity.

        Freshly initialized or checkpoint-loaded params are host numpy;
        without this cache every prediction call would re-upload all
        parameter tables (the whole output matrix among them) through
        the device link. After a training step params are already
        device arrays and ``device_put`` is a no-op."""
        import jax

        if getattr(self, "_dev_params_src", None) is not self.params:
            # leaves that are already jax Arrays stay untouched: re-
            # device_put would be a no-op single-process but is INVALID
            # for mesh-sharded arrays spanning processes
            self._dev_params = jax.tree_util.tree_map(
                lambda leaf: leaf
                if isinstance(leaf, jax.Array)
                else jax.device_put(leaf),
                self.params,
            )
            self._dev_params_src = self.params
        return self._dev_params

    def _input_window(self, sequence):
        """Input truncation for prediction: last ``max_length`` items
        (rnn_base.py:144). Order-free bag models (SDAE) override to keep
        the whole sequence."""
        return sequence[-min(self.max_length, len(sequence)) :]

    def top_k_recommendations(self, sequence, user_id=None, k=10, exclude=None):
        """Receives a sequence of (id, rating); returns k item ids.

        Parity with rnn_base.py:132-159 (seen/excluded items masked to
        -inf before the top-k).
        """
        if exclude is None:
            exclude = []
        seq = self._input_window(sequence)
        ids, id_mask, mask = self._encode_sequences(
            [seq], user_ids=None if user_id is None else [user_id]
        )
        scores = np.array(
            self._score_jit(self._device_params(), ids, id_mask, mask)[0]
        )
        if self.interactions_are_unique:
            scores[[int(i[0]) for i in sequence]] = -np.inf
        scores[list(exclude)] = -np.inf
        return list(np.argpartition(-scores, range(k))[:k])

    # ------------------------------------------------------------------
    # fast packed mini-batches (vectorized; no per-item Python)
    # ------------------------------------------------------------------
    def _fast_batching_ok(self) -> bool:
        """The vectorized batcher reproduces the reference's sampling
        distribution only for the default plugin settings (no sequence
        noise; deterministic next-item target)."""
        ts = self.target_selection
        return (
            self.sequence_noise.is_identity
            and ts.n_targets == 1
            and not ts.shuffle
            and ts.bias < 0
            and np.isfinite(self.max_length)
        )

    def _gen_cut_indices(self, training_set, rng, B: int):
        """Shared cut sampler: same multi-cut sampling per sequence as
        the reference (rnn_base.py:396-415) — multiple random cuts per
        drawn sequence, batch filled in draw order. Yields
        ``(sel_rows, sel_cuts)`` int64[B] buffers (REUSED across yields;
        consumers must copy before advancing the generator)."""
        store = training_set.store
        lengths = store.lengths
        eligible = np.where(lengths >= 3)[0]
        if len(eligible) == 0:
            raise ValueError("no trainable sequences (all shorter than 3)")
        order = eligible.copy()
        pos = len(order)
        epoch = -1

        sel_rows = np.empty(B, dtype=np.int64)
        sel_cuts = np.empty(B, dtype=np.int64)
        while True:
            j = 0
            while j < B:
                if pos >= len(order):
                    if training_set.shuffle:
                        rng.shuffle(order)
                    pos = 0
                    epoch += 1
                r = order[pos]
                pos += 1
                training_set.epochs = epoch + pos / len(order)
                n = int(min(B - j, lengths[r] - 2))
                if n == lengths[r] - 2:
                    # taking every cut: a sorted full sample IS the range
                    # (rnn_base.py:398 sorts its random.sample); skipping
                    # the RNG here is the common case and much cheaper
                    sel_cuts[j : j + n] = np.arange(2, lengths[r])
                else:
                    sel_cuts[j : j + n] = np.sort(
                        rng.choice(np.arange(2, lengths[r]), size=n, replace=False)
                    )
                sel_rows[j : j + n] = r
                j += n
            yield sel_rows, sel_cuts

    def _gen_packed_mini_batch(self, training_set, rng=None, n_stack=0):
        """Vectorized equivalent of ``_gen_mini_batch``: same multi-cut
        sampling per sequence (rnn_base.py:396-415), but batches are
        assembled with numpy slice copies from the packed SequenceStore
        instead of per-item Python featurization (~20x the generator
        throughput — needed to keep the TPU step fed).

        With ``n_stack=K`` the generator assembles K batches in ONE numpy
        pass (a [K*B] super-batch) and yields a dict of [K, B, ...]
        arrays ready for the fused K-step dispatch — amortizing the
        fixed per-numpy-op cost that dominates at small B. A sequence's
        cuts may then span adjacent sub-batches; the per-cut sampling
        distribution (multiple random cuts per drawn sequence, batch
        filled in draw order) is unchanged."""
        store = training_set.store
        offsets = store.offsets
        B, L, F = self.batch_size * max(1, n_stack), self.max_length, self.n_feature_slots
        rng = rng if rng is not None else self.rng
        for sel_rows, sel_cuts in self._gen_cut_indices(training_set, rng, B):
            # vectorized assembly: one fancy gather over the flat store
            offs = offsets[sel_rows]
            starts = np.maximum(0, sel_cuts - L)
            m = (sel_cuts - starts).astype(np.int64)  # [B] prefix lengths
            t_idx = np.arange(L, dtype=np.int64)[None, :]
            valid = t_idx < m[:, None]  # [B, L]
            flat = offs[:, None] + starts[:, None] + t_idx
            flat = np.where(valid, flat, 0)
            ids = np.zeros((B, L, F), dtype=np.int32)
            ids[:, :, 0] = np.where(valid, store.items[flat], 0)
            col = 1
            if self.use_ratings_features:
                buckets = np.clip(
                    np.round(store.ratings[flat] * 2) - 1, 0, 9
                ).astype(np.int32)
                ids[:, :, col] = np.where(valid, self.n_items + buckets, 0)
                col += 1
            ft = self._feature_tables
            if ft is not None and (ft.item_slots or ft.user_slots):
                mf_off, uf_off = self._feature_offsets()
                if ft.item_slots:
                    tab = ft.item_ids[ids[:, :, 0]]
                    ids[:, :, col : col + ft.item_slots] = np.where(
                        tab >= 0, mf_off + tab, -1
                    )
                    col += ft.item_slots
                if ft.user_slots:
                    u = store.user_ids[sel_rows].astype(np.int64)
                    ids[:, :, col:] = (uf_off + ft.user_ids[u])[:, None, :]
                ids[:, :, 1:][~valid] = -1
            mask = valid.astype(np.float32)
            targets = store.items[offs + sel_cuts].astype(np.int32)
            target_ratings = store.ratings[offs + sel_cuts]

            packed = {"ids": ids, "mask": mask, "targets": targets}
            if F > 1:
                packed["id_mask"] = np.broadcast_to(
                    mask[:, :, None], ids.shape
                ).astype(np.float32)
            batch = self._compact_wire(
                self._finalize_packed_batch(packed, target_ratings), m
            )
            if n_stack:
                batch = self._restack_wire(batch, n_stack)
            yield batch

    # ------------------------------------------------------------------
    # index-wire fast path: device-resident dataset, index-only payloads
    # ------------------------------------------------------------------
    # The packed SequenceStore is uploaded to HBM ONCE per training run;
    # each dispatch then ships only the sampled (row, cut) index pairs
    # (2 x int32[K,B] ≈ 9x less than the compact id/length wire) and the
    # batch — ids, masks, targets, target popularity — is assembled on
    # device by gathers inside the jitted K-step scan. This removes the
    # host-side numpy assembly (the e2e throughput cap on small hosts)
    # and most of the link payload at once. Models opt in with
    # ``index_wire_ok`` when their whole batch is derivable on device
    # from (store, rows, cuts) — true for the CCE family; sampled /
    # margin / cluster losses need host-side RNG fields and keep the
    # compact wire.
    index_wire_ok = False

    def _index_batching_ok(self) -> bool:
        return self.index_wire_ok and self._fast_batching_ok()

    def _make_pop_db(self) -> np.ndarray:
        """Per-item popularity^diversity_bias table for on-device
        target_pop lookup (pop^0 = ones for models without the bias)."""
        db = getattr(self, "diversity_bias", 0.0)
        return np.asarray(
            self.dataset.item_popularity[: self.n_items], dtype=np.float32
        ) ** db

    def _index_payload_extras(self, k: int) -> dict:
        """Model hook: host-side fields to ship alongside the (rows,
        cuts) indices, ALWAYS stacked on a leading k axis — even for
        k=1, since a stacked K=1 dispatch still scans over that axis
        (the unstacked wire squeezes it in ``_gen_index_mini_batch``).
        E.g. the sampled losses' per-step negative-sample sets, which
        must keep their host RNG draw order."""
        return {}

    def _build_index_store(self, training_set) -> dict:
        """Host-side arrays of the device-resident store."""
        store = training_set.store
        if store.offsets[-1] >= np.iinfo(np.int32).max:
            raise ValueError("dataset too large for int32 index wire")
        host = {
            "items": store.items.astype(np.int32),
            "offsets": store.offsets.astype(np.int32),
            "pop_db": np.asarray(self._make_pop_db(), dtype=np.float32),
        }
        if self.use_ratings_features:
            host["rating_buckets"] = np.clip(
                np.round(store.ratings * 2) - 1, 0, 9
            ).astype(np.int32)
        ft = self._feature_tables
        if ft is not None and ft.item_slots:
            mf_off, _ = self._feature_offsets()
            host["mf_table"] = np.where(
                ft.item_ids >= 0, mf_off + ft.item_ids, -1
            ).astype(np.int32)
        if ft is not None and ft.user_slots:
            _, uf_off = self._feature_offsets()
            host["uf_table"] = (uf_off + ft.user_ids).astype(np.int32)
            host["row_user"] = store.user_ids.astype(np.int32)
        return host

    def _upload_index_store(self, training_set, sharding=None) -> dict:
        import jax

        host = self._build_index_store(training_set)
        if sharding is None and self.mesh is not None:
            from seqrec_tpu.parallel import store_sharding

            sharding = store_sharding(host, self.mesh)
        if sharding is not None:
            from seqrec_tpu.parallel import put_global

            return put_global(host, sharding)
        return jax.device_put(host)

    def _gen_index_mini_batch(self, training_set, rng=None, n_stack=0):
        """Index-only twin of ``_gen_packed_mini_batch``: same cut
        sampler (so the training distribution is identical), but yields
        just ``{"rows", "cuts"}`` int32 arrays ([K, B] with n_stack)."""
        B = self.batch_size * max(1, n_stack)
        rng = rng if rng is not None else self.rng
        for sel_rows, sel_cuts in self._gen_cut_indices(training_set, rng, B):
            rows = sel_rows.astype(np.int32)  # astype copies the buffer
            cuts = sel_cuts.astype(np.int32)
            extras = self._index_payload_extras(max(1, n_stack))
            if n_stack:
                rows = rows.reshape(n_stack, self.batch_size)
                cuts = cuts.reshape(n_stack, self.batch_size)
            else:
                # unstacked wire: extras lose the leading k=1 axis so
                # they match the single-batch train_function layout
                extras = {key: np.asarray(v)[0] for key, v in extras.items()}
            yield {"rows": rows, "cuts": cuts, **extras}

    def _expand_index_wire(self, batch: dict, store: dict) -> dict:
        """Assemble a training batch on device from (rows, cuts) and the
        device-resident store; traced twin of the numpy assembly in
        ``_gen_packed_mini_batch`` + ``_finalize_packed_batch``."""
        rows, cuts = batch["rows"], batch["cuts"]
        L = int(self.max_length)
        offs = store["offsets"][rows]
        starts = jnp.maximum(0, cuts - L)
        m = cuts - starts
        t = jnp.arange(L, dtype=jnp.int32)
        valid = t[None, :] < m[:, None]
        flat = jnp.where(valid, offs[:, None] + starts[:, None] + t[None, :], 0)
        item_ids = jnp.where(valid, store["items"][flat], 0)
        cols = [item_ids[..., None]]
        if self.use_ratings_features:
            cols.append(
                jnp.where(valid, self.n_items + store["rating_buckets"][flat], 0)[
                    ..., None
                ]
            )
        if "mf_table" in store:
            cols.append(
                jnp.where(valid[..., None], store["mf_table"][item_ids], -1)
            )
        if "uf_table" in store:
            u_feats = store["uf_table"][store["row_user"][rows]]  # [B, 3]
            cols.append(
                jnp.where(valid[..., None], u_feats[:, None, :], -1)
            )
        ids = jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0]
        mask = valid.astype(jnp.float32)
        targets = store["items"][offs + cuts]
        out = {
            "ids": ids,
            "mask": mask,
            "targets": targets,
            "target_pop": store["pop_db"][targets],
        }
        if self.n_feature_slots > 1:
            out["id_mask"] = jnp.broadcast_to(
                mask[..., None], ids.shape
            ).astype(jnp.float32)
        for key, v in batch.items():
            if key not in ("rows", "cuts"):
                out[key] = v  # extras (e.g. negative samples) pass through
        return out

    def _restack_wire(self, batch: dict, n_stack: int) -> dict:
        """Reshape a [K*B]-row super-batch into the [K, B, ...] layout
        the fused K-step dispatch scans over. Model hook: subclasses
        whose batches carry per-step shared fields (e.g. negative-sample
        sets) override this to redraw them per K slot."""
        B_super = self.batch_size * n_stack
        out = {}
        for key, v in batch.items():
            v = np.asarray(v)
            if v.ndim and v.shape[0] == B_super:
                out[key] = v.reshape(n_stack, self.batch_size, *v.shape[1:])
            else:
                # per-model constants (e.g. margin's default-target
                # vector) replicate across the K axis
                out[key] = np.broadcast_to(v, (n_stack,) + v.shape)
        return out

    def _finalize_packed_batch(self, packed: dict, target_ratings) -> dict:
        """Model hook: add loss-specific fields to a packed batch
        (vectorized). Default covers the CCE batch layout."""
        packed["target_pop"] = np.ones(len(packed["targets"]), dtype=np.float32)
        return packed

    # wire-format compaction: the packed generator's masks are always
    # prefix masks, so the [B,L] float mask (and its [B,L,F] broadcast)
    # need not cross the host->device link at all — ship the [B] prefix
    # lengths and rebuild the masks on device inside the jitted step.
    # Item ids travel as int16 when the feature-id space fits. Halves to
    # quarters the per-step payload; the link (not the MXU) is the
    # bottleneck of this model class at deployment batch sizes.
    _WIRE_ID_KEYS = ("ids", "targets", "seen_ids", "target_ids")

    def _compact_wire(self, packed: dict, prefix_lengths) -> dict:
        packed.pop("mask", None)
        packed.pop("id_mask", None)
        packed["lengths"] = prefix_lengths.astype(np.int32)
        if self._input_size() + 1 < np.iinfo(np.int16).max:
            for key in self._WIRE_ID_KEYS:
                if key in packed and packed[key].dtype == np.int32:
                    packed[key] = packed[key].astype(np.int16)
        return packed

    def _expand_wire(self, batch: dict) -> dict:
        """Inverse of ``_compact_wire``; runs inside jit (traced)."""
        if "lengths" not in batch:
            return batch
        batch = dict(batch)
        lengths = batch.pop("lengths")
        for key in self._WIRE_ID_KEYS:
            if key in batch and batch[key].dtype == jnp.int16:
                batch[key] = batch[key].astype(jnp.int32)
        L = batch["ids"].shape[-2]
        mask = (jnp.arange(L) < lengths[:, None]).astype(jnp.float32)
        batch["mask"] = mask
        if self.n_feature_slots > 1:
            batch["id_mask"] = jnp.broadcast_to(
                mask[..., None], batch["ids"].shape
            ).astype(jnp.float32)
        return batch

    @staticmethod
    def _prefetch(generator, depth: int = 4):
        """Background-thread prefetch (the reference ships a disabled
        version of this, rnn_base.py:34-56,273-274; ours is on by
        default so host batch assembly overlaps device steps).

        The producer checks a stop flag between bounded puts so that
        closing (or garbage-collecting) the returned generator releases
        the thread — prefetch stages are nested (assembly -> transfer)
        and a thread left blocked in ``q.put`` at interpreter shutdown
        can abort the process from the runtime's C++ layer."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        stop = threading.Event()
        error: list = []

        def producer():
            try:
                for item in generator:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as exc:
                # forward assembly/transfer errors to the consumer: ending
                # the stream here would look like normal data exhaustion
                # and training would return a successful-looking result
                # after 0 steps
                error.append(exc)
            finally:
                # cascade closure upstream: prefetch stages nest
                # (assembly -> transfer), and abandoning the upstream
                # generator would leave ITS producer thread blocked in
                # q.put past interpreter shutdown (C++-level abort). The
                # generator is suspended here (this thread iterates it),
                # so close() is safe and propagates stage by stage.
                try:
                    generator.close()
                except Exception:
                    pass
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()

    # ------------------------------------------------------------------
    # mini-batch generation (reference semantics, rnn_base.py:373-420)
    # ------------------------------------------------------------------
    def _gen_mini_batch(self, sequence_generator, test=False, max_reuse_sequence=np.inf):
        while True:
            j = 0
            sequences = []
            batch_size = 1 if test else self.batch_size
            while j < batch_size:
                sequence, user_id = next(sequence_generator)

                if not test:
                    n_cuts = int(min(batch_size - j, len(sequence) - 2, max_reuse_sequence))
                    if n_cuts <= 0:
                        continue
                    seq_lengths = sorted(
                        self.rng.choice(
                            np.arange(2, len(sequence)), size=n_cuts, replace=False
                        ).tolist()
                    )
                else:
                    seq_lengths = [int(len(sequence) / 2)]

                skipped_seq = 0
                for l in seq_lengths:
                    target = self.target_selection(sequence[l:], test=test)
                    if len(target) == 0:
                        skipped_seq += 1
                        continue
                    start = max(0, l - self.max_length)
                    sequences.append([user_id, sequence[start:l], target])
                j += len(seq_lengths) - skipped_seq

            if test:
                yield self._prepare_input(sequences), [
                    i[0] for i in sequence[seq_lengths[0] :]
                ]
            else:
                yield self._prepare_input(sequences)

    # ------------------------------------------------------------------
    # batched validation (replaces rnn_base.py:358-371 one-user-per-call)
    # ------------------------------------------------------------------
    def _iter_test_instances(self, sequence_generator):
        """Yield (input_sequence, goal_ids, user_id) per test/val user."""
        for sequence, user_id in sequence_generator:
            l = int(len(sequence) / 2)
            target = self.target_selection(sequence[l:], test=True)
            if len(target) == 0:
                continue
            start = max(0, l - self.max_length)
            goal = [i[0] for i in sequence[l:]]
            yield sequence[start:l], goal, user_id

    def _batched_recommendations(self, inputs, k: int = 10, user_ids=None):
        """Top-k for a list of input sequences, chunked on device.

        All chunks are dispatched before any result is fetched: over a
        remote-device link each dispatch/fetch costs a round trip, so
        the pipeline hides (n_chunks - 1) of them. Inputs travel as the
        compact wire format (ids + prefix lengths; masks and the
        seen-item set are rebuilt on device)."""
        return self._topk_from_staged(
            self._stage_eval_inputs(inputs, user_ids=user_ids), k
        )

    def _stage_eval_inputs(self, inputs, user_ids=None) -> list:
        """Encode + start the host->device upload of eval input chunks;
        returns [(n_real_rows, (ids_dev, lengths_dev)), ...]."""
        import jax

        shardings = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row = lambda nd: NamedSharding(  # noqa: E731
                self.mesh, P("data", *([None] * (nd - 1)))
            )
            shardings = row  # per-array, built below once ndim is known

        chunk = self.eval_batch_size
        staged = []
        for c0 in range(0, len(inputs), chunk):
            batch = inputs[c0 : c0 + chunk]
            pad = chunk - len(batch)
            batch_p = batch + [batch[-1]] * pad
            users_p = None
            if user_ids is not None:
                users = list(user_ids[c0 : c0 + chunk])
                users_p = users + [users[-1]] * pad
            ids, _, mask = self._encode_sequences(batch_p, user_ids=users_p)
            lengths = mask.sum(axis=1).astype(np.int32)
            if self._input_size() + 1 < np.iinfo(np.int16).max:
                ids = ids.astype(np.int16)
            # async upload: all chunk transfers start before any dispatch
            if shardings is not None:
                from seqrec_tpu.parallel import put_global

                dev = (
                    put_global(ids, shardings(ids.ndim)),
                    put_global(lengths, shardings(1)),
                )
            else:
                dev = jax.device_put((ids, lengths))
            staged.append((len(batch), dev))
        return staged

    def _topk_from_staged(self, staged, k: int) -> np.ndarray:
        from seqrec_tpu.parallel import host_global

        params = self._device_params()
        pending = [
            (n, self._topk_wire_jit(params, ids_d, len_d, k))
            for n, (ids_d, len_d) in staged
        ]
        # host_global: on a multi-process mesh the top-k rows are sharded
        # over a cross-host "data" axis; gather them (every process runs
        # this eval loop, so the collective is symmetric)
        return np.concatenate(
            [host_global(topk)[:n] for n, topk in pending], axis=0
        )

    def _compute_validation_metrics(self, metrics):
        ev = evaluation.Evaluator(self.dataset, k=10)
        # the validation inputs are identical at every checkpoint (the
        # generator is unshuffled and the half-split is deterministic),
        # so encode + upload them ONCE and reuse the device-resident
        # chunks; skip the cache when --rand_test_target randomizes goals
        cacheable = self.target_selection.determinist_test
        if not cacheable or getattr(self, "_val_cache", None) is None:
            instances = list(
                self._iter_test_instances(self.dataset.validation_set(epochs=1))
            )
            staged = (
                self._stage_eval_inputs(
                    [seq for seq, _, _ in instances],
                    user_ids=[u for _, _, u in instances],
                )
                if instances
                else []
            )
            if cacheable:
                self._val_cache = (instances, staged)
        else:
            instances, staged = self._val_cache
        if not instances:
            # zero validation instances (e.g. --rand_test_target with a
            # target_bias that filters every user's goals away): record 0s
            # instead of dividing by len(instances) (cluster.py does the
            # same for its extra metrics)
            for name in self.metrics:
                metrics[name].append(0.0)
            return metrics
        recs = self._topk_from_staged(staged, k=10)
        for (_, goal, _), rec in zip(instances, recs):
            ev.add_instance(goal, rec.tolist())
        metrics["recall"].append(ev.average_recall())
        metrics["sps"].append(ev.sps())
        metrics["ndcg"].append(ev.average_ndcg())
        metrics["user_coverage"].append(ev.user_coverage())
        metrics["item_coverage"].append(ev.item_coverage())
        metrics["blockbuster_share"].append(ev.blockbuster_share())
        return metrics

    # ------------------------------------------------------------------
    # generic training loop (contract parity with rnn_base.py:215-356)
    # ------------------------------------------------------------------
    def get_pareto_front(self, metrics, metrics_names):
        costs = np.zeros((len(metrics[metrics_names[0]]), len(metrics_names)))
        for i, m in enumerate(metrics_names):
            costs[:, i] = np.array(metrics[m]) * self.metrics[m]["direction"]
        is_efficient = np.ones(costs.shape[0], dtype=bool)
        for i, c in enumerate(costs):
            if is_efficient[i]:
                is_efficient[is_efficient] = np.any(costs[is_efficient] >= c, axis=1)
        return np.where(is_efficient)[0].tolist()

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

        if self.params is None:
            self.params = self._init_params()
        if not hasattr(self, "_train_step"):
            self._build_functions()

        iterations = 0
        epochs_offset = 0
        if load_last_model:
            epochs_offset = self.load_last(save_dir)
        if self.mesh is not None:
            self._shard_state()
        elif self.opt_state is None:
            self.opt_state = self._opt.init(self.params)

        # a mesh run always routes the fast path through the stacked
        # pipeline (even at K=1) so every payload crosses the link with
        # explicit ("data",) shardings
        use_stacked = self._fast_batching_ok() and (
            self.steps_per_dispatch > 1 or self.mesh is not None
        )
        if self._fast_batching_ok():
            # vectorized packed batches, assembled in a prefetch thread
            # (with a dedicated RNG: numpy Generators are not thread-safe)
            batch_rng = np.random.default_rng(self.seed + 77)
            if use_stacked:
                batch_generator = self._payload_pipeline(
                    dataset.training_set, batch_rng, self.steps_per_dispatch
                )
            else:
                batch_generator = self._prefetch(
                    self._with_epochs(
                        self._gen_packed_mini_batch(
                            dataset.training_set, batch_rng
                        ),
                        dataset.training_set,
                    )
                )
        else:
            batch_generator = self._gen_mini_batch(
                self.sequence_noise(dataset.training_set())
            )
            if self.mesh is not None:
                batch_generator = self._shard_batch_gen(batch_generator)

        start_time = time()
        next_save = int(progress)
        train_costs = []
        cost_sum = None  # device-side running sum: ONE host pull per checkpoint
        cost_count = 0
        # epochs-as-consumed: set from the per-payload markers; the raw
        # generator counter races with the prefetch threads (see
        # _with_epochs) — only a fallback for the slow synchronous path
        self._pipeline_epochs = None
        epochs = []
        metrics = {name: [] for name in self.metrics.keys()}
        filename = {}

        # fused multi-step dispatch needs fixed batch shapes, which only
        # the packed fast batcher guarantees; K is the true number of
        # optimizer steps per loop iteration (all accounting uses it)
        K = self.steps_per_dispatch if self._fast_batching_ok() else 1
        try:
            while time() - start_time < max_time and iterations < max_iter:
                # train on one batch (async; costs sync at checkpoints)
                try:
                    if use_stacked:
                        cost = self.train_function_stacked(next(batch_generator))
                    else:
                        cost = self.train_function(next(batch_generator))
                except StopIteration:
                    break

                cost_sum = cost if cost_sum is None else cost_sum + cost
                cost_count += K
                iterations += K

                if time_based_progress:
                    progress_indicator = int(time() - start_time)
                else:
                    progress_indicator = iterations

                if progress_indicator >= next_save:
                    if progress_indicator >= min_iterations:
                        consumed = (
                            self._pipeline_epochs
                            if self._pipeline_epochs is not None
                            else dataset.training_set.epochs
                        )
                        epochs.append(epochs_offset + consumed)
                        mean_cost = float(cost_sum) / max(cost_count, 1)
                        if np.isnan(mean_cost):
                            raise ValueError("Cost is NaN")
                        train_costs.append(mean_cost)
                        cost_sum, cost_count = None, 0
                        metrics = self._compute_validation_metrics(metrics)
                        self._print_progress(
                            iterations,
                            epochs[-1],
                            start_time,
                            train_costs,
                            metrics,
                            validation_metrics,
                        )

                        run_nb = len(metrics[list(self.metrics.keys())[0]]) - 1
                        if autosave == "All":
                            filename[run_nb] = save_dir + self._get_model_filename(
                                round(epochs[-1], 3)
                            )
                            self.save(filename[run_nb], async_write=True)
                        elif autosave == "Best":
                            pareto_runs = self.get_pareto_front(
                                metrics, validation_metrics
                            )
                            if run_nb in pareto_runs:
                                filename[run_nb] = save_dir + self._get_model_filename(
                                    round(epochs[-1], 3)
                                )
                                to_delete = [
                                    r for r in filename
                                    if r not in pareto_runs and r != run_nb
                                ]
                                if to_delete:
                                    # a dethroned checkpoint may still be
                                    # QUEUED in the async writer; deleting
                                    # before its write lands would leave a
                                    # stale file behind. Drain BEFORE
                                    # submitting the new save — by now the
                                    # old write has had a full validation
                                    # interval to land, so this almost
                                    # never blocks (draining after would
                                    # wait on the new write too, making
                                    # Best-saves synchronous again)
                                    self._drain_saves()
                                for run in to_delete:
                                    try:
                                        os.remove(filename[run])
                                    except OSError:
                                        print(
                                            "Warning : Previous model could not be deleted"
                                        )
                                    del filename[run]
                                self.save(filename[run_nb], async_write=True)

                        if early_stopping is not None:
                            if all(
                                early_stopping(epochs, metrics[m])
                                for m in validation_metrics
                            ):
                                break

                    # catch up past the current indicator (iterations can
                    # jump by K per loop, and a slow validation pass can
                    # overshoot a time-based schedule): without this a
                    # full validation+save would run after EVERY dispatch
                    while next_save <= progress_indicator:
                        if isinstance(progress, int):
                            next_save += min(progress, max_progress_interval)
                        else:
                            next_save += min(
                                max_progress_interval, next_save * (progress - 1)
                            )
        except KeyboardInterrupt:
            print("Training interrupted")
        finally:
            # all queued async checkpoint writes must hit disk before the
            # loop returns (callers read the files immediately). If an
            # exception is already propagating (e.g. the NaN abort), a
            # late writer error must not REPLACE it as the run's failure.
            aborting = sys.exc_info()[0] is not None
            try:
                self._drain_saves()
            except Exception as save_exc:
                if not aborting:
                    raise
                print(
                    f"Warning: async checkpoint write failed during abort: {save_exc}",
                    file=sys.stderr,
                )

        if not metrics[validation_metrics[0]]:
            # no checkpoint was reached before the iteration/time budget ran
            # out (the reference would crash here, rnn_base.py:355)
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

    def _print_progress(
        self, iterations, epochs, start_time, train_costs, metrics, validation_metrics
    ):
        print(self.name, iterations, "batchs, ", epochs, " epochs in", time() - start_time, "s")
        # training throughput since the previous checkpoint (sequences/s)
        now = time()
        last_iters, last_time = getattr(self, "_tp_mark", (0, start_time))
        if iterations > last_iters and now > last_time:
            # MF-family iterations already count samples (batch_size absent)
            per_iter = getattr(self, "batch_size", 1)
            rate = (iterations - last_iters) * per_iter / (now - last_time)
            print("Throughput : ", round(rate, 1), " sequences/s")
        self._tp_mark = (iterations, now)
        print("Last train cost : ", train_costs[-1])
        for m in self.metrics:
            print(m, ": ", metrics[m][-1])
            if m in validation_metrics:
                print(
                    "Best ",
                    m,
                    ": ",
                    max(np.array(metrics[m]) * self.metrics[m]["direction"])
                    * self.metrics[m]["direction"],
                )
        print("-----------------")
        # machine-readable TSV progress on stderr (rnn_base.py:434)
        print(
            iterations,
            epochs,
            time() - start_time,
            train_costs[-1],
            " ".join(str(metrics[m][-1]) for m in self.metrics),
            file=sys.stderr,
        )

    # ------------------------------------------------------------------
    # filenames / checkpointing (parity with rnn_base.py:111-130,470-515)
    # ------------------------------------------------------------------
    def _common_filename(self, epochs) -> str:
        filename = (
            "ml"
            + str(self.max_length)
            + "_bs"
            + str(self.batch_size)
            + "_ne"
            + str(epochs)
            + "_"
            + self.recurrent_layer.name
            + "_"
            + self.updater.name
            + ("_lu" if self.lazy_updates else "")
            + "_"
            + self.target_selection.name
        )
        if self.sequence_noise.name != "":
            filename += "_" + self.sequence_noise.name
        if not self.interactions_are_unique:
            filename += "_ri"
        if not (
            self.use_ratings_features
            or self.use_movies_features
            or self.use_users_features
        ):
            filename += "_nf"
        if self.use_ratings_features:
            filename += "_rf"
        if self.use_movies_features:
            filename += "_mf"
        if self.use_users_features:
            filename += "_uf"
        return filename

    def _get_model_filename(self, epochs):  # pragma: no cover
        raise NotImplementedError

    # set True for exact-resume checkpoints; the reference never saves
    # optimizer state (rnn_base.py:470-479), so parity default is False
    save_optimizer_state = False

    @staticmethod
    def _gather_leaf(leaf) -> np.ndarray:
        """Host copy of a (possibly mesh-sharded) array. Single-process
        sharded arrays are fully addressable and assemble locally; on a
        multi-host mesh the shards are gathered across processes so every
        host writes a complete checkpoint."""
        from seqrec_tpu.parallel import host_global

        return host_global(leaf)

    def save(self, filename: str, async_write: bool = False) -> None:
        """Write a checkpoint. Synchronous by default (the file is on
        disk when this returns — the reference contract direct callers
        rely on).

        The train loop's autosaves pass ``async_write=True``: the params
        are snapshotted with a cheap on-device copy (the live buffers
        are donated to the next train dispatch, so the host pull must
        read an owned copy) and the D2H transfer + npz write run on a
        worker thread — at 10^5-catalog shapes a checkpoint is 100+ MB
        and the pull through a remote-device link can cost tens of
        seconds that would otherwise stall the training loop. ``train``
        drains the queue before returning, so the on-disk contract (all
        files present, written in order) is unchanged. Multi-process
        saves are always synchronous: the cross-host shard gather
        (``_gather_leaf``) is a collective that must run in program
        order on every host."""
        print("Save model in " + filename)
        if jax.process_count() > 1 or not async_write:
            pytree_save(filename, self._gather_tree())
            return
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else np.asarray(x),
            self.params,
        )
        opt_leaves = None
        if self.save_optimizer_state and self.opt_state is not None:
            opt_leaves = [
                leaf + 0 if isinstance(leaf, jax.Array) else np.asarray(leaf)
                for leaf in jax.tree_util.tree_leaves(self.opt_state)
            ]
        self._save_executor_submit(filename, snap, opt_leaves)

    def _gather_tree(self) -> dict:
        tree = {"params": jax.tree_util.tree_map(self._gather_leaf, self.params)}
        if self.save_optimizer_state and self.opt_state is not None:
            leaves = jax.tree_util.tree_leaves(self.opt_state)
            tree["opt"] = {
                str(i): self._gather_leaf(leaf) for i, leaf in enumerate(leaves)
            }
        return tree

    def _save_executor_submit(self, filename, snap, opt_leaves) -> None:
        import queue
        import threading

        if not hasattr(self, "_save_queue"):
            # maxsize bounds the HBM exposure: each queued item pins one
            # on-device parameter snapshot, so an unbounded queue under
            # --save All with slow writes would accumulate copies until
            # the next dispatch OOMs; at maxsize=2 the producer blocks
            # (i.e. degrades to the old synchronous behavior) instead
            q: "queue.Queue" = queue.Queue(maxsize=2)
            errbox: list = []

            # NB: the worker closes over (q, errbox) ONLY — a self
            # reference would pin the model and its params for the
            # thread's lifetime
            def worker():
                while True:
                    item = q.get()
                    if item is None:
                        q.task_done()
                        return
                    fname, params, opts = item
                    try:
                        tree = {
                            "params": jax.tree_util.tree_map(np.asarray, params)
                        }
                        if opts is not None:
                            tree["opt"] = {
                                str(i): np.asarray(leaf)
                                for i, leaf in enumerate(opts)
                            }
                        pytree_save(fname, tree)
                    except Exception as exc:  # surfaced by _drain_saves
                        errbox.append(exc)
                    finally:
                        q.task_done()

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._save_queue = q
            self._save_errbox = errbox
            self._save_thread = t
        self._save_queue.put((filename, snap, opt_leaves))

    def _drain_saves(self) -> None:
        """Block until every queued checkpoint hit disk, SHUT DOWN the
        worker thread (a sleeping thread per model instance would leak
        across in-process sweeps/tests), and re-raise the first writer
        error (a save failure must not be silent). A later ``save``
        spawns a fresh worker."""
        if hasattr(self, "_save_queue"):
            q, errbox, t = self._save_queue, self._save_errbox, self._save_thread
            del self._save_queue, self._save_errbox, self._save_thread
            q.join()
            q.put(None)
            t.join()
            if errbox:
                raise errbox[0]

    def load(self, filename: str) -> None:
        tree = pytree_load(filename)
        if "params" not in tree:  # archives from before the opt-state split
            tree = {"params": tree}
        self.params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
        self.opt_state = None
        if not hasattr(self, "_train_step"):
            self._build_functions()
        if "opt" in tree:
            template = self._opt.init(self.params)
            treedef = jax.tree_util.tree_structure(template)
            leaves = [
                jnp.asarray(tree["opt"][str(i)])
                for i in range(len(tree["opt"]))
            ]
            self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)

    def load_last(self, save_dir: str) -> float:
        def extract_number_of_epochs(filename):
            m = re.search(r"_ne([0-9]+(\.[0-9]+)?)_", filename)
            return float(m.group(1))

        pattern = save_dir + self._get_model_filename("*")
        files = glob.glob(pattern)
        # the ``ne*`` wildcard must capture ONLY the epoch number: the
        # filename scheme omits defaulted config tokens (e.g. the LSTM
        # tower marker), so the default-config glob also swallows
        # sibling-family files like ``..._ne1.5_GRU_...`` whose epoch
        # would then be extracted and resolved to a NONEXISTENT filename
        # (same defect class as test.py:find_models, fixed round 4)
        base = self._get_model_filename("*").replace("\\", "/").split("/")[-1]
        rx = re.compile(
            re.escape(base).replace(re.escape("*"), r"([0-9]+(\.[0-9]+)?)") + r"$"
        )
        files = np.array(
            [f for f in files if rx.search(f.replace("\\", "/").split("/")[-1])]
        )
        if len(files) == 0:
            print("No previous model, starting from scratch")
            return 0
        last_batch = np.amax(np.array([extract_number_of_epochs(f) for f in files]))
        last_model = save_dir + self._get_model_filename(last_batch)
        print("Starting from model " + last_model)
        self.load(last_model)
        return last_batch
