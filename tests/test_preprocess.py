"""Golden-format tests for the preprocess pipeline.

The on-disk contract is defined by /root/reference/preprocess.py:147-214.
"""

import os

import numpy as np
import pytest

from seqrec_tpu.data import DataHandler, SequenceStore
from seqrec_tpu.data.preprocess import preprocess


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """~30-row synthetic CSV with known structure."""
    d = tmp_path_factory.mktemp("tiny")
    rows = []
    t = 0
    # 6 users with 5 interactions each over 5 items (every item popular enough)
    for u in range(6):
        for i in range(5):
            rows.append(f"{100+u}::{200+((i+u) % 5)}::{(i % 5)+1}::{t}")
            t += 1
    raw = d / "ratings.dat"
    raw.write_text("\n".join(rows) + "\n")
    dirname = preprocess(
        str(raw),
        columns="uirt",
        sep="::",
        min_user_activity=2,
        min_item_pop=2,
        val_size=1,
        test_size=1,
        seed=7,
        dirname=str(d) + "/",
    )
    return dirname


def test_creates_canonical_layout(tiny_dataset):
    for sub in ("data", "models", "results"):
        assert os.path.isdir(os.path.join(tiny_dataset, sub))
    for f in (
        "train_set_triplets",
        "val_set_triplets",
        "test_set_triplets",
        "train_set_sequences",
        "val_set_sequences",
        "test_set_sequences",
        "train_set_sequences+",
        "stats",
        "user_id_mapping",
        "item_id_mapping",
    ):
        assert os.path.isfile(os.path.join(tiny_dataset, "data", f)), f


def test_triplets_format_and_id_remap(tiny_dataset):
    trips = np.loadtxt(
        os.path.join(tiny_dataset, "data", "train_set_triplets")
    )
    assert trips.shape[1] == 3
    # ids remapped to consecutive ints starting at 0
    assert trips[:, 0].min() >= 0 and trips[:, 1].min() >= 0
    assert trips[:, 1].max() < 5
    # ratings preserved in 1..5
    assert trips[:, 2].min() >= 1 and trips[:, 2].max() <= 5


def test_sequence_format_roundtrip(tiny_dataset):
    store = SequenceStore.from_file(
        os.path.join(tiny_dataset, "data", "train_set_sequences")
    )
    assert len(store) == 4  # 6 users - 1 val - 1 test
    # every sequence has 5 interactions (by construction)
    assert (store.lengths == 5).all()


def test_extended_set_has_halved_val_test_users(tiny_dataset):
    base = SequenceStore.from_file(
        os.path.join(tiny_dataset, "data", "train_set_sequences")
    )
    ext = SequenceStore.from_file(
        os.path.join(tiny_dataset, "data", "train_set_sequences+")
    )
    assert len(ext) == len(base) + 2
    # the appended sequences are halves: floor((5-?)..) -> 2 items each
    extra_lengths = ext.lengths[len(base):]
    assert (extra_lengths == 2).all()


def test_stats_file(tiny_dataset):
    handler = DataHandler(tiny_dataset)
    assert handler.n_users == 6
    assert handler.n_items == 5
    assert handler.n_interactions == 30
    assert handler.longest_sequence == 5
    assert handler.training_set.n_users == 4
    assert handler.validation_set.n_users == 1
    assert handler.test_set.n_users == 1


def test_item_popularity_cached(tiny_dataset):
    handler = DataHandler(tiny_dataset)
    pop = handler.item_popularity
    assert pop.sum() == handler.training_set.n_interactions
    assert os.path.isfile(
        os.path.join(tiny_dataset, "data", "training_set_item_popularity.npy")
    )


def test_mappings_are_tsv_with_header(tiny_dataset):
    with open(os.path.join(tiny_dataset, "data", "user_id_mapping")) as f:
        header = f.readline().split("\t")
    assert [h.strip() for h in header] == ["original_id", "new_id"]


def test_extended_training_set_handler(tiny_dataset):
    handler = DataHandler(tiny_dataset, extended_training_set=True)
    seqs = list(handler.training_set(epochs=1))
    assert len(seqs) == 6  # 4 train + 2 halved
    assert handler.training_set.epochs == (len(seqs) - 1) / len(seqs)


def test_sequence_generator_modes(tiny_dataset):
    handler = DataHandler(tiny_dataset)
    rng = np.random.default_rng(0)
    seqs = list(
        handler.training_set(
            min_length=2, max_length=3, length_choice="max", epochs=1, rng=rng
        )
    )
    assert all(len(s) == 3 for s, _ in seqs)
    seqs_rand = list(
        handler.training_set(
            min_length=2,
            max_length=4,
            length_choice="random",
            subsequence="begining",
            epochs=1,
            rng=rng,
        )
    )
    assert all(2 <= len(s) <= 4 for s, _ in seqs_rand)


def test_grid_generator_plants_second_order_signal():
    """The grid regime (second synthetic quality regime, BASELINE.md):
    the composed rule (row of i_{t-1}, col of i_{t-2}) must fire at
    ~markov_strength, and a first-order successor table fit on some
    users must generalize poorly to held-out users (the signal is
    second-order by construction)."""
    from collections import defaultdict

    import numpy as np

    from seqrec_tpu.data.synthetic import generate_interactions_grid

    side, strength = 20, 0.6
    rows = generate_interactions_grid(
        n_users=400, n_items=side * side, min_len=20, max_len=60,
        markov_strength=strength, seed=5,
    )
    assert rows[:, 1].max() < side * side
    seqs = defaultdict(list)
    for u, i, _, _ in rows:
        seqs[u].append(i)

    hits = total = 0
    for s in seqs.values():
        for a, b, c in zip(s, s[1:], s[2:]):
            hits += int(c == (b // side) * side + (a % side))
            total += 1
    assert abs(hits / total - strength) < 0.05

    # first-order table from 350 users, evaluated on the other 50
    trans = defaultdict(lambda: defaultdict(int))
    users = sorted(seqs)
    for u in users[:350]:
        s = seqs[u]
        for b, c in zip(s, s[1:]):
            trans[b][c] += 1
    mm = n = 0
    for u in users[350:]:
        s = seqs[u]
        for a, b, c in zip(s, s[1:], s[2:]):
            top = sorted(trans[b], key=lambda x: -trans[b][x])[:10]
            mm += int(c in top)
            n += 1
    # the oracle hits ~strength; first-order tops out near
    # strength * 10/side + noise — assert a wide margin
    assert mm / n < strength * 0.75, mm / n


def test_lag2_generator_blinds_first_order():
    """Lag-2 regime: succ[i_{t-2}] fires at ~strength; a first-order
    successor table generalizes to held-out users at ~chance while the
    lag-2 oracle hits ~strength."""
    from collections import defaultdict

    import numpy as np

    from seqrec_tpu.data.synthetic import generate_interactions_lag2

    strength, n_items = 0.6, 400
    rows = generate_interactions_lag2(
        n_users=400, n_items=n_items, min_len=20, max_len=60,
        markov_strength=strength, seed=5,
    )
    seqs = defaultdict(list)
    for u, i, _, _ in rows:
        seqs[u].append(i)

    # recover the planted permutation from the data itself
    votes = defaultdict(lambda: defaultdict(int))
    for s in seqs.values():
        for a, c in zip(s, s[2:]):
            votes[a][c] += 1
    succ = {a: max(v, key=v.get) for a, v in votes.items()}

    users = sorted(seqs)
    trans = defaultdict(lambda: defaultdict(int))
    for u in users[:350]:
        s = seqs[u]
        for b, c in zip(s, s[1:]):
            trans[b][c] += 1
    mm = oracle = n = 0
    for u in users[350:]:
        s = seqs[u]
        for a, b, c in zip(s, s[1:], s[2:]):
            top = sorted(trans[b], key=lambda x: -trans[b][x])[:10]
            mm += int(c in top)
            oracle += int(c == succ.get(a, -1))
            n += 1
    assert oracle / n > strength * 0.9, oracle / n
    assert mm / n < 0.3 * strength, mm / n  # first-order is blind
