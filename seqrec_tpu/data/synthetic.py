"""Synthetic datasets with planted sequential structure.

Used by tests and benchmarks (no public dataset ships with the image).
The generator plants a first-order Markov chain over items plus a
popularity skew, so that sequence-aware models (RNN, Markov, FPMC) can
beat the POP floor on sps@10 — the reference's implicit sanity bar.
"""

from __future__ import annotations

import os

import numpy as np

from seqrec_tpu.data import preprocess as pp


def generate_interactions(
    n_users: int = 500,
    n_items: int = 200,
    min_len: int = 10,
    max_len: int = 40,
    markov_strength: float = 0.7,
    seed: int = 0,
) -> np.ndarray:
    """Return an interactions array of rows ``(user, item, rating, time)``.

    With probability ``markov_strength`` the next item follows a planted
    deterministic successor chain (with a small random jump); otherwise it
    is drawn from a Zipf-like popularity distribution.
    """
    rng = np.random.default_rng(seed)
    # planted successor permutation: item i -> succ[i]
    succ = rng.permutation(n_items)
    pop_logits = -1.1 * np.log(np.arange(1, n_items + 1))
    pop = np.exp(pop_logits - pop_logits.max())
    pop /= pop.sum()

    rows = []
    t = 0
    for u in range(n_users):
        length = int(rng.integers(min_len, max_len + 1))
        item = int(rng.choice(n_items, p=pop))
        seen = {item}
        rows.append((u, item, 1 + int(rng.integers(0, 5)), t))
        t += 1
        for _ in range(length - 1):
            if rng.random() < markov_strength:
                item = int(succ[item])
            else:
                item = int(rng.choice(n_items, p=pop))
            # avoid long repeats of the same item
            if item in seen and rng.random() < 0.5:
                item = int(rng.choice(n_items, p=pop))
            seen.add(item)
            rows.append((u, item, 1 + int(rng.integers(0, 5)), t))
            t += 1
    return np.asarray(rows, dtype=np.int64)


def make_dataset(
    dirname: str,
    n_users: int = 500,
    n_items: int = 200,
    min_len: int = 10,
    max_len: int = 40,
    markov_strength: float = 0.7,
    val_size: float = 0.1,
    test_size: float = 0.1,
    seed: int = 0,
) -> str:
    """Generate interactions and run the full preprocess pipeline into
    ``dirname``. Returns the dataset directory path (with trailing slash)."""
    os.makedirs(dirname, exist_ok=True)
    rows = generate_interactions(
        n_users=n_users,
        n_items=n_items,
        min_len=min_len,
        max_len=max_len,
        markov_strength=markov_strength,
        seed=seed,
    )
    raw = os.path.join(dirname, "interactions.tsv")
    np.savetxt(raw, rows, fmt="%d", delimiter="\t")
    return pp.preprocess(
        raw,
        columns="uirt",
        sep="\t",
        min_user_activity=2,
        min_item_pop=1,
        val_size=val_size,
        test_size=test_size,
        seed=seed,
        dirname=dirname if dirname.endswith("/") else dirname + "/",
    )
