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


def generate_interactions_vec(
    n_users: int,
    n_items: int,
    min_len: int = 20,
    max_len: int = 100,
    markov_strength: float = 0.5,
    seed: int = 0,
    zipf: float = 0.0,
) -> np.ndarray:
    """Vectorized variant of :func:`generate_interactions` for LARGE
    catalogs (the per-interaction Python loop above takes minutes at
    10^5-item catalogs; this walks all users' Markov chains in parallel,
    one numpy pass per timestep).

    With ``zipf=0`` (default) non-Markov draws are uniform over the
    catalog so a bounded number of draws covers the whole catalog (a
    200k-item bench dataset should actually have ~200k items after
    preprocessing). With ``zipf>0`` the loop generator's regime is
    reproduced at scale: non-Markov draws follow a (shuffled) Zipf
    popularity and a draw that repeats an already-consumed item is
    redrawn once with probability 1/2 — the structure that lets an RNN
    BEAT the Markov floor (popularity fills ranks 2..10 and rare items'
    successor estimates need cross-item generalization), exactly like
    the ML-1M-scale dataset in BASELINE.md. Uniform mode keeps MM as
    the near-Bayes predictor (measured: GRU val 0.47 vs MM 0.44 at 50k
    items), so quality campaigns use zipf>0.
    """
    rng = np.random.default_rng(seed)
    succ = rng.permutation(n_items)
    lengths = rng.integers(min_len, max_len + 1, size=n_users)
    L = int(lengths.max())
    items = np.zeros((n_users, L), dtype=np.int64)

    if zipf > 0.0:
        pop = (1.0 / np.arange(1, n_items + 1) ** zipf)
        pop = rng.permutation(pop / pop.sum())
        cum = np.cumsum(pop)

        def draw(n):
            return np.minimum(
                np.searchsorted(cum, rng.random(n)), n_items - 1
            )

        def seen_before(cand, t):
            # membership of cand in each user's first t items (the loop
            # generator's ``item in seen``), vectorized per timestep
            if t == 0:
                return np.zeros(len(cand), dtype=bool)
            return (items[:, :t] == cand[:, None]).any(axis=1)

        items[:, 0] = draw(n_users)
        for t in range(1, L):
            follow = rng.random(n_users) < markov_strength
            nxt = np.where(follow, succ[items[:, t - 1]], draw(n_users))
            # repeat-avoidance (generate_interactions:52-54): half of the
            # repeated draws are replaced by a fresh popularity draw
            redraw = seen_before(nxt, t) & (rng.random(n_users) < 0.5)
            if redraw.any():
                nxt[redraw] = draw(int(redraw.sum()))
            items[:, t] = nxt
    else:
        items[:, 0] = rng.integers(0, n_items, size=n_users)
        for t in range(1, L):
            follow = rng.random(n_users) < markov_strength
            jump = rng.integers(0, n_items, size=n_users)
            items[:, t] = np.where(follow, succ[items[:, t - 1]], jump)
    valid = np.arange(L)[None, :] < lengths[:, None]
    users = np.repeat(np.arange(n_users), lengths)
    flat_items = items[valid]
    ratings = rng.integers(1, 6, size=flat_items.size)
    # chronological order: user-major (each user's sequence contiguous in
    # time), matching the loop generator's global time counter
    times = np.arange(flat_items.size)
    return np.stack([users, flat_items, ratings, times], axis=1)


def generate_interactions_grid(
    n_users: int = 500,
    n_items: int = 3600,
    min_len: int = 10,
    max_len: int = 40,
    markov_strength: float = 0.6,
    seed: int = 0,
    grid_cols: int | None = None,
) -> np.ndarray:
    """Compositional SECOND-order regime: the signal a first-order
    Markov model cannot capture.

    Items live on a (n/cols) x cols grid. With probability
    ``markov_strength`` the next item is the grid cell
    ``(row(i_{t-1}), col(i_{t-2}))`` — it composes the LAST item's row
    with the SECOND-TO-LAST item's column; otherwise a uniform jump.
    Conditioning on the previous item alone pins only the row, so a
    first-order model's mass spreads over the columns (sps bounded near
    q*10/cols + floor), while a sequence model with two steps of memory
    and factorized item embeddings can recover the exact cell. This is
    the complement of :func:`generate_interactions`'s first-order
    regime, where the Markov baseline wins by construction (BASELINE.md
    quality tables).

    ``grid_cols`` (default sqrt(n)) sets the column count. At large
    catalogs use FEWER columns than rows: the learnable structure is a
    cols-way classification of i_{t-2} (examples per column class =
    n_interactions/cols), and a symmetric 223x223 grid at 50k items was
    measured memorization-dominated — the GRU drove train cost to 3.7
    while held-out sps stayed at the first-order cap (0.04); 64 columns
    give each column class ~n/64 items' worth of evidence."""
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(n_items)) if grid_cols is None else grid_cols
    n_items = (n_items // side) * side  # snap to a full grid
    # UNIFORM non-Markov draws: a popularity skew would concentrate the
    # column marginal of i_{t-2}, letting a first-order model cover the
    # composed cells with a few popular columns (measured: Zipf jumps
    # gave a train-fit MM a 0.73 top-10 hit rate; uniform ~10/side)
    lengths = rng.integers(min_len, max_len + 1, size=n_users)
    L = int(lengths.max())
    items = np.zeros((n_users, L), dtype=np.int64)
    items[:, 0] = rng.integers(0, n_items, size=n_users)
    items[:, 1] = rng.integers(0, n_items, size=n_users)
    for t in range(2, L):
        follow = rng.random(n_users) < markov_strength
        composed = (items[:, t - 1] // side) * side + (items[:, t - 2] % side)
        jump = rng.integers(0, n_items, size=n_users)
        items[:, t] = np.where(follow, composed, jump)
    valid = np.arange(L)[None, :] < lengths[:, None]
    users = np.repeat(np.arange(n_users), lengths)
    flat_items = items[valid]
    ratings = rng.integers(1, 6, size=flat_items.size)
    times = np.arange(flat_items.size)
    return np.stack([users, flat_items, ratings, times], axis=1)


def generate_interactions_lag2(
    n_users: int = 500,
    n_items: int = 2000,
    min_len: int = 10,
    max_len: int = 40,
    markov_strength: float = 0.6,
    seed: int = 0,
) -> np.ndarray:
    """LAG-2 successor regime: second-order signal with first-order
    learnability.

    With probability ``markov_strength`` the next item is
    ``succ[i_{t-2}]`` (a planted permutation of the SECOND-TO-LAST
    item); otherwise a uniform jump. The sequence interleaves two
    independent successor chains (even/odd positions), so:

    - a first-order model is blind: conditioned on i_{t-1} alone, the
      next item is ~uniform (i_{t-2} decorrelates from i_{t-1}), putting
      MM at the POP floor;
    - a recurrent model faces exactly the first-order task it provably
      learns (BASELINE.md: RNN-CCE 0.54 on the planted lag-1 regime) —
      the same permutation lookup, delayed one step through the hidden
      state.

    This is the learnable counterpoint to the compositional grid regime
    (:func:`generate_interactions_grid`), where 50k-item runs were
    measured memorization-dominated (GRU peaks at the first-order cap
    0.07 and never recovers the (row, col) rule)."""
    rng = np.random.default_rng(seed)
    succ = rng.permutation(n_items)
    lengths = rng.integers(min_len, max_len + 1, size=n_users)
    L = int(lengths.max())
    items = np.zeros((n_users, L), dtype=np.int64)
    items[:, 0] = rng.integers(0, n_items, size=n_users)
    items[:, 1] = rng.integers(0, n_items, size=n_users)
    for t in range(2, L):
        follow = rng.random(n_users) < markov_strength
        jump = rng.integers(0, n_items, size=n_users)
        items[:, t] = np.where(follow, succ[items[:, t - 2]], jump)
    valid = np.arange(L)[None, :] < lengths[:, None]
    users = np.repeat(np.arange(n_users), lengths)
    flat_items = items[valid]
    ratings = rng.integers(1, 6, size=flat_items.size)
    times = np.arange(flat_items.size)
    return np.stack([users, flat_items, ratings, times], axis=1)


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
    vectorized: bool = False,
    generator: str | None = None,
    zipf: float = 0.0,
    grid_cols: int | None = None,
) -> str:
    """Generate interactions and run the full preprocess pipeline into
    ``dirname``. Returns the dataset directory path (with trailing slash).

    ``vectorized=True`` uses :func:`generate_interactions_vec` (uniform
    item popularity, required for large-catalog benchmark datasets);
    ``generator="grid"`` uses the second-order compositional regime
    (:func:`generate_interactions_grid`)."""
    os.makedirs(dirname, exist_ok=True)
    if generator == "grid":
        gen = generate_interactions_grid
        kwargs = {"grid_cols": grid_cols} if grid_cols else {}
    elif generator == "lag2":
        gen = generate_interactions_lag2
        kwargs = {}
    else:
        gen = generate_interactions_vec if vectorized else generate_interactions
        kwargs = {"zipf": zipf} if vectorized else {}
    rows = gen(
        n_users=n_users,
        n_items=n_items,
        min_len=min_len,
        max_len=max_len,
        markov_strength=markov_strength,
        seed=seed,
        **kwargs,
    )
    raw = os.path.join(dirname, "interactions.tsv")
    if vectorized:
        import pandas as pd

        pd.DataFrame(rows).to_csv(raw, sep="\t", header=False, index=False)
    else:
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
