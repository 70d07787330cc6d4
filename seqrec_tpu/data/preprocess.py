"""CSV → canonical dataset directory.

Re-implements the reference preprocessor's on-disk contract
(/root/reference/preprocess.py:44-279): column-spec parsing (``uirt``),
default rating of 1, chronological sort (int timestamps treated as unix
seconds), alternating min-activity filtering, pandas-categorical id
remapping with mapping files, by-user train/val/test split, triplet +
sequence formats, the extended training set ``train_set_sequences+``
(first halves of val/test users' sequences), the ``stats`` file and
README files.

Intentional divergences from the reference (documented, not replicated):
- the split samples users WITHOUT replacement (the reference's
  ``np.random.choice`` without ``replace=False`` could draw duplicate user
  ids and undershoot the requested split size, preprocess.py:136-140);
- no interactive confirmation prompt (``--yes`` is implied when run
  programmatically; the CLI keeps a prompt unless ``--yes`` is passed);
- Python 3 / seeded ``numpy.random.Generator``.
"""

from __future__ import annotations

import argparse
import os
import sys
from shutil import copyfile

import numpy as np
import pandas as pd


def command_parser(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", dest="filename", help="Input file", required=True, type=str)
    parser.add_argument(
        "--columns",
        help='Order of the columns in the file (eg: "uirt"), u=user, i=item, '
        "t=timestamp, r=rating. Missing r ⇒ rating 1; missing t ⇒ input order is "
        "chronological. Extra columns ignored. Default: uit",
        default="uit",
        type=str,
    )
    parser.add_argument(
        "--sep",
        help="Column separator (pandas regex allowed).",
        default=r"\s+",
        type=str,
    )
    parser.add_argument(
        "--min_user_activity",
        help="Users with fewer interactions are removed. Default: 2",
        default=2,
        type=int,
    )
    parser.add_argument(
        "--min_item_pop",
        help="Items with fewer interactions are removed. Default: 5",
        default=5,
        type=int,
    )
    parser.add_argument(
        "--val_size",
        help="Users in the validation set; (0,1) means a fraction. Default: 0.1",
        default=0.1,
        type=float,
    )
    parser.add_argument(
        "--test_size",
        help="Users in the test set; (0,1) means a fraction. Default: 0.1",
        default=0.1,
        type=float,
    )
    parser.add_argument("--seed", help="Seed for the random split", default=1, type=int)
    parser.add_argument(
        "--yes", help="Do not ask for confirmation.", action="store_true"
    )
    args = parser.parse_args(argv)
    args.dirname = os.path.dirname(os.path.abspath(args.filename)) + "/"
    return args


def create_dirs(dirname: str) -> None:
    for sub in ("data", "models", "results"):
        os.makedirs(os.path.join(dirname, sub), exist_ok=True)


def load_data(filename: str, columns: str, separator: str) -> pd.DataFrame:
    """Load and chronologically sort the raw interactions
    (preprocess.py:44-65)."""
    data = pd.read_csv(
        filename,
        sep=separator,
        names=list(columns),
        index_col=False,
        usecols=range(len(columns)),
        engine="python" if len(separator) > 1 and separator != r"\s+" else "c",
    )
    if "r" not in columns:
        data["r"] = 1
    if "t" in columns:
        if data["t"].dtype == np.int64:  # probably a unix timestamp
            data["t"] = pd.to_datetime(data["t"], unit="s")
        else:
            data["t"] = pd.to_datetime(data["t"])
        data = data.sort_values("t", kind="mergesort")
    return data


def remove_rare_elements(
    data: pd.DataFrame, min_user_activity: int, min_item_popularity: int
) -> pd.DataFrame:
    """Alternating removal of inactive users and rare items
    (preprocess.py:67-87). The item constraint may end up loosely satisfied,
    as in the reference."""
    user_activity = data.groupby("u")["u"].transform("size")
    data = data[user_activity >= min_user_activity]
    item_popularity = data.groupby("i")["i"].transform("size")
    data = data[item_popularity >= min_item_popularity]
    user_activity = data.groupby("u")["u"].transform("size")
    data = data[user_activity >= min_user_activity]
    return data


def save_index_mapping(data: pd.DataFrame, dirname: str) -> pd.DataFrame:
    """Remap ids to consecutive ints and persist the mapping TSVs
    (preprocess.py:89-115)."""
    data = data.copy()
    data["u_original"] = data["u"].astype("category")
    data["i_original"] = data["i"].astype("category")
    data["u"] = data["u_original"].cat.codes
    data["i"] = data["i_original"].cat.codes

    for col, fname in (("u", "user_id_mapping"), ("i", "item_id_mapping")):
        mapping = pd.DataFrame(
            {"original_id": data[col + "_original"], "new_id": data[col]}
        )
        mapping = mapping.sort_values("original_id").drop_duplicates(
            subset="original_id"
        )
        mapping.to_csv(
            os.path.join(dirname, "data", fname), sep="\t", index=False
        )
    return data


def split_data(
    data: pd.DataFrame,
    nb_val_users: float,
    nb_test_users: float,
    dirname: str,
    rng: np.random.Generator,
):
    """By-user random split into train/val/test; each user lands in exactly
    one set (preprocess.py:117-151). Sampling is without replacement."""
    nb_users = data["u"].nunique()
    if nb_val_users < 1:
        nb_val_users = round(nb_val_users * nb_users)
    if nb_test_users < 1:
        nb_test_users = round(nb_test_users * nb_users)
    nb_val_users, nb_test_users = int(nb_val_users), int(nb_test_users)

    if nb_users <= nb_val_users + nb_test_users:
        raise ValueError(
            "Not enough users in the dataset: choose less users for validation and test splits"
        )

    def extract_n_users(df, n):
        users_ids = rng.choice(df["u"].unique(), n, replace=False)
        n_set = df[df["u"].isin(users_ids)]
        remain_set = df.drop(n_set.index)
        return n_set, remain_set

    test_set, tmp_set = extract_n_users(data, nb_test_users)
    val_set, train_set = extract_n_users(tmp_set, nb_val_users)

    for df, name in (
        (train_set, "train_set_triplets"),
        (val_set, "val_set_triplets"),
        (test_set, "test_set_triplets"),
    ):
        df.to_csv(
            os.path.join(dirname, "data", name),
            sep="\t",
            columns=["u", "i", "r"],
            index=False,
            header=False,
        )
    return train_set, val_set, test_set


def gen_sequences(data: pd.DataFrame, half: bool = False):
    """Yield ``[user, i1, r1, i2, r2, ...]`` rows; ``half=True`` keeps only
    the first half of each sequence (preprocess.py:153-172).

    Reference parity notes: sequences with ≤ 3 tokens (user + 1 item) are
    dropped for all but the final user, and the final user's sequence is
    yielded unconditionally — both quirks preserved.
    """
    data = data.sort_values("u", kind="mergesort")  # stable: keeps time order
    seq: list = []
    prev_id = -1
    for u, i, r in zip(data["u"], data["i"], data["r"]):
        if u != prev_id:
            if len(seq) > 3:
                if half:
                    seq = seq[: 1 + 2 * int((len(seq) - 1) / 4)]
                yield seq
            prev_id = u
            seq = [u]
        seq.extend([i, r])
    if half:
        seq = seq[: 1 + 2 * int((len(seq) - 1) / 4)]
    yield seq


def make_sequence_format(train_set, val_set, test_set, dirname) -> None:
    """Write the sequence-format splits and the extended training set
    (preprocess.py:174-201)."""
    for df, name in (
        (train_set, "train_set_sequences"),
        (val_set, "val_set_sequences"),
        (test_set, "test_set_sequences"),
    ):
        with open(os.path.join(dirname, "data", name), "w") as f:
            for s in gen_sequences(df):
                f.write(" ".join(map(str, s)) + "\n")

    plus = os.path.join(dirname, "data", "train_set_sequences+")
    copyfile(os.path.join(dirname, "data", "train_set_sequences"), plus)
    with open(plus, "a") as f:
        for df in (val_set, test_set):
            for s in gen_sequences(df, half=True):
                f.write(" ".join(map(str, s)) + "\n")


def save_data_stats(data, train_set, val_set, test_set, dirname) -> None:
    """Write ``data/stats`` (preprocess.py:203-214)."""

    def _get_stats(df):
        return "\t".join(
            map(
                str,
                [
                    df["u"].nunique(),
                    df["i"].nunique(),
                    len(df.index),
                    df.groupby("u").size().max(),
                ],
            )
        )

    with open(os.path.join(dirname, "data", "stats"), "w") as f:
        f.write("set\tn_users\tn_items\tn_interactions\tlongest_sequence\n")
        f.write("Full\t" + _get_stats(data) + "\n")
        f.write("Train\t" + _get_stats(train_set) + "\n")
        f.write("Val\t" + _get_stats(val_set) + "\n")
        f.write("Test\t" + _get_stats(test_set) + "\n")


def make_readme(dirname, val_set, test_set) -> None:
    data_readme = (
        "Files generated by seqrec_tpu preprocess (reference-compatible layout):\n"
        "  user_id_mapping / item_id_mapping: original ↔ new id TSVs\n"
        "  train_set_triplets: (user, item, rating) per line, chronological\n"
        "  {train,val,test}_set_sequences: user i1 r1 i2 r2 ... per line\n"
        "  train_set_sequences+: training set plus first halves of val/test users\n"
        "  stats: per-split counts\n"
        "The validation set contains %s users, the test set %s users.\n"
        % (val_set["u"].nunique(), test_set["u"].nunique())
    )
    results_readme = (
        "Each line of a results file corresponds to one model: the epoch count\n"
        "followed by tab-separated metric values (all @10 unless -k is set).\n"
    )
    with open(os.path.join(dirname, "data", "README"), "w") as f:
        f.write(data_readme)
    with open(os.path.join(dirname, "results", "README"), "w") as f:
        f.write(results_readme)


def preprocess(
    filename: str,
    columns: str = "uit",
    sep: str = r"\s+",
    min_user_activity: int = 2,
    min_item_pop: int = 5,
    val_size: float = 0.1,
    test_size: float = 0.1,
    seed: int = 1,
    dirname: str | None = None,
) -> str:
    """Programmatic entry point; returns the dataset directory."""
    if dirname is None:
        dirname = os.path.dirname(os.path.abspath(filename)) + "/"
    rng = np.random.default_rng(seed)
    create_dirs(dirname)
    data = load_data(filename, columns, sep)
    data = remove_rare_elements(data, min_user_activity, min_item_pop)
    data = save_index_mapping(data, dirname)
    train_set, val_set, test_set = split_data(
        data, val_size, test_size, dirname, rng
    )
    make_sequence_format(train_set, val_set, test_set, dirname)
    save_data_stats(data, train_set, val_set, test_set, dirname)
    make_readme(dirname, val_set, test_set)
    return dirname


def main(argv=None) -> None:
    args = command_parser(argv)
    if not args.yes:
        print(
            "This program will create a lot of files and directories in "
            + args.dirname
        )
        answer = input("Are you sure that you want to do that ? [y/n]")
        if answer != "y":
            sys.exit(0)
    preprocess(
        args.filename,
        columns=args.columns,
        sep=args.sep,
        min_user_activity=args.min_user_activity,
        min_item_pop=args.min_item_pop,
        val_size=args.val_size,
        test_size=args.test_size,
        seed=args.seed,
        dirname=args.dirname,
    )
    print("Data ready!")


if __name__ == "__main__":
    main()
