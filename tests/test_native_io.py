"""Native C++ parsers vs the Python reference parsers."""

import os

import numpy as np
import pytest

from seqrec_tpu.data import native
from seqrec_tpu.data.dataset import SequenceStore


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _python_parse(filename):
    users, items, ratings, offsets = [], [], [], [0]
    with open(filename) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            users.append(int(float(parts[0])))
            seq = parts[1:]
            items.extend(int(float(t)) for t in seq[0::2])
            ratings.extend(float(t) for t in seq[1::2])
            offsets.append(len(items))
    return users, items, ratings, offsets


def test_native_sequences_matches_python(lib, tmp_path):
    fn = tmp_path / "seqs"
    fn.write_text(
        "0 5 4.5 7 3 2 1\n"
        "3 9 2.5\n"
        "7 1 1 2 2 3 3 4 4\n"
    )
    got = native.load_sequences_native(str(fn))
    assert got is not None
    items, ratings, offsets, users = got
    pu, pi, pr, po = _python_parse(str(fn))
    np.testing.assert_array_equal(users, pu)
    np.testing.assert_array_equal(items, pi)
    np.testing.assert_allclose(ratings, pr, rtol=1e-6)
    np.testing.assert_array_equal(offsets, po)


def test_native_triplets(lib, tmp_path):
    fn = tmp_path / "trips"
    fn.write_text("0\t5\t4.0\n1\t2\t1.0\n1\t9\t3.5\n")
    users, items, ratings = native.load_triplets_native(str(fn))
    np.testing.assert_array_equal(users, [0, 1, 1])
    np.testing.assert_array_equal(items, [5, 2, 9])
    np.testing.assert_allclose(ratings, [4.0, 1.0, 3.5])


def test_sequence_store_uses_native(lib, synthetic_dataset):
    fn = os.path.join(synthetic_dataset, "data", "train_set_sequences")
    store = SequenceStore.from_file(fn)
    # cross-check against the pure python parse
    os.environ["SEQREC_NO_NATIVE"] = "1"
    try:
        native._lib, native._lib_failed = None, False
        store_py = SequenceStore.from_file(fn)
    finally:
        del os.environ["SEQREC_NO_NATIVE"]
        native._lib, native._lib_failed = None, False
    np.testing.assert_array_equal(store.items, store_py.items)
    np.testing.assert_array_equal(store.offsets, store_py.offsets)
    np.testing.assert_array_equal(store.user_ids, store_py.user_ids)
    np.testing.assert_allclose(store.ratings, store_py.ratings, rtol=1e-6)
