"""Metric oracles: closed-form values on tiny hand-built instance lists.

Semantics under test are those of /root/reference/helpers/evaluation.py
(see docstrings in seqrec_tpu/utils/evaluation.py for file:line cites).
"""

import numpy as np
import pytest

from seqrec_tpu.utils.evaluation import Evaluator


def make_ev(fake_dataset, instances, k=10):
    ev = Evaluator(fake_dataset, k=k)
    for goal, pred in instances:
        ev.add_instance(goal, pred)
    return ev


def test_sps_uses_first_goal_only(fake_dataset):
    ev = make_ev(
        fake_dataset,
        [
            ([5, 7], [5, 1, 2]),   # goal[0]=5 in top-k -> hit
            ([7, 5], [5, 1, 2]),   # goal[0]=7 not in top-k -> miss (5 is, but not first)
            ([3], [9, 8, 3]),      # hit
        ],
        k=3,
    )
    assert ev.sps() == pytest.approx(2 / 3)


def test_sps_truncates_to_k(fake_dataset):
    ev = make_ev(fake_dataset, [([4], [1, 2, 4])], k=2)
    assert ev.sps() == 0  # 4 is at rank 3, beyond k=2


def test_recall(fake_dataset):
    ev = make_ev(
        fake_dataset,
        [
            ([1, 2, 3, 4], [1, 2, 99]),  # 2/4
            ([5], [5]),                  # 1/1
        ],
        k=10,
    )
    assert ev.average_recall() == pytest.approx((0.5 + 1.0) / 2)


def test_precision_divides_by_min_len_k(fake_dataset):
    # prediction shorter than k: denominator is len(prediction)
    ev = make_ev(fake_dataset, [([1, 2], [1, 9])], k=10)
    assert ev.average_precision() == pytest.approx(1 / 2)
    ev2 = make_ev(fake_dataset, [([1, 2], [1, 9, 8, 7, 6])], k=3)
    assert ev2.average_precision() == pytest.approx(1 / 3)


def test_ndcg_binary_with_capped_ideal(fake_dataset):
    # goal has 1 item; prediction of length 3, hit at position 2 (0-based)
    # max_dcg = 1/log2(2) (only i=0 < len(goal)); dcg = 1/log2(4)
    ev = make_ev(fake_dataset, [([7], [1, 2, 7])], k=10)
    expected = (1 / np.log2(4)) / (1 / np.log2(2))
    assert ev.average_ndcg() == pytest.approx(expected)


def test_user_coverage(fake_dataset):
    ev = make_ev(
        fake_dataset,
        [([1], [1, 2]), ([3], [4, 5]), ([6, 7], [9, 7])],
    )
    assert ev.user_coverage() == pytest.approx(2 / 3)


def test_item_coverage_is_a_count(fake_dataset):
    ev = make_ev(
        fake_dataset,
        [([1, 2], [1, 2, 3]), ([2, 9], [2, 8])],
    )
    # distinct correct items: {1, 2} from first, {2} from second -> {1, 2}
    assert ev.item_coverage() == 2


def test_blockbuster_share(fake_dataset):
    # fake_dataset: 100 items, popularity descending with item id
    # -> top 1% = 1 item = item 0
    ev = make_ev(
        fake_dataset,
        [([0, 50], [0, 50])],  # both correct; only item 0 is a blockbuster
    )
    assert ev.blockbuster_share() == pytest.approx(1 / 2)


def test_blockbuster_share_empty(fake_dataset):
    ev = make_ev(fake_dataset, [([1], [2])])
    assert ev.blockbuster_share() == 0


def test_assr_default_and_set(fake_dataset):
    ev = make_ev(fake_dataset, [([1], [1])])
    assert ev.assr() == 1
    ev.nb_of_dp = 20.0
    assert ev.assr() == pytest.approx(100 / 20.0)


def test_metrics_divide_by_all_instances(fake_dataset):
    # recall guard skips empty goal but still divides by len(instances)
    ev = make_ev(fake_dataset, [([], [1]), ([1], [1])])
    assert ev.average_recall() == pytest.approx(0.5)


def test_correct_prediction_collections(fake_dataset):
    ev = make_ev(fake_dataset, [([1, 2], [2, 3]), ([2], [2])])
    correct = sorted(ev.get_correct_predictions())
    assert correct == [2, 2]
    assert ev.get_strict_goals() == [1, 2]


def test_distribution_characteristics():
    from seqrec_tpu.utils.evaluation import DistributionCharacteristics

    d = DistributionCharacteristics([1, 1, 2, 3, 3, 3])
    assert d.number_of_items() == 3
    # one item seen twice, one once, one three times
    assert d.frequency_distribution() == {2: 1, 1: 1, 3: 1}
    bars = d.popularity_distribution(np.array([5.0, 1.0, 2.0, 3.0, 4.0]), n_bins=5)
    assert bars.sum() == 6  # every occurrence lands in exactly one bucket
    assert bars[0] == 2  # item 1 is the least popular -> first decile
