from seqrec_tpu.utils.early_stopping import StopAfterN, WaitWorstCaseTimesX


def test_stop_after_n_waits_for_n_nonimproving():
    es = StopAfterN(n=2)
    assert not es([1, 2], [0.5, 0.4])          # too few evals
    assert not es([1, 2, 3], [0.5, 0.4, 0.45])  # improvement in window
    assert es([1, 2, 3], [0.5, 0.4, 0.3])       # 2 consecutive decreases
    assert not es([1, 2, 3, 4], [0.5, 0.4, 0.3, 0.35])


def test_stop_after_n_lower_is_better():
    es = StopAfterN(n=2, higher_is_better=False)
    # decreasing cost = improving -> never stop
    assert not es([1, 2, 3, 4], [0.5, 0.4, 0.3, 0.2])
    # increasing cost = worsening -> stop
    assert es([1, 2, 3], [0.2, 0.3, 0.4])


def test_worst_times_x():
    es = WaitWorstCaseTimesX(x=2.0, min_wait=1.0)
    # bests at epoch 1 and 2 (longest wait 1); current wait 1 -> no stop
    assert not es([1, 2, 3], [0.1, 0.2, 0.15])
    # current wait 3 > max(1, 1*2) -> stop
    assert es([1, 2, 3, 4, 5], [0.1, 0.2, 0.15, 0.12, 0.1])


def test_worst_times_x_no_improvement_uses_min_wait():
    es = WaitWorstCaseTimesX(x=2.0, min_wait=1.5)
    # no best after the first -> longest_wait == 0, compare to min_wait
    assert not es([1, 2], [0.5, 0.4])          # wait 1 <= 1.5
    assert es([1, 2, 3], [0.5, 0.4, 0.3])      # wait 2 > 1.5
