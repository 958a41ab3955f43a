"""CTC forward-algorithm loss vs brute-force path enumeration."""

import itertools
import math

import numpy as np
import pytest

from calamari_spark.operators.ctc_loss import ctc_loss


def _collapse(path, blank=0):
    out = []
    prev = None
    for p in path:
        if p != blank and p != prev:
            out.append(p)
        prev = p
    return out


def _brute_force(softmax, labels, blank=0):
    T, C = softmax.shape
    total = 0.0
    for path in itertools.product(range(C), repeat=T):
        if _collapse(path, blank) == list(labels):
            p = 1.0
            for t, c in enumerate(path):
                p *= softmax[t, c]
            total += p
    return -math.log(total) if total > 0 else float("inf")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("labels", [[1], [1, 2], [1, 1], [2, 1, 2]])
def test_matches_brute_force(seed, labels):
    rng = np.random.RandomState(seed)
    T, C = 5, 4
    sm = rng.dirichlet(np.ones(C), size=T)
    assert ctc_loss(sm, labels) == pytest.approx(_brute_force(sm, labels), rel=1e-9)


def test_single_frame_single_label():
    sm = np.array([[0.2, 0.5, 0.3]])
    assert ctc_loss(sm, [1]) == pytest.approx(-math.log(0.5))
    assert ctc_loss(sm, []) == pytest.approx(-math.log(0.2))


def test_infeasible_is_inf():
    sm = np.full((1, 3), 1 / 3)
    assert ctc_loss(sm, [1, 2]) == float("inf")
    assert ctc_loss(sm, [1, 1]) == float("inf")  # repeat needs a blank frame
    assert ctc_loss(np.full((2, 3), 1 / 3), [1, 1]) == float("inf")  # 2 < 3
    assert ctc_loss(np.full((3, 3), 1 / 3), [1, 1]) < float("inf")


def test_confident_model_near_zero_loss():
    # a near-one-hot path spelling [1, 2] should have tiny loss
    sm = np.full((4, 3), 1e-6)
    for t, c in enumerate([1, 0, 2, 0]):
        sm[t, c] = 1 - 2e-6
    assert ctc_loss(sm, [1, 2]) < 0.01


@pytest.mark.parametrize("T", [1, 2, 3, 5])
def test_empty_labels_is_sum_of_blank_logprobs(T):
    rng = np.random.RandomState(9)
    sm = rng.dirichlet(np.ones(3), size=T)
    expected = -sum(math.log(sm[t, 0]) for t in range(T))
    assert ctc_loss(sm, []) == pytest.approx(expected, rel=1e-12)
