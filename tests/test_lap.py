"""Hungarian matching vs scipy (the reference's solver)."""
import numpy as np
from scipy.optimize import linear_sum_assignment

from pavenet_tpu.ops import hungarian
from pavenet_tpu.ops.lap import hungarian_masked


def total_cost(cost, col4row):
    return sum(cost[i, j] for i, j in enumerate(col4row))


def test_matches_scipy_square_and_rect():
    rng = np.random.RandomState(0)
    for trial in range(20):
        R = rng.randint(1, 12)
        C = rng.randint(R, 40)
        cost = rng.randn(R, C).astype(np.float32) * 10
        got = np.asarray(hungarian(cost))
        rows, cols = linear_sum_assignment(cost)
        assert len(set(got.tolist())) == R, "assignment must be one-to-one"
        np.testing.assert_allclose(
            total_cost(cost, got), cost[rows, cols].sum(), rtol=1e-5)


def test_masked_rows():
    rng = np.random.RandomState(1)
    R, C = 8, 20
    cost = rng.rand(R, C).astype(np.float32)
    valid = np.array([True] * 3 + [False] * 5)
    got = np.asarray(hungarian_masked(cost, valid))
    assert (got[3:] == -1).all()
    rows, cols = linear_sum_assignment(cost[:3])
    assert total_cost(cost[:3], got[:3]) <= cost[rows, cols].sum() + 1e-5


def test_duplicate_costs():
    cost = np.zeros((4, 6), np.float32)
    got = np.asarray(hungarian(cost))
    assert len(set(got.tolist())) == 4
