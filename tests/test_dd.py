import numpy as np
import pytest

from dafs_tpu import dd
from tests import oracle_dd


def _fake_merge_problem(rng, L1, L2):
    """Random but structured posteriors resembling a real merge step."""
    # a couple of plausible helix candidates shared between both groups
    p_x = np.zeros((L1, L1), np.float32)
    p_y = np.zeros((L2, L2), np.float32)
    p_z = np.zeros((L1, L2), np.float32)
    for i in range(L1):
        j = int(np.clip(round(i * L2 / L1) + rng.integers(-1, 2), 0, L2 - 1))
        p_z[i, j] = 0.4 + 0.6 * rng.random()
    for _ in range(L1):
        i = int(rng.integers(0, L1 - 4))
        j = int(rng.integers(i + 4, L1))
        p_x[i, j] = 0.3 + 0.7 * rng.random()
        # a matching pair in y coordinates
        k = int(np.clip(round(i * L2 / L1), 0, L2 - 1))
        l = int(np.clip(round(j * L2 / L1), 0, L2 - 1))
        if k + 3 < l:
            p_y[k, l] = 0.3 + 0.7 * rng.random()
    for _ in range(L2 // 2):
        k = int(rng.integers(0, L2 - 4))
        l = int(rng.integers(k + 4, L2))
        p_y[k, l] = max(p_y[k, l], 0.2 + 0.5 * rng.random())
    return p_x, p_y, p_z


@pytest.mark.parametrize("seed", range(4))
def test_dd_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    L1 = int(rng.integers(12, 22))
    L2 = int(rng.integers(12, 22))
    p_x, p_y, p_z = _fake_merge_problem(rng, L1, L2)
    kw = dict(w=4.0, th_s=[0.2], th_a=0.01, eta0=0.5, t_max=60)

    s_w, x_w, y_w, z_w, viol_w = oracle_dd.solve_by_dd(
        p_x, p_y, p_z, 1, 1, 4.0, [0.2], 0.01, 0.5, 60
    )
    s_g, x_g, y_g, z_g = dd.solve_by_dd(p_x, p_y, p_z, 1, 1, **kw)

    np.testing.assert_array_equal(x_g, x_w)
    np.testing.assert_array_equal(y_g, y_w)
    np.testing.assert_array_equal(z_g, z_w)
    assert abs(s_g - s_w) < 1e-3


def test_dd_group_weighting():
    # asymmetric group sizes exercise the 2N/(N1+N2) weighting
    rng = np.random.default_rng(7)
    p_x, p_y, p_z = _fake_merge_problem(rng, 18, 16)
    s_w, x_w, y_w, z_w, _ = oracle_dd.solve_by_dd(
        p_x, p_y, p_z, 3, 1, 4.0, [0.2], 0.01, 0.5, 40
    )
    s_g, x_g, y_g, z_g = dd.solve_by_dd(
        p_x, p_y, p_z, 3, 1, w=4.0, th_s=[0.2], th_a=0.01, eta0=0.5, t_max=40
    )
    np.testing.assert_array_equal(x_g, x_w)
    np.testing.assert_array_equal(y_g, y_w)
    np.testing.assert_array_equal(z_g, z_w)


def test_dd_update_rules_converge():
    """AdaGrad/Adam variants (src/dafs.cpp:984-1004) reach the same feasible
    solution as plain subgradient on a consistent toy problem."""
    import numpy as np

    from dafs_tpu import dd

    L = 10
    p_x = np.zeros((L, L), np.float32)
    p_y = np.zeros((L, L), np.float32)
    p_z = np.eye(L, dtype=np.float32) * 0.99
    for i, j in [(0, 9), (1, 8), (2, 7)]:
        p_x[i, j] = p_y[i, j] = 0.9
    base = None
    for rule in ["subgradient", "adagrad", "adam"]:
        s, x, y, z = dd.solve_by_dd(
            p_x, p_y, p_z, 1, 1, w=4.0, th_s=[0.2], th_a=0.01,
            eta0=0.5, t_max=200, update_rule=rule,
        )
        if base is None:
            base = (list(x), list(y), list(z))
        assert (list(x), list(y), list(z)) == base, rule


def test_solve_by_dd_batch_matches_serial():
    """The vmapped layered solver must reproduce the serial per-merge path."""
    rng = np.random.default_rng(3)

    def prob(L1, L2):
        p_x = np.triu(rng.random((L1, L1)).astype(np.float32) * 0.5, 1)
        p_y = np.triu(rng.random((L2, L2)).astype(np.float32) * 0.5, 1)
        p_z = rng.random((L1, L2)).astype(np.float32) * 0.6
        p_x[p_x <= 0.01] = 0
        p_y[p_y <= 0.01] = 0
        p_z[p_z <= 0.01] = 0
        return p_x, p_y, p_z

    kw = dict(w=4.0, th_s=[0.2], th_a=0.01, eta0=0.5, t_max=40)
    problems = []
    for (L1, L2, n1, n2) in [(18, 21, 1, 1), (25, 23, 2, 1), (30, 30, 3, 2)]:
        p_x, p_y, p_z = prob(L1, L2)
        problems.append((p_x, p_y, p_z, n1, n2))
    serial = [dd.solve_by_dd(*p, **kw) for p in problems]
    batched = dd.solve_by_dd_batch(problems, **kw)
    for (s0, x0, y0, z0), (s1, x1, y1, z1) in zip(serial, batched):
        assert s0 == s1
        np.testing.assert_array_equal(x0, x1)
        np.testing.assert_array_equal(y0, y1)
        np.testing.assert_array_equal(z0, z1)
