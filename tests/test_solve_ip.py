import numpy as np

from dafs_tpu import dd


def _consistent_problem(L=20, stem=5):
    """Identity matching + a shared stem: DD converges to 0 violations."""
    p_x = np.zeros((L, L), np.float32)
    p_y = np.zeros((L, L), np.float32)
    p_z = np.zeros((L, L), np.float32)
    for k in range(stem):
        p_x[k, L - 1 - k] = 0.9
        p_y[k, L - 1 - k] = 0.9
    np.fill_diagonal(p_z, 0.95)
    return p_x, p_y, p_z


def test_ip_agrees_with_converged_dd():
    p_x, p_y, p_z = _consistent_problem()
    kw = dict(w=4.0, th_s=[0.2], th_a=0.01, eta0=0.5)
    s_dd, x_dd, y_dd, z_dd = dd.solve_by_dd(p_x, p_y, p_z, 1, 1, t_max=600, **kw)
    s_ip, x_ip, y_ip, z_ip = dd.solve_by_ip(p_x, p_y, p_z, 1, 1, t_max=0, **kw)
    np.testing.assert_array_equal(x_dd, x_ip)
    np.testing.assert_array_equal(y_dd, y_ip)
    np.testing.assert_array_equal(z_dd, z_ip)
    # consensus: every x pair maps via z onto a y pair (src/dafs.cpp ILP W rows)
    for i, j in enumerate(x_ip):
        if j >= 0:
            assert z_ip[i] >= 0 and z_ip[j] >= 0
            assert y_ip[z_ip[i]] == z_ip[j]


def test_ip_empty_problem():
    p_x = np.zeros((8, 8), np.float32)
    p_y = np.zeros((8, 8), np.float32)
    p_z = np.zeros((8, 8), np.float32)
    s, x, y, z = dd.solve_by_ip(
        p_x, p_y, p_z, 1, 1, w=4.0, th_s=[0.2], th_a=0.01, t_max=0
    )
    assert (x < 0).all() and (y < 0).all() and (z < 0).all()
