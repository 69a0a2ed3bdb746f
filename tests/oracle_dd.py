"""Literal scalar re-expression of DAFS::solve_by_dd (src/dafs.cpp:1006-1295)."""

from __future__ import annotations

import numpy as np

from tests import oracle_decoders as orc

F = np.float32
CUTOFF = 0.01


def solve_by_dd(p_x, p_y, p_z, n1, n2, w, th_s, th_a, eta0, t_max):
    L1 = p_x.shape[0]
    L2 = p_y.shape[0]
    min_th_s = min(th_s)

    cbp = []
    c_x = [[] for _ in range(L1)]
    c_y = [[] for _ in range(L2)]
    c_z = [[] for _ in range(L1)]
    for i in range(L1 - 1):
        for j in range(i + 1, L1):
            if p_x[i, j] > CUTOFF:
                for k in range(L2 - 1):
                    if p_z[i, k] > CUTOFF:
                        for l in range(k + 1, L2):
                            if p_y[k, l] > CUTOFF and p_z[j, l] > CUTOFF:
                                p = F(F(n1) * p_x[i, j] + F(n2) * p_y[k, l]) / F(n1 + n2)
                                q = F(p_z[i, k] + p_z[j, l]) / F(2)
                                if p - F(min_th_s) > 0.0 and F(w) * (p - F(min_th_s)) + (q - F(th_a)) > 0.0:
                                    cbp.append((i, j, k, l))
                                    c_x[i].append(j)
                                    c_y[k].append(l)
                                    c_z[i].append(k)
                                    c_z[j].append(l)
    c_x = [sorted(set(v)) for v in c_x]
    c_y = [sorted(set(v)) for v in c_y]
    c_z = [sorted(set(v)) for v in c_z]

    env = orc.nw_envelope(p_z, th_a)

    q_x = np.zeros((L1, L1), np.float32)
    q_y = np.zeros((L2, L2), np.float32)
    q_z = np.zeros((L1, L2), np.float32)

    c = F(0.0)
    eta = F(eta0)
    s_prev = F(0.0)
    w_x = F(F(w) * 2 * n1 / (n1 + n2))
    w_y = F(F(w) * 2 * n2 / (n1 + n2))
    x = np.full(L1, -1)
    y = np.full(L2, -1)
    z = np.full(L1, -1)
    violated = 0

    for t in range(t_max):
        sm_x = np.float32(w_x * (p_x - F(th_s[0])) - q_x)
        s1, x = orc.sparse_nussinov(sm_x)
        sm_y = np.float32(w_y * (p_y - F(th_s[0])) - q_y)
        s2, y = orc.sparse_nussinov(sm_y)
        sm_z = np.float32(p_z - F(th_a) + q_z)
        s3, z = orc.sparse_nw(sm_z, env)
        s = F(F(s1) + F(s2) + F(s3))

        violated = 0
        t_x = np.zeros((L1, L1), np.int64)
        t_y = np.zeros((L2, L2), np.int64)
        t_z = np.zeros((L1, L2), np.int64)
        for (i, j, k, l) in cbp:
            s_w = F(q_x[i, j] + q_y[k, l] - q_z[i, k] - q_z[j, l])
            if s_w > 0.0:
                s = F(s + s_w)
                t_x[i, j] += 1
                t_y[k, l] += 1
                t_z[i, k] += 1
                t_z[j, l] += 1

        for i in range(L1):
            j = x[i]
            if j != -1 and t_x[i, j] != 1:
                violated += 1
                q_x[i, j] = F(q_x[i, j] - eta * (t_x[i, j] - 1))
            for j in c_x[i]:
                if x[i] != j and t_x[i, j] != 0:
                    violated += 1
                    q_x[i, j] = F(q_x[i, j] - eta * t_x[i, j])

        for k in range(L2):
            l = y[k]
            if l != -1 and t_y[k, l] != 1:
                violated += 1
                q_y[k, l] = F(q_y[k, l] - eta * (t_y[k, l] - 1))
            for l in c_y[k]:
                if y[k] != l and t_y[k, l] != 0:
                    violated += 1
                    q_y[k, l] = F(q_y[k, l] - eta * t_y[k, l])

        for i in range(L1):
            k = z[i]
            if k != -1:
                if t_z[i, k] > 1:
                    violated += 1
                q_z[i, k] = F(max(0.0, q_z[i, k] - eta * (1 - t_z[i, k])))
            for k in c_z[i]:
                if z[i] != k:
                    if t_z[i, k] > 0:
                        violated += 1
                    q_z[i, k] = F(max(0.0, q_z[i, k] + eta * t_z[i, k]))

        if violated == 0:
            break

        if s > s_prev or t == 0:
            c = F(c + max(0.0, F(4.0 * len(cbp)) - violated) / (4.0 * len(cbp)))
            eta = F(eta0 / (1.0 + c))
        s_prev = s

    return float(s_prev), x, y, z, violated
