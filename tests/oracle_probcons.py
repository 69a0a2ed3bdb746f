"""Literal scalar re-expression of the ProbCons pair-HMM (test oracle).

Mirrors probconsRNA/ProbabilisticModel.h + ScoreType.h cell-by-cell with
numpy float32 scalars.  Used only by tests to validate the TPU wavefront
kernel; intentionally slow.
"""

from __future__ import annotations

import numpy as np

from dafs_tpu.models import probcons_params as P

F = np.float32
LOG_ZERO = F(-2e20)
LOG_UNDERFLOW = F(7.5)


def lookup(x: np.float32) -> np.float32:
    assert 0.0 <= x <= 7.5
    if x <= 1.0:
        return ((F(-0.009350833524763) * x + F(0.130659527668286)) * x + F(0.498799810682272)) * x + F(0.693203116424741)
    if x <= 2.5:
        return ((F(-0.014532321752540) * x + F(0.139942324101744)) * x + F(0.495635523139337)) * x + F(0.692140569840976)
    if x <= 4.5:
        return ((F(-0.004605031767994) * x + F(0.063427417320019)) * x + F(0.695956496475118)) * x + F(0.514272634594009)
    return ((F(-0.000458661602210) * x + F(0.009695946122598)) * x + F(0.930734667215156)) * x + F(0.168037164329057)


def log_add(x: np.float32, y: np.float32) -> np.float32:
    if x < y:
        return y if (x == LOG_ZERO or y - x >= LOG_UNDERFLOW) else F(lookup(F(y - x)) + x)
    return x if (y == LOG_ZERO or x - y >= LOG_UNDERFLOW) else F(lookup(F(x - y)) + y)


def pexp(x: np.float32) -> np.float32:
    if x > 0:
        return F(np.exp(np.float64(x)))
    if x > -0.5:
        return (((F(0.03254409303190190000) * x + F(0.16280432765779600000)) * x + F(0.49929760485974900000)) * x + F(0.99995149601363700000)) * x + F(0.99999925508501600000)
    if x > -1:
        return (((F(0.01973899026052090000) * x + F(0.13822379685007000000)) * x + F(0.48056651562365000000)) * x + F(0.99326940370383500000)) * x + F(0.99906756856399500000)
    if x > -2:
        return (((F(0.00940528203591384000) * x + F(0.09414963667859410000)) * x + F(0.40825793595877300000)) * x + F(0.93933625499130400000)) * x + F(0.98369508190545300000)
    if x > -4:
        return (((F(0.00217245711583303000) * x + F(0.03484829428350620000)) * x + F(0.22118199801337800000)) * x + F(0.67049462206469500000)) * x + F(0.83556950223398500000)
    if x > -8:
        return (((F(0.00012398771025456900) * x + F(0.00349155785951272000)) * x + F(0.03727721426017900000)) * x + F(0.17974997741536900000)) * x + F(0.33249299994217400000)
    if x > -16:
        return (((F(0.00000051741713416603) * x + F(0.00002721456879608080)) * x + F(0.00053418601865636800)) * x + F(0.00464101989351936000)) * x + F(0.01507447981459420000)
    return F(0.0)


def posterior(seq1: str, seq2: str) -> np.ndarray:
    """Full (L1+1)x(L2+1) match posterior incl. the posterior[0][0]=0 hack."""
    t = P.log_tables()
    init, trans, match_t, ins_t = t["init"], t["trans"], t["match"], t["ins"]
    c1 = np.concatenate([[0], P.encode(seq1)])
    c2 = np.concatenate([[0], P.encode(seq2)])
    L1, L2 = len(seq1), len(seq2)

    fwd = np.full((3, L1 + 1, L2 + 1), LOG_ZERO, dtype=np.float32)
    fwd[0, 1, 1] = F(init[0] + match_t[c1[1], c2[1]])
    fwd[1, 1, 0] = F(init[1] + ins_t[c1[1]])
    fwd[2, 0, 1] = F(init[2] + ins_t[c2[1]])
    for i in range(L1 + 1):
        for j in range(L2 + 1):
            if i > 1 or j > 1:
                if i > 0 and j > 0:
                    v = F(fwd[0, i - 1, j - 1] + trans[0, 0])
                    v = log_add(v, F(fwd[1, i - 1, j - 1] + trans[1, 0]))
                    v = log_add(v, F(fwd[2, i - 1, j - 1] + trans[2, 0]))
                    fwd[0, i, j] = F(v + match_t[c1[i], c2[j]])
                if i > 0:
                    fwd[1, i, j] = F(
                        ins_t[c1[i]]
                        + log_add(
                            F(fwd[0, i - 1, j] + trans[0, 1]),
                            F(fwd[1, i - 1, j] + trans[1, 1]),
                        )
                    )
                if j > 0:
                    fwd[2, i, j] = F(
                        ins_t[c2[j]]
                        + log_add(
                            F(fwd[0, i, j - 1] + trans[0, 2]),
                            F(fwd[2, i, j - 1] + trans[2, 2]),
                        )
                    )

    bwd = np.full((3, L1 + 1, L2 + 1), LOG_ZERO, dtype=np.float32)
    for k in range(3):
        bwd[k, L1, L2] = init[k]
    for i in range(L1, -1, -1):
        for j in range(L2, -1, -1):
            if i < L1 and j < L2:
                prob_xy = F(bwd[0, i + 1, j + 1] + match_t[c1[i + 1], c2[j + 1]])
                for k in range(3):
                    bwd[k, i, j] = log_add(bwd[k, i, j], F(prob_xy + trans[k, 0]))
            if i < L1:
                bwd[0, i, j] = log_add(bwd[0, i, j], F(bwd[1, i + 1, j] + ins_t[c1[i + 1]] + trans[0, 1]))
                bwd[1, i, j] = log_add(bwd[1, i, j], F(bwd[1, i + 1, j] + ins_t[c1[i + 1]] + trans[1, 1]))
            if j < L2:
                bwd[0, i, j] = log_add(bwd[0, i, j], F(bwd[2, i, j + 1] + ins_t[c2[j + 1]] + trans[0, 2]))
                bwd[2, i, j] = log_add(bwd[2, i, j], F(bwd[2, i, j + 1] + ins_t[c2[j + 1]] + trans[2, 2]))

    total_f = LOG_ZERO
    for k in range(3):
        total_f = log_add(total_f, F(fwd[k, L1, L2] + bwd[k, L1, L2]))
    total_b = F(fwd[0, 1, 1] + bwd[0, 1, 1])
    total_b = log_add(total_b, F(fwd[1, 1, 0] + bwd[1, 1, 0]))
    total_b = log_add(total_b, F(fwd[2, 0, 1] + bwd[2, 0, 1]))
    total = F((total_f + total_b) / F(2.0))

    post = np.zeros((L1 + 1, L2 + 1), dtype=np.float32)
    for i in range(L1 + 1):
        for j in range(L2 + 1):
            post[i, j] = pexp(F(min(F(0.0), F(fwd[0, i, j] + bwd[0, i, j] - total))))
    post[0, 0] = 0.0
    return post
