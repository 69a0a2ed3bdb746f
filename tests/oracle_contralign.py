"""Literal scalar re-expression of the CONTRAlign pair-CRF (test oracle).

Mirrors contralign/InferenceEngine.ipp ComputeForward/Backward/Posterior
with numpy float32 scalars and the float Fast_* approximations.
"""

from __future__ import annotations

import numpy as np

from dafs_tpu.models import contralign_params as CP

F = np.float32
NEG_INF = F(-2e20)
M_, IX, IY, I2X, I2Y = range(5)
K = 5


def fast_lepo(x):
    x = F(x)
    if x < 3.3792499610:
        if x < 1.6320158198:
            if x < 0.6615367791:
                return ((F(-0.0065591595)*x+F(0.1276442762))*x+F(0.4996554598))*x+F(0.6931542306)
            return ((F(-0.0155157557)*x+F(0.1446775699))*x+F(0.4882939746))*x+F(0.6958092989)
        if x < 2.4912588184:
            return ((F(-0.0128909247)*x+F(0.1301028251))*x+F(0.5150398748))*x+F(0.6795585882)
        return ((F(-0.0072142647)*x+F(0.0877540853))*x+F(0.6208708362))*x+F(0.5909675829)
    if x < 5.7890710412:
        if x < 4.4261691294:
            return ((F(-0.0031455354)*x+F(0.0467229449))*x+F(0.7592532310))*x+F(0.4348794399)
        return ((F(-0.0010110698)*x+F(0.0185943421))*x+F(0.8831730747))*x+F(0.2523695427)
    if x < 7.8162726752:
        return ((F(-0.0001962780)*x+F(0.0046084408))*x+F(0.9634431978))*x+F(0.0983148903)
    return ((F(-0.0000113994)*x+F(0.0003734731))*x+F(0.9959107193))*x+F(0.0149855051)


def lse(x, y):
    x, y = F(x), F(y)
    if x < y:
        x, y = y, x
    if y > F(-1e20) and x - y < F(11.8624794162):
        return F(fast_lepo(F(x - y)) + y)
    return x


def fast_exp(x):
    x = F(x)
    if x < F(-2.4915033807):
        if x < F(-5.8622823336):
            if x < F(-9.91152):
                return F(0)
            return ((F(0.0000803850)*x+F(0.0021627428))*x+F(0.0194708555))*x+F(0.0588080014)
        if x < F(-3.8396630909):
            return ((F(0.0013889414)*x+F(0.0244676474))*x+F(0.1471290604))*x+F(0.3042757740)
        return ((F(0.0072335607)*x+F(0.0906002677))*x+F(0.3983111356))*x+F(0.6245959221)
    if x < F(-0.6725053211):
        if x < F(-1.4805375919):
            return ((F(0.0232410351)*x+F(0.2085645908))*x+F(0.6906367911))*x+F(0.8682322329)
        return ((F(0.0573782771)*x+F(0.3580258429))*x+F(0.9121133217))*x+F(0.9793091728)
    if x < F(0):
        return ((F(0.1199175927)*x+F(0.4815668234))*x+F(0.9975991939))*x+F(0.9999505077)
    return F(1e20) if x > F(46.052) else F(np.exp(np.float64(x)))


def posterior(seq1: str, seq2: str) -> np.ndarray:
    t = CP.tables()
    match, ins, single, pair = t["match"], t["ins"], t["single"], t["pair"]
    x = np.concatenate([[4], CP.encode(seq1)])
    y = np.concatenate([[4], CP.encode(seq2)])
    LX, LY = len(seq1), len(seq2)

    def s_match(i, j, s):
        v = F(match[x[i], y[j]] + single[M_])
        if i != 1 or j != 1:
            v = F(v + pair[s, M_])
        return v

    def s_insx(i, j, s, tier2=False):
        st = I2X if tier2 else IX
        v = F(ins[x[i]] + single[st])
        if i != 1 or j != 0:
            v = F(v + pair[s, st])
        return v

    def s_insy(i, j, s, tier2=False):
        st = I2Y if tier2 else IY
        v = F(ins[y[j]] + single[st])
        if i != 0 or j != 1:
            v = F(v + pair[s, st])
        return v

    Ff = np.full((K, LX + 1, LY + 1), NEG_INF, np.float32)
    Ff[:, 0, 0] = 0.0
    for i in range(1, LX + 1):
        Ff[IX, i, 0] = lse(Ff[IX, i, 0], F(Ff[IX, i - 1, 0] + s_insx(i, 0, IX)))
        Ff[I2X, i, 0] = lse(Ff[I2X, i, 0], F(Ff[I2X, i - 1, 0] + s_insx(i, 0, I2X, True)))
    for j in range(1, LY + 1):
        Ff[IY, 0, j] = lse(Ff[IY, 0, j], F(Ff[IY, 0, j - 1] + s_insy(0, j, IY)))
        Ff[I2Y, 0, j] = lse(Ff[I2Y, 0, j], F(Ff[I2Y, 0, j - 1] + s_insy(0, j, I2Y, True)))
    for i in range(1, LX + 1):
        for j in range(1, LY + 1):
            Ff[M_, i, j] = lse(Ff[M_, i, j], F(Ff[M_, i - 1, j - 1] + s_match(i, j, M_)))
            if i > 1 or j > 1:
                for s in (IX, IY, I2X, I2Y):
                    Ff[M_, i, j] = lse(Ff[M_, i, j], F(Ff[s, i - 1, j - 1] + s_match(i, j, s)))
            for s in (M_, IX, IY):
                Ff[IX, i, j] = lse(Ff[IX, i, j], F(Ff[s, i - 1, j] + s_insx(i, j, s)))
            for s in (M_, IX, IY):
                Ff[IY, i, j] = lse(Ff[IY, i, j], F(Ff[s, i, j - 1] + s_insy(i, j, s)))
            for s in (M_, I2X, I2Y):
                Ff[I2X, i, j] = lse(Ff[I2X, i, j], F(Ff[s, i - 1, j] + s_insx(i, j, s, True)))
            for s in (M_, I2X, I2Y):
                Ff[I2Y, i, j] = lse(Ff[I2Y, i, j], F(Ff[s, i, j - 1] + s_insy(i, j, s, True)))

    Fb = np.full((K, LX + 1, LY + 1), NEG_INF, np.float32)
    Fb[:, LX, LY] = 0.0
    for i in range(LX, 0, -1):
        for j in range(LY, 0, -1):
            Fb[M_, i - 1, j - 1] = lse(Fb[M_, i - 1, j - 1], F(Fb[M_, i, j] + s_match(i, j, M_)))
            if i > 1 or j > 1:
                for s in (IX, IY, I2X, I2Y):
                    Fb[s, i - 1, j - 1] = lse(Fb[s, i - 1, j - 1], F(Fb[M_, i, j] + s_match(i, j, s)))
            for s in (M_, IX, IY):
                Fb[s, i - 1, j] = lse(Fb[s, i - 1, j], F(Fb[IX, i, j] + s_insx(i, j, s)))
            for s in (M_, IX, IY):
                Fb[s, i, j - 1] = lse(Fb[s, i, j - 1], F(Fb[IY, i, j] + s_insy(i, j, s)))
            for s in (M_, I2X, I2Y):
                Fb[s, i - 1, j] = lse(Fb[s, i - 1, j], F(Fb[I2X, i, j] + s_insx(i, j, s, True)))
            for s in (M_, I2X, I2Y):
                Fb[s, i, j - 1] = lse(Fb[s, i, j - 1], F(Fb[I2Y, i, j] + s_insy(i, j, s, True)))
    for i in range(LX, 0, -1):
        Fb[IX, i - 1, 0] = lse(Fb[IX, i - 1, 0], F(Fb[IX, i, 0] + s_insx(i, 0, IX)))
        Fb[I2X, i - 1, 0] = lse(Fb[I2X, i - 1, 0], F(Fb[I2X, i, 0] + s_insx(i, 0, I2X, True)))
    for j in range(LY, 0, -1):
        Fb[IY, 0, j - 1] = lse(Fb[IY, 0, j - 1], F(Fb[IY, 0, j] + s_insy(0, j, IY)))
        Fb[I2Y, 0, j - 1] = lse(Fb[I2Y, 0, j - 1], F(Fb[I2Y, 0, j] + s_insy(0, j, I2Y, True)))

    Z = Ff[M_, LX, LY]
    for k in range(1, K):
        Z = lse(Z, Ff[k, LX, LY])

    post = np.zeros((LX + 1, LY + 1), np.float32)
    for i in range(1, LX + 1):
        for j in range(1, LY + 1):
            acc = F(0.0)
            for k in range(K):
                if k == M_ or i > 1 or j > 1:
                    acc = F(acc + fast_exp(F(Ff[k, i - 1, j - 1] + s_match(i, j, k) + Fb[M_, i, j] - Z)))
            post[i, j] = min(max(acc, F(0.0)), F(1.0))
    return post
