"""Log-space arithmetic matching the reference's fast approximations.

ProbCons (probconsRNA/ScoreType.h:18-19,37-57,187-262) and the CONTRA* engines
(contrafold/LogSpace.hpp) do log-sum-exp with piecewise-cubic approximations
rather than exact logaddexp.  Downstream decisions (thresholds at 0.01,
argmax decodes) are taken on these approximate probabilities, so we replicate
the same piecewise polynomials (as vectorized float32 JAX ops) to reproduce the
reference's *outputs*, not merely its math.

All functions operate elementwise on float32 arrays and are safe under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: a module-level jnp constant is a device buffer
# created at import time and CAPTURED by every jit that references it —
# measured on the axon runtime, one such captured buffer permanently
# degrades every subsequent dispatch of the whole process by ~28 ms (the
# round-3 'fixed in-executable stall').  numpy scalars embed as HLO
# literals with identical f32 values.
LOG_ZERO = np.float32(-2e20)
LOG_ONE = np.float32(0.0)
LOG_UNDERFLOW = np.float32(7.5)


def _poly3(x, a, b, c, d):
    x = x.astype(jnp.float32)
    return (
        (jnp.float32(a) * x + jnp.float32(b)) * x + jnp.float32(c)
    ) * x + jnp.float32(d)


def _poly4(x, a, b, c, d, e):
    x = x.astype(jnp.float32)
    return (
        ((jnp.float32(a) * x + jnp.float32(b)) * x + jnp.float32(c)) * x
        + jnp.float32(d)
    ) * x + jnp.float32(e)


def lookup(x):
    """log(exp(x)+1) for 0 <= x <= 7.5 (ScoreType.h:187-198), 4-piece cubic."""
    p1 = _poly3(x, -0.009350833524763, 0.130659527668286, 0.498799810682272, 0.693203116424741)
    p2 = _poly3(x, -0.014532321752540, 0.139942324101744, 0.495635523139337, 0.692140569840976)
    p3 = _poly3(x, -0.004605031767994, 0.063427417320019, 0.695956496475118, 0.514272634594009)
    p4 = _poly3(x, -0.000458661602210, 0.009695946122598, 0.930734667215156, 0.168037164329057)
    return jnp.where(
        x <= 1.0, p1, jnp.where(x <= 2.5, p2, jnp.where(x <= 4.5, p3, p4))
    ).astype(jnp.float32)


def log_add(x, y):
    """ProbCons LOG_ADD (ScoreType.h:259-262): approximate logaddexp.

    if x < y: (x == LOG_ZERO or y-x >= 7.5) ? y : LOOKUP(y-x)+x
    else:     (y == LOG_ZERO or x-y >= 7.5) ? x : LOOKUP(x-y)+y
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    use_hi = jnp.logical_or(lo == LOG_ZERO, d >= LOG_UNDERFLOW)
    # clamp argument so lookup() stays in-domain even when unused
    approx = lookup(jnp.minimum(d, LOG_UNDERFLOW)) + lo
    return jnp.where(use_hi, hi, approx)


def probcons_exp(x):
    """ProbCons EXP approximation (ScoreType.h:37-57), piecewise quartic.

    For x > 0 the reference falls through to libm exp(); posterior computation
    clamps at 0 first, so only the polynomial branches are exercised there.
    """
    x = jnp.asarray(x, jnp.float32)
    p_m05 = _poly4(x, 0.03254409303190190000, 0.16280432765779600000, 0.49929760485974900000, 0.99995149601363700000, 0.99999925508501600000)
    p_m1 = _poly4(x, 0.01973899026052090000, 0.13822379685007000000, 0.48056651562365000000, 0.99326940370383500000, 0.99906756856399500000)
    p_m2 = _poly4(x, 0.00940528203591384000, 0.09414963667859410000, 0.40825793595877300000, 0.93933625499130400000, 0.98369508190545300000)
    p_m4 = _poly4(x, 0.00217245711583303000, 0.03484829428350620000, 0.22118199801337800000, 0.67049462206469500000, 0.83556950223398500000)
    p_m8 = _poly4(x, 0.00012398771025456900, 0.00349155785951272000, 0.03727721426017900000, 0.17974997741536900000, 0.33249299994217400000)
    p_m16 = _poly4(x, 0.00000051741713416603, 0.00002721456879608080, 0.00053418601865636800, 0.00464101989351936000, 0.01507447981459420000)
    return jnp.where(
        x > 0,
        jnp.exp(x),
        jnp.where(
            x > -0.5, p_m05,
            jnp.where(
                x > -1, p_m1,
                jnp.where(
                    x > -2, p_m2,
                    jnp.where(
                        x > -4, p_m4,
                        jnp.where(x > -8, p_m8, jnp.where(x > -16, p_m16, 0.0)),
                    ),
                ),
            ),
        ),
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# CONTRA* engines (contrafold/LogSpace.hpp = contralign/LogSpace.hpp)
# ---------------------------------------------------------------------------

NEG_INF = np.float32(-2e20)  # numpy, not jnp: see LOG_ZERO note


_CONTRA_LEPO_MAX = 11.8624794162


def contra_fast_logexpplusone(x):
    """float Fast_LogExpPlusOne: log(exp(x)+1) for 0 <= x <= 11.8624794162,
    8-piece cubic (contrafold/LogSpace.hpp, identical copy in contralign/).
    """
    x = jnp.asarray(x, jnp.float32)
    # (a, b, c, d, upper-bound-of-interval); order matters: first match wins
    p = [
        (-0.0065591595, 0.1276442762, 0.4996554598, 0.6931542306, 0.6615367791),
        (-0.0155157557, 0.1446775699, 0.4882939746, 0.6958092989, 1.6320158198),
        (-0.0128909247, 0.1301028251, 0.5150398748, 0.6795585882, 2.4912588184),
        (-0.0072142647, 0.0877540853, 0.6208708362, 0.5909675829, 3.3792499610),
        (-0.0031455354, 0.0467229449, 0.7592532310, 0.4348794399, 4.4261691294),
        (-0.0010110698, 0.0185943421, 0.8831730747, 0.2523695427, 5.7890710412),
        (-0.0001962780, 0.0046084408, 0.9634431978, 0.0983148903, 7.8162726752),
    ]
    out = _poly3(x, -0.0000113994, 0.0003734731, 0.9959107193, 0.0149855051)
    for a, b, c, d, thr in reversed(p):
        out = jnp.where(x < jnp.float32(thr), _poly3(x, a, b, c, d), out)
    return out


def contra_fast_logplus(x, y):
    """float Fast_LogAdd/Fast_LogPlusEquals (contrafold/LogSpace.hpp):
    with x >= y, returns x if y <= NEG_INF/2 or x-y >= 11.8624794162,
    else Fast_LogExpPlusOne(x-y) + y.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    hi = jnp.maximum(x, y)
    lo = jnp.minimum(x, y)
    d = hi - lo
    use_hi = jnp.logical_or(lo <= jnp.float32(-1e20), d >= jnp.float32(_CONTRA_LEPO_MAX))
    approx = contra_fast_logexpplusone(jnp.minimum(d, jnp.float32(_CONTRA_LEPO_MAX))) + lo
    return jnp.where(use_hi, hi, approx)


def contra_fast_exp(x):
    """float Fast_Exp (contrafold/LogSpace.hpp): 6-interval cubic, 0 below
    -9.91152, libm exp above 0 (clamped to 1e20 past 46.052)."""
    x = jnp.asarray(x, jnp.float32)
    # (a, b, c, d, lower-bound-of-interval), from most-negative upward
    segs = [
        (0.0000803850, 0.0021627428, 0.0194708555, 0.0588080014, -9.91152),
        (0.0013889414, 0.0244676474, 0.1471290604, 0.3042757740, -5.8622823336),
        (0.0072335607, 0.0906002677, 0.3983111356, 0.6245959221, -3.8396630909),
        (0.0232410351, 0.2085645908, 0.6906367911, 0.8682322329, -2.4915033807),
        (0.0573782771, 0.3580258429, 0.9121133217, 0.9793091728, -1.4805375919),
        (0.1199175927, 0.4815668234, 0.9975991939, 0.9999505077, -0.6725053211),
    ]
    uppers = [s[4] for s in segs[1:]] + [0.0]
    out = jnp.where(x > jnp.float32(46.052), jnp.float32(1e20), jnp.exp(x))
    for (a, b, c, d, _), ub in reversed(list(zip(segs, uppers))):
        out = jnp.where(x < jnp.float32(ub), _poly3(x, a, b, c, d), out)
    out = jnp.where(x < jnp.float32(-9.91152), jnp.float32(0.0), out)
    return out
