"""Small-sample test statistics: Student-t and F tail probabilities.

The reference leans on commons-math3 distributions
(math-scala/.../regression/LinearRegressorModel.scala:85-89 TDistribution,
.../tests/FittnessTests.scala:108-110 FDistribution) for OLS p-values.
No scipy in this container, so the regularized incomplete beta function
I_x(a,b) is implemented directly — Lentz's modified continued fraction
(the standard public algorithm, e.g. Numerical Recipes §6.4; same method
commons-math's Beta.regularizedBeta uses) — and both distribution tails
reduce to it:

    P(T > t)   = I_{v/(v+t^2)}(v/2, 1/2) / 2          (t >= 0)
    P(F > f)   = I_{d2/(d2+d1 f)}(d2/2, d1/2)

Driver-side only (k x k model postprocessing); nothing here touches
executors.
"""

from __future__ import annotations

import math

_MAX_ITER = 300
_EPS = 3e-14
_FPMIN = 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log(1.0 - x))
    front = math.exp(ln_front)
    # use the CF on the side where it converges fast
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """P(T > t) for Student-t with df degrees of freedom."""
    if df <= 0:
        return float("nan")
    p_two = betainc(df / 2.0, 0.5, df / (df + t * t))  # P(|T| > |t|)
    return p_two / 2.0 if t >= 0 else 1.0 - p_two / 2.0


def t_two_sided_pval(t: float, df: float) -> float:
    """2 * P(T > |t|) — the OLS coefficient p-value

    (LinearRegressorModel.scala:88-89)."""
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def f_sf(f: float, d1: float, d2: float) -> float:
    """P(F > f) for the F distribution — the overall-regression p-value

    (FittnessTests.scala:108-110)."""
    if f <= 0:
        return 1.0
    return betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


class OnlineExponentialAverage:
    """Exponentially time-discounted running average

    (math/src/main/java/org/apache/mahout/math/stats/
    OnlineExponentialAverage.java:23-63, studied not copied): older
    samples are discounted to 1/e after ``alpha`` time units. ``mean()``
    is the discounted average of x, ``mean_rate()`` the discounted event
    rate. For the distributed one-pass equivalent see
    operators.evaluation.exponential_average (the recurrence unrolls to
    sum(x_i * exp(-(T - t_i)/alpha))).
    """

    def __init__(self, alpha: float):
        self.alpha = float(alpha)
        self.last_t = 0.0
        self.s = 0.0
        self.w = 0.0
        self.t = 0.0

    def add(self, t: float, x: float) -> None:
        import math as _math

        pi = _math.exp(-(t - self.last_t) / self.alpha)
        self.s = x + pi * self.s
        self.w = 1.0 + pi * self.w
        self.t = (t - self.last_t) + pi * self.t
        self.last_t = t

    def mean(self) -> float:
        return self.s / self.w

    def mean_rate(self) -> float:
        return self.s / self.t
