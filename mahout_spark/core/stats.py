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


class GlobalOnlineAuc:
    """Online AUC estimator (math/src/main/java/org/apache/mahout/math/
    stats/GlobalOnlineAuc.java:43-148, studied not copied).

    Keeps a ``history``-deep buffer of recent scores per category
    (0 = negative, 1 = positive); each new sample is compared against the
    OTHER category's buffered scores (win = 1, tie = 0.5) and the win
    rate folds into a per-category running average, optionally windowed:

        avg[c] += (m/count - avg[c]) / min(window_size, samples[c])

    (samples[c] already includes the new sample, as in the reference).
    ``auc()`` = (1 - avg[0] + avg[1]) / 2, initialised to 0.5.

    Policies: ``fifo`` (reference default — "distinctly the best
    properties", GlobalOnlineAuc.java:57 — and fully deterministic),
    ``fair`` (reservoir replacement), ``random``. The reference draws
    FAIR/RANDOM indices from RandomUtils.getRandom() (a seeded
    MersenneTwister); we draw from the JavaRandom LCG twin instead —
    the policy semantics (uniform index) are preserved, the index
    sequences differ, and FIFO is exact bit-parity.
    """

    HISTORY = 10

    def __init__(self, policy: str = "fifo", window_size: int | None = None,
                 seed: int = 42, history: int = HISTORY):
        if policy not in ("fifo", "fair", "random"):
            raise ValueError(f"unknown policy: {policy}")
        self.policy = policy
        self.window_size = (int(window_size) if window_size
                            else (1 << 62))  # Integer.MAX_VALUE stand-in
        self.history = int(history)
        self.scores = [[float("nan")] * self.history for _ in range(2)]
        self.averages = [0.5, 0.5]
        self.samples = [0, 0]
        from .hashing import JavaRandom

        self._rng = JavaRandom(seed)

    def _next_int(self, bound: int) -> int:
        # java.util.Random.nextInt(bound) power-of-two-free path
        while True:
            bits = self._rng._next(31)
            val = bits % bound
            if bits - val + (bound - 1) >= 0:
                return val

    def add_sample(self, category: int, score: float) -> float:
        n = self.samples[category]
        if n < self.history:
            self.scores[category][n] = score
        elif self.policy == "fifo":
            self.scores[category][n % self.history] = score
        elif self.policy == "fair":
            j = self._next_int(n + 1)
            if j < self.history:
                self.scores[category][j] = score
        else:  # random
            self.scores[category][self._next_int(self.history)] = score
        self.samples[category] = n + 1
        if min(self.samples) >= 1:
            m = 0.0
            count = 0.0
            for v in self.scores[1 - category]:
                if v != v:  # NaN
                    continue
                count += 1.0
                if score > v:
                    m += 1.0
                elif score == v:
                    m += 0.5
            k = min(self.window_size, self.samples[category])
            self.averages[category] += (m / count - self.averages[category]) / k
        return self.auc()

    def auc(self) -> float:
        return (1.0 - self.averages[0] + self.averages[1]) / 2.0


class GroupedOnlineAuc:
    """Average of per-group online AUCs (math/.../stats/
    GroupedOnlineAuc.java:36-74, studied not copied): one GlobalOnlineAuc
    per group key; ``auc()`` is the unweighted mean over groups.
    Controls for a grouping factor (e.g. rank items *within* a user, not
    users against each other). A sample without a group key is an error,
    as in the reference (its null path throws). For the distributed
    per-group twin see operators.evaluation.grouped_online_auc.
    """

    def __init__(self, policy: str = "fifo",
                 window_size: int | None = None, seed: int = 42):
        self.policy = policy
        self.window_size = window_size
        self.seed = seed
        self.groups: dict = {}

    def add_sample(self, category: int, group_key, score: float) -> float:
        if group_key is None:
            raise ValueError("GroupedOnlineAuc requires a group key")
        g = self.groups.get(group_key)
        if g is None:
            g = GlobalOnlineAuc(policy=self.policy,
                                window_size=self.window_size,
                                seed=self.seed)
            self.groups[group_key] = g
        return g.add_sample(category, score)

    def auc(self) -> float:
        if not self.groups:
            return float("nan")
        return sum(g.auc() for g in self.groups.values()) / len(self.groups)


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
