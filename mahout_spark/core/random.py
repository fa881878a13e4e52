"""Sampler family — the reference's ``math/random`` package, re-expressed.

Studied, not copied — reference anchors:
  - Multinomial.java:41-190 (heap-ordered weight tree: root at index 1,
    children at 2n/2n+1; "parent comes down" insertion; sample(u) walks
    left-child cumulative weights; set()/delete() leaves a phantom leaf),
  - ChineseRestaurant.java:34-112 (Pitman-Yor: existing table j chosen
    with prob (w_j - discount)/(alpha + W), else a new table),
  - Empirical.java:28-123 (piecewise-linear inverse ECDF with optional
    exponential tails; quantiles squeezed by 0.5/samples per open end),
  - PoissonSampler.java:30-66 (pmf partial sums cached in a Multinomial,
    rebuilt lazily when u falls into the unexpanded tail),
  - Normal.java / Missing.java / WeightedThing.java / MultiNormal.java
    (A u + m with A'A = Sigma), IndianBuffet.java:38-90.

These are IN-CORE, driver-side utilities, exactly as in the reference
(used there for streaming-k-means seeding and synthetic-corpus
generation); the distributed analogues in this repo are the hash-gated
samplers in ``functions/sampling.py``. Every sampler takes an explicit
``seed`` (the reference hides a MersenneTwister behind RandomUtils — we
document the difference and use NumPy's PCG64) and every non-trivial
sampler exposes a deterministic ``sample(u=...)`` path so tests replay
exact decisions with no RNG parity games.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Generic, Iterator, TypeVar

import numpy as np

T = TypeVar("T")


@dataclass
class WeightedThing(Generic[T]):
    """(value, weight) pair ordered by weight (WeightedThing.java)."""

    value: T
    weight: float

    def __lt__(self, other: "WeightedThing") -> bool:
        return self.weight < other.weight


class Multinomial(Generic[T]):
    """Dynamic multinomial sampler over weighted items.

    The reference's heap-ordered weight tree (Multinomial.java:44): the
    array is 1-indexed; internal node n caries the subtree total, and
    sampling walks down taking the left child iff u <= its total. add()
    replays the "parent comes down" move verbatim so the leaf ORDER (and
    therefore every sample(u) decision) matches the Java structure
    step-for-step; set(value, 0) leaves a phantom leaf exactly like the
    reference (iteration skips it, tree weights stay consistent).
    O(log n) add/set/sample — the point of the tree: incremental weight
    updates (deletion included) without rebuilding an alias table.
    """

    def __init__(self, things: "list[WeightedThing[T]] | None" = None,
                 seed: int = 1):
        self._weight: list[float] = [0.0]
        self._values: list[Any] = [None]
        self._items: dict[Any, int] = {}
        self._rand = np.random.Generator(np.random.PCG64(seed))
        for thing in things or []:
            self.add(thing.value, thing.weight)

    @classmethod
    def from_counts(cls, counts: dict, seed: int = 1) -> "Multinomial":
        m = cls(seed=seed)
        for value, c in counts.items():
            m.add(value, float(c))
        return m

    def add(self, value: T, w: float) -> None:
        if value is None:
            raise ValueError("value must not be None")
        if value in self._items:
            raise ValueError(f"{value!r} already present — use set()")
        n = len(self._weight)
        if n == 1:
            self._weight.append(w)
            self._values.append(value)
            self._items[value] = 1
        else:
            # parent's leaf comes down to position n, new leaf at n+1
            self._weight.append(self._weight[n // 2])
            self._values.append(self._values[n // 2])
            self._items[self._values[n // 2]] = n
            n += 1
            self._items[value] = n
            self._weight.append(w)
            self._values.append(value)
            # ancestors of the new leaf (incl. the slot that just became
            # internal — its value ends up left-child + right-child)
            while n > 1:
                n //= 2
                self._weight[n] += w

    def get_weight(self, value: T) -> float:
        n = self._items.get(value)
        return self._weight[n] if n is not None else 0.0

    def get_probability(self, value: T) -> float:
        n = self._items.get(value)
        return self._weight[n] / self._weight[1] if n is not None else 0.0

    @property
    def total_weight(self) -> float:
        return self._weight[1] if len(self._weight) > 1 else 0.0

    def set(self, value: T, new_w: float) -> None:
        if value not in self._items:
            raise ValueError(f"{value!r} not present")
        n = self._items[value]
        if new_w <= 0:
            del self._items[value]  # phantom leaf stays in the tree
        old = self._weight[n]
        while n > 0:
            self._weight[n] += new_w - old
            n //= 2

    def delete(self, value: T) -> None:
        self.set(value, 0.0)

    def sample(self, u: float | None = None) -> T:
        if len(self._weight) <= 1:
            raise ValueError("empty sampler")
        if u is None:
            u = float(self._rand.random())
        u *= self._weight[1]
        n = 1
        while 2 * n < len(self._weight):
            left = self._weight[2 * n]
            if u <= left:
                n = 2 * n
            else:
                u -= left
                n = 2 * n + 1
        return self._values[n]

    def _leaf_weights(self) -> list[float]:
        """Test hook — leaf weights in probe order (Multinomial.java:170)."""
        size = len(self._weight)
        i = 1 << (size.bit_length() - 1)
        out = [self._weight[j] for j in range(i, size)]
        out += [self._weight[j] for j in range(i // 2, i)]
        return out

    def __iter__(self) -> Iterator[T]:
        return (v for v in self._values[1:] if v in self._items)


class ChineseRestaurant:
    """Pitman-Yor / Dirichlet-process table sampler
    (ChineseRestaurant.java:34): table j wins with probability
    (w_j - discount) / (alpha + W); otherwise open a new table. Unique
    tables grow O(alpha log T) at discount 0, O(alpha T^discount) else.
    """

    def __init__(self, alpha: float, discount: float = 0.0, seed: int = 1):
        if alpha <= 0:
            raise ValueError("alpha must be > 0")
        if not 0 <= discount <= 1:
            raise ValueError("need 0 <= discount <= 1")
        self.alpha = float(alpha)
        self.discount = float(discount)
        self._weights: list[float] = []
        self._total = 0.0
        self._rand = np.random.Generator(np.random.PCG64(seed))

    def sample(self, u: float | None = None) -> int:
        if u is None:
            u = float(self._rand.random())
        u *= self.alpha + self._total
        for j, w in enumerate(self._weights):
            if u < w - self.discount:
                self._weights[j] += 1
                self._total += 1
                return j
            u -= w - self.discount
        self._weights.append(1.0)
        self._total += 1
        return len(self._weights) - 1

    def size(self) -> int:
        return len(self._weights)

    def count(self, j: int | None = None) -> int:
        if j is None:
            return int(self._total)
        if j < 0:
            raise ValueError("j must be >= 0")
        return int(self._weights[j]) if j < len(self._weights) else 0


class Empirical:
    """Inverse-ECDF sampler (Empirical.java:51-123): linear interpolation
    between (quantile, value) knots, optional exponential tails past the
    observed extremes; knot quantiles squeezed into
    [0.5/samples, 1 - 0.5/samples] per allowed tail."""

    def __init__(self, exceed_minimum: bool, exceed_maximum: bool,
                 samples: int, *ecdf: float, seed: int = 1):
        if len(ecdf) % 2 != 0:
            raise ValueError("ecdf must alternate quantile, value")
        if samples < 3:
            raise ValueError("samples must be >= 3")
        if not exceed_minimum and ecdf[0] != 0:
            raise ValueError("without a left tail, ecdf must start at 0")
        if not exceed_maximum and ecdf[-2] != 1:
            raise ValueError("without a right tail, ecdf must end at 1")
        self._rand = np.random.Generator(np.random.PCG64(seed))
        n = len(ecdf) // 2
        x, y = [], []
        for i in range(0, len(ecdf), 2):
            q, v = ecdf[i], ecdf[i + 1]
            if not 0 <= q <= 1:
                raise ValueError("quantiles must be in [0, 1]")
            if i > 0 and (q <= x[-1] or v <= y[-1]):
                raise ValueError("knots must be strictly increasing")
            x.append(q)
            y.append(v)
        x0 = 0.5 / samples if exceed_minimum else 0.0
        x1 = 1 - (0.5 / samples if exceed_maximum else 0.0)
        self.x = [q * (x1 - x0) + x0 for q in x]
        self.y = y
        self.n = n
        self.exceed_minimum = exceed_minimum
        self.exceed_maximum = exceed_maximum

    def sample(self, u: float | None = None) -> float:
        if u is None:
            u = float(self._rand.random())
        x, y, n = self.x, self.y, self.n
        if self.exceed_minimum and u < x[0]:
            u = max(u, 1.0e-16)
            return y[0] + math.log(u / x[0]) * x[0] * (y[1] - y[0]) \
                / (x[1] - x[0])
        if self.exceed_maximum and u > x[n - 1]:
            u = min(u, 1 - 1.0e-16)
            dy = y[n - 1] - y[n - 2]
            dx = x[n - 1] - x[n - 2]
            return y[n - 1] - math.log((1 - u) / (1 - x[n - 1])) \
                * (1 - x[n - 1]) * dy / dx
        for i in range(1, n):
            if x[i] > u:
                return y[i - 1] + (u - x[i - 1]) * (y[i] - y[i - 1]) \
                    / (x[i] - x[i - 1])
        raise AssertionError(f"u={u} outside [{x[0]}, {x[n-1]}]")


def _poisson_pmf(lam: float, i: int) -> float:
    return math.exp(-lam + i * math.log(lam) - math.lgamma(i + 1)) \
        if lam > 0 else (1.0 if i == 0 else 0.0)


class PoissonSampler:
    """Poisson sampler via cached pmf partial sums in a Multinomial
    (PoissonSampler.java:30-66): the table expands lazily whenever u
    falls within 20x of the unexpanded tail mass; not for lambda > ~1000.
    """

    def __init__(self, lam: float, seed: int = 1):
        self.lam = float(lam)
        self._limit = 1.0
        self._partial: Multinomial[int] | None = None
        self._rand = np.random.Generator(np.random.PCG64(seed))

    def sample(self, u: float | None = None) -> int:
        if u is None:
            u = float(self._rand.random())
        if u < self._limit:
            self._limit = 1.0
            steps: list[WeightedThing[int]] = []
            i = 0
            while u / 20 < self._limit:
                pdf = _poisson_pmf(self.lam, i)
                self._limit -= pdf
                steps.append(WeightedThing(i, pdf))
                i += 1
            steps.append(WeightedThing(len(steps), self._limit))
            self._partial = Multinomial(steps)
        return int(self._partial.sample(u))


class Normal:
    """Gaussian sampler (Normal.java)."""

    def __init__(self, mean: float = 0.0, sd: float = 1.0, seed: int = 1):
        self.mean, self.sd = float(mean), float(sd)
        self._rand = np.random.Generator(np.random.PCG64(seed))

    def sample(self) -> float:
        return float(self._rand.standard_normal()) * self.sd + self.mean


class Missing(Generic[T]):
    """Missing-data wrapper (Missing.java): with probability p emit the
    marker, else delegate. Same seed + same p => identical missingness
    pattern across variables, the reference's documented property."""

    def __init__(self, p: float, delegate, missing_marker: T = None,
                 seed: int = 1):
        self.p = float(p)
        self.delegate = delegate
        self.missing_marker = missing_marker
        self._rand = np.random.Generator(np.random.PCG64(seed))

    def sample(self) -> T:
        if float(self._rand.random()) >= self.p:
            return self.delegate.sample()
        return self.missing_marker


class MultiNormal:
    """Multivariate normal (MultiNormal.java): sample = A u + m with
    A'A = Sigma; diagonal / spherical / full-matrix constructors."""

    def __init__(self, scale: "np.ndarray | None" = None,
                 mean: "np.ndarray | None" = None,
                 dimension: int | None = None, seed: int = 1):
        if scale is not None:
            scale = np.asarray(scale, dtype=float)
            if scale.ndim == 1:  # diagonal
                scale = np.diag(scale)
            dimension = scale.shape[1]
        self.scale = scale
        self.mean = None if mean is None else np.asarray(mean, dtype=float)
        if dimension is None:
            raise ValueError("need scale or dimension")
        self.dimension = dimension
        self._rand = np.random.Generator(np.random.PCG64(seed))

    @classmethod
    def spherical(cls, radius: float, mean: np.ndarray,
                  seed: int = 1) -> "MultiNormal":
        mean = np.asarray(mean, dtype=float)
        return cls(np.full(mean.size, float(radius)), mean, seed=seed)

    def sample(self) -> np.ndarray:
        u = self._rand.standard_normal(self.dimension)
        v = u if self.scale is None else self.scale @ u
        return v if self.mean is None else v + self.mean


class IndianBuffet(Generic[T]):
    """Indian-buffet-process document sampler (IndianBuffet.java:38-90):
    doc 1 draws Poisson(alpha) dishes; doc d revisits dish i with
    probability count_i/d and adds Poisson(alpha/d) new dishes.
    ``converter`` maps dish index -> token (identity by default; pass
    ``IndianBuffet.word_converter()`` for deterministic word tokens)."""

    def __init__(self, alpha: float,
                 converter: "Callable[[int], T] | None" = None,
                 seed: int = 1):
        self.alpha = float(alpha)
        self.converter = converter or (lambda i: i)
        self._counts: list[int] = []
        self._documents = 0
        self._rand = np.random.Generator(np.random.PCG64(seed))
        self._poisson_seed = seed

    @staticmethod
    def word_converter() -> Callable[[int], str]:
        return lambda i: f"word-{i:04d}"

    def sample(self) -> list:
        out = []
        if self._documents == 0:
            n = PoissonSampler(self.alpha, seed=self._poisson_seed) \
                .sample(float(self._rand.random()))
            for i in range(int(n)):
                out.append(self.converter(i))
                self._counts.append(1)
            self._documents = 1
            return out
        self._documents += 1
        for i, cnt in enumerate(self._counts):
            if float(self._rand.random()) < cnt / self._documents:
                out.append(self.converter(i))
                self._counts[i] += 1
        base = len(self._counts)
        n_new = PoissonSampler(self.alpha / self._documents,
                               seed=self._poisson_seed) \
            .sample(float(self._rand.random()))
        for j in range(int(n_new)):
            out.append(self.converter(base + j))
            self._counts.append(1)
        return out
