"""Privacy-noised sketch release — deterministic discrete-Laplace noise.

The north rule's "privacy-noised CMS inner products": release a count-min
sketch (or any linear sketch) with independent two-sided geometric
("discrete Laplace") noise added to every counter, then run point /
inner-product / cosine queries against the noised counters. The two-sided
geometric mechanism (Ghosh-Roughgarden-Sundararajan 2009) with
``P(Z = z) ∝ alpha^|z|``, ``alpha = exp(-eps_dp)`` is the canonical
integer-valued eps_dp-DP mechanism for counts; because one inserted item
touches ``depth`` counters (one per row), releasing the whole sketch with
per-cell parameter ``alpha = exp(-eps_total/depth)`` gives eps_total-DP
for unit-weight neighboring streams (basic composition across rows; the
reference's own CountMinSketchConfig.java:120-219 frames CMS collisions
as plausible-deniability privacy — this module adds the rigorous layer).

Determinism (the repo-wide rule — retry-safe, oracle-replayable):

- the noise for cell (i, j) of the sketch tagged ``tag`` is a pure
  function of ``(noise_seed, tag, i, j)``: a 60-bit uniform
  ``u = md5_long60("dp:{seed}:{tag}:{i}:{j}")`` (the cross-engine hash,
  functions/hashutil.py) inverted through the mechanism's CDF;
- the CDF inversion uses NO floating-point at query time: the driver
  precomputes INTEGER thresholds in the u-domain [0, 2^60) once
  (``geometric_thresholds``) and injects the same literal table into
  both the Spark-side NumPy kernel and the DuckDB oracle SQL, so the
  noise is identical by construction (the repo's threshold-literal
  convention — float accumulation happens once, driver-side);
- the support is truncated to ``[-bound, bound]`` with ``bound`` sized so
  the truncated tail mass is below the 2^-60 u-granularity — i.e. the
  truncation is invisible at the resolution the uniform can express.

Noise values are integers, so integer-valued counters stay integer-valued
and every downstream sum/dot/min stays order-independent and hash-exact
across engines (the property all CMS gates rely on).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

_U60 = 1 << 60


def md5_long60_py(s: str) -> int:
    """CPython twin of functions/hashutil.md5_long60 (Spark) /

    md5_long60_sql (DuckDB): first 15 hex chars of md5 as a 60-bit int.
    """
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def geometric_bound(dp_eps: float) -> int:
    """Smallest truncation bound whose tail mass is < 2^-60.

    Tail mass beyond ±B is ~ alpha^(B+1) / (1 - alpha) (one side);
    solve alpha^B <= 2^-61 => B = ceil(61 * ln 2 / dp_eps) + 1.
    """
    if dp_eps <= 0:
        raise ValueError(f"dp_eps must be positive, got {dp_eps}")
    return int(math.ceil(61.0 * math.log(2.0) / dp_eps)) + 1


def geometric_thresholds(dp_eps: float, bound: int | None = None) -> list[int]:
    """Integer CDF thresholds in the 60-bit u-domain for the truncated

    two-sided geometric distribution with ``alpha = exp(-dp_eps)``.

    Returns ``2*bound`` increasing thresholds T such that the noise for a
    uniform ``u in [0, 2^60)`` is ``(#{m : T[m] <= u}) - bound`` — i.e.
    ``u < T[0] -> -bound`` and ``u >= T[-1] -> +bound``. Computed ONCE on
    the driver and injected as literals into both engines.
    """
    if bound is None:
        bound = geometric_bound(dp_eps)
    alpha = math.exp(-dp_eps)
    weights = [alpha ** abs(z) for z in range(-bound, bound + 1)]
    total = math.fsum(weights)
    acc = 0.0
    out = []
    for w in weights[:-1]:
        acc += w
        out.append(min(_U60 - 1, int(acc / total * _U60)))
    return out


def geometric_noise_from_u(u: np.ndarray, thresholds: list[int]) -> np.ndarray:
    """Vectorized inverse-CDF: int64 noise for 60-bit uniforms ``u``."""
    t = np.asarray(thresholds, dtype=np.int64)
    bound = len(t) // 2
    return (np.searchsorted(t, np.asarray(u, dtype=np.int64), side="right")
            - bound).astype(np.int64)


def cell_noise(depth: int, width: int, noise_seed: int, tag: str,
               thresholds: list[int]) -> np.ndarray:
    """(depth, width) float64 noise matrix for one sketch release.

    Cell (i, j) uses u = md5_long60("dp:{seed}:{tag}:{i}:{j}") — identical
    to the DuckDB oracle's expression, so the release is replayable.
    """
    u = np.fromiter(
        (md5_long60_py(f"dp:{noise_seed}:{tag}:{i}:{j}")
         for i in range(depth) for j in range(width)),
        dtype=np.int64, count=depth * width)
    return geometric_noise_from_u(u, thresholds).reshape(
        depth, width).astype(np.float64)


def geometric_noise_sql(u_expr: str, thresholds: list[int]) -> str:
    """DuckDB SQL expression computing the same noise from a 60-bit

    uniform expression (searchsorted side='right' == count of T <= u).
    """
    bound = len(thresholds) // 2
    lits = ", ".join(str(t) for t in thresholds)
    return (f"(len(list_filter([{lits}]::BIGINT[], "
            f"__t -> __t <= ({u_expr}))) - {bound})")


def noise_u_sql(noise_seed: int, tag_expr: str, i_expr: str,
                j_expr: str) -> str:
    """The cell-uniform expression, matching cell_noise's Python string."""
    from mahout_spark.functions.hashutil import md5_long60_sql

    return md5_long60_sql(
        f"'dp:{noise_seed}:' || ({tag_expr}) || ':' || ({i_expr})::VARCHAR "
        f"|| ':' || ({j_expr})::VARCHAR")
