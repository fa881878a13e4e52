"""IDRescorer — plug-in rescoring/filtering for every top-K selection path.

Reference anchor (studied, not copied):
  mr/src/main/java/org/apache/mahout/cf/taste/recommender/IDRescorer.java:36,48
    — ``rescore(id, originalScore)`` + ``isFiltered(id)``.
  mr/src/main/java/org/apache/mahout/cf/taste/impl/recommender/TopItems.java:62-73
    — the contract: skip filtered ids BEFORE estimating, rescore the
    estimate, drop NaN rescored values, THEN rank top-K by the rescored
    value.
  NullRescorer.java — the identity rescorer (rescore=x, isFiltered=false).

Spark-first shape: a rescorer is a pair of *column-expression builders*,
not a per-id callback — ``rescore(id_col, score_col) -> Column`` and
``is_filtered(id_col) -> Column`` — so the whole hook stays inside
whole-stage codegen (zero Python in the hot path, works at any scale).
The reference's per-id virtual call becomes two projected expressions.

Semantics parity notes:
* The reference checks ``isFiltered`` before calling the estimator.
  Estimates here are pure column expressions, so filtering the estimate
  frame before ranking is value-identical; callers that pass the hook
  down to ``recommend*`` apply the id filter on the candidate frame
  (before the aggregation) — same result, less work.
* ``NaN`` rescored values are dropped (TopItems.java:73's
  ``!Double.isNaN(rescoredPref)`` guard), which is also how a rescorer
  expresses "filter by (id, score) pair" in the reference idiom.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class IDRescorer:
    """Column-expression twin of taste's IDRescorer.

    Parameters
    ----------
    rescore : (id_col, score_col) -> Column, optional
        New score expression. Default: identity (NullRescorer.java:44).
    is_filtered : (id_col) -> Column(boolean), optional
        True ⇒ the id never enters the ranking (IDRescorer.java:48).
        Default: never filtered.
    """

    def __init__(self,
                 rescore: Optional[Callable[[Column, Column], Column]] = None,
                 is_filtered: Optional[Callable[[Column], Column]] = None):
        self._rescore = rescore
        self._is_filtered = is_filtered

    def rescore(self, id_col: Column, score_col: Column) -> Column:
        if self._rescore is None:
            return score_col
        return self._rescore(id_col, score_col)

    def is_filtered(self, id_col: Column) -> Column:
        if self._is_filtered is None:
            return F.lit(False)
        return self._is_filtered(id_col)


#: NullRescorer.java — shared identity instance.
NULL_RESCORER = IDRescorer()


def apply_rescorer(df: DataFrame, id_col: str, score_col: str,
                   rescorer: Optional[IDRescorer]) -> DataFrame:
    """TopItems.java:62-73 as a projection: drop filtered ids, replace the

    score with the rescored value, drop NaN rescored rows. Call this on
    the scored frame immediately BEFORE ``topk_per_group`` so ranking and
    ties run on the rescored value, exactly like the reference's heap.
    """
    if rescorer is None:
        return df
    out = df.filter(~rescorer.is_filtered(F.col(id_col)))
    new_score = rescorer.rescore(F.col(id_col), F.col(score_col))
    out = out.withColumn(score_col, new_score)
    return out.filter(~F.isnan(F.col(score_col)))


def filter_candidates(df: DataFrame, id_col: str,
                      rescorer: Optional[IDRescorer]) -> DataFrame:
    """The early half of the hook: remove filtered ids from a candidate

    frame before any estimation work (TopItems.java:62 checks
    ``isFiltered`` before calling the estimator — at scale this is also
    the cheap place to cut the join fan-out)."""
    if rescorer is None or rescorer._is_filtered is None:
        return df
    return df.filter(~rescorer.is_filtered(F.col(id_col)))
