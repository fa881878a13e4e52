"""Spark-side sketch aggregation: mergeable sketches as binary columns.

PySpark has no Python UDAF, so every sketch aggregates in two phases
(SURVEY.md §2.5): partial sketches per Arrow batch or per salted group
(``mapInPandas``/``applyInPandas``), then an associative merge — the exact
shape of the reference's ``allreduceBlock`` contract
(math-scala/.../CheckpointedOps.scala:42, SparkEngine.scala:98-101) and of
treeAggregate.
"""

from mahout_spark.sketch.agg import SKETCH_SPECS, SketchSpec, sketch_by_key

__all__ = ["SKETCH_SPECS", "SketchSpec", "sketch_by_key"]
