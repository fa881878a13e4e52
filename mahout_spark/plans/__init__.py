"""Plans: checkpoint/lineage/resume protocol and plan-audit helpers."""

from mahout_spark.plans.checkpoint import CheckpointedSketchJob

__all__ = ["CheckpointedSketchJob"]
