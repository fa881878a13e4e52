"""mahout_spark — a from-scratch PySpark-native sketch/similarity engine.

Re-expresses the capabilities of the jalhajj/mahout reference (a Mahout fork
whose flagship addition is a count-min-sketch cosine recommender) as an
idiomatic PySpark DataFrame + Arrow engine:

- ``mahout_spark.core``       pure-NumPy mergeable sketch kernels
                              (CMS, HLL, Bloom, t-digest, KLL) — zero Spark deps
- ``mahout_spark.sketch``     two-phase applyInPandas aggregation layer
                              (the Python analog of a mergeable UDAF)
- ``mahout_spark.operators``  cooccurrence / LLR / similarity / top-K /
                              dedup / ANN / recommender pipelines
- ``mahout_spark.functions``  column-expression builders (text, vectors,
                              similarity measures, hashing)
- ``mahout_spark.sources``    web-page table generator + catalog IO
- ``mahout_spark.plans``      checkpoint/lineage/resume + CMS auto-config
- ``mahout_spark.streaming``  incremental + windowed streaming sketches

Design stance (SURVEY.md §7): DataFrame-first, Catalyst does the planning;
Python only in vectorized Arrow batches; sketches are binary columns merged
associatively; deterministic seeded hashing everywhere (no rand()).
"""

__version__ = "0.1.0"
