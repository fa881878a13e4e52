"""Column-expression builders — the JVM-side (whole-stage-codegen) surface.

Everything here returns pyspark Column expressions, never Python UDFs:
similarity measures, LLR, text weighting, and cross-engine-stable hashing.
"""
