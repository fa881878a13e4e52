"""FeatureVectorEncoder family — hash-trick encoders as column plans.

Reference anchors (studied, not copied):
- mr/.../vectorizer/encoders/FeatureVectorEncoder.java (probes: the
  value is added at ``probes`` distinct hash locations to soften
  collision bias; hash is seeded by (name, probe))
- StaticWordValueEncoder.java:63-79 (per-word weight dictionary with a
  missing-value default; full weight added at EVERY probe,
  WordValueEncoder.java:43-53)
- AdaptiveWordValueEncoder.java:45-64 (weight(word) =
  −log((count+0.5) / (total + distinct·0.5 + 0.5)) over an online
  dictionary). Batch divergence, documented: the reference counts
  words in ENCOUNTER order (each add sees the dictionary so far) —
  meaningless under distributed, order-free execution — so the
  distributed twin uses the corpus-level counts (the fixpoint the
  online estimate converges to after one pass).
- InteractionValueEncoder.java:66-105 (cross features: weight =
  w1 · w2 · w at a combined hash per probe pair)
- ContinuousValueEncoder.java:39-49 / ConstantValueEncoder (value /
  constant weight added at hash(name, probe) — no token)

All buckets derive from ``xxhash64`` (JVM, codegen) — deterministic
across retries and cluster sizes; the hash-trick collision analysis is
the same one the CMS sketches rely on. Output is long-form
(id, bucket, weight) — the layout every downstream operator here
consumes (sum duplicate buckets with one groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["static_word_encode", "adaptive_word_encode",
           "interaction_encode", "constant_encode"]


def _with_probes(df: DataFrame, n_probes: int) -> DataFrame:
    return df.withColumn(
        "__probe", F.explode(F.array(*[F.lit(p) for p in range(n_probes)])))


def static_word_encode(tokens: DataFrame, dim: int = 1 << 12,
                       probes: int = 1, id_col: str = "doc_id",
                       token_col: str = "token",
                       weights: dict | None = None,
                       missing_weight: float = 1.0,
                       name: str = "word") -> DataFrame:
    """(id, bucket, weight): per-word dictionary weight (or the missing

    default) added at each of ``probes`` hash locations."""
    w = F.lit(float(missing_weight))
    if weights:
        mapping = F.create_map(*[F.lit(x) for kv in weights.items()
                                 for x in (kv[0], float(kv[1]))])
        w = F.coalesce(mapping[F.col(token_col)],
                       F.lit(float(missing_weight)))
    probed = _with_probes(tokens.select(F.col(id_col), F.col(token_col),
                                        w.alias("__w")), probes)
    bucket = F.pmod(
        F.xxhash64(F.lit(name), F.col(token_col), F.col("__probe")),
        F.lit(dim))
    return (probed.select(id_col, bucket.alias("bucket"),
                          F.col("__w").alias("weight"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("weight").alias("weight")))


def adaptive_word_encode(tokens: DataFrame, dim: int = 1 << 12,
                         probes: int = 1, id_col: str = "doc_id",
                         token_col: str = "token",
                         name: str = "word") -> DataFrame:
    """(id, bucket, weight): weight(word) = −log((count + 0.5) /

    (total + distinct·0.5 + 0.5)) from corpus counts — rare words weigh
    more (the IDF-flavored adaptive weight)."""
    counts = tokens.groupBy(token_col).agg(F.count("*").alias("__cnt"))
    totals = counts.agg(
        F.sum("__cnt").alias("__total"),
        F.count("*").alias("__distinct")).first()
    denom = float(totals["__total"]) + float(totals["__distinct"]) * 0.5 \
        + 0.5
    weighted = (tokens.join(counts, token_col)
                .withColumn("__w", -F.log((F.col("__cnt") + 0.5)
                                          / F.lit(denom))))
    probed = _with_probes(weighted, probes)
    return (probed.select(
        id_col,
        F.pmod(F.xxhash64(F.lit(name), F.col(token_col), F.col("__probe")),
               F.lit(dim)).alias("bucket"),
        F.col("__w").alias("weight"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("weight").alias("weight")))


def interaction_encode(rows: DataFrame, first_col: str, second_col: str,
                       dim: int = 1 << 12, probes: int = 1,
                       id_col: str = "doc_id", weight: float = 1.0,
                       name: str = "interaction") -> DataFrame:
    """(id, bucket, weight): cross-feature encoding — one bucket per

    probe from the combined (first, second) hash, weight = w1·w2·w
    (both sub-encoders at weight 1 here, InteractionValueEncoder:103-105
    — pass a pre-weighted column via ``weight`` for other cases)."""
    probed = _with_probes(rows.select(F.col(id_col), F.col(first_col),
                                      F.col(second_col)), probes)
    bucket = F.pmod(
        F.xxhash64(F.lit(name), F.col(first_col), F.col(second_col),
                   F.col("__probe")), F.lit(dim))
    return (probed.select(id_col, bucket.alias("bucket"),
                          F.lit(float(weight)).alias("weight"))
            .groupBy(id_col, "bucket")
            .agg(F.sum("weight").alias("weight")))


def constant_encode(rows: DataFrame, dim: int = 1 << 12, probes: int = 1,
                    id_col: str = "doc_id", value_col: str | None = None,
                    weight: float = 1.0,
                    name: str = "constant") -> DataFrame:
    """ConstantValueEncoder / ContinuousValueEncoder: weight (or the

    row's ``value_col``) added at hash(name, probe) — no token in the
    hash, so every row maps to the same ``probes`` buckets."""
    w = (F.col(value_col).cast("double") if value_col
         else F.lit(float(weight)))
    probed = _with_probes(rows.select(F.col(id_col), w.alias("__w")),
                          probes)
    bucket = F.pmod(F.xxhash64(F.lit(name), F.col("__probe")), F.lit(dim))
    return (probed.select(id_col, bucket.alias("bucket"),
                          F.col("__w").alias("weight"))
            .groupBy(id_col, "bucket")
            .agg(F.sum("weight").alias("weight")))
