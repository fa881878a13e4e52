"""Pure-NumPy mergeable sketch kernels (no Spark dependency).

Each kernel module exposes a small dataclass-style state object with:
``update_batch`` (vectorized over NumPy arrays), ``merge`` (associative,
commutative), ``serialize``/``deserialize`` (bytes, for a Spark ``binary``
column), and a query API. These are the executor-side building blocks the
``mahout_spark.sketch`` layer wires into two-phase applyInPandas
aggregations.
"""

from mahout_spark.core.bloom import BloomFilter
from mahout_spark.core.fd import FrequentDirections
from mahout_spark.core.cms import CountMinSketch
from mahout_spark.core.hll import HyperLogLog
from mahout_spark.core.kll import KLLSketch
from mahout_spark.core.moments import MomentsSketch
from mahout_spark.core.tdigest import TDigest
from mahout_spark.core.theta import ThetaSketch
from mahout_spark.core.tuplesketch import TupleSketch

__all__ = [
    "BloomFilter",
    "CountMinSketch",
    "FrequentDirections",
    "HyperLogLog",
    "KLLSketch",
    "MomentsSketch",
    "TDigest",
    "ThetaSketch",
    "TupleSketch",
]
