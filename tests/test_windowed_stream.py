"""Stateful windowed sketch stream: closed windows match batch builds."""

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.tdigest import TDigest
from mahout_spark.sketch.agg import tdigest_spec
from mahout_spark.streaming.windowed import windowed_sketch_stream


@pytest.mark.slow
def test_windowed_tdigest_matches_batch(spark):
    # events across 3 hourly windows, 2 groups
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    rng_vals = [float(v) for v in range(600)]
    for i, v in enumerate(rng_vals):
        rows.append((base + pd.Timedelta(minutes=(i % 170)),
                     "a" if i % 2 == 0 else "b", v))
    pdf = pd.DataFrame(rows, columns=["ts", "etype", "value"])
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        spark.createDataFrame(pdf).repartition(4).write.parquet(src)

        stream = spark.readStream.schema(
            "ts timestamp, etype string, value double").parquet(src)
        spec = tdigest_spec(100.0)
        out = windowed_sketch_stream(stream, spec, "ts", "etype",
                                     value_col="value", window="1 hour",
                                     watermark="0 seconds")
        q = (out.writeStream.format("parquet")
             .option("path", os.path.join(tmp, "out"))
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(tmp, "out")).collect()

    # watermark 0s + availableNow: windows before max-event-time close.
    # Windows 0 and 1 must have emitted; compare medians to batch t-digests.
    closed = {(r["w_start"].hour, r["grp"]): TDigest.deserialize(
        bytes(r["sketch"])) for r in got}
    assert len(closed) >= 2
    for (hour, grp), digest in closed.items():
        want_vals = pdf[(pdf["ts"].dt.hour == hour)
                        & (pdf["etype"] == grp)]["value"]
        batch = TDigest(100.0)
        import numpy as np

        batch.update_batch(want_vals.to_numpy())
        assert digest.count == batch.count
        if digest.count > 0:
            assert abs(digest.quantile(0.5) - batch.quantile(0.5)) <= \
                (want_vals.max() - want_vals.min() + 1) * 0.05


@pytest.mark.slow
def test_window_emits_once_across_micro_batches(spark):
    """A group idle for one micro-batch must NOT emit a partial row.

    Regression: timing out at watermark+1 evicted still-open windows when
    their group idled for a batch; later in-watermark events re-created
    the state and a second (w_start, grp) row appeared.
    """
    import time

    base = pd.Timestamp("2026-01-01 00:00:00")
    b1 = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(minutes=20)],
        "etype": ["a", "b"],
        "value": [1.0, 100.0]})
    # batch 2: group "a" again inside window 0 (watermark from batch 1 is
    # 00:20 — with the bug, "a" state was already scheduled to evict);
    # plus a 02:30 event to push the watermark past window 0's end.
    b2 = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=30),
               base + pd.Timedelta(hours=2, minutes=30)],
        "etype": ["a", "b"],
        "value": [3.0, 200.0]})
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        spark.createDataFrame(b1).coalesce(1).write.mode("append") \
            .parquet(src)
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
        spark.createDataFrame(b2).coalesce(1).write.mode("append") \
            .parquet(src)

        stream = (spark.readStream.schema(
            "ts timestamp, etype string, value double")
            .option("maxFilesPerTrigger", 1).parquet(src))
        spec = tdigest_spec(100.0)
        out = windowed_sketch_stream(stream, spec, "ts", "etype",
                                     value_col="value", window="1 hour",
                                     watermark="0 seconds")
        q = (out.writeStream.format("parquet")
             .option("path", os.path.join(tmp, "out"))
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(tmp, "out")).collect()

    keys = [(r["w_start"], r["grp"]) for r in got]
    assert len(keys) == len(set(keys)), f"duplicate window emissions: {keys}"
    by_key = {(r["w_start"].hour, r["grp"]): TDigest.deserialize(
        bytes(r["sketch"])) for r in got}
    # window 0 / group a must contain BOTH events (count 2), not a partial
    assert by_key[(0, "a")].count == 2


@pytest.mark.slow
def test_windowed_cms_stream_matches_batch_byte_exact(spark):
    """Streaming parity-CMS per window (key_expr=md5_long60) must equal

    the batch sketch_by_key build COUNTER-FOR-COUNTER — merges are
    counter addition, so partitioning/micro-batching cannot change bits.
    """
    import numpy as np

    from mahout_spark.core.cms import CountMinSketch
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [(base + pd.Timedelta(minutes=(i % 170)),
             "a" if i % 2 == 0 else "b", f"tok{i % 23}")
            for i in range(500)]
    pdf = pd.DataFrame(rows, columns=["ts", "etype", "tok"])
    spec = cms_spec_shape(3, 53, 77, parity=True)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        spark.createDataFrame(pdf).repartition(4).write.parquet(src)
        stream = spark.readStream.schema(
            "ts timestamp, etype string, tok string").parquet(src)
        out = windowed_sketch_stream(stream, spec, "ts", "etype",
                                     key_expr=md5_long60(F.col("tok")),
                                     window="1 hour",
                                     watermark="0 seconds")
        q = (out.writeStream.format("parquet")
             .option("path", os.path.join(tmp, "out"))
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = {(r["w_start"], r["grp"]): bytes(r["sketch"])
               for r in spark.read.parquet(os.path.join(tmp, "out"))
                             .collect()}

        batch_df = (spark.read.parquet(src)
                    .withColumn("w_start",
                                F.window(F.col("ts"), "1 hour")
                                .getField("start")))
        want = {(r["w_start"], r["etype"]): bytes(r["sketch"])
                for r in sketch_by_key(batch_df, ["w_start", "etype"], spec,
                                       key_expr=md5_long60(F.col("tok")))
                .collect()}

    assert len(got) >= 2
    for key, blob in got.items():
        a = CountMinSketch.deserialize(blob)
        b = CountMinSketch.deserialize(want[key])
        assert np.array_equal(a.counts, b.counts), key


@pytest.mark.slow
def test_windowed_req_matches_batch(spark):
    """REQ rides the same stateful windowed path: each closed window's
    sketch answers tail quantiles within the relative bound of a batch
    build over the same events."""
    import numpy as np

    from mahout_spark.core.req import REQSketch
    from mahout_spark.sketch.agg import req_spec

    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(800):
        rows.append((base + pd.Timedelta(minutes=(i % 170)),
                     "a" if i % 2 == 0 else "b", float(i) ** 1.5))
    pdf = pd.DataFrame(rows, columns=["ts", "etype", "value"])
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        spark.createDataFrame(pdf).repartition(4).write.parquet(src)
        stream = spark.readStream.schema(
            "ts timestamp, etype string, value double").parquet(src)
        out = windowed_sketch_stream(stream, req_spec(32, seed=3), "ts",
                                     "etype", value_col="value",
                                     window="1 hour",
                                     watermark="0 seconds")
        q = (out.writeStream.format("parquet")
             .option("path", os.path.join(tmp, "out"))
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(tmp, "out")).collect()

    closed = {(r["w_start"].hour, r["grp"]): REQSketch.deserialize(
        bytes(r["sketch"])) for r in got}
    assert len(closed) >= 2
    for (hour, grp), sk in closed.items():
        vals = pdf[(pdf["ts"].dt.hour == hour)
                   & (pdf["etype"] == grp)]["value"].to_numpy()
        assert sk.n == len(vals)
        if sk.n == 0:
            continue
        srt = np.sort(vals)
        n = len(vals)
        for q_ in (0.5, 0.9, 0.99):
            est = sk.quantile(q_)
            r = int(np.ceil(q_ * n))
            tr = np.searchsorted(srt, est, side="right")
            assert abs(tr - r) <= 0.1 * (n - r + 1) + 2
