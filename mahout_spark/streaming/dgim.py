"""Per-key DGIM sliding-window counts over Structured Streaming.

``dgim_count_stream`` keeps one DGIM exponential histogram
(core/dgim.py) per group with ``applyInPandasWithState`` and emits,
after every micro-batch that touches the group, the estimated event
count in the trailing window as of the group's newest event. This is
the question the windowed-sketch path (streaming/windowed.py) can't
answer — a TUMBLING window closes and freezes, while DGIM slides: the
count always covers "the last W as of now" with O(log^2 W) state.

Ordering contract: events are sorted by timestamp inside each
micro-batch before ingest; across batches Structured Streaming
delivers a group's batches in order, and late rows below the group's
high-water mark are clamped to it (error bounded by the watermark
delay, documented in core/dgim.py). Expired buckets are pruned each
batch, so state stays O(r log W) per group forever.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mahout_spark.core.dgim import DGIM


def dgim_count_stream(events: DataFrame, ts_col: str, group_col: str,
                      window_ms: int, r: int = 8,
                      watermark: str = "10 minutes"):
    """events (streaming DF) -> streaming DF[grp, as_of, est_count,
    n_buckets] in update mode; est_count estimates events in
    (as_of - window_ms, as_of] with relative error <= 1/(2(r-1))."""
    # the watermarked timestamp column must survive the projection
    # (event-time timeout requires its tag); ms conversion happens
    # pandas-side
    prepared = (events.withWatermark(ts_col, watermark)
                .select(F.col(group_col).alias("grp"),
                        F.col(ts_col).alias("__event_ts")))

    out_schema = ("grp string, as_of timestamp, est_count double, "
                  "n_buckets int")

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"grp": pd.Series([], dtype=object),
                 "as_of": pd.Series([], dtype="datetime64[ns]"),
                 "est_count": pd.Series([], dtype=float),
                 "n_buckets": pd.Series([], dtype="int32")})
            return
        d = (DGIM.deserialize(state.get[0]) if state.exists
             else DGIM(r=r))
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            ms = (pdf["__event_ts"].astype("datetime64[ns]")
                  .astype("int64") // 1_000_000)
            for t in sorted(ms.tolist()):
                d.update(t)
        if touched:
            d.expire(d.hwm, window_ms)
            state.update((d.serialize(),))
            # state GC: drop the group once the watermark passes its
            # whole trailing window
            state.setTimeoutTimestamp(d.hwm + window_ms + 1)
            yield pd.DataFrame(
                {"grp": [key[0]],
                 "as_of": [pd.Timestamp(d.hwm, unit="ms")],
                 "est_count": [d.count(d.hwm, window_ms)],
                 "n_buckets": [d.n_buckets]})

    return prepared.groupBy("grp").applyInPandasWithState(
        update, outputStructType=out_schema,
        stateStructType="sketch binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)
