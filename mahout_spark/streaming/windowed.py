"""Event-time windowed sketches over Structured Streaming.

``windowed_sketch_stream`` maintains one mergeable sketch per
(event-time window, group) with ``applyInPandasWithState`` — the custom
stateful-operator path: state = the serialized sketch, update = the same
vectorized kernel the batch path uses, eviction = watermark timeout. This
is the streaming generalization of OnlineSummarizer's one-pass
accumulators (math/.../stats/OnlineSummarizer.java:52-60) — the reference
has no streaming engine at all (SURVEY.md §2.7).

Late data within the watermark merges into the window's sketch (merge
associativity again); windows close when the watermark passes and emit
exactly once.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import (GroupState, GroupStateTimeout)

from mahout_spark.sketch.agg import SketchSpec


def windowed_sketch_stream(events: DataFrame, spec: SketchSpec,
                           ts_col: str, group_col: str,
                           value_col: str | None = None,
                           key_col: str | None = None,
                           window: str = "1 hour",
                           watermark: str = "2 hours",
                           key_expr: F.Column | None = None):
    """events (streaming DF) -> streaming DF[window_start, group, sketch].

    Emits a row per closed (window, group) carrying the serialized sketch;
    downstream queries use sketch_eval / cms_point_lookup unchanged.
    ``key_expr`` overrides the default xxhash64 key mapping (pass
    ``md5_long60`` for parity sketches whose streaming build the DuckDB
    oracle replays — same contract as sketch_by_key).
    """
    if key_expr is not None:
        key_sel = [key_expr.cast("long").alias("__key")]
    elif key_col:
        key_sel = [F.xxhash64(F.col(key_col)).alias("__key")]
    else:
        key_sel = []
    # group by the watermarked window struct itself — projecting the
    # struct away would drop the event-time watermark tag
    prepared = (events.withWatermark(ts_col, watermark)
                .select(F.window(F.col(ts_col), window).alias("win"),
                        F.col(group_col).alias("grp"),
                        *([F.col(value_col).cast("double").alias("__val")]
                          if value_col else []),
                        *key_sel))

    out_schema = "w_start timestamp, grp string, sketch binary"

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if isinstance(key[0], (tuple, list)):
            w_start, w_end = key[0][0], key[0][1]
        else:
            w_start, w_end = key[0]["start"], key[0]["end"]
        if state.hasTimedOut:
            (blob,) = state.get
            state.remove()
            yield pd.DataFrame({"w_start": [w_start], "grp": [key[1]],
                                "sketch": [blob]})
            return
        s = (spec.deserialize(state.get[0]) if state.exists
             else spec.make())
        import numpy as np

        for pdf in pdfs:
            if not len(pdf):
                continue
            keys = (pdf["__key"].to_numpy(dtype=np.int64)
                    if "__key" in pdf else None)
            vals = (pdf["__val"].to_numpy(dtype=np.float64)
                    if "__val" in pdf else None)
            spec.update(s, keys, vals)
        state.update((s.serialize(),))
        # Emit exactly once, when the watermark passes the window's END —
        # timing out at the current watermark would evict a still-open
        # window whenever its group idles for one micro-batch, and late
        # events inside the watermark would then re-create the state and
        # emit a second partial row for the same (w_start, grp).
        end_ms = int(pd.Timestamp(w_end).value // 1_000_000)
        state.setTimeoutTimestamp(
            max(end_ms + 1, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({"w_start": pd.Series([], dtype="datetime64[ns]"),
                            "grp": pd.Series([], dtype=object),
                            "sketch": pd.Series([], dtype=object)})

    return prepared.groupBy("win", "grp").applyInPandasWithState(
        update, outputStructType=out_schema,
        stateStructType="sketch binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)
