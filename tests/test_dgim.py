"""DGIM sliding-window counter: exact-regime equality, the published
relative-error bound under adversarial and random arrivals, bucket
invariants (powers of two, <= r per size, O(log^2) count), expiry,
late-event clamping, serde, and the streaming per-key operator vs
exact trailing-window counts."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

from mahout_spark.core.dgim import DGIM


def _err_bound(r):
    return 1.0 / (2.0 * (r - 1))


def test_exact_while_all_size_one():
    d = DGIM(r=4)
    for t in range(4):                 # <= r size-1 buckets stay exact
        d.update(t * 10)
    assert d.count(30, 100) == 4.0
    assert d.count(30, 15) == 2.0      # only ts 20, 30 inside
    assert d.count(200, 50) == 0.0


@pytest.mark.parametrize("r", [2, 4, 9])
@pytest.mark.parametrize("arrival", ["dense", "bursty", "random"])
def test_error_bound(r, arrival):
    rng = np.random.default_rng(17)
    if arrival == "dense":
        ts = np.arange(5000)
    elif arrival == "bursty":
        ts = np.sort(np.concatenate(
            [np.full(500, b * 1000) + np.arange(500) % 7
             for b in range(10)]))
    else:
        ts = np.sort(rng.integers(0, 20000, 5000))
    d = DGIM(r=r)
    d.update_batch(ts.tolist())
    now = int(ts.max())
    for w in (97, 1003, 7777, 100000):
        exact = int(((ts > now - w) & (ts <= now)).sum())
        est = d.count(now, w)
        if exact > 0:
            assert abs(est - exact) <= _err_bound(r) * exact + 1e-9, \
                (r, arrival, w, est, exact)
        else:
            assert est == 0.0


def test_bucket_invariants():
    d = DGIM(r=3)
    d.update_batch(range(100000))
    sizes = [s for _, s in d.buckets]
    assert all(s & (s - 1) == 0 for s in sizes)          # powers of two
    from collections import Counter
    assert max(Counter(sizes).values()) <= 3             # <= r per size
    assert d.n_buckets <= 3 * (int(np.log2(100000)) + 2)  # O(r log n)
    ts = [t for t, _ in d.buckets]
    assert ts == sorted(ts)                              # oldest-first


def test_expire_and_late_clamp():
    d = DGIM(r=4)
    d.update_batch(range(0, 1000, 10))
    d.expire(990, 100)
    assert all(t > 890 for t, _ in d.buckets)
    hwm = d.hwm
    d.update(5)                        # very late event
    assert d.hwm == hwm                # clamped, not time-travelling
    assert d.count(hwm, 50) >= 1.0
    with pytest.raises(ValueError):
        DGIM(r=1)


def test_serde_roundtrip():
    d = DGIM(r=5)
    d.update_batch(range(0, 3000, 3))
    rt = DGIM.deserialize(d.serialize())
    assert rt.r == 5 and rt.hwm == d.hwm and rt.buckets == d.buckets
    assert rt.count(d.hwm, 500) == d.count(d.hwm, 500)
    with pytest.raises(ValueError):
        DGIM.deserialize(b"zzz")


@pytest.mark.slow
def test_streaming_counts_match_bound(spark):
    from mahout_spark.streaming.dgim import dgim_count_stream

    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for i in range(2000):
        grp = "a" if i % 3 else "b"
        rows.append((base + pd.Timedelta(seconds=i), grp))
    pdf = pd.DataFrame(rows, columns=["ts", "etype"])
    window_ms = 600 * 1000             # trailing 10 minutes
    r = 8
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            "ts timestamp, etype string").parquet(src)
        out = dgim_count_stream(stream, "ts", "etype", window_ms, r=r)
        q = (out.writeStream.format("memory").queryName("dgim_out")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r_["grp"]: r_ for r_ in
               spark.sql("select * from dgim_out").collect()}
    assert set(got) == {"a", "b"}
    for grp, row in got.items():
        sub = pdf[pdf["etype"] == grp]
        as_of = row["as_of"]
        exact = int(((sub["ts"] > as_of - pd.Timedelta(milliseconds=window_ms))
                     & (sub["ts"] <= as_of)).sum())
        assert abs(row["est_count"] - exact) <= _err_bound(r) * exact + 1e-9
        assert row["n_buckets"] <= r * 25
