"""Hadoop SequenceFile + VectorWritable codec round-trips."""

import io
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.sources.seqfile import (decode_vector_writable,
                                          drm_to_seqfile,
                                          encode_vector_writable,
                                          read_sequence_file, read_vint,
                                          seqfile_to_drm,
                                          write_sequence_file, write_vint)


@pytest.mark.parametrize("v", [0, 1, -1, 127, -112, 128, -113, 5000,
                               -5000, 2 ** 31 - 1, -2 ** 31])
def test_hadoop_vint_round_trip(v):
    buf = io.BytesIO()
    write_vint(buf, v)
    buf.seek(0)
    assert read_vint(buf) == v


def test_vector_writable_dense_and_sparse_round_trip():
    dense = np.array([1.5, 0.0, -2.25, 3.0])
    d = decode_vector_writable(encode_vector_writable(dense))
    assert d["indices"] is None and np.array_equal(d["values"], dense)
    assert d["size"] == 4
    idx = np.array([2, 7, 40])
    vals = np.array([0.5, -1.0, 9.75])
    s = decode_vector_writable(
        encode_vector_writable(vals, idx, size=100))
    assert s["size"] == 100
    assert np.array_equal(s["indices"], idx)
    assert np.array_equal(s["values"], vals)


def test_vector_writable_decodes_reference_layout():
    # hand-built RANDOM-access (non-sequential) sparse with lax floats
    buf = io.BytesIO()
    buf.write(bytes([0x08]))  # sparse, random access, lax
    buf.write(bytes([5]))  # size 5 (uvarint)
    buf.write(bytes([2]))  # nnz 2
    buf.write(bytes([3]))
    buf.write(struct.pack(">f", 1.5))
    buf.write(bytes([1]))
    buf.write(struct.pack(">f", -2.0))
    out = decode_vector_writable(buf.getvalue())
    got = dict(zip(out["indices"].tolist(), out["values"].tolist()))
    assert got == {3: 1.5, 1: -2.0}


def test_sequence_file_round_trip_with_sync():
    recs = [(i, encode_vector_writable(np.array([float(i), 2.0 * i])))
            for i in range(250)]  # > sync_interval, exercises escapes
    blob = write_sequence_file(recs, "org.apache.hadoop.io.LongWritable",
                               "org.apache.mahout.math.VectorWritable",
                               sync_interval=64)
    out = list(read_sequence_file(blob))
    assert len(out) == 250
    for i, (k, v) in enumerate(out):
        assert k == i
        assert np.array_equal(v["values"], [float(i), 2.0 * i])


def test_text_keys_and_rejects():
    blob = write_sequence_file([("a", "x"), ("b", "y")],
                               "org.apache.hadoop.io.Text",
                               "org.apache.hadoop.io.Text")
    assert list(read_sequence_file(blob)) == [("a", "x"), ("b", "y")]
    with pytest.raises(ValueError, match="SEQ magic"):
        list(read_sequence_file(b"garbage bytes here"))
    # compressed flag set -> clear error
    bad = bytearray(blob)
    # compression byte sits right after the two class names
    buf = io.BytesIO(blob)
    buf.read(4)
    for _ in range(2):
        n = read_vint(buf)
        buf.read(n)
    bad[buf.tell()] = 1
    # flipping the flag makes the next byte parse as an (empty) codec
    # class name -> clear unsupported-codec error
    with pytest.raises(ValueError, match="codec"):
        list(read_sequence_file(bytes(bad)))


@pytest.mark.parametrize("codec", [
    "org.apache.hadoop.io.compress.DefaultCodec",
    "org.apache.hadoop.io.compress.GzipCodec",
    "org.apache.hadoop.io.compress.BZip2Codec",
    "org.apache.hadoop.io.compress.SnappyCodec",
])
@pytest.mark.parametrize("compression", ["record", "block"])
def test_compressed_round_trip(codec, compression):
    recs = [(i, f"value-{i}" * (i % 7 + 1)) for i in range(500)]
    blob = write_sequence_file(recs, "org.apache.hadoop.io.IntWritable",
                               "org.apache.hadoop.io.Text",
                               compression=compression, codec=codec,
                               block_records=128)  # forces 4 blocks
    assert list(read_sequence_file(blob)) == recs
    # compression actually happened (repetitive text shrinks)
    plain = write_sequence_file(recs, "org.apache.hadoop.io.IntWritable",
                                "org.apache.hadoop.io.Text")
    if compression == "block":
        assert len(blob) < len(plain) // 2


def test_compressed_vector_writable_and_unsupported_codec():
    recs = [(i, encode_vector_writable(np.arange(20, dtype=float) * i))
            for i in range(50)]
    blob = write_sequence_file(recs, "org.apache.hadoop.io.IntWritable",
                               "org.apache.mahout.math.VectorWritable",
                               compression="block")
    got = list(read_sequence_file(blob))
    assert len(got) == 50
    assert np.allclose(got[3][1]["values"], np.arange(20) * 3.0)
    with pytest.raises(ValueError, match="LzoCodec"):
        write_sequence_file(
            recs[:1], "org.apache.hadoop.io.IntWritable",
            "org.apache.mahout.math.VectorWritable",
            compression="record",
            codec="com.hadoop.compression.lzo.LzoCodec")
    with pytest.raises(ValueError, match="record"):
        write_sequence_file(recs[:1], "org.apache.hadoop.io.IntWritable",
                            "org.apache.mahout.math.VectorWritable",
                            compression="zip")


def test_drm_seqfile_spark_round_trip(spark, tmp_path):
    triples = spark.createDataFrame(
        [(0, 1, 2.0), (0, 3, 4.0), (1, 0, -1.5), (2, 2, 7.25)],
        "row_id long, col_id long, value double")
    out = str(tmp_path / "drm_seq")
    drm_to_seqfile(triples, out)
    back = seqfile_to_drm(spark, out)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, triples.collect()))
    # and the round-tripped DRM feeds the algebra layer
    from mahout_spark.operators.drm import ata

    g = ata(back).collect()
    assert len(g) > 0


def test_read_seqfile_df_generic(spark, tmp_path):
    import os

    from mahout_spark.sources.seqfile import read_seqfile_df

    recs = [("docA", encode_vector_writable(np.array([1.0, 0.0, 2.0]))),
            ("docB", encode_vector_writable(np.array([5.0]),
                                            np.array([7]), size=10))]
    blob = write_sequence_file(recs, "org.apache.hadoop.io.Text",
                               "org.apache.mahout.math.VectorWritable")
    d = tmp_path / "seq"
    os.makedirs(d)
    (d / "part-r-00000.seq").write_bytes(blob)
    out = {r["key"]: r for r in read_seqfile_df(spark, str(d)).collect()}
    assert out["docA"]["values"] == [1.0, 0.0, 2.0]
    assert out["docA"]["indices"] == [0, 1, 2]
    assert out["docB"]["size"] == 10
    assert out["docB"]["indices"] == [7] and out["docB"]["values"] == [5.0]
