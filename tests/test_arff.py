"""ARFF ingest: header goldens, quote-aware CSV split, hand-computed
cell semantics (nominal ordinals, dates, NaN, shared string word map),
sparse rows, and re-read determinism."""

import math
from datetime import datetime, timezone

import pytest

from mahout_spark.sources.arff import (parse_header, read_arff,
                                       read_arff_with_words, split_csv)

SAMPLE = """% a comment line
@RELATION 'test rel'

@ATTRIBUTE height NUMERIC
@attribute width real
@attribute count integer
@ATTRIBUTE class {setosa,'veri color',"virg,inica"}
@attribute when date
@attribute when2 date "yyyy-MM-dd HH:mm:ss"
@attribute word string
@attribute word2 string
@DATA
% data comment
1.5,2,3,setosa,2001-02-03T04:05:06,2001-02-03 04:05:06,apple,banana
?,abc,4,'veri color',2001-02-03T04:05:07,2001-02-03 04:05:07,banana,apple

{0 9.5, 3 "virg,inica", 6 cherry}
"""


def _ms(y, mo, d, h, mi, s):
    return float(int(datetime(y, mo, d, h, mi, s,
                              tzinfo=timezone.utc).timestamp() * 1000))


EXPECTED = {
    (0, 0): 1.5, (0, 1): 2.0, (0, 2): 3.0, (0, 3): 1.0,
    (0, 4): _ms(2001, 2, 3, 4, 5, 6), (0, 5): _ms(2001, 2, 3, 4, 5, 6),
    (0, 6): 0.0, (0, 7): 1.0,
    (1, 1): float("nan"), (1, 2): 4.0, (1, 3): 2.0,
    (1, 4): _ms(2001, 2, 3, 4, 5, 7), (1, 5): _ms(2001, 2, 3, 4, 5, 7),
    (1, 6): 1.0, (1, 7): 0.0,
    (2, 0): 9.5, (2, 3): 3.0, (2, 6): 2.0,
}


@pytest.fixture(scope="module")
def arff_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("arff") / "sample.arff"
    p.write_text(SAMPLE)
    return str(p)


def test_split_csv_golden():
    assert split_csv('a, "b, c", d\\,e') == ["a", '"b, c"', "d,e"]
    assert split_csv("'x, y',z") == ["'x, y'", "z"]
    assert split_csv("one") == ["one"]
    assert split_csv("") == []


def test_header_golden():
    model, start = parse_header(SAMPLE.splitlines())
    assert model.relation == "test rel"
    assert model.labels == ["height", "width", "count", "class",
                            "when", "when2", "word", "word2"]
    assert model.types == ["numeric", "numeric", "numeric", "nominal",
                           "date", "date", "string", "string"]
    assert model.nominals["class"] == {"setosa": 1, "veri color": 2,
                                       "virg,inica": 3}
    assert model.date_fmts == {4: "yyyy-MM-dd'T'HH:mm:ss",
                               5: "yyyy-MM-dd HH:mm:ss"}
    assert SAMPLE.splitlines()[start - 1].lower() == "@data"


def test_header_errors():
    with pytest.raises(ValueError, match="no type"):
        parse_header(["@attribute lonely", "@data"])
    with pytest.raises(ValueError, match="invalid attribute"):
        parse_header(["@attribute x complex", "@data"])
    with pytest.raises(ValueError, match="no @data"):
        parse_header(["@relation r", "@attribute x numeric"])


def test_read_arff_cells_hand_computed(spark, arff_path):
    model, triples = read_arff(spark, arff_path)
    got = {(r["row_id"], r["col_id"]): r["value"]
           for r in triples.collect()}
    assert set(got) == set(EXPECTED)
    for key, want in EXPECTED.items():
        if math.isnan(want):
            assert math.isnan(got[key]), key
        else:
            assert got[key] == want, key


def test_word_map_first_encounter_order(spark, arff_path):
    _, _, words = read_arff_with_words(spark, arff_path)
    got = {r["word"]: r["word_id"] for r in words.collect()}
    # sequential order: apple (row0,col6)=0, banana (row0,col7)=1,
    # cherry (row2,col6)=2 — shared across both string attributes
    assert got == {"apple": 0.0, "banana": 1.0, "cherry": 2.0}


def test_reread_is_identical(spark, arff_path):
    _, t1 = read_arff(spark, arff_path)
    _, t2 = read_arff(spark, arff_path)
    a = sorted(map(tuple, t1.fillna(-9e9).collect()))
    b = sorted(map(tuple, t2.fillna(-9e9).collect()))
    assert a == b


def test_invalid_nominal_raises(spark, tmp_path):
    p = tmp_path / "bad.arff"
    p.write_text("@relation r\n@attribute c {a,b}\n@data\nz\n")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    model, triples = read_arff(spark, str(p))
    with pytest.raises((Py4JJavaError, PythonException, Exception)):
        triples.collect()
