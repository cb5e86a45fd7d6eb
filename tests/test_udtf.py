"""Python UDTF surface (functions/udtf.py)."""

from __future__ import annotations

from pyspark.sql.functions import lit

from amazon_lookout_for_equipment_python_sdk_spark.functions.udtf import (
    SplitSentences,
)


def test_split_sentences_direct(spark):
    rows = SplitSentences(lit("One two. Three! Four? trailing bit")).collect()
    sents = [(r["sent_id"], r["sentence"]) for r in rows]
    assert sents == [
        (0, "One two."),
        (1, "Three!"),
        (2, "Four?"),
        (3, "trailing bit"),
    ]
    # offsets index into the original string
    text = "One two. Three! Four? trailing bit"
    for r in rows:
        assert text[r["start"] : r["end"]].strip() == r["sentence"]


def test_split_sentences_lateral_sql(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    docs = spark.createDataFrame(
        [(1, "Alpha. Beta."), (2, "Solo"), (3, None)],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.doc_id, s.sent_id, s.sentence "
        "FROM udtf_docs d, LATERAL split_sentences(d.text) s "
        "ORDER BY d.doc_id, s.sent_id"
    ).collect()
    got = [(r["doc_id"], r["sent_id"], r["sentence"]) for r in out]
    assert got == [
        (1, 0, "Alpha."),
        (1, 1, "Beta."),
        (2, 0, "Solo"),
    ]


def test_weighted_median_udaf(spark):
    from pyspark.sql import functions as F

    from amazon_lookout_for_equipment_python_sdk_spark.functions.udtf import (
        weighted_median_udaf,
    )

    rows = [
        # group a: values 1..4, weight on 4 dominates -> median 4
        ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 10.0),
        # group b: uniform weights -> plain lower median of [5, 6] = 5
        ("b", 5.0, 1.0), ("b", 6.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    wm = weighted_median_udaf()
    out = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(wm("v", "w").alias("m")).collect()
    }
    assert out == {"a": 4.0, "b": 5.0}
