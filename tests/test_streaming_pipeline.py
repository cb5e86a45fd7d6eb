"""Stateless streaming corpus pipeline (streaming/pipeline.py) + the
row-local-operators-apply-to-streams property."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import text as tx
from amazon_lookout_for_equipment_python_sdk_spark.operators.corpus import (
    contamination_check,
)
from amazon_lookout_for_equipment_python_sdk_spark.streaming.pipeline import (
    streaming_contamination_check,
)


def _write_docs(path, rows):
    with open(path, "w") as f:
        f.write("doc_id|text\n")
        for i, t in rows:
            f.write(f"{i}|{t}\n")


_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon completely different tail here"),
    (3, "nothing in common with the benchmark at all whatsoever"),
    (4, "short"),
    (5, "the eval suite holds this exact sentence for leak testing"),
]
_EVAL = [
    (100, "alpha beta gamma delta epsilon zeta"),
    (101, "the eval suite holds this exact sentence for leak testing"),
]


def test_streaming_contamination_matches_batch(spark, tmp_path):
    eval_df = spark.createDataFrame(_EVAL, "doc_id long, text string")
    indir = tmp_path / "in"
    indir.mkdir()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", True)
        .option("sep", "|")
        .csv(str(indir / "*.csv"))
    )
    # replay in two micro-batches
    _write_docs(indir / "b1.csv", _DOCS[:3])
    q = streaming_contamination_check(
        stream, eval_df, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        shingle_n=3,
    )
    q.awaitTermination()
    _write_docs(indir / "b2.csv", _DOCS[3:])
    q = streaming_contamination_check(
        stream, eval_df, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        shingle_n=3,
    )
    q.awaitTermination()

    got = sorted(
        (r["doc_id"], r["n_sh"], r["n_hit"], r["contamination"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    batch = spark.createDataFrame(_DOCS, "doc_id long, text string")
    want = sorted(
        (r["doc_id"], r["n_sh"], r["n_hit"], r["contamination"])
        for r in contamination_check(batch, eval_df, shingle_n=3).collect()
    )
    assert got == want
    # sanity: doc 5 is fully contaminated, doc 3 clean, doc 4 shingle-less
    by_id = {t[0]: t for t in got}
    assert by_id[5][2] > 0 and by_id[5][3] == 1.0
    assert by_id[3][2] == 0
    assert by_id[4][1] == 0 and by_id[4][3] is None


def test_row_local_operators_accept_streams(spark, tmp_path):
    """text_stats / quality_filter / lang_id are row-local plans — they
    must transform a streaming DataFrame directly (no foreachBatch)."""
    indir = tmp_path / "in"
    indir.mkdir()
    _write_docs(indir / "b1.csv", _DOCS)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("header", True)
        .option("sep", "|")
        .csv(str(indir / "*.csv"))
    )
    out = tx.text_stats(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ts_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from ts_stream").collect()
    assert len(rows) == len(_DOCS)
    batch_rows = tx.text_stats(
        spark.createDataFrame(_DOCS, "doc_id long, text string")
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch_rows))
