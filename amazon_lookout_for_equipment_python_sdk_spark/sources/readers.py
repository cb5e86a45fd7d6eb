"""Readers for every reference input format (SURVEY S4-S7).

All readers impose explicit schemas (the reference's type rule is
deterministic: first col DATETIME, rest DOUBLE) — no sampling-based
inference jobs at scale.  Spark reads local paths and object stores
(``s3a://``) through the same API, which subsumes the reference's separate
s3fs code paths (schema.py:62-98, dataset.py:183-240).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: training CSV timestamp format (reference dataset.py:163)
TRAINING_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_component_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    ts_format: str | None = None,
) -> DataFrame:
    """S5 — component training CSV with imposed schema + timestamp parse
    (reference dataset.py:507-509 ``parse_dates``)."""
    reader = spark.read.option("header", True).schema(schema)
    if ts_format:
        reader = reader.option("timestampFormat", ts_format)
    return reader.csv(path)


def read_labels_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 — headerless 2-column label-ranges CSV -> (start, end) timestamps
    (reference dataset.py:126-130: ``header=None`` then columns renamed)."""
    schema = T.StructType(
        [
            T.StructField("start", T.TimestampType(), True),
            T.StructField("end", T.TimestampType(), True),
        ]
    )
    return spark.read.option("header", False).schema(schema).csv(path)


def read_tags_description(spark: SparkSession, path: str) -> DataFrame:
    """S5 — tag metadata dimension (Tag -> Subsystem), broadcast-sized
    (reference dataset.py:143-147)."""
    return (
        spark.read.option("header", True)
        .schema("Tag STRING, Subsystem STRING")
        .csv(path)
    )


def read_timeranges_txt(spark: SparkSession, path: str) -> dict[str, str]:
    """S6 — 4-line timeranges.txt -> train/eval bounds (reference
    dataset.py:133-140).  Tiny file: read as text, collect 4 rows."""
    rows = [r[0].strip() for r in spark.read.text(path).collect()]
    if len(rows) < 4:
        raise ValueError(f"timeranges file {path!r} needs 4 lines, got {len(rows)}")
    keys = ("training_start", "training_end", "evaluation_start", "evaluation_end")
    return dict(zip(keys, rows[:4]))


INFERENCE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("prediction", T.IntegerType(), True),
        T.StructField("anomaly_score", T.DoubleType(), True),
        T.StructField(
            "diagnostics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), True),
                        T.StructField("value", T.DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def read_inference_results(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S7 — JSON-lines inference outputs with typed schema (the reference
    ``eval``s each line, scheduler.py:626 — N4: replaced with from_json
    semantics via a typed json reader)."""
    return spark.read.schema(INFERENCE_RESULT_SCHEMA).json(paths)


def pivot_diagnostics(results: DataFrame) -> DataFrame:
    """N1 — explode + pivot diagnostics into wide per-sensor columns
    (reference scheduler.py:636-657).  Sensor names become columns named
    ``component\\tag`` exactly as the reference emits them."""
    exploded = results.select(
        "timestamp",
        "prediction",
        "anomaly_score",
        F.explode_outer("diagnostics").alias("d"),
    )
    return (
        exploded.groupBy("timestamp", "prediction", "anomaly_score")
        .pivot("d.name")
        .agg(F.first("d.value", ignorenulls=True))
        .drop("null")
    )
