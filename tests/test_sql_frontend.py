"""The SQL front end: registered views + spark.sql text produce the same
results as the DataFrame-API implementations (the engine is usable from
pure SQL, not just the Python API)."""

from __future__ import annotations

from amazon_lookout_for_equipment_python_sdk_spark.plans.queries import QUERIES
from amazon_lookout_for_equipment_python_sdk_spark.plans.registry import load


def test_sql_text_matches_dataframe_impl(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events_v")

    sql = spark.sql(
        """
        SELECT event_type,
               timestamp_seconds(floor(unix_timestamp(ts) / 300) * 300)
                 AS bucket_ts,
               cast(sum(cast(round(value * 100) as bigint)) as double)
                 / (count(value) * 100.0d) AS avg_value,
               count(*) AS n_rows
        FROM events_v GROUP BY 1, 2
        """
    )
    df = QUERIES["resample_mean"](spark, sf_dir)
    a = sorted(map(tuple, sql.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b and len(a) > 100


def test_sql_frontend_covers_window_and_join(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    out = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n,
               sum(cast(round(o.o_totalprice * 100) as bigint)) AS cents
        FROM orders_v o JOIN customer_v c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert len(out) == 5 and all(r["n"] > 0 for r in out)
    total = sum(r["cents"] for r in out)
    # cross-check against the DataFrame path
    from pyspark.sql import functions as F

    orders = load(spark, sf_dir, "orders")
    want = orders.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert total == want
