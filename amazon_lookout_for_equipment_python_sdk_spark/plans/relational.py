"""Relational operator layer over the TPC-H-ish tables (SURVEY §2.2/2.3/2.6/2.7).

Covers projections/filters (P1-P8), dimension joins (J2), semi/anti joins
(P7), sorts/top-k/pagination (T1-T3), set ops (U1-U3), scalar functions
(F1-F8), and the sum-rank-head aggregate (A8).

Scale notes: dimension joins broadcast the small side explicitly; top-k is
orderBy+limit (Spark plans TakeOrderedAndProject — no full sort); all
money arithmetic runs on exact scaled integers (see plans.registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.conditions import on_filter
from .._persist import note_persist as _note_persist
from .registry import (
    det_avg,
    det_sum,
    load,
    register,
    sql_det_avg,
    sql_det_sum,
)

# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (P4 filter + A-layer aggs + T1 sort)
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_det_sum('l_quantity')} AS sum_qty,
       {sql_det_sum('l_extendedprice')} AS sum_base_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round(100 - l_discount*100) AS BIGINT)) / 1e6 AS sum_disc_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round(100 - l_discount*100) AS BIGINT)
           * CAST(round(100 + l_tax*100) AS BIGINT)) / 1e8 AS sum_charge,
       {sql_det_avg('l_quantity')} AS avg_qty,
       {sql_det_avg('l_extendedprice')} AS avg_price,
       {sql_det_avg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL)
def q1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan->filter->agg pipeline the
    relational layer (P4+A-layer) must sustain at 100 TB.  All sums are
    exact integer arithmetic until one final division."""
    li = load(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_f = F.round(100 - F.col("l_discount") * 100).cast("long")
    tax_f = F.round(100 + F.col("l_tax") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            det_sum(F.col("l_quantity")).alias("sum_qty"),
            det_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(price_c * disc_f) / F.lit(1e6)).alias("sum_disc_price"),
            (F.sum(price_c * disc_f * tax_f) / F.lit(1e8)).alias("sum_charge"),
            det_avg(F.col("l_quantity")).alias("avg_qty"),
            det_avg(F.col("l_extendedprice")).alias("avg_price"),
            det_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J2: dimension lookup joins (broadcast) through the star schema
# ---------------------------------------------------------------------------

_STAR_SQL = f"""
SELECT n.n_name AS nation, r.r_name AS region,
       count(*) AS n_lineitems,
       {sql_det_sum('l.l_quantity')} AS sum_qty
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("star_join_rollup", _STAR_SQL)
def star_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — dimension lookup join chain (reference tags->Subsystem broadcast
    join, dataset.py:160-161), as a star-schema rollup.  Dims are broadcast:
    no shuffle of the fact table."""
    li = load(spark, sf_dir, "lineitem")
    sup = F.broadcast(load(spark, sf_dir, "supplier"))
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_lineitems"),
            det_sum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# P7: semi/anti membership joins
# ---------------------------------------------------------------------------


@register(
    "semi_join_active_customers",
    """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def semi_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — membership validation as left-semi join (reference signal-subset
    check, plot.py:136-143)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "anti_join_inactive_customers",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
""",
)
def anti_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — the 'unknown signals' complement as left-anti join (reference
    raises listing unknowns, dataset.py:809-810).  Right side pre-filtered
    so the result is non-trivial (customers inactive in 1998+)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# P8 + T2: status filter + deterministic top-k
# ---------------------------------------------------------------------------


@register(
    "status_filter_counts",
    """
SELECT o_orderpriority, count(*) AS n_orders,
       sum(CAST(round(o_totalprice*10000) AS BIGINT)) / 1e4 AS sum_total
FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1
""",
)
def status_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — equality filter on a status enum (reference scheduler
    execution-status filter, scheduler.py:585-592)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            det_sum(F.col("o_totalprice"), scale=10000).alias("sum_total"),
        )
    )


@register(
    "topk_orders",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
""",
)
def topk_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 — deterministic top-k (orderBy+limit plans as
    TakeOrderedAndProject: per-partition heap + merge, no global sort)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "top_customers_by_spend",
    """
SELECT c.c_custkey, c.c_name, t.n_orders, t.spend FROM (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(round(o_totalprice*10000) AS BIGINT)) / 1e4 AS spend
  FROM orders GROUP BY 1
  ORDER BY spend DESC, o_custkey LIMIT 10) t
JOIN customer c ON c.c_custkey = t.o_custkey
""",
)
def top_customers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+T2 — sum-per-key, rank desc, head(top_n) (reference
    plot.py:594), then dimension join for names."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    top = (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            det_sum(F.col("o_totalprice"), scale=10000).alias("spend"),
        )
        .orderBy(F.desc("spend"), "o_custkey")
        .limit(10)
    )
    return top.join(F.broadcast(cust), top.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_name", "n_orders", "spend"
    )


# ---------------------------------------------------------------------------
# P5: off-condition mini-DSL
# ---------------------------------------------------------------------------


@register(
    "off_condition_filter",
    f"""
SELECT event_type, count(*) AS n_on, {sql_det_avg('value')} AS avg_on_value
FROM events WHERE NOT coalesce(value < 100.0, FALSE) GROUP BY 1
""",
)
def off_condition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/M4 — on-time rows after excluding off-time per the DSL
    'machine\\value < 100.0' (the condition describes OFF-time; matching
    rows are dropped — reference model.py:109-123, 194-208)."""
    events = load(spark, sf_dir, "events")
    keep = on_filter("machine\\value < 100.0", layout="wide", value_col="value")
    return (
        events.filter(keep)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_on"), det_avg(F.col("value")).alias("avg_on_value"))
    )


# ---------------------------------------------------------------------------
# U1/U2/U3: set operations
# ---------------------------------------------------------------------------


@register(
    "union_distinct_labels",
    """
SELECT event_type AS label FROM events
UNION
SELECT o_orderpriority AS label FROM orders
""",
)
def union_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2 — vertical concat + distinct (reference pd.concat + unique)."""
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    return (
        events.select(F.col("event_type").alias("label"))
        .unionByName(orders.select(F.col("o_orderpriority").alias("label")))
        .distinct()
    )


@register(
    "membership_isin",
    f"""
SELECT user_id, count(*) AS n_events, {sql_det_sum('value')} AS sum_value
FROM events WHERE event_type IN ('error', 'signup')
GROUP BY 1
""",
)
def membership_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/P6 — membership filter (reference tag-in-list intersection,
    plot.py:140-143)."""
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type").isin("error", "signup"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), det_sum(F.col("value")).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# F1-F8: scalar datetime/string layer
# ---------------------------------------------------------------------------


@register(
    "time_features",
    """
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS mi,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS iso_s,
       split_part(props, ':', 1) AS props_head
FROM events WHERE event_type = 'view'
""",
)
def time_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F4/F6/F7 — timestamp parts, epoch, formatted string, string
    split (reference F-layer: dataset.py:163/303, scheduler.py:146-151,
    plot.py:595)."""
    events = load(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "view").select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("mo"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.minute("ts").cast("int").alias("mi"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_s"),
        F.substring_index("props", ":", 1).alias("props_head"),
    )


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join (beyond-reference scale operator)
# ---------------------------------------------------------------------------

_BLOOM_SQL = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {sql_det_sum('l_extendedprice')} AS sum_price
FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag
"""


@register("bloom_prune_semi_join", _BLOOM_SQL)
def bloom_semi_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table semi-join with a bloom pre-prune (operators/bloom.py):
    the bitmap of urgent order keys (one broadcast array<long> row) filters
    lineitem BEFORE the semi-join shuffle, so the shuffle carries only
    probable matches; the exact semi-join then drops the bloom's false
    positives, making the result provably identical to a plain semi-join
    — which is what the oracle runs.  The cluster-scale analogue of the
    reference's driver-side membership set (plot.py:136-143)."""
    from ..operators.bloom import bloom_semi_join

    li = load(spark, sf_dir, "lineitem")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            det_sum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order key (beyond-reference storage-layout operator)
# ---------------------------------------------------------------------------

_ZBITS = 16
_Z_TOP = (1 << _ZBITS) - 1


def _z_interleave_sql(qu: str, qv: str) -> str:
    terms = [f"((({qu} >> {i}) & 1) << {2 * i})" for i in range(_ZBITS)]
    terms += [f"((({qv} >> {i}) & 1) << {2 * i + 1})" for i in range(_ZBITS)]
    return " | ".join(terms)


def _z_quant_sql(x: str, lo: str, hi: str) -> str:
    return (
        f"CASE WHEN CAST({hi} AS DOUBLE) = CAST({lo} AS DOUBLE) THEN 0 "
        f"ELSE least(greatest(CAST(floor((CAST({x} AS DOUBLE) - CAST({lo} AS "
        f"DOUBLE)) / (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) * "
        f"{float(_Z_TOP)}) AS BIGINT), 0), {_Z_TOP}) END"
    )


_ZORDER_SQL = f"""
WITH b AS (
  SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
         min(value) AS lo_v, max(value) AS hi_v
  FROM events
), q AS (
  SELECT event_id,
         {_z_quant_sql('user_id', 'b.lo_u', 'b.hi_u')} AS qu,
         {_z_quant_sql('value', 'b.lo_v', 'b.hi_v')} AS qv
  FROM events, b
)
SELECT event_id, {_z_interleave_sql('qu', 'qv')} AS zkey FROM q
"""


@register("zorder_key_events", _ZORDER_SQL)
def zorder_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key of (user_id, value) against global min/max — the
    clustering key behind operators/zorder.py's OPTIMIZE-ZORDER-style
    rewrite (file skipping on several columns at once).  One tiny
    min/max agg broadcast into a codegen shift/mask interleave; the
    oracle unrolls the identical bit arithmetic, so the key is proven
    engine-portable bit-for-bit."""
    from ..operators.zorder import zorder_key

    events = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return zorder_key(events, ["user_id", "value"], bits=_ZBITS).select(
        "event_id", "zkey"
    )


# ---------------------------------------------------------------------------
# Classic decision-support shapes (TPC-H Q3/Q5/Q6 analogues)
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT l.l_orderkey,
       sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * CAST(round(100 - l.l_discount*100) AS BIGINT)) / 1e6 AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15'
  AND l.l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY 1, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_SQL)
def q3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter broadcast into the fact
    join chain, two-phase revenue agg, TakeOrdered top-10 (no full
    sort).  Exact scaled-integer money arithmetic throughout."""
    cust = F.broadcast(
        load(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-03-15"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    rev = (
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.round(100 - F.col("l_discount") * 100).cast("long")
        )
        / 1e6
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q5_SQL = """
SELECT n.n_name AS nation,
       sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * CAST(round(100 - l.l_discount*100) AS BIGINT)) / 1e6 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY revenue DESC, nation
"""


@register("q5_local_supplier_volume", _Q5_SQL)
def q5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the fact table joins two shuffle-keyed big sides
    (orders, then the customer-nation == supplier-nation equality) with
    the tiny nation/region dims broadcast; revenue in exact cents."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    rev = (
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.round(100 - F.col("l_discount") * 100).cast("long")
        )
        / 1e6
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


_Q6_SQL = """
SELECT sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round(l_discount*100) AS BIGINT)) / 1e4 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_SQL)
def q6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    pushes to the parquet scan, the agg is one partial+final pair, and
    the answer is a single row.  The canonical 'is pushdown working'
    probe."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.round(F.col("l_discount") * 100).cast("long")
        )
        / 1e4
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rev.alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# MERGE / CDC: SCD-1 upsert + changelog compaction (operators/merge.py)
# ---------------------------------------------------------------------------

_UPSERT_SQL = """
WITH u AS (
  SELECT o_orderkey, 'X' AS o_orderstatus,
         CAST(floor(CAST(round(o_totalprice*100) AS BIGINT) * 11 / 10)
              AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 97 = 0
), keep AS (
  SELECT o.o_orderkey, o.o_orderstatus,
         CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
  FROM orders o ANTI JOIN u ON o.o_orderkey = u.o_orderkey
), m AS (
  SELECT * FROM u UNION ALL SELECT * FROM keep
)
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS total
FROM m GROUP BY 1
"""


@register("orders_upsert_merge", _UPSERT_SQL)
def upsert_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 MERGE (operators/merge.py merge_upsert): a deterministic 1%
    update batch (keys % 97 == 0, status 'X', +10% price on exact cents)
    merges into orders; post-merge per-status rollup verifies both the
    anti-join (replaced rows gone) and the union (updates present).

    One anti-join shuffle on the key — zero-exchange when both sides are
    bucketed (sinks.write_bucketed)."""
    from ..operators.merge import merge_upsert

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    updates = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.floor(F.col("cents") * 11 / 10).cast("long").alias("cents"),
    )
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias("total"),
    )


_CDC_SQL = """
SELECT user_id, event_type, ts, value, event_id FROM (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 AND user_id % 50 = 0
"""


@register("cdc_latest_state", _CDC_SQL)
def cdc_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction (operators/merge.py cdc_latest): events as a
    change log keyed (user_id, event_type); keep each key's latest row.
    The rank-1 window compiles to WindowGroupLimit — map-side local top-1
    before the shuffle.  Output filtered to a deterministic 2% of users to
    keep the driver compare small."""
    from ..operators.merge import cdc_latest

    events = load(spark, sf_dir, "events")
    latest = cdc_latest(
        events, ["user_id", "event_type"], ts_col="ts", tiebreak_col="event_id"
    )
    return latest.filter(F.col("user_id") % 50 == 0).select(
        "user_id", "event_type", "ts", "value", "event_id"
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 analogue: returned-item revenue per customer (top 20)
# ---------------------------------------------------------------------------

_Q10_SQL = """
WITH rev AS (
  SELECT o.o_custkey,
         sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
             * CAST(round(100 - l.l_discount*100) AS BIGINT)) AS rc
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    AND l.l_returnflag = 'R'
  GROUP BY 1
)
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(rev.rc AS DOUBLE) / 1e4 AS revenue
FROM rev
JOIN customer c ON c.c_custkey = rev.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev.rc DESC, c.c_custkey LIMIT 20
"""


@register("q10_returned_items", _Q10_SQL)
def q10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact-fact join (orders filtered to one
    quarter BEFORE joining lineitem), revenue on exact cents, then the
    customer/nation dims join AFTER the per-customer rollup — the rollup
    output (|customers| rows) is what meets the dims, not the fact table.
    Top-20 is TakeOrdered with a key tiebreak (exact integers, so ties
    rank identically in both engines)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rc = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round(100 - F.col("l_discount") * 100).cast("long")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(rc).alias("rc"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("rc").cast("double") / F.lit(1e4)).alias("revenue"),
            "rc",
        )
        .orderBy(F.col("rc").desc(), F.col("c_custkey"))
        .limit(20)
        .drop("rc")
    )


# ---------------------------------------------------------------------------
# CUBE multi-level rollup (grouping sets surface)
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("orders_cube_rollup", _CUBE_SQL)
def cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in ONE pass —
    Spark plans a single Expand + hash aggregate, not four scans.
    ``grouping_id`` disambiguates subtotal NULLs from data NULLs (none in
    this data, but the column is part of the cube contract).  Money on
    exact cents."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double")
                / F.lit(100.0)
            ).alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "total"
        )
    )


# ---------------------------------------------------------------------------
# SCD-2 history merge (operators/merge.py scd2_apply)
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH cur AS (
  SELECT o_orderkey AS k, o_orderstatus AS attr, o_orderdate AS vf
  FROM orders
), u AS (
  SELECT o_orderkey AS k, 'X' AS uattr, TIMESTAMP '1999-01-01' AS uts
  FROM orders WHERE o_orderkey % 97 = 0
), j AS (
  SELECT coalesce(c.k, u.k) AS k, c.attr, c.vf, u.uattr, u.uts
  FROM cur c FULL JOIN u ON c.k = u.k
), rows_out AS (
  -- stale rule mirrors scd2_apply: an update older than the open row's
  -- valid_from is dropped (monotone-feed contract)
  SELECT k, attr, CAST(NULL AS TIMESTAMP) AS vt FROM j
  WHERE vf IS NOT NULL AND (uts IS NULL OR attr IS NOT DISTINCT FROM uattr
                            OR uts < vf)
  UNION ALL
  SELECT k, attr, uts FROM j
  WHERE vf IS NOT NULL AND uts IS NOT NULL AND attr IS DISTINCT FROM uattr
    AND uts >= vf
  UNION ALL
  SELECT k, uattr, CAST(NULL AS TIMESTAMP) FROM j
  WHERE uts IS NOT NULL
    AND (vf IS NULL OR (attr IS DISTINCT FROM uattr AND uts >= vf))
)
SELECT attr AS o_orderstatus,
       count(CASE WHEN vt IS NULL THEN 1 END) AS n_current,
       count(CASE WHEN vt IS NOT NULL THEN 1 END) AS n_closed
FROM rows_out GROUP BY 1
"""


@register("scd2_orders_history", _SCD2_SQL)
def scd2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history merge (operators/merge.py scd2_apply): orders as the
    initial current snapshot, a deterministic 1% status-change feed;
    rollup counts current vs closed versions per status — verifying the
    close/open/insert expansion end-to-end in ONE join pass
    (plan-pinned in tests/test_merge.py).  The fixed 1999-01-01 update ts
    lands BEFORE some order dates, so the out-of-order stale-drop rule is
    exercised by real rows on both engines."""
    from ..operators.merge import scd2_apply

    orders = load(spark, sf_dir, "orders")
    hist = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("attr"),
        F.col("o_orderdate").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("X").alias("attr"),
        F.to_timestamp(F.lit("1999-01-01")).alias("ts"),
    )
    out = scd2_apply(hist, upd, ["k"], ["attr"])
    return out.groupBy(F.col("attr").alias("o_orderstatus")).agg(
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_current"),
        F.count(F.when(F.col("valid_to").isNotNull(), 1)).alias("n_closed"),
    )


# ---------------------------------------------------------------------------
# Window-function surface: ntile quartiles
# ---------------------------------------------------------------------------

_NTILE_SQL = """
WITH q AS (
  SELECT event_type,
         CAST(round(value*100) AS BIGINT) AS xc,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
       count(*) AS n_rows,
       CAST(sum(xc) AS DOUBLE) / (count(*) * 100.0) AS avg_value
FROM q GROUP BY 1, 2
"""


@register("ntile_quartile_stats", _NTILE_SQL)
def ntile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) per signal with a deterministic (value, event_id) order,
    then exact-cents per-quartile means — §2.5 window surface."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    q = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return q.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n_rows"),
        (
            F.sum("xc").cast("double")
            / (F.count("*") * F.lit(100.0))
        ).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Multiset difference: EXCEPT ALL
# ---------------------------------------------------------------------------

_EXCEPT_SQL = """
SELECT event_type, count(*) AS n FROM (
  SELECT event_type FROM events WHERE user_id % 2 = 0
  EXCEPT ALL
  SELECT event_type FROM events WHERE user_id % 2 = 1
) t GROUP BY 1
"""


@register("except_all_event_types", _EXCEPT_SQL)
def except_all_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (U3 extended): per-type surplus of even-user
    events over odd-user events via EXCEPT ALL — bag semantics both
    engines implement identically."""
    events = load(spark, sf_dir, "events")
    even = events.filter(F.col("user_id") % 2 == 0).select("event_type")
    odd = events.filter(F.col("user_id") % 2 == 1).select("event_type")
    return even.exceptAll(odd).groupBy("event_type").agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
WITH sub AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 40 = 0
)
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM sub a JOIN sub b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 3
"""


@register("fuzzy_name_pairs", _FUZZY_SQL)
def fuzzy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity matching on a deterministic customer subset:
    pairs within levenshtein <= 3 (F-layer string functions; the
    blocking-key subset keeps the pair space tiny — at scale, block on a
    phonetic/prefix key exactly like this modulus stands in for)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 40 == 0
    ).select("c_custkey", "c_name")
    a = cust.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("_na")
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("_nb")
    )
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("_na"), F.col("_nb")).cast("long")
        )
        .filter(F.col("dist") <= 3)
        .select("key_a", "key_b", "dist")
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt) — long-form measures
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
WITH m AS (
  SELECT l_returnflag, 'quantity' AS measure,
         CAST(round(l_quantity*100) AS BIGINT) AS cents FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice',
         CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount',
         CAST(round(l_discount*100) AS BIGINT) FROM lineitem
)
SELECT l_returnflag, measure, count(*) AS n,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS total
FROM m GROUP BY 1, 2
"""


@register("unpivot_lineitem_measures", _UNPIVOT_SQL)
def unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (the inverse of N1's pivot): three lineitem measures
    to long form via Spark's native ``unpivot`` — ONE scan with an
    Expand node, not three union'd scans (the oracle spells it as the
    equivalent UNION ALL).  Exact cents."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("quantity"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("extendedprice"),
        F.round(F.col("l_discount") * 100).cast("long").alias("discount"),
    )
    long = li.unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "cents",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias("total"),
    )


# ---------------------------------------------------------------------------
# Per-group top-k (T2 extended from global to grouped)
# ---------------------------------------------------------------------------

_TOPK_GRP_SQL = """
SELECT c_mktsegment, o_orderkey, total, rnk FROM (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(CAST(round(o.o_totalprice*100) AS BIGINT) AS DOUBLE) / 100.0
           AS total,
         CAST(row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY CAST(round(o.o_totalprice*100) AS BIGINT) DESC,
                    o.o_orderkey) AS BIGINT) AS rnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) t
WHERE rnk <= 3
"""


@register("top3_orders_per_segment", _TOPK_GRP_SQL)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (the grouped form of T2's global top-k): the 3
    largest orders in each market segment.  The rank<=k filter compiles
    to WindowGroupLimit — map tasks keep a local top-3 per segment before
    the shuffle, so the exchange carries O(segments x k x tasks) rows,
    not the order table (plan-pinned in tests)."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", cents.alias("_cents")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("_cents").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            (F.col("_cents").cast("double") / F.lit(100.0)).alias("total"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 analogue: large-volume orders (HAVING-filtered semi-join)
# ---------------------------------------------------------------------------

_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice*100) AS BIGINT) AS total_cents,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY total_cents DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_volume_orders", _Q18_SQL)
def q18_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: orders whose total line quantity exceeds a
    threshold (aggregate -> HAVING -> semi-join back to facts), with
    customer enrichment and a top-100 by price.  The §2.4 shape q1-q10
    don't cover: an AGGREGATE output driving a fact-side join filter.

    Plan: the HAVING aggregate reduces lineitem to qualifying orderkeys
    (aggregate-sized); joining THAT to orders/lineitem keeps every join
    build side small; the final rollup groups only surviving orders.
    Exact integer quantities and cents end-to-end."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    qty = F.round(F.col("l_quantity")).cast("long")
    # the qualifying-keys frame derives from li and joins back beside
    # li: alias its key so the self-join lineage stays unambiguous
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("_bigkey"))
        .drop("_bigkey")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("total_cents"),
        )
        .agg(F.sum(qty).alias("sum_qty"))
        .orderBy(F.desc("total_cents"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 analogue: supplier diversity per part attribute (anti-join +
# count distinct)
# ---------------------------------------------------------------------------

_Q16_SQL = """
WITH bad AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 2, 3, 4, 5)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY 1, 2, 3
"""


@register("q16_supplier_diversity", _Q16_SQL)
def q16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct-supplier counts per (brand, type,
    size) over a selective part filter, EXCLUDING complaint suppliers
    via an anti-join — the count-distinct-after-anti-join shape.

    Plan: the part filter pushes to the scan and the filtered dim
    broadcasts; the negative supplier list is tiny and broadcasts as an
    anti-join; count(DISTINCT) compiles to Spark's two-phase
    expand/partial-agg — no row ever carries more than the three group
    keys + suppkey."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_size").isin(1, 2, 3, 4, 5))),
            li.l_partkey == part.p_partkey,
        )
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy(
            "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 analogue: suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
), per_order AS (
  SELECT okey, skey, is_late,
         count(*) OVER (PARTITION BY okey) AS n_supp,
         sum(is_late) OVER (PARTITION BY okey) AS n_late
  FROM late
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order p JOIN supplier s ON p.skey = s.s_suppkey
WHERE p.is_late = 1 AND p.n_supp >= 2 AND p.n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_waiting_suppliers", _Q21_SQL)
def q21_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue (reference-free; the classic EXISTS/NOT-EXISTS
    decision-support shape): suppliers who were the SOLE late shipper on
    a finished multi-supplier order.  The testdata lineitem carries no
    commit/receipt dates, so "late" = shipped more than 90 days after
    the order date.

    Textbook Q21 is two correlated self-joins of the fact table (EXISTS
    another supplier, NOT EXISTS another LATE supplier) — the shape that
    goes quadratic on a naive plan.  Here both quantifiers fold into ONE
    pass: aggregate lineitem to (order, supplier, any_late), then two
    order-partitioned window counts (suppliers per order, late suppliers
    per order) decide sole-lateness row-locally.  No self-join, no
    cartesian ever touches the fact table.

    Exchange budget (pinned in test_plan_shapes.py): when filtered
    orders broadcast (small SF / selective status), the fact shuffles
    once map-combined into the (okey, skey) aggregate and once more
    REDUCED (one row per order-supplier) for the okey window.  At a
    scale where orders stops broadcasting, the orderkey shuffle-join
    partitioning satisfies BOTH the aggregate's (okey, skey) clustering
    (subset rule) and the window's — the whole quantifier pipeline then
    rides the single join exchange.  Supplier broadcasts for the name
    rollup either way."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load(spark, sf_dir, "supplier")
    is_late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        1,
    ).otherwise(0)
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("okey"),
            F.col("l_suppkey").alias("skey"),
        )
        .agg(F.max(is_late).alias("is_late"))
    )
    w = Window.partitionBy("okey")
    sole_late = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
    )
    return (
        sole_late.join(
            F.broadcast(supp), sole_late.skey == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 analogue: priority counts of orders with a late line item
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


@register("q4_order_priority", _Q4_SQL)
def q4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: per-priority counts of one quarter's orders
    that had at least one late line item (no commit/receipt dates in the
    testdata, so "late" = shipped more than 60 days after the order
    date).  The correlated EXISTS — the one decision-support quantifier
    the spine didn't yet exercise directly — compiles to a LEFT SEMI
    join with the residual date predicate riding the orderkey equi-key:
    the quarter filter pushes to the orders scan (aggregate-small side),
    lineitem is touched once, and no row is ever duplicated by multiple
    matching line items (semi-join semantics, not join+distinct)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    hit = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 analogue: top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * CAST(round(100 - l_discount*100) AS BIGINT)) / 1e6
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_SQL)
def q15_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: the supplier(s) with maximum quarterly
    revenue — the aggregate -> scalar-max -> filter quantifier (the
    classic correlated scalar subquery / CREATE VIEW shape), completing
    the spine beside Q18's aggregate->join-filter and Q4/Q21's
    EXISTS forms.  Ties all surface, per the spec.

    Plan: one lineitem scan (quarter filter pushed) into a
    supplier-sized revenue aggregate, PERSISTED so the scalar max and
    the equality filter read the aggregate rather than re-deriving the
    fact lineage; the 1-row max broadcasts; supplier enriches via
    broadcast.  Exact integer cents until one final division, so the
    float equality is bit-deterministic on both engines."""
    from pyspark import StorageLevel

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_f = F.round(100 - F.col("l_discount") * 100).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg((F.sum(price_c * disc_f) / F.lit(1e6)).alias("total_revenue"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        .transform(_note_persist)
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
