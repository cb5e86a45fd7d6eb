"""Data-quality expectations: declarative rule checks compiled to ONE
aggregation pass (plus one job per set-level rule).

The dbt-tests / Great-Expectations surface a lakehouse ingest needs,
expressed Spark-first: every ROW-LOCAL rule (not_null, in_range,
accepted_values, matches) becomes a conditional count inside a single
hash aggregate — checking 20 rules costs one scan, not 20.  Set-level
rules (unique, foreign_key) need their own shuffle by nature and run as
separate tiny jobs.

Extends the engine's schema validation (pkg/schema.py, reference
schema.py) from structure to CONTENT.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation; ``violation`` is a boolean Column that is
    true where the row breaks the rule (row-local rules only)."""

    name: str
    violation: Column | None = None
    kind: str = "row"  # row | unique | fk
    cols: tuple[str, ...] = field(default_factory=tuple)
    fk_dim: "DataFrame | None" = None
    fk_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(
        f"accepted_values({col})",
        c.isNotNull() & ~c.isin(values),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    c = F.col(col)
    return Rule(
        name or f"matches({col})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", kind="unique", cols=tuple(cols))


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(
        f"foreign_key({col})", kind="fk", cols=(col,), fk_dim=dim,
        fk_col=dim_col,
    )


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run all expectations; returns (rule, n_violations) with one row
    per rule, zero-count rows included (the audit record needs the
    passes, not just the failures).

    Row-local rules fuse into ONE aggregate over one scan.  ``unique``
    counts rows beyond the first per key (groupBy + sum(cnt-1)),
    ignoring rows with any NULL key column (dbt/Great-Expectations
    semantics — NULL keys belong to ``not_null``);
    ``foreign_key`` counts fact rows whose key misses the dim (left_anti,
    broadcastable dims stay broadcast).
    """
    spark = df.sparkSession
    out: DataFrame | None = None

    row_rules = [r for r in rules if r.kind == "row"]
    if row_rules:
        aggs = [
            F.sum(r.violation.cast("long")).alias(str(i))
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        names = F.array(*[F.lit(r.name) for r in row_rules])
        counts = F.array(*[F.col(str(i)) for i in range(len(row_rules))])
        out = wide.select(
            F.explode(F.arrays_zip(names.alias("rule"), counts.alias("n")))
            .alias("_z")
        ).select(
            F.col("_z.rule").alias("rule"),
            F.coalesce(F.col("_z.n"), F.lit(0)).alias("n_violations"),
        )

    for r in rules:
        if r.kind == "unique":
            # dbt / Great Expectations semantics: NULL-keyed rows are the
            # not_null rule's concern, never each other's duplicates
            nn = F.lit(True)
            for c in r.cols:
                nn = nn & F.col(c).isNotNull()
            dup = (
                df.filter(nn)
                .groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("_c") - 1), F.lit(0).cast("long")
                    ).alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            out = dup if out is None else out.unionByName(dup)
        elif r.kind == "fk":
            dim_keys = r.fk_dim.select(
                F.col(r.fk_col).alias(r.cols[0])
            ).distinct()
            miss = (
                df.filter(F.col(r.cols[0]).isNotNull())
                .join(F.broadcast(dim_keys), list(r.cols), "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            out = miss if out is None else out.unionByName(miss)

    if out is None:
        return spark.createDataFrame([], "rule string, n_violations long")
    return out


def quarantine_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """The expectations-gate ingest pattern: (clean, quarantined) —
    quarantined rows carry a ``dq_failures`` array naming every ROW-LOCAL
    rule they break (set-level rules can't attribute to a single row and
    are ignored here; run :func:`check` for their counts).

    One row-local projection — both outputs share the scan; no shuffle.
    Write `clean` to the main table and `quarantined` to a side table for
    triage/replay (the standard lakehouse quarantine flow)."""
    row_rules = [r for r in rules if r.kind == "row"]
    if not row_rules:
        return df, df.limit(0).withColumn(
            "dq_failures", F.array().cast("array<string>")
        )
    failures = F.filter(
        F.array(
            *[
                F.when(r.violation, F.lit(r.name)).otherwise(F.lit(None))
                for r in row_rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("dq_failures", failures)
    clean = tagged.filter(F.size("dq_failures") == 0).drop("dq_failures")
    quarantined = tagged.filter(F.size("dq_failures") > 0)
    return clean, quarantined
