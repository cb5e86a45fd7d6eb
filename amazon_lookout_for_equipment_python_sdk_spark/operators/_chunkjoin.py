"""Null-safe boundary-table joins for the skew-safe chunked twins.

Every chunked twin decomposes a per-key window into (key, time-bucket)
local work plus a tiny boundary/carry/offset table joined back on the
key (+ bucket).  Spark's window ``partitionBy`` treats a NULL key as a
regular partition value — the plain forms restamp/pair/fill/score
NULL-key rows as one ordinary group — but a standard equi-join drops
NULL keys, so a twin joining its boundary table with plain equality
silently loses those rows (inner joins) or orphans them from their
cross-bucket carry (left joins), breaking the twins' identical-output
contract exactly and only on NULL-key groups (r11 review finding).

:func:`join_boundary` joins with null-safe equality (``eqNullSafe``)
on the KEY columns and plain equality on the rest (bucket ids — never
null where a twin has a null-timestamp contract of its own, e.g. the
lead/restamp sentinel bucket).  ``EqualNullSafe`` is a hash-joinable
predicate, so the broadcast plan shape is unchanged (plan-pinned in
tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bucket id for NULL-timestamp rows in the chunked twins — far below
#: any real ``floor(event-time / span)`` (|unix micros| < 2^63 over a
#: >=1e6-us span keeps real buckets within +-2^43; second-granularity
#: buckets are smaller still) and SMALLER than all of them, which
#: reproduces the plain forms' ascending nulls-FIRST window order on
#: the bucket axis: null-ts rows land in the front bucket, take the
#: front offsets/carries, and the boundary joins (plain equality on
#: the bucket id) match them like any other bucket.  Without the
#: sentinel a NULL bucket id fails the equi-join and the twins drop
#: rows their plain forms keep — the null-TIMESTAMP sibling of the
#: null-key class bug (r11 review).
NULL_TS_BUCKET = -(1 << 62)

#: Union of the internal staging column names the chunked twins create
#: with ``withColumn`` — which silently REPLACES a same-named input
#: column, corrupting output where the plain forms have no such hazard
#: (r11 ADVICE).  Twins reject input frames carrying any of these via
#: :func:`guard_internal`; the routed wrappers inherit the check, so a
#: clashing frame fails loudly on the twin path instead of silently
#: mid-plan.
RESERVED_INTERNAL = frozenset(
    {
        "_b", "_bkt", "_bstart", "_c", "_carry", "_cum", "_d", "_g",
        "_lc", "_lead", "_lm", "_loc", "_lr", "_m", "_n", "_new",
        "_off", "_ord", "_rn", "_side", "_us", "_xc",
    }
)


def guard_internal(df: DataFrame, extra: "tuple[str, ...]" = ()) -> None:
    """Raise if ``df`` already carries a chunked twin's internal staging
    column name (or the ``_nsj_`` boundary-join prefix).  ``withColumn``
    would silently replace it and corrupt the output; the plain window
    forms have no such hazard, so the twin refuses loudly instead."""
    reserved = RESERVED_INTERNAL.union(extra)
    clash = sorted(
        c for c in df.columns if c in reserved or c.startswith("_nsj_")
    )
    if clash:
        raise ValueError(
            f"input frame carries reserved internal column(s) {clash}; "
            "rename them before calling a chunked twin (these names are "
            "staging columns the twin would silently overwrite)"
        )


def join_boundary(
    left: DataFrame,
    right: DataFrame,
    ns_cols: "list[str]",
    eq_cols: "list[str]",
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Join ``left`` to the (tiny) ``right`` boundary table: null-safe
    on ``ns_cols`` (the window keys), plain equality on ``eq_cols``
    (bucket ids).  Right-side join columns are dropped after the join,
    so the result carries exactly left's columns plus right's payload —
    the same shape as ``left.join(right, on=[...])``."""
    if not ns_cols and not eq_cols:
        raise ValueError("join_boundary needs at least one join column")
    join_cols = set(ns_cols) | set(eq_cols)
    payload = [c for c in right.columns if c not in join_cols]
    clashes = sorted(
        c for c in payload if c in left.columns or c.startswith("_nsj_")
    )
    if clashes:
        raise ValueError(
            "join_boundary: right payload columns collide with left "
            f"columns or the _nsj_ staging prefix: {clashes} — rename "
            "the boundary payload before joining"
        )
    renamed = right
    conds = []
    for c in ns_cols:
        renamed = renamed.withColumnRenamed(c, f"_nsj_{c}")
        conds.append(F.col(c).eqNullSafe(F.col(f"_nsj_{c}")))
    for c in eq_cols:
        renamed = renamed.withColumnRenamed(c, f"_nsj_{c}")
        conds.append(F.col(c) == F.col(f"_nsj_{c}"))
    if broadcast:
        renamed = F.broadcast(renamed)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    out = left.join(renamed, on=cond, how=how)
    return out.drop(*[f"_nsj_{c}" for c in ns_cols + eq_cols])
