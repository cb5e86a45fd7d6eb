"""Off-condition mini-DSL (SURVEY P5/M4).

The reference accepts a machine-off condition string
``'component\\tag < threshold'`` or ``'component\\tag > threshold'``
describing when the machine is OFF (model.py:194-208: "Sensor
representative of the machine's on/off state. Ex: 'tag_name < 1000'" —
off while the sensor is below 1000).  Rows matching the condition are
off-time and are EXCLUDED from training/inference (model.py:109-123 "use
one of the signals ... to identify off time from on time").  We compile
the string to a Spark Column predicate that is True where the machine is
OFF; use :func:`on_filter` for the keep-side predicate.

Two data layouts are supported:
- wide: the tag is a column -> predicate on that column;
- long: (tag, value) rows -> predicate ``tag == name AND value <op> thresh``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PATTERN = re.compile(
    r"^\s*(?:(?P<component>[^\\]+)\\)?(?P<tag>[^<>\s]+)\s*(?P<op>[<>])\s*"
    r"(?P<threshold>-?\d+(?:\.\d+)?)\s*$"
)


def parse_off_condition(
    condition: str,
    layout: str = "wide",
    tag_col: str = "tag",
    value_col: str = "value",
) -> Column:
    """Compile ``'component\\tag (<|>) value'`` to a boolean Column that is
    True where the machine is OFF (rows matching the condition are
    excluded from training/inference, model.py:109-123, 194-208).

    Raises ValueError on malformed input (parity with the reference's
    implicit contract — it sends the string to the service verbatim; we
    validate eagerly).
    """
    m = _PATTERN.match(condition)
    if not m:
        raise ValueError(
            f"off_condition must be 'component\\tag (<|>) value', got: {condition!r}"
        )
    tag, op, thresh = m.group("tag"), m.group("op"), float(m.group("threshold"))
    if layout == "wide":
        col = F.col(tag)
        return col > thresh if op == ">" else col < thresh
    if layout == "long":
        cmp_ = F.col(value_col) > thresh if op == ">" else F.col(value_col) < thresh
        return (F.col(tag_col) == tag) & cmp_
    raise ValueError(f"layout must be 'wide' or 'long', got {layout!r}")


def on_filter(
    condition: str,
    layout: str = "wide",
    tag_col: str = "tag",
    value_col: str = "value",
) -> Column:
    """Keep-side predicate: True where the machine is ON, i.e. NOT(off).

    A null gating-sensor value gives no evidence of off-time, so null is
    treated as ON (kept) — ``NOT coalesce(off, false)``.  Use this (not a
    bare ``~parse_off_condition``) to filter training/scoring rows, since
    SQL three-valued logic would otherwise drop null rows too.
    """
    off = parse_off_condition(condition, layout, tag_col, value_col)
    return ~F.coalesce(off, F.lit(False))
