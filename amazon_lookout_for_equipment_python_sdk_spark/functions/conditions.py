"""Off-condition mini-DSL (SURVEY P5/M4).

The reference accepts a machine-off condition string
``'component\\tag < threshold'`` or ``'component\\tag > threshold'`` and
excludes matching rows from training/scoring (reference model.py:109-123,
194-208: the DSL is exactly one comparison of one ``component\\tag`` against
a float).  We compile it to a Spark Column predicate.

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
    True where the machine is ON (the reference keeps rows where the
    condition holds; model.py:109-123).

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
