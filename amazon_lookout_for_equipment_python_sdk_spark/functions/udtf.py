"""Python UDTF surface (SURVEY §2.12): arrow-era table functions.

Spark's Python UDTFs (3.5+) return MULTIPLE rows per input — the
lateral-view shape that scalar UDFs can't express.  One real table
function for the corpus layer: sentence splitting with offsets (the
pre-chunking step when chunk boundaries must respect sentences).

The split itself is deliberately regex-simple (., !, ? + whitespace) and
deterministic; swap the `_split` seam for a real segmenter (pysbd etc.)
in deployments that ship one — the UDTF plumbing (registration, lateral
join, schema) is the engine surface being provided.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[^.!?]+[.!?]?")


def _split(text: str):
    for m in _SENT_RE.finditer(text or ""):
        raw = m.group()
        s = raw.strip()
        if s:
            # offsets of the STRIPPED sentence so text[start:end] == s
            lead = len(raw) - len(raw.lstrip())
            start = m.start() + lead
            yield s, start, start + len(s)


@udtf(returnType="sent_id int, sentence string, start int, end int")
class SplitSentences:
    """Explode a document into sentences with char offsets.

    Usage::

        from pyspark.sql.functions import lit
        SplitSentences(lit("One. Two!")).show()
        # or registered for SQL lateral joins:
        spark.udtf.register("split_sentences", SplitSentences)
        spark.sql("SELECT d.doc_id, s.* FROM docs d, "
                  "LATERAL split_sentences(d.text) s")
    """

    def eval(self, text: str):
        for i, (s, a, b) in enumerate(_split(text)):
            yield i, s, a, b


# --- grouped-agg pandas UDAF (the UDAF leg of §2.12) ------------------------


def weighted_median_udaf():
    """Arrow grouped-agg UDAF: weighted lower median — the aggregation
    shape built-ins can't express (percentile_approx has no weights).

    Returns a pandas_udf usable in ``groupBy().agg()``; per group the
    whole (value, weight) slice arrives as pandas Series (Arrow batch,
    not row-at-a-time).  Deterministic: sort by value, take the first
    value whose cumulative weight reaches half the total."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmedian(v: pd.Series, w: pd.Series) -> float:
        if len(v) == 0:
            return float("nan")
        order = np.lexsort((np.arange(len(v)), v.to_numpy()))
        vv = v.to_numpy()[order]
        ww = w.to_numpy()[order].astype(np.float64)
        cum = np.cumsum(ww)
        total = cum[-1]
        idx = int(np.searchsorted(cum, total / 2.0, side="left"))
        return float(vv[min(idx, len(vv) - 1)])

    return wmedian
