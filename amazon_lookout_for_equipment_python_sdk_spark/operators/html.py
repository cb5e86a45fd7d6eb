"""HTML -> text extraction with boilerplate removal (the crawl-to-corpus
step every web-scale training pipeline starts with; trafilatura/jusText
class of heuristics, stdlib-only).

Design: parsing is row-local Python (stdlib ``html.parser`` — real HTML is
not regex-parseable, so this is an honest Arrow-batched UDF, not a codegen
path), boilerplate scoring is the published jusText/Boilerpipe heuristic
family: segment the DOM into block-level text segments, score each by
length, link density, and stopword density, keep GOOD segments.

Scale: ``mapInPandas`` over the raw-HTML column — one pass, zero shuffle;
the output is ordinary text the rest of the corpus layer (quality filter,
dedup, chunking, packing) consumes unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: block-level elements that delimit text segments
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "header", "footer",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "blockquote",
    "pre", "br", "tr", "ul", "ol", "table", "nav", "aside", "figure",
}
#: subtrees dropped entirely
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for "
    "with as on at by from not but have has had i you he she they we".split()
)


class _SegmentParser(HTMLParser):
    """Collect (text, n_chars, n_link_chars) per block-level segment."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[tuple[str, int]] = []  # (text, link_chars)
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._link_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.segments.append((text, self._link_chars))
        self._buf, self._link_chars = [], 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._link_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_segments(html: str) -> list[dict]:
    """Parse one HTML document into scored block segments.

    Score heuristics (jusText/Boilerpipe family):
    - ``link_density`` = chars inside <a> / total chars;
    - ``stop_density`` = stopword tokens / tokens;
    - ``good`` = len >= 25 chars AND link_density < 0.33 AND
      (stop_density >= 0.18 OR len >= 120) — short link-heavy
      functional-word-free segments are navigation/boilerplate."""
    p = _SegmentParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:  # noqa: BLE001 — one broken doc must not kill a task
        pass
    out = []
    for text, link_chars in p.segments:
        toks = text.lower().split()
        n_stop = sum(1 for t in toks if t in _STOPWORDS)
        link_density = link_chars / max(len(text), 1)
        stop_density = n_stop / max(len(toks), 1)
        good = (
            len(text) >= 25
            and link_density < 0.33
            and (stop_density >= 0.18 or len(text) >= 120)
        )
        out.append(
            {
                "text": text,
                "link_density": link_density,
                "stop_density": stop_density,
                "good": good,
            }
        )
    return out


def html_to_text(html: str) -> str:
    """The one-string form: good segments joined by newlines."""
    return "\n".join(s["text"] for s in extract_segments(html) if s["good"])


HTML_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_segments", T.IntegerType(), False),
        T.StructField("n_good", T.IntegerType(), False),
        T.StructField("boilerplate_ratio", T.DoubleType(), True),
    ]
)


def html_extract_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-scale extraction: (doc_id, text, n_segments, n_good,
    boilerplate_ratio) per document; ``text`` is NULL when nothing
    survives.  Row-local in Arrow batches, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, nseg, ngood, ratio = [], [], [], [], []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                segs = extract_segments(html if html is not None else "")
                good = [s for s in segs if s["good"]]
                ids.append(did)
                texts.append(
                    "\n".join(s["text"] for s in good) if good else None
                )
                nseg.append(len(segs))
                ngood.append(len(good))
                bad_chars = sum(
                    len(s["text"]) for s in segs if not s["good"]
                )
                all_chars = sum(len(s["text"]) for s in segs)
                ratio.append(
                    bad_chars / all_chars if all_chars else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "n_segments": nseg,
                    "n_good": ngood,
                    "boilerplate_ratio": ratio,
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(html_col)
    ).mapInPandas(run, schema=HTML_TEXT_SCHEMA)
