"""Model-based document quality filtering — the classifier leg of the
LLM-corpus quality stack (heuristics live in operators/text.py; CCNet's
LM-perplexity leg in operators/lm.py).

Production pipelines (fastText-style: GPT-3's WebText classifier, LLaMA's
Wikipedia-reference filter) train a linear classifier on a small labeled
set and score the full crawl.  Spark-first shape: features are the
existing JVM-side quality statistics (token counts, type-token ratio,
stopword ratio, repetition) assembled into an MLlib vector; training is
distributed L-BFGS logistic regression (one MLlib job); scoring is a
broadcast of the (tiny) coefficient vector applied as a pure codegen
dot-product — NO MLlib transform and no UDF on the 100 TB scoring path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import (
    bpe_token_count,
    stopword_count,
    token_count,
    tokens,
)

#: feature extractors, each a pure-codegen Column over the text
_FEATURES: dict[str, "object"] = {}


def _feat_cols(text: Column) -> dict[str, Column]:
    n_tok = token_count(text)
    toks = tokens(text)
    safe = F.greatest(n_tok, F.lit(1))
    return {
        "log_n_tokens": F.log1p(n_tok.cast("double")),
        "type_token_ratio": (
            F.size(F.array_distinct(toks)).cast("double") / safe
        ),
        "stopword_ratio": stopword_count(text).cast("double") / safe,
        "avg_token_len": (
            (F.length(text) - (n_tok - 1)).cast("double") / safe
        ),
        "bpe_per_ws_token": bpe_token_count(text).cast("double") / safe,
    }


FEATURE_NAMES = [
    "log_n_tokens",
    "type_token_ratio",
    "stopword_ratio",
    "avg_token_len",
    "bpe_per_ws_token",
]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the classifier's feature columns (all whole-stage codegen)."""
    cols = _feat_cols(F.col(text_col))
    return df.select(*df.columns, *[cols[n].alias(n) for n in FEATURE_NAMES])


class QualityClassifier:
    """Logistic-regression quality scorer.

    ``fit`` runs MLlib's distributed L-BFGS on a LABELED sample (small by
    construction — labels are human/heuristic); the learned model is just
    ``coefficients`` + ``intercept`` (floats, serializable).  ``score``
    applies sigmoid(w.x + b) as plain Column arithmetic, so the full-
    corpus pass stays in codegen with the model constant-folded — the
    standard deploy shape for a linear filter at 100 TB.
    """

    def __init__(self, coefficients: list[float] | None = None, intercept: float = 0.0):
        self.coefficients = coefficients
        self.intercept = intercept

    def fit(
        self, labeled: DataFrame, label_col: str = "label", text_col: str = "text"
    ) -> "QualityClassifier":
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import VectorAssembler

        feats = quality_features(labeled, text_col)
        vec = VectorAssembler(
            inputCols=FEATURE_NAMES, outputCol="_features"
        ).transform(feats)
        lr = LogisticRegression(
            featuresCol="_features",
            labelCol=label_col,
            maxIter=100,
            regParam=1e-4,
            standardization=True,
        )
        model = lr.fit(vec)
        self.coefficients = [float(c) for c in model.coefficients]
        self.intercept = float(model.intercept)
        return self

    def score(
        self, df: DataFrame, text_col: str = "text", out_col: str = "quality_prob"
    ) -> DataFrame:
        if self.coefficients is None:
            raise ValueError("fit() first (or construct with coefficients)")
        cols = _feat_cols(F.col(text_col))
        z = F.lit(float(self.intercept))
        for name, w in zip(FEATURE_NAMES, self.coefficients):
            z = z + F.lit(float(w)) * cols[name]
        return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))

    def filter_quality(
        self, df: DataFrame, threshold: float = 0.5, text_col: str = "text"
    ) -> DataFrame:
        """Keep documents the model scores above ``threshold``."""
        return (
            self.score(df, text_col)
            .filter(F.col("quality_prob") >= threshold)
            .drop("quality_prob")
        )

    def to_payload(self) -> dict:
        return {
            "features": FEATURE_NAMES,
            "coefficients": self.coefficients,
            "intercept": self.intercept,
        }

    @classmethod
    def from_payload(cls, payload: dict) -> "QualityClassifier":
        if payload.get("features") != FEATURE_NAMES:
            raise ValueError("payload feature set does not match this version")
        return cls(payload["coefficients"], payload["intercept"])
