"""Multimodal columns: binary payloads + typed metadata (north-star op).

Treats image/audio/video as opaque ``binary`` columns with a typed metadata
struct, processed with Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, partitioning, UDF signature, batch shape) is real and
tested; the actual codecs are STUBBED (this container ships no image/audio
libraries): ``decode_stub`` derives deterministic fake features from the
bytes, and ``decode_image``/``decode_audio`` raise NotImplementedError with
instructions, exactly as a deployment would swap in Pillow/torchaudio.

Scale design: mapInPandas streams Arrow batches — no per-row Python
round-trip, no driver collect; binary payloads never shuffle unless the
caller aggregates on derived features (which are tiny).  Partition count
follows the input files; heavy decode work scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - deployment hook
    """Swap in a real decoder (e.g. Pillow: Image.open(BytesIO(payload)))."""
    raise NotImplementedError(
        "image codecs are not available in this environment; install Pillow "
        "and replace multimodal.decode_image"
    )


def decode_audio(payload: bytes):  # pragma: no cover - deployment hook
    raise NotImplementedError(
        "audio codecs are not available in this environment; install "
        "soundfile/torchaudio and replace multimodal.decode_audio"
    )


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from raw bytes (testing stand-in
    for the codec + embedder): dim means over byte stripes, scaled to
    [0, 1]."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    out = []
    stripe = max(len(payload) // dim, 1)
    for i in range(dim):
        chunk = payload[i * stripe : (i + 1) * stripe] or payload[-stripe:]
        out.append(sum(chunk) / (255.0 * len(chunk)))
    return out


def extract_features(
    media: DataFrame, dim: int = 8, decoder=decode_stub
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out.

    ``decoder(payload) -> list[float]`` runs per row INSIDE the batch loop;
    swapping the stub for a real codec changes no Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: decoder(b, dim) if decoder is decode_stub
                        else decoder(b)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    derived from metadata duration — pure JVM sequence/explode; the actual
    frame grab is the stubbed decode step."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
