"""PySpark-native analytics engine with the data-processing capabilities of
the ``lookoutequipment`` SDK (aws-samples/amazon-lookout-for-equipment-python-sdk).

The reference (see /root/reference, SURVEY.md) is a pandas/numpy SDK for
multivariate industrial time-series anomaly detection whose heavy compute runs
in a managed service.  This package re-implements every data-processing
semantic natively on Spark:

- ``schema``      — component schema model (JSON <-> StructType), validation
- ``datamodel``   — wide<->long time-series pivots
- ``sources``     — CSV/Parquet/JSON/text readers and the per-component /
                    per-slot CSV sinks
- ``operators``   — resample, forward-fill, rolling windows, histograms,
                    Wasserstein ranking, interval/range joins, run compaction,
                    dedup, similarity search, text analysis
- ``functions``   — scalar layer: timestamp formats, ISO-8601 durations,
                    slot flooring, the off-condition mini-DSL
- ``ml``          — MLlib anomaly pipeline (the reference's remote model,
                    made local and explicit)
- ``streaming``   — Structured Streaming scheduler semantics

Everything is expressed with the DataFrame/SQL API so Catalyst plans it;
Pandas UDFs appear only where built-ins genuinely cannot express the
semantics.  Designed for multi-executor scale (partition-parallel by tag /
component; broadcast dimensions; bucketed interval joins).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
