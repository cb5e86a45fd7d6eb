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

__version__ = "0.2.0"

# Ship this package's Python kernels BY VALUE in task closures.
# cloudpickle serializes module-level functions by REFERENCE (the worker
# re-imports them), so any harness that makes the package importable only
# in the driver process — sys.path.insert from an arbitrary cwd, the
# external driver's shape — gets ModuleNotFoundError on executors for
# every kernel that closes over a module-level helper (the
# applyInPandasWithState state kernels, codec functions, ...).  Parent
# registration covers every submodule (cloudpickle resolves by name
# prefix), the kernels depend only on worker-importable third-party
# modules (pandas/numpy) and their arguments, and pickling cost is paid
# once per UDF per query.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - cloudpickle without the API
    pass

from .session import get_spark  # noqa: F401

# --- reference-parity surface (lookoutequipment __init__.py:29-55) ----------
# Every capability a reference user calls through its 18 public names has a
# Spark-native counterpart exported here (AWS-client plumbing like
# upload_file_to_s3 has no counterpart by design — Spark writes straight to
# the object store, SURVEY S10).
from .schema import (  # noqa: F401
    create_data_schema,
    create_data_schema_from_dir,
    create_data_schema_from_uri,
)
from .sources import Catalog  # noqa: F401  (list/load/create/ingest/delete)
from .ml import (  # noqa: F401
    AnomalyDetector,  # LookoutEquipmentModel: train/score, made local
    ModelConfig,
    ModelEvaluation,  # LookoutEquipmentAnalysis
    model_metrics_json,
    ranges_from_model_metrics,
)
from .streaming import (  # noqa: F401
    InferenceScheduler,  # LookoutEquipmentScheduler
    SchedulerConfig,
    build_inspection_report,  # LookoutEquipmentSchedulerInspector
    export_report_to_html,
    generate_replay_data,
    prepare_inference_data,
)
from .plot import (  # noqa: F401
    TimeSeriesVisualization,
    plot_feature_importance,  # plot_event_barh
    plot_histogram_comparison,
    plot_histogram_grid,
)
from .operators.histogram import compute_bin_edges  # noqa: F401

#: reference name for the object-store schema scan (schema.py:62-98); ours
#: accepts any Hadoop filesystem URI (s3a://, gs://, hdfs://, file://)
create_data_schema_from_s3_path = create_data_schema_from_uri
