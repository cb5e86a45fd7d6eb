"""MLlib-native anomaly model + evaluation (SURVEY §2.11 M1-M5)."""

from .pipeline import AnomalyDetector, ModelConfig  # noqa: F401
from .evaluation import (  # noqa: F401
    ModelEvaluation,
    model_metrics_json,
    ranges_from_model_metrics,
)
