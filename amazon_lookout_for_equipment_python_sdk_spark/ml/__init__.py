"""MLlib-native anomaly model + evaluation (SURVEY §2.11 M1-M5)."""

from .pipeline import AnomalyDetector, ModelConfig  # noqa: F401
from .evaluation import ModelEvaluation  # noqa: F401
