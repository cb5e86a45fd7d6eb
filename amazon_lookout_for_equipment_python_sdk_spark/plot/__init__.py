"""Presentation layer (SURVEY §2.13): reference plot.py / evaluation-plot
parity over Spark-computed frames, rendered to dependency-free SVG."""

from .render import Band, Panel, Series  # noqa: F401
from .viz import (  # noqa: F401
    TimeSeriesVisualization,
    feature_importance_frame,
    plot_feature_importance,
    plot_histogram_comparison,
    plot_histogram_grid,
)
