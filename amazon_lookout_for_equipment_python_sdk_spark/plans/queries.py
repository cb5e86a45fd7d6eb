"""Aggregated query registry — importing each layer registers its queries."""

from __future__ import annotations

from .registry import ORACLE_SQL, QUERIES, load  # noqa: F401
from . import timeseries_q  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import corpus_q  # noqa: F401,E402
