"""Scalar function layer (SURVEY §2.8): datetime utilities, duration codes,
and the off-condition mini-DSL."""

from .conditions import on_filter, parse_off_condition  # noqa: F401
from .datetime_utils import (  # noqa: F401
    iso8601_duration_to_seconds,
    seconds_to_interval_string,
    tz_offset_string,
)
