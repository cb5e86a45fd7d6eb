"""Datetime scalar utilities (SURVEY F2-F5, W4).

ISO-8601 duration codes (``PT5M`` style) are first-class config in the
reference: sampling rates PT1S..PT1H (model.py:157-158), upload frequencies
PT5M..PT1H (dataset.py:486-492, scheduler.py:99), decoded with string
slicing there; here they become seconds / Spark interval strings.

Timestamp string formats used by the reference file contracts
(dataset.py:163, 303; scheduler.py:146-151) are exposed as Spark
``date_format`` patterns.
"""

from __future__ import annotations

import re

_DUR = re.compile(r"^PT(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?$")

#: reference timestamp-string formats -> Spark date_format patterns
TIMESTAMP_FORMATS = {
    # training CSV format %Y-%m-%dT%H:%M:%S.%f (dataset.py:163)
    "training_csv": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    # inference file-name formats (scheduler.py:146-151)
    "yyyyMMddHHmmss": "yyyyMMddHHmmss",
    "yyyy-MM-dd-HH-mm-ss": "yyyy-MM-dd-HH-mm-ss",
    # EPOCH handled via unix_timestamp()
}


def iso8601_duration_to_seconds(code: str) -> int:
    """``'PT5M'`` -> 300 (reference decodes with ``code[2:][:-1]``,
    scheduler.py:99; we parse the full PTnHnMnS grammar)."""
    m = _DUR.match(code.strip().upper())
    if not m or not any(m.groups()):
        raise ValueError(f"not an ISO-8601 time duration: {code!r}")
    h, mi, s = (int(g) if g else 0 for g in m.groups())
    return h * 3600 + mi * 60 + s


def seconds_to_interval_string(seconds: int) -> str:
    """Seconds -> Spark interval string ('300 seconds') for window()/trigger."""
    return f"{int(seconds)} seconds"


def tz_offset_string(offset_minutes: int) -> str:
    """Minutes east of UTC -> ``'+HH:MM'`` (reference scheduler.py:108-118
    builds the same from pytz)."""
    sign = "+" if offset_minutes >= 0 else "-"
    mins = abs(int(offset_minutes))
    return f"{sign}{mins // 60:02d}:{mins % 60:02d}"


_TZ_OFFSET = re.compile(r"^([+-])(\d{2}):(\d{2})$")


def parse_tz_offset_minutes(offset: str) -> int:
    """``'+HH:MM'`` -> signed minutes east of UTC (inverse of
    :func:`tz_offset_string`; the InputTimeZoneOffset wire format,
    reference scheduler.py:385-386)."""
    m = _TZ_OFFSET.match(offset.strip())
    if not m:
        raise ValueError(f"timezone offset must be '+HH:MM' or '-HH:MM', got {offset!r}")
    sign = 1 if m.group(1) == "+" else -1
    return sign * (int(m.group(2)) * 60 + int(m.group(3)))
