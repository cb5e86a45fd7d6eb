"""Property-based tests (SURVEY §5.2: slot-logic property checks) over the
pure functions — no SparkSession needed, so hypothesis can run hundreds of
cases cheaply."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_lookout_for_equipment_python_sdk_spark.functions.datetime_utils import (
    iso8601_duration_to_seconds,
    parse_tz_offset_minutes,
    tz_offset_string,
)
from amazon_lookout_for_equipment_python_sdk_spark.streaming.scheduler import (
    next_wakeup,
    slot_bounds_for,
)

_TS = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2100, 1, 1)
)
_FREQ = st.sampled_from([5, 10, 15, 30, 60])


@given(ts=_TS, freq=_FREQ)
@settings(max_examples=300)
def test_every_instant_in_exactly_one_slot(ts, freq):
    start, end = slot_bounds_for(ts, freq)
    # containment
    assert start <= ts <= end + timedelta(seconds=1)
    assert start <= ts  # floor never exceeds
    # width and alignment (reference scheduler.py:153-164)
    assert end - start == timedelta(minutes=freq, seconds=-1)
    assert start.minute % freq == 0 and start.second == 0
    # idempotent: any instant inside the slot maps back to the same slot
    s2, e2 = slot_bounds_for(start, freq)
    assert (s2, e2) == (start, end)
    s3, e3 = slot_bounds_for(end, freq)
    assert (s3, e3) == (start, end)


@given(ts=_TS, freq=_FREQ)
@settings(max_examples=200)
def test_next_wakeup_is_next_boundary(ts, freq):
    w = next_wakeup(ts, freq)
    assert w > ts
    assert (w - ts) <= timedelta(minutes=freq)
    assert w.minute % freq == 0 and w.second == 0 and w.microsecond == 0


@given(
    h=st.integers(min_value=0, max_value=99),
    m=st.integers(min_value=0, max_value=99),
    s=st.integers(min_value=0, max_value=99),
)
@settings(max_examples=200)
def test_iso8601_duration_total(h, m, s):
    parts = (f"{h}H" if h else "") + (f"{m}M" if m else "") + (f"{s}S" if s else "")
    if not parts:
        return
    assert iso8601_duration_to_seconds(f"PT{parts}") == h * 3600 + m * 60 + s


@given(mins=st.integers(min_value=-14 * 60, max_value=14 * 60))
@settings(max_examples=200)
def test_tz_offset_roundtrip(mins):
    assert parse_tz_offset_minutes(tz_offset_string(mins)) == mins


# --- PNG codec: decode(encode(img)) == img for every filter type ------------


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    ft=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, ft, seed):
    import numpy as np

    from amazon_lookout_for_equipment_python_sdk_spark.operators import (
        multimodal as mm,
    )

    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    np.testing.assert_array_equal(
        mm.decode_image(mm.encode_png(img, filter_type=ft)), img
    )


# --- redaction is idempotent: replacement tokens never re-match -------------


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
def test_redaction_idempotent_property(text):
    import re

    from amazon_lookout_for_equipment_python_sdk_spark.operators.corpus import (
        REDACTION_RULES,
    )

    def redact(s: str) -> str:
        for pat, repl in REDACTION_RULES:
            s = re.sub(pat, repl, s)
        return s

    once = redact(text)
    assert redact(once) == once
