"""Schema system tests — reference validation parity (schema.py:163-181)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from amazon_lookout_for_equipment_python_sdk_spark import schema as sch


def test_create_data_schema_roundtrip():
    doc = sch.create_data_schema(
        {"pump": ["Timestamp", "s1", "s2"], "motor": ["Timestamp", "m1"]}
    )
    parsed = json.loads(doc)
    assert [c["ComponentName"] for c in parsed["Components"]] == ["pump", "motor"]
    pump = parsed["Components"][0]["Columns"]
    assert pump[0] == {"Name": "Timestamp", "Type": "DATETIME"}
    assert pump[1] == {"Name": "s1", "Type": "DOUBLE"}

    back = sch.parse_data_schema(doc)
    assert back["pump"].fields == ["Timestamp", "s1", "s2"]

    st = sch.struct_types_from_schema(doc)["pump"]
    assert st.fields[0].dataType == T.TimestampType()
    assert all(f.dataType == T.DoubleType() for f in st.fields[1:])


def test_component_needs_two_fields():
    # parity: reference raises for timestamp-only components (schema.py:163-167)
    with pytest.raises(ValueError, match="at least 2 fields"):
        sch.create_data_schema({"pump": ["Timestamp"]})


def test_schema_from_dir(spark, tmp_path):
    for comp, cols in [("pump", "Timestamp,s1,s2"), ("motor", "Timestamp,m1")]:
        d = tmp_path / comp
        d.mkdir()
        (d / f"{comp}.csv").write_text(f"{cols}\n2024-01-01T00:00:00.000000,1.0"
                                       + (",2.0" if comp == "pump" else "") + "\n")
    doc = sch.create_data_schema_from_dir(str(tmp_path), spark)
    parsed = sch.parse_data_schema(doc)
    assert set(parsed) == {"pump", "motor"}
    assert parsed["pump"].fields == ["Timestamp", "s1", "s2"]


def test_schema_from_dir_empty_raises(spark, tmp_path):
    os.makedirs(tmp_path / "empty_comp", exist_ok=True)
    with pytest.raises(ValueError, match="no component directories"):
        sch.create_data_schema_from_dir(str(tmp_path), spark)


def test_schema_from_uri_hadoop_fs(spark, tmp_path):
    """S2 — the object-store path walks the Hadoop FileSystem API; a
    file:// URI exercises the exact code path s3a:// uses on a cluster
    (reference create_data_schema_from_s3_path, schema.py:62-98)."""
    for comp, cols in [("pump", "Timestamp,s1,s2"), ("motor", "Timestamp,m1")]:
        d = tmp_path / comp
        d.mkdir()
        (d / f"{comp}.csv").write_text(
            f"{cols}\n2024-01-01T00:00:00.000000,1.0"
            + (",2.0" if comp == "pump" else "")
            + "\n"
        )
    doc = sch.create_data_schema_from_uri(f"file://{tmp_path}", spark)
    parsed = sch.parse_data_schema(doc)
    assert set(parsed) == {"pump", "motor"}
    assert parsed["pump"].fields == ["Timestamp", "s1", "s2"]
    assert parsed["motor"].fields == ["Timestamp", "m1"]
    with pytest.raises(ValueError, match="no such location"):
        sch.create_data_schema_from_uri(f"file://{tmp_path}/missing", spark)
