"""Component schema system (SURVEY §1.1/§2.1 S1-S3).

Reference: ``lookoutequipment.schema`` (schema.py:23-183) — a dataset schema
is a JSON document ``{"Components": [{"ComponentName": str, "Columns":
[{"Name": str, "Type": "DATETIME"|"DOUBLE"}]}]}``; the first column of every
component is the DATETIME timestamp, all others DOUBLE; a component must
have at least one sensor beyond the timestamp (schema.py:163-167 raises
otherwise).  Schema inference reads only CSV headers (schema.py:53-54,
``nrows=1``) — the type rule is deterministic, so no data scan is needed.

Here the same document maps to/from Spark ``StructType``s, and inference
uses a limit-0 header read per component directory.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

DATETIME = "DATETIME"
DOUBLE = "DOUBLE"


@dataclass
class ComponentSchema:
    """One component: name + ordered field list (first field = timestamp)."""

    name: str
    fields: list[str] = field(default_factory=list)

    def validate(self) -> None:
        # parity: schema.py:163-167 — a component needs the timestamp plus
        # at least one sensor column
        if len(self.fields) < 2:
            raise ValueError(
                f"Component {self.name!r} must have at least 2 fields "
                f"(timestamp + 1 sensor), got {self.fields}"
            )

    def to_struct_type(self) -> T.StructType:
        self.validate()
        cols = [T.StructField(self.fields[0], T.TimestampType(), True)]
        cols += [T.StructField(f, T.DoubleType(), True) for f in self.fields[1:]]
        return T.StructType(cols)

    def to_components_entry(self) -> dict:
        self.validate()
        columns = [{"Name": self.fields[0], "Type": DATETIME}]
        columns += [{"Name": f, "Type": DOUBLE} for f in self.fields[1:]]
        return {"ComponentName": self.name, "Columns": columns}


def create_data_schema(component_fields_map: dict[str, list[str]]) -> str:
    """dict {component: [field, ...]} -> JSON schema doc (reference
    schema.py:100-146)."""
    comps = [
        ComponentSchema(name, list(fields)).to_components_entry()
        for name, fields in component_fields_map.items()
    ]
    return json.dumps({"Components": comps})


def create_data_schema_from_dir(root_dir: str, spark: SparkSession) -> str:
    """Walk ``root_dir`` — one sub-directory per component, CSVs inside —
    and harvest each component's columns from the CSV header (reference
    schema.py:23-60; header-only read).

    Uses a Spark header read with ``limit(0)`` so only file headers are
    touched regardless of file size.
    """
    components: dict[str, list[str]] = {}
    for entry in sorted(os.listdir(root_dir)):
        comp_dir = os.path.join(root_dir, entry)
        if not os.path.isdir(comp_dir):
            continue
        csvs = [f for f in sorted(os.listdir(comp_dir)) if f.endswith(".csv")]
        if not csvs:
            continue
        header_df = (
            spark.read.option("header", True)
            .csv(os.path.join(comp_dir, csvs[0]))
            .limit(0)
        )
        components[entry] = list(header_df.columns)
    if not components:
        raise ValueError(f"no component directories with CSVs under {root_dir!r}")
    return create_data_schema(components)


def create_data_schema_from_uri(root_uri: str, spark: SparkSession) -> str:
    """S2 — header-only schema inference over ANY Hadoop-supported
    filesystem URI (``s3a://bucket/prefix``, ``gs://``, ``hdfs://``,
    ``file:///``) — the reference's object-store variant
    (create_data_schema_from_s3_path, schema.py:62-98, via s3fs walk).

    Spark-native: the directory walk goes through the Hadoop FileSystem API
    (the same abstraction the executors use to read the data), so exactly
    the code path that works for ``file://`` in tests works for ``s3a://``
    on a cluster — no boto/s3fs dependency.  Headers are read with a
    ``limit(0)`` CSV scan per component, regardless of file size.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(root_uri)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        raise ValueError(f"no such location: {root_uri!r}")
    components: dict[str, list[str]] = {}
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        comp = st.getPath().getName()
        csvs = sorted(
            f.getPath().toString()
            for f in fs.listStatus(st.getPath())
            if f.getPath().getName().endswith(".csv")
        )
        if not csvs:
            continue
        header_df = (
            spark.read.option("header", True).csv(csvs[0]).limit(0)
        )
        components[comp] = list(header_df.columns)
    if not components:
        raise ValueError(f"no component directories with CSVs under {root_uri!r}")
    return create_data_schema(dict(sorted(components.items())))


def hadoop_dir_exists(spark: SparkSession, uri: str) -> bool:
    """True if ``uri`` resolves to a directory on its Hadoop FileSystem —
    the URI-scheme twin of ``os.path.isdir`` (works for ``file://``,
    ``s3a://``, ``hdfs://``, ...)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(conf)
    return bool(fs.exists(path) and fs.getFileStatus(path).isDirectory())


def parse_data_schema(schema_json: str) -> dict[str, ComponentSchema]:
    """JSON schema doc -> {component_name: ComponentSchema} (typed parse —
    the reference uses ``eval`` on schema strings, dataset.py:871; N4 says
    never do that)."""
    doc = json.loads(schema_json)
    out: dict[str, ComponentSchema] = {}
    for comp in doc["Components"]:
        cs = ComponentSchema(
            comp["ComponentName"], [c["Name"] for c in comp["Columns"]]
        )
        cs.validate()
        out[comp["ComponentName"]] = cs
    return out


def struct_types_from_schema(schema_json: str) -> dict[str, T.StructType]:
    """JSON schema doc -> per-component Spark StructType."""
    return {
        name: cs.to_struct_type() for name, cs in parse_data_schema(schema_json).items()
    }
