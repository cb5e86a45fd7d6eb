"""WebDataset-style tar-shard sink + source for multimodal training data.

The de-facto large-scale training layout (WebDataset / img2dataset): samples
are packed into POSIX tar shards, one file per payload (``{key}.{ext}``)
plus a JSON sidecar (``{key}.json``), and training loaders stream shards
sequentially.  Public format: https://github.com/webdataset/webdataset —
implemented here with only stdlib ``tarfile``.

Scale design:
- **Write**: samples are assigned a deterministic shard (``key mod
  n_shards``), ONE repartition co-locates each shard, and each task
  streams its shard's rows through ``tarfile`` to the sink directory —
  payload bytes move through exactly one shuffle and never visit the
  driver.  Rows inside a shard are sorted by key so shard bytes are
  reproducible run-to-run (byte-identical with fixed mtime=0).
- **Read**: ``binaryFile`` source lists shards (parallelism = #shards,
  the intended WebDataset contract) and a ``mapInPandas`` untars payloads
  row-local.  At 100 TB, both directions scale with executors; writer
  output streams route through ``._fsio`` — plain paths keep local
  ``open()``, URI-schemed ``out_dir``s (``file://``, ``hdfs://``,
  object-store schemes) resolve via ``pyarrow.fs``, the executor-safe
  storage seam (r12 verdict #3).
"""

from __future__ import annotations

import io
import json
import tarfile
from collections.abc import Iterator

from . import _fsio

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("ext", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),
    ]
)


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "media_id",
    payload_col: str = "payload",
    ext_col: str | None = None,
    default_ext: str = "bin",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Pack ``df`` into ``n_shards`` WebDataset tar shards under
    ``out_dir``; returns the collected shard manifest as a DataFrame
    (shard, path, n_samples, n_bytes).

    Each sample writes ``{key}.{ext}`` (payload) and, when ``meta_cols``
    is given, ``{key}.json`` (the selected columns as a JSON object).
    Shard assignment is ``pmod(hash64(key), n_shards)`` — deterministic,
    so re-runs produce identical shard membership; mtime is pinned to 0
    for byte-reproducible shards."""
    _fsio.ensure_dir(out_dir)
    meta_cols = meta_cols or []
    cols = [
        F.col(key_col).cast("string").alias("_key"),
        F.col(payload_col).alias("_payload"),
        (F.col(ext_col) if ext_col else F.lit(default_ext)).alias("_ext"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("_shard"),
    ]
    if meta_cols:
        cols.append(F.to_json(F.struct(*meta_cols)).alias("_meta"))
    staged = df.select(*cols)

    has_meta = bool(meta_cols)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # one group == one shard (applyInPandas on _shard); a shard must
        # fit one task — the standard WebDataset contract (size shards
        # via n_shards, ~1 GB each in production)
        shard_id = int(key[0])
        pdf = pdf.sort_values("_key", kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for i in range(len(pdf)):
                k = pdf["_key"].iloc[i]
                payload = pdf["_payload"].iloc[i]
                files = []
                if payload is not None:
                    files.append(
                        (f"{k}.{pdf['_ext'].iloc[i]}", bytes(payload))
                    )
                if has_meta and pdf["_meta"].iloc[i] is not None:
                    files.append(
                        (f"{k}.json", pdf["_meta"].iloc[i].encode("utf-8"))
                    )
                for name, data in files:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(data))
                if files:  # a row with no payload and no sidecar wrote
                    n += 1  # nothing — the manifest must not claim it
        path = _fsio.join_path(out_dir, f"shard-{shard_id:05d}.tar")
        payload_bytes = buf.getvalue()
        with _fsio.open_output(path) as f:
            f.write(payload_bytes)
        return pd.DataFrame(
            {
                "shard": [shard_id],
                "path": [path],
                "n_samples": [n],
                "n_bytes": [len(payload_bytes)],
            }
        )

    manifest = staged.groupBy("_shard").applyInPandas(
        pack, schema=MANIFEST_SCHEMA
    )
    # materialize now (the write is the side effect); manifest is tiny
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Stream WebDataset shards back into (key, ext, payload, meta) rows.

    ``binaryFile`` lists ``*.tar`` (one input partition per shard — the
    WebDataset parallelism contract); untarring is row-local.  The JSON
    sidecar, when present, lands in ``meta`` as its raw string."""
    shards = spark.read.format("binaryFile").load(
        _fsio.join_path(path, "*.tar")
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.rpartition(".")
                        data = tf.extractfile(m).read()
                        s = samples.setdefault(
                            key, {"payload": None, "ext": None, "meta": None}
                        )
                        if ext == "json":
                            s["meta"] = data.decode("utf-8")
                        else:
                            s["payload"], s["ext"] = data, ext
                if samples:
                    yield pd.DataFrame(
                        {
                            "key": list(samples),
                            "ext": [s["ext"] for s in samples.values()],
                            "payload": [
                                s["payload"] for s in samples.values()
                            ],
                            "meta": [s["meta"] for s in samples.values()],
                        }
                    )

    return shards.select("content").mapInPandas(unpack, schema=SAMPLE_SCHEMA)
