"""WebDataset tar-shard sink/source round trip (sources/webdataset.py)."""

from __future__ import annotations

import io
import json
import tarfile

import numpy as np

from amazon_lookout_for_equipment_python_sdk_spark.operators import multimodal as mm
from amazon_lookout_for_equipment_python_sdk_spark.sources import webdataset as wd


def _media_rows(n=12):
    rows = []
    for i in range(n):
        img = np.full((8, 8, 3), i * 20 % 255, dtype=np.uint8)
        rows.append((i, "image", bytearray(mm.encode_bmp(img)), None))
    return rows


def test_webdataset_round_trip(spark, tmp_path):
    df = spark.createDataFrame(_media_rows(), mm.MEDIA_SCHEMA)
    out = str(tmp_path / "wds")
    manifest = wd.write_webdataset(
        df, out, n_shards=4, ext_col=None, default_ext="bmp",
        meta_cols=["kind"],
    )
    man = manifest.collect()
    assert sum(r["n_samples"] for r in man) == 12
    assert all(r["n_bytes"] > 0 for r in man)

    back = wd.read_webdataset(spark, out)
    rows = {r["key"]: r for r in back.collect()}
    assert len(rows) == 12
    orig = {str(r[0]): bytes(r[2]) for r in _media_rows()}
    for k, r in rows.items():
        assert r["ext"] == "bmp"
        assert bytes(r["payload"]) == orig[k]
        assert json.loads(r["meta"]) == {"kind": "image"}


def test_webdataset_shards_are_reproducible(spark, tmp_path):
    """Same input -> byte-identical shards (mtime pinned, keys sorted,
    deterministic shard assignment)."""
    df = spark.createDataFrame(_media_rows(), mm.MEDIA_SCHEMA)
    outs = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        man = wd.write_webdataset(df, out, n_shards=3).collect()
        outs.append(
            {r["shard"]: open(r["path"], "rb").read() for r in man}
        )
    assert outs[0].keys() == outs[1].keys()
    for s in outs[0]:
        assert outs[0][s] == outs[1][s]


def test_webdataset_null_payload_writes_sidecar_only(spark, tmp_path):
    rows = [(1, "image", None, None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = str(tmp_path / "wds")
    man = wd.write_webdataset(df, out, meta_cols=["kind"]).collect()
    assert sum(r["n_samples"] for r in man) == 1
    names = []
    for r in man:
        with tarfile.open(r["path"]) as tf:
            names += [m.name for m in tf.getmembers()]
    assert names == ["1.json"]
    back = wd.read_webdataset(spark, out).collect()
    assert len(back) == 1 and back[0]["payload"] is None


def test_webdataset_tar_is_standard(spark, tmp_path):
    """Shards must be readable by any tar implementation — the whole point
    of the format.  Verify with a fresh stdlib read of raw bytes."""
    df = spark.createDataFrame(_media_rows(4), mm.MEDIA_SCHEMA)
    out = str(tmp_path / "wds")
    man = wd.write_webdataset(df, out, n_shards=1).collect()
    raw = open(man[0]["path"], "rb").read()
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        members = tf.getmembers()
    assert len(members) == 4
    assert all(m.mtime == 0 for m in members)


def test_write_webdataset_uri_out_dir(spark, tmp_path):
    """URI-schemed out_dirs route through the pyarrow.fs storage seam
    (r12 verdict #3): a file:// write is byte-identical to the
    plain-path write and reads back through read_webdataset."""
    df = spark.createDataFrame(_media_rows(6), mm.MEDIA_SCHEMA)
    loc = str(tmp_path / "loc")
    uri_dir = f"file://{tmp_path}/uri"
    wd.write_webdataset(df, loc, n_shards=2)
    man = wd.write_webdataset(df, uri_dir, n_shards=2).collect()
    assert all(r["path"].startswith("file://") for r in man)
    for name in ("shard-00000.tar", "shard-00001.tar"):
        la = open(str(tmp_path / "loc" / name), "rb").read()
        lb = open(str(tmp_path / "uri" / name), "rb").read()
        assert la == lb, f"{name} differs between local and file:// writes"
    back = wd.read_webdataset(spark, uri_dir)
    assert back.count() == 6
