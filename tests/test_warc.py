"""WARC/WET source + sink (sources/warc.py): round-trip, determinism,
malformed-record tolerance + resync, gzip/plain mix, HTTP body split."""

from __future__ import annotations

import glob
import gzip
import hashlib
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.sources import warc as W


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame(
        {
            "url": [f"https://example.org/page/{i}" for i in range(40)],
            "text": [
                f"document {i} body with some words " + "x" * (i % 7)
                for i in range(40)
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_round_trip_wet(spark, docs_df, tmp_path):
    out = str(tmp_path / "wet")
    manifest = W.write_warc(docs_df, out, n_shards=4)
    m = {r["shard"]: r for r in manifest.collect()}
    assert sorted(m) == [0, 1, 2, 3]
    assert sum(r["n_records"] for r in m.values()) == 40

    allr = W.read_warc(spark, out).collect()
    # each shard opens with a warcinfo record (real WET layout)
    assert len(allr) == 44
    assert sum(r["record_type"] == "warcinfo" for r in allr) == 4
    rows = [r for r in allr if r["record_type"] == "conversion"]
    assert len(rows) == 40
    assert all(r["error"] is None for r in rows)
    assert all(r["content_type"] == "text/plain" for r in rows)
    got = {
        r["target_uri"]: bytes(r["payload"]).decode() for r in rows
    }
    want = {
        r["url"]: r["text"] for r in docs_df.collect()
    }
    assert got == want


def test_write_is_deterministic(spark, docs_df, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    W.write_warc(docs_df, a, n_shards=3)
    W.write_warc(docs_df, b, n_shards=3)
    fa = sorted(glob.glob(os.path.join(a, "*")))
    fb = sorted(glob.glob(os.path.join(b, "*")))
    assert [os.path.basename(p) for p in fa] == [
        os.path.basename(p) for p in fb
    ]
    for pa, pb in zip(fa, fb):
        ha = hashlib.md5(open(pa, "rb").read()).hexdigest()
        hb = hashlib.md5(open(pb, "rb").read()).hexdigest()
        assert ha == hb, f"shard bytes differ: {pa}"


def test_plain_and_gz_mix(spark, docs_df, tmp_path):
    out = str(tmp_path / "mix")
    W.write_warc(docs_df.limit(10), out, n_shards=1, gzipped=True)
    W.write_warc(
        docs_df.limit(10), out + "2", n_shards=1, gzipped=False
    )
    os.rename(
        glob.glob(out + "2/*.warc")[0],
        os.path.join(out, "plain-shard.warc"),
    )
    back = W.read_warc(spark, out, record_types=["conversion"])
    assert back.count() == 20
    assert back.filter(F.col("error").isNotNull()).count() == 0


def test_malformed_record_resync(spark, tmp_path):
    """A lying Content-Length mid-shard yields ONE error row and the
    parser resyncs to the next record instead of sinking the shard."""
    good1 = W._record_bytes(
        "conversion", "https://a", "2024-01-01T00:00:00Z",
        "text/plain", b"first", "<urn:uuid:1>",
    )
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://bad\r\n"
        b"Content-Length: notanumber\r\n"
        b"\r\n"
        b"junk junk\r\n\r\n"
    )
    good2 = W._record_bytes(
        "conversion", "https://b", "2024-01-01T00:00:00Z",
        "text/plain", b"second", "<urn:uuid:2>",
    )
    shard = tmp_path / "broken.warc"
    shard.write_bytes(good1 + bad + good2)
    rows = W.read_warc(spark, str(tmp_path)).collect()
    errs = [r for r in rows if r["error"] is not None]
    oks = sorted(
        (r for r in rows if r["error"] is None),
        key=lambda r: r["target_uri"],
    )
    assert len(errs) == 1 and "Content-Length" in errs[0]["error"]
    assert [bytes(r["payload"]) for r in oks] == [b"first", b"second"]


def test_garbage_prefix_resync(spark, tmp_path):
    good = W._record_bytes(
        "conversion", "https://ok", "2024-01-01T00:00:00Z",
        "text/plain", b"payload", "<urn:uuid:3>",
    )
    shard = tmp_path / "garbage.warc"
    shard.write_bytes(b"GARBAGE BYTES HERE\n" + good)
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    errs = [r for r in rows if r["error"]]
    assert len(errs) == 1 and "magic" in errs[0]["error"]
    ok = next(r for r in rows if not r["error"])
    assert bytes(ok["payload"]) == b"payload"


def test_truncated_record(spark, tmp_path):
    rec = W._record_bytes(
        "conversion", "https://t", "2024-01-01T00:00:00Z",
        "text/plain", b"full payload bytes", "<urn:uuid:4>",
    )
    shard = tmp_path / "trunc.warc"
    shard.write_bytes(rec[: len(rec) - 12])
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert "overruns" in rows[0]["error"]


def test_http_body_split(spark):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html>hi</html>"
    )
    assert W.http_payload_body(http) == b"<html>hi</html>"
    assert W.http_payload_body(b"bare text") == b"bare text"
    assert W.http_payload_body(None) is None
    df = spark.createDataFrame(
        pd.DataFrame({"payload": [http, b"bare", None]})
    )
    got = [
        bytes(r["body"]) if r["body"] is not None else None
        for r in W.with_http_body(df).collect()
    ]
    assert got == [b"<html>hi</html>", b"bare", None]


def test_response_flavor_round_trip(spark, tmp_path):
    """Raw-capture WARC: HTTP bytes in, http_payload_body extracts the
    HTML, html_to_text completes the crawl-to-text chain."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.html import (
        html_to_text,
    )

    body_text = (
        "Hello crawl world, this is the main content of the page "
        "and it has enough words to pass the boilerplate filter."
    )
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        f"<html><body><p>{body_text}</p></body></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["https://x.org/p"], "raw": [http.encode()]}
        )
    )
    out = str(tmp_path / "resp")
    W.write_warc(
        df, out, n_shards=1, payload_col="raw",
        record_type="response",
        content_type="application/http; msgtype=response",
    )
    back = W.with_http_body(
        W.read_warc(spark, out, record_types=["response"])
    )
    row = back.collect()[0]
    assert row["record_type"] == "response"
    text = html_to_text(bytes(row["body"]).decode())
    assert body_text in text


def test_incremental_parser_chunk_invariance():
    """Feeding the stream in tiny chunks yields exactly the one-shot
    rows — records, headers, and resync markers may split anywhere."""
    recs = b"".join(
        W._record_bytes(
            "conversion", f"https://c/{i}", "2024-01-01T00:00:00Z",
            "text/plain", b"payload-%d" % i, f"<urn:uuid:{i}>",
        )
        for i in range(20)
    )
    stream = b"GARBAGE\n" + recs[:100] + b"XXJUNKXX\n" + recs
    want = W._parse_records("s", stream)
    for size in (1, 3, 7, 64, 1000):
        p = W._RecordParser("s")
        got = []
        for i in range(0, len(stream), size):
            got.extend(p.feed(stream[i : i + size]))
        got.extend(p.finish())
        assert got == want, f"chunk size {size} diverged"
    # ONE error row for the whole garbage prefix (not one per chunk);
    # the header fragment + junk merge into the next record's header
    # block (tolerant last-header-wins) so all 20 payloads survive
    errs = [r for r in want if r["error"]]
    oks = [r for r in want if not r["error"]]
    assert sorted(bytes(r["payload"]) for r in oks) == sorted(
        b"payload-%d" % i for i in range(20)
    )
    assert len(errs) == 1 and "magic" in errs[0]["error"], errs


def test_incremental_parser_buffer_bounded():
    """Peak parse buffer stays ~one record + one chunk — never the
    whole stream (the r12 review's decompressed-shard memory cliff)."""
    big_payload = b"x" * 50_000
    recs = b"".join(
        W._record_bytes(
            "conversion", f"https://b/{i}", "2024-01-01T00:00:00Z",
            "text/plain", big_payload, f"<urn:uuid:{i}>",
        )
        for i in range(40)
    )
    p = W._RecordParser("s")
    peak, chunk = 0, 8192
    n = 0
    for i in range(0, len(recs), chunk):
        n += len(p.feed(recs[i : i + chunk]))
        peak = max(peak, len(p.buf))
    n += len(p.finish())
    assert n == 40
    assert peak < len(big_payload) + 3 * chunk, peak


def test_oversized_garbage_header_resyncs():
    """A WARC magic followed by no header terminator for >64 KiB is
    garbage, not a header — one error row, then resync to the next
    record (the unbounded-header-buffer guard)."""
    junk = b"WARC/1.0\r\n" + b"A" * (W._MAX_HEADER + 10)
    good = W._record_bytes(
        "conversion", "https://ok", "2024-01-01T00:00:00Z",
        "text/plain", b"fine", "<urn:uuid:9>",
    )
    rows = W._parse_records("s", junk + b"\r\n" + good)
    errs = [r for r in rows if r["error"]]
    oks = [r for r in rows if not r["error"]]
    assert len(errs) == 1 and "unterminated header" in errs[0]["error"]
    assert len(oks) == 1 and bytes(oks[0]["payload"]) == b"fine"


def test_warcinfo_leading_record_reads_like_common_crawl(spark, tmp_path):
    """Real WET shards open with a ``warcinfo`` record describing the
    crawl; the reader must surface it as an ordinary typed record so
    downstream filters (`record_type == 'conversion'`) drop it."""
    info_payload = (
        b"software: crawler/1.0\r\nformat: WARC file version 1.0\r\n"
    )
    info = W._record_bytes(
        "warcinfo", None, "2024-01-01T00:00:00Z",
        "application/warc-fields", info_payload, "<urn:uuid:info>",
    )
    conv = W._record_bytes(
        "conversion", "https://cc.example/p", "2024-01-01T00:00:00Z",
        "text/plain", b"extracted text here", "<urn:uuid:c1>",
    )
    shard = tmp_path / "cc.warc.wet.gz"
    shard.write_bytes(gzip.compress(info, mtime=0) + gzip.compress(conv, mtime=0))
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 2 and all(r["error"] is None for r in rows)
    kinds = {r["record_type"] for r in rows}
    assert kinds == {"warcinfo", "conversion"}
    conv_row = next(r for r in rows if r["record_type"] == "conversion")
    assert bytes(conv_row["payload"]) == b"extracted text here"
    info_row = next(r for r in rows if r["record_type"] == "warcinfo")
    assert info_row["target_uri"] is None


def test_lf_header_with_crlf_in_payload():
    """An LF-terminated header whose PAYLOAD contains a CRLFCRLF must
    frame on the earlier LF terminator — probing CRLF first mis-framed
    this shape (r12 review)."""
    payload = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody"
    rec = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: https://lf.example\n"
        b"Content-Length: %d\n"
        b"\n" % len(payload)
    ) + payload + b"\r\n\r\n"
    rows = W._parse_records("s", rec)
    assert len(rows) == 1 and rows[0]["error"] is None, rows
    assert bytes(rows[0]["payload"]) == payload
    assert rows[0]["target_uri"] == "https://lf.example"


def test_record_type_filter_pushes_into_parser(spark, tmp_path):
    """record_types drops non-matching payloads INSIDE the parse loop
    (raw WARC interleaves request/response/metadata per capture);
    error rows always pass."""
    recs = (
        W._record_bytes("request", "https://r", "2024-01-01T00:00:00Z",
                        "application/http; msgtype=request",
                        b"GET / HTTP/1.1", "<urn:uuid:rq>")
        + W._record_bytes("response", "https://r", "2024-01-01T00:00:00Z",
                          "application/http; msgtype=response",
                          b"HTTP/1.1 200 OK\r\n\r\nhi", "<urn:uuid:rs>")
        + W._record_bytes("metadata", "https://r", "2024-01-01T00:00:00Z",
                          "application/warc-fields",
                          b"fetch: ok", "<urn:uuid:md>")
        + b"NOT A RECORD\n"
        + W._record_bytes("response", "https://r2", "2024-01-01T00:00:00Z",
                          "application/http; msgtype=response",
                          b"HTTP/1.1 200 OK\r\n\r\nbye", "<urn:uuid:r2>")
    )
    (tmp_path / "cap.warc").write_bytes(recs)
    rows = W.read_warc(
        spark, str(tmp_path), record_types=["response"]
    ).collect()
    kinds = sorted(
        (r["record_type"] or "", r["error"] is not None) for r in rows
    )
    assert kinds == [("", True), ("response", False), ("response", False)]
    unfiltered = W.read_warc(spark, str(tmp_path)).collect()
    assert len(unfiltered) == 5


def test_http_chunked_body_decodes():
    """Common Crawl response captures ship HTTP/1.1 chunked bodies
    verbatim — the body splitter must de-chunk them, and tolerate a
    truncated final chunk by yielding the decoded prefix."""
    body = b"4\r\nWiki\r\n5\r\npedia\r\nE\r\n in\r\n\r\nchunks.\r\n0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    )
    assert W.http_payload_body(http) == b"Wikipedia in\r\n\r\nchunks."
    # truncated mid-chunk: prefix survives
    trunc = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nWiki\r\nA\r\npedi"
    )
    assert W.http_payload_body(trunc) == b"Wikipedi"
    # malformed size line: decoded prefix + raw remainder
    bad = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nWiki\r\nZZ\r\nrest"
    )
    assert W.http_payload_body(bad) == b"WikiZZ\r\nrest"
    # non-chunked responses unaffected
    plain = b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi"
    assert W.http_payload_body(plain) == b"hi"


def test_http_gzip_content_encoding_decodes():
    """Content-Encoding: gzip bodies decompress; truncated streams
    yield their decodable prefix; corrupt streams fall back to raw."""
    html = b"<html>" + b"x" * 500 + b"</html>"
    gz = gzip.compress(html, mtime=0)
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz
    )
    assert W.http_payload_body(http) == html
    # chunked + gzip together (the common crawl combination)
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n"
        + hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    assert W.http_payload_body(chunked) == html
    # truncated gzip: prefix (possibly empty) without raising
    trunc = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz[:40]
    )
    out = W.http_payload_body(trunc)
    assert html.startswith(out)
    # corrupt magic after headers: falls back to raw bytes
    corrupt = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"
    )
    assert W.http_payload_body(corrupt) == b"not-gzip"


def test_http_lf_header_with_crlf_in_body():
    """The HTTP splitter must frame on the EARLIEST blank line of
    either convention: an LF-terminated header whose BODY contains a
    \\r\\n\\r\\n previously split on the later CRLF terminator and
    silently dropped the body prefix (r12 ADVICE, medium — the same
    bug the WARC header parser fixed in _drain)."""
    http = (
        b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
        b"<html>pre\r\n\r\npost</html>"
    )
    assert W.http_payload_body(http) == b"<html>pre\r\n\r\npost</html>"
    # CRLF header with an \n\n later in the body: CRLF still wins
    http2 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"a\n\nb"
    )
    assert W.http_payload_body(http2) == b"a\n\nb"
    # headers only, no blank line at all
    assert W.http_payload_body(b"HTTP/1.1 304 Not Modified\r\nX: y") == b""


def test_http_deflate_content_encoding_decodes():
    """Content-Encoding: deflate — zlib-wrapped (RFC form) AND raw
    deflate (what many real servers send) both decode; truncated
    streams yield their decodable prefix; corrupt falls back to raw."""
    import zlib

    html = b"<html>" + b"d" * 400 + b"</html>"
    wrapped = zlib.compress(html)
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    rawbody = raw.compress(html) + raw.flush()
    head = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
    assert W.http_payload_body(head + wrapped) == html
    assert W.http_payload_body(head + rawbody) == html
    # truncated zlib stream: prefix without raising
    out = W.http_payload_body(head + wrapped[:30])
    assert html.startswith(out)
    # chunked + deflate together
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: deflate\r\n\r\n"
        + hex(len(wrapped))[2:].encode() + b"\r\n" + wrapped
        + b"\r\n0\r\n\r\n"
    )
    assert W.http_payload_body(chunked) == html
    # corrupt for BOTH wbits forms (bad zlib header + invalid stored-
    # block lengths) -> raw bytes come back untouched
    assert W.http_payload_body(head + b"\x00\x00corrupt") == b"\x00\x00corrupt"


def test_duplicate_uri_shards_are_deterministic(spark, tmp_path):
    """Equal-URI rows previously kept shuffle arrival order (the sort
    keyed on _uri alone) and _det_record_id collided on a shared
    256-byte payload prefix — shard bytes now tiebreak on the FULL
    payload digest and record ids are unique per record (r12 ADVICE)."""
    shared = b"common-prefix-" + b"p" * 300
    rows = [
        ("https://dup.example/x", shared + b"-variant-A"),
        ("https://dup.example/x", shared + b"-variant-B"),
        ("https://dup.example/y", b"other"),
    ]
    a = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"])
    )
    b = spark.createDataFrame(
        pd.DataFrame(rows[::-1], columns=["url", "text"])
    )
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    W.write_warc(a.repartition(3), out_a, n_shards=1)
    W.write_warc(b.repartition(3), out_b, n_shards=1)
    fa = sorted(glob.glob(os.path.join(out_a, "*.warc.gz")))
    fb = sorted(glob.glob(os.path.join(out_b, "*.warc.gz")))
    assert [os.path.basename(p) for p in fa] == [
        os.path.basename(p) for p in fb
    ]
    for pa, pb in zip(fa, fb):
        assert open(pa, "rb").read() == open(pb, "rb").read()
    back = W.read_warc(spark, out_a, record_types=["conversion"]).collect()
    ids = [r["record_id"] for r in back]
    assert len(ids) == 3 and len(set(ids)) == 3, ids


def test_write_warc_uri_out_dir(spark, docs_df, tmp_path):
    """URI-schemed out_dirs route through the pyarrow.fs storage seam
    (r12 verdict #3): a file:// write must be byte-identical to the
    plain-path write and read back through read_warc unchanged."""
    loc = str(tmp_path / "loc")
    uri_dir = f"file://{tmp_path}/uri"
    W.write_warc(docs_df, loc, n_shards=2)
    manifest = W.write_warc(docs_df, uri_dir, n_shards=2)
    assert all(r["path"].startswith("file://") for r in manifest.collect())
    for name in ("shard-00000.warc.gz", "shard-00001.warc.gz"):
        la = open(os.path.join(loc, name), "rb").read()
        lb = open(str(tmp_path / "uri" / name), "rb").read()
        assert la == lb, f"{name} differs between local and file:// writes"
    back = W.read_warc(spark, uri_dir, record_types=["conversion"])
    assert back.count() == docs_df.count()


def test_corrupt_gzip_member_resyncs(spark, docs_df, tmp_path):
    """A corrupt or truncated GZIP MEMBER must cost error rows, not the
    shard: gzip.GzipFile raises mid-read (one flipped byte discarded
    the rest of a shard — task death, not an error row).  The
    member-aware streamer yields one error per desync and resyncs at
    the next member magic."""
    out = str(tmp_path / "wet")
    W.write_warc(docs_df, out, n_shards=1)
    victim = glob.glob(os.path.join(out, "*.warc.gz"))[0]
    blob = open(victim, "rb").read()

    # (a) garbage INSERTED between two members mid-file
    members = [m.start() for m in __import__("re").finditer(
        b"\x1f\x8b\x08", blob
    )]
    assert len(members) == 41  # warcinfo + 40 records
    cut = members[20]
    open(victim, "wb").write(blob[:cut] + b"JUNK" * 32 + blob[cut:])
    rows = W.read_warc(spark, out).collect()
    good = [r for r in rows if r["error"] is None
            and r["record_type"] == "conversion"]
    errs = [r for r in rows if r["error"] is not None]
    assert len(good) == 40, "all records must survive an inter-member gap"
    assert len(errs) >= 1 and any("gzip" in r["error"] for r in errs)

    # (b) bytes corrupted INSIDE a member: that record dies, rest live
    open(victim, "wb").write(
        blob[: members[20] + 40]
        + b"\x00\x00\x00\x00"
        + blob[members[20] + 44 :]
    )
    rows = W.read_warc(spark, out).collect()
    good = [r for r in rows if r["error"] is None
            and r["record_type"] == "conversion"]
    assert 38 <= len(good) <= 40, (len(good), "one record may die")
    assert any(r["error"] and "gzip" in r["error"] for r in rows)

    # (c) truncated final member: prefix records + one error row
    open(victim, "wb").write(blob[: len(blob) - 25])
    rows = W.read_warc(spark, out).collect()
    good = [r for r in rows if r["error"] is None
            and r["record_type"] == "conversion"]
    assert len(good) == 39
    assert any(
        r["error"] and ("truncated" in r["error"] or "corrupt" in r["error"])
        for r in rows
    )


def test_iter_gzip_stream_matches_gzipfile_on_healthy_input():
    """On healthy concatenated members the streamer is byte-identical
    to GzipFile, at any chunk geometry."""
    parts = [gzip.compress(bytes([i]) * (37 * i + 1), mtime=0)
             for i in range(1, 30)]
    blob = b"".join(parts)
    want = gzip.decompress(blob)
    for chunk in (7, 64, 1 << 20):
        got = b"".join(
            v for k, v in W._iter_gzip_stream(blob, chunk, chunk)
            if k == "data"
        )
        assert got == want, chunk


def test_http_declared_charset_header_and_meta():
    h = (b"HTTP/1.1 200 OK\r\n"
         b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\nbody")
    assert W.http_declared_charset(h) == "iso-8859-1"
    meta = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b'<html><head><meta charset="gbk"></head>x</html>')
    assert W.http_declared_charset(meta) == "gbk"
    httpequiv = (
        b"HTTP/1.1 200 OK\r\n\r\n"
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Shift_JIS">'
    )
    assert W.http_declared_charset(httpequiv) == "shift_jis"
    # meta sniff window is 1024 bytes: a late declaration is ignored
    late = (b"HTTP/1.1 200 OK\r\n\r\n" + b"x" * 2000
            + b'<meta charset="gbk">')
    assert W.http_declared_charset(late) is None
    assert W.http_declared_charset(b"bare text") is None
    assert W.http_declared_charset(None) is None


def test_meta_charset_sniffed_through_compressed_body():
    """A gzip (or chunked) HTML capture declaring its charset ONLY via
    <meta> must still decode under it: the meta window sniffs the
    DECODED body, not the raw compressed bytes (r13 ADVICE)."""
    import gzip as _gz

    zh = "中文页面"
    html = b'<html><head><meta charset="gbk"></head>' + zh.encode("gbk")
    cap_gz = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + _gz.compress(html)
    )
    text, cs = W.decode_http_text(cap_gz)
    assert cs == "gbk" and zh in text
    # chunked transfer splitting the meta tag across chunks
    part1, part2 = html[:20], html[20:]
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + hex(len(part1))[2:].encode() + b"\r\n" + part1 + b"\r\n"
        + hex(len(part2))[2:].encode() + b"\r\n" + part2 + b"\r\n"
        + b"0\r\n\r\n"
    )
    text, cs = W.decode_http_text(chunked)
    assert cs == "gbk" and zh in text
    # raw-payload fallback window still works when no body is passed
    assert W.http_declared_charset(cap_gz) is None  # compressed: missed
    assert W.http_declared_charset(cap_gz, html) == "gbk"


def test_decode_http_text_charset_chain(spark):
    """Declared charset wins; strict UTF-8 second; windows-1252 total
    fallback; bogus declared codec names fall through."""
    latin = "café résumé".encode("latin-1")
    cap_decl = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain; charset=latin-1\r\n\r\n"
                + latin)
    assert W.decode_http_text(cap_decl) == ("café résumé", "latin-1")
    # same bytes, NO declaration: invalid UTF-8 -> windows-1252 fallback
    cap_bare = b"HTTP/1.1 200 OK\r\n\r\n" + latin
    text, cs = W.decode_http_text(cap_bare)
    assert cs == "windows-1252" and "caf" in text
    # declared gbk, gbk bytes (chinese), via the meta tag
    zh = "中文页面"
    cap_gbk = (b"HTTP/1.1 200 OK\r\n\r\n"
               + b'<meta charset="gbk">' + zh.encode("gbk"))
    text, cs = W.decode_http_text(cap_gbk)
    assert cs == "gbk" and zh in text
    # bogus codec name -> utf-8 branch
    cap_bogus = (b"HTTP/1.1 200 OK\r\n"
                 b"Content-Type: text/plain; charset=no-such-codec\r\n\r\n"
                 + "plain utf-8 ✓".encode())
    assert W.decode_http_text(cap_bogus) == ("plain utf-8 ✓", "utf-8")
    # gzip content-encoding composes: charset applies to the DECODED body
    gz = gzip.compress("über".encode("latin-1"), mtime=0)
    cap_gz = (b"HTTP/1.1 200 OK\r\n"
              b"Content-Encoding: gzip\r\n"
              b"Content-Type: text/plain; charset=latin-1\r\n\r\n" + gz)
    assert W.decode_http_text(cap_gz) == ("über", "latin-1")
    assert W.decode_http_text(None) is None

    # column form: adds text + charset, guards clashes
    df = spark.createDataFrame(
        pd.DataFrame({"payload": [cap_decl, cap_bare, None]})
    )
    rows = W.with_http_text(df).collect()
    assert [r["charset"] for r in rows] == [
        "latin-1", "windows-1252", None
    ]
    assert rows[0]["text"] == "café résumé"
    with pytest.raises(ValueError, match="collides"):
        W.with_http_text(df.withColumn("text", F.lit("x")))


def test_iter_gzip_stream_corruption_fuzz():
    """For ANY single splice/flip/truncation, the streamer must never
    raise, and every member strictly before the damage must come back
    intact (seeded RNG — deterministic)."""
    import random

    rng = random.Random(1309)
    members = [
        gzip.compress(bytes([65 + i]) * rng.randrange(1, 400), mtime=0)
        for i in range(12)
    ]
    offsets = [0]
    for m in members:
        offsets.append(offsets[-1] + len(m))
    blob = b"".join(members)
    want_full = gzip.decompress(blob)
    for trial in range(200):
        kind = rng.randrange(3)
        pos = rng.randrange(1, len(blob))
        if kind == 0:  # splice garbage
            bad = blob[:pos] + bytes(rng.randrange(256) for _ in range(9)) + blob[pos:]
        elif kind == 1:  # flip a byte
            bad = blob[:pos] + bytes([blob[pos] ^ 0xFF]) + blob[pos + 1:]
        else:  # truncate
            bad = blob[:pos]
        chunk = rng.choice([5, 64, 1 << 20])
        got = b"".join(
            v for k, v in W._iter_gzip_stream(bad, chunk, chunk)
            if k == "data"
        )
        # members entirely before the damage must replay byte-exact
        n_safe = max(i for i in range(len(offsets)) if offsets[i] <= pos)
        safe = want_full[: sum(
            len(gzip.decompress(m)) for m in members[:n_safe]
        )] if n_safe else b""
        assert got.startswith(safe), (trial, kind, pos, n_safe)


def test_decode_http_text_bom_overrides_declaration():
    """WHATWG encoding standard: a BOM beats any declared charset —
    a UTF-8 page mislabeled latin-1 but carrying its BOM must decode
    as UTF-8."""
    text = "naïve ünïcode ✓"
    bom_utf8 = b"\xef\xbb\xbf" + text.encode("utf-8")
    cap = (b"HTTP/1.1 200 OK\r\n"
           b"Content-Type: text/plain; charset=latin-1\r\n\r\n" + bom_utf8)
    got, cs = W.decode_http_text(cap)
    assert (got, cs) == (text, "utf-8-sig")
    # utf-16 both endiannesses, undeclared
    for enc, codec in (("utf-16-le", "utf-16-le"), ("utf-16-be", "utf-16-be")):
        bom = b"\xff\xfe" if enc == "utf-16-le" else b"\xfe\xff"
        cap = b"HTTP/1.1 200 OK\r\n\r\n" + bom + text.encode(enc)
        got, cs = W.decode_http_text(cap)
        assert (got, cs) == (text, codec), enc
    # no BOM: the declared chain is untouched
    plain = b"HTTP/1.1 200 OK\r\n\r\n" + text.encode("utf-8")
    assert W.decode_http_text(plain) == (text, "utf-8")


def test_sniff_charset_families_and_latin_guard():
    """Statistical detection for UNDECLARED legacy pages (r14): each
    CJK family detected by strict-decode + home-script mass; isolated
    high bytes (latin accents) refuse to guess; ASCII refuses."""
    zh = ("这是一个没有声明字符集的中文页面，" * 8)
    assert W.sniff_charset(zh.encode("gbk")) == "gbk"
    ja = ("これは文字コード宣言のない日本語のページです。" * 8)
    assert W.sniff_charset(ja.encode("shift_jis")) == "shift_jis"
    assert W.sniff_charset(ja.encode("euc-jp")) == "euc-jp"
    ko = ("이것은 문자집합 선언이 없는 한국어 페이지입니다. " * 8)
    assert W.sniff_charset(ko.encode("euc-kr")) == "euc-kr"
    # latin accents are ISOLATED high bytes -> None, never a CJK guess
    assert W.sniff_charset("café résumé naïve".encode("latin-1")) is None
    assert W.sniff_charset(b"plain ascii only") is None
    assert W.sniff_charset(b"") is None and W.sniff_charset(None) is None
    # truncated multibyte char at the sniff boundary is tolerated
    blob = zh.encode("gbk")
    assert W.sniff_charset(blob[: len(blob) - 1]) == "gbk"
    # traditional Chinese -> big5 (distinct from gbk via strict decode)
    zt = ("這是一個沒有聲明字符集的中文頁面，裡面有常見的漢字。" * 8)
    assert W.sniff_charset(zt.encode("big5")) == "big5"
    # mojibake guard: Shift_JIS bytes ALSO strictly decode under GBK
    # (onto rare ideographs) — the distinctiveness rank must not let
    # gbk steal them
    assert W.sniff_charset(ja.encode("shift_jis")) == "shift_jis"
    # random bytes refuse (structural + mass filters)
    import random as _r

    _r.seed(1)
    junk = bytes(_r.randrange(256) for _ in range(4096))
    assert W.sniff_charset(junk) is None


def test_decode_http_text_sniffs_undeclared_cjk():
    """Chain position: BOM > declared > strict utf-8 > SNIFF > 1252."""
    zh = "没有声明的中文页面内容在这里重复出现" * 6
    cap = b"HTTP/1.1 200 OK\r\n\r\n" + zh.encode("gbk")
    text, cs = W.decode_http_text(cap)
    assert cs == "gbk" and zh in text
    # a DECLARATION still outranks the sniffer (declared latin-1 wins
    # even though the bytes would also sniff-decode)
    cap_decl = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain; charset=latin-1\r\n\r\n"
                + "café".encode("latin-1"))
    assert W.decode_http_text(cap_decl)[1] == "latin-1"
    # undetermined legacy bytes still total out at windows-1252
    text, cs = W.decode_http_text(
        b"HTTP/1.1 200 OK\r\n\r\n" + "caf\xe9 r\xe9sum\xe9".encode("latin-1")
    )
    assert cs == "windows-1252" and "caf" in text


def test_sniff_charset_never_raises_property():
    """Total function over arbitrary bytes: returns None or a known
    codec, never raises — a sniffer crash would sink a decode task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    known = {None, *W._SNIFF_RANGES}

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=512))
    def check(b):
        assert W.sniff_charset(b) in known
        # and the full ladder stays total too
        out = W.decode_http_text(b"HTTP/1.1 200 OK\r\n\r\n" + b)
        assert out is None or isinstance(out[0], str)

    check()


def test_gzip_desync_resets_record_parser(spark, tmp_path):
    """r14 review #1: a corrupt gzip member interrupting a record
    mid-body must not let that record's Content-Length swallow the
    NEXT members' records — the parser resets at the member boundary
    and every good record survives."""
    import gzip as _gz

    recs = [
        W._record_bytes(
            "conversion", f"https://m/{i}", "2024-01-01T00:00:00Z",
            "text/plain", b"x" * 300, f"<urn:uuid:m{i}>",
        )
        for i in range(3)
    ]
    # member 0 corrupt mid-DEFLATE (header survives, body dies);
    # members 1 and 2 pristine
    m0 = bytearray(_gz.compress(recs[0], mtime=0))
    m0[len(m0) // 2] ^= 0xFF
    shard = tmp_path / "desync.warc.gz"
    shard.write_bytes(
        bytes(m0)
        + _gz.compress(recs[1], mtime=0)
        + _gz.compress(recs[2], mtime=0)
    )
    rows = W.read_warc(spark, str(tmp_path)).collect()
    oks = sorted(
        (r for r in rows if r["error"] is None),
        key=lambda r: r["target_uri"],
    )
    errs = [r for r in rows if r["error"]]
    assert [r["target_uri"] for r in oks] == ["https://m/1", "https://m/2"]
    assert all(bytes(r["payload"]) == b"x" * 300 for r in oks)
    assert 1 <= len(errs) <= 2  # the desync event, never silent loss


def test_resync_finds_magic_without_preceding_newline():
    """r14 review #3: a valid record starting exactly where garbage
    ends (no newline between) must be recovered, not dropped."""
    rec = W._record_bytes(
        "conversion", "https://edge", "2024-01-01T00:00:00Z",
        "text/plain", b"survives", "<urn:uuid:e>",
    )
    rows = W._parse_records("s", b"garbage-no-magic" + rec)
    oks = [r for r in rows if r["error"] is None]
    assert len(oks) == 1 and bytes(oks[0]["payload"]) == b"survives"
    # and in the split-feed form too
    p = W._RecordParser("s")
    got = p.feed(b"garbage-no-magic") + p.feed(rec) + p.finish()
    assert [r["target_uri"] for r in got if not r["error"]] == [
        "https://edge"
    ]


def test_dechunk_lf_framed_with_crlf_in_data():
    """r14 review #5: LF-framed chunked body whose DATA contains \\r\\n
    must still dechunk (earliest-terminator rule, like every other
    framing site)."""
    assert W._dechunk(b"8\nab\r\ncd\n\n0\n\n") == b"ab\r\ncd\n\n"[:8]
    # CRLF framing with LF inside data keeps working
    assert W._dechunk(b"4\r\na\nb\n\r\n0\r\n\r\n") == b"a\nb\n"


def test_uri_with_crlf_cannot_inject_headers(spark, tmp_path):
    """r14 review #6: scraped hrefs carry stray newlines — the writer
    percent-encodes CR/LF so the record frames correctly and the
    payload survives."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://e.com/a\r\n\r\nfake"],
                "text": ["real payload"],
            }
        )
    )
    out = str(tmp_path / "inj")
    W.write_warc(df, out, n_shards=1)
    rows = W.read_warc(spark, out, record_types=["conversion"]).collect()
    assert len(rows) == 1 and rows[0]["error"] is None
    assert bytes(rows[0]["payload"]) == b"real payload"
    assert rows[0]["target_uri"] == "http://e.com/a%0D%0A%0D%0Afake"


def test_multi_member_gzip_content_encoding():
    """r14 review #7: a multi-member gzip body decodes ALL members,
    not just the first."""
    import gzip as _gz

    body = _gz.compress(b"hello ") + _gz.compress(b"world")
    cap = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + body)
    assert W.http_payload_body(cap) == b"hello world"
    # corrupt SECOND member: fully-decoded prior members survive
    bad = bytearray(_gz.compress(b"tail"))
    bad[12] ^= 0xFF
    cap2 = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
            + _gz.compress(b"head ") + bytes(bad))
    assert W.http_payload_body(cap2) == b"head "
