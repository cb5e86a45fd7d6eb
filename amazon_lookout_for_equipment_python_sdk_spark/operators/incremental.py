"""Incremental dedup — new-batch-vs-corpus, the daily-crawl shape.

Re-running corpus-wide dedup on every ingest is O(corpus) per day; at
100 TB the standing pattern is an INDEX of what has been seen (exact
content hashes + MinHash band buckets + the per-doc shingle-hash arrays
for candidate verification) that each new batch probes:

- exact dups: one anti-join of the batch's content hashes against the
  seen-hash table;
- near dups: the batch's band buckets (row-local, zero shuffle to
  compute) equi-join the seen band table on (band, bucket), candidates
  verify row-locally via ``array_intersect`` on the carried 48-bit
  shingle hashes — the same verify the batch path uses
  (operators/dedup.py ngram_jaccard_lsh);
- survivors' index rows append back, keeping the cycle closed.

Every seen-side table is produced by :func:`dedup_index_frames` so the
caller can persist them bucketed on their join keys
(sources/sinks.write_bucketed): then the daily probe shuffles ONLY the
new batch — the corpus-sized side joins in place with zero exchange.

All hashing matches operators/dedup.py bit-for-bit, so an index built
today verifies against signatures computed next year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .._persist import note_persist as _note_persist
from .dedup import (
    _shingle_array,
    _with_digests,
    minhash_banded,
    minhash_banded_from_digests,
)


def _content_hash(text_col: str):
    """48-bit md5 of the raw text (exact-dup key, matches dedup_exact)."""
    return F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast(
        "long"
    )


def dedup_index_frames(
    docs: DataFrame,
    num_perm: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    share_digests: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three index tables of a corpus: ``(exact, bands_tbl, hashes)``.

    - ``exact``: (h) distinct content hashes — bucket/persist on ``h``;
    - ``bands_tbl``: (id, band, bucket) — bucket/persist on ``bucket``;
    - ``hashes``: (id, hh: array<long>) shingle-hash sets — on ``id``.

    All row-local to compute (no shuffle until the caller's write).

    ``share_digests=True`` persists the shared digest frame (DISK_ONLY)
    so ``bands_tbl`` and ``hashes`` read ONE materialization instead of
    each re-running the md5-dominated shingle pipeline (Catalyst clones
    the subtree per consumer — r15 plan audit counted the corpus shingle
    UDF twice).  Use it when the three frames are CONSUMED directly in
    one job (incremental_dedup_batch's shape); leave it off when the
    caller immediately persists them bucketed (write_bucketed), where
    the cache would be a second corpus-sized materialization for
    nothing."""
    exact = docs.select(_content_hash(text_col).alias("h")).distinct()
    digests = _with_digests(
        _shingle_array(docs, shingle_n, text_col, id_col), num_perm
    )
    if share_digests:
        from pyspark import StorageLevel

        digests = digests.persist(StorageLevel.DISK_ONLY).transform(
            _note_persist
        )
    bands_tbl = minhash_banded_from_digests(digests, num_perm, bands, id_col)
    hashes = digests.select(F.col(id_col).alias("id"), F.col("_h").alias("hh"))
    return exact, bands_tbl, hashes


def incremental_dedup(
    new_docs: DataFrame,
    seen_exact: DataFrame,
    seen_bands: DataFrame,
    seen_hashes: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate a new batch against the seen-corpus index: adds
    ``is_exact_dup`` (content hash already seen) and ``near_dup_of``
    (smallest seen id whose verified Jaccard >= threshold, else null).

    Exact-dup rows skip the near-dup probe entirely (they'd trivially
    match).  The probe joins are keyed on ``h`` / ``bucket`` / ``id`` —
    exactly the keys the index persists bucketed — so only batch-sized
    data moves."""
    thr_millionths = int(round(threshold * 1_000_000))
    batch = new_docs.withColumn("_ch", _content_hash(text_col))
    exact_flag = batch.join(
        seen_exact.select(F.col("h").alias("_ch"), F.lit(True).alias("is_exact_dup")),
        "_ch",
        "left",
    ).withColumn("is_exact_dup", F.coalesce("is_exact_dup", F.lit(False)))

    fresh = exact_flag.filter(~F.col("is_exact_dup")).select(id_col, text_col)
    # ONE digest pass for the batch: bands and hash arrays both derive
    # from it, and the persist is batch-sized by this function's whole
    # contract ("only batch-sized data moves") — without it each
    # consumer re-runs the md5-dominated shingle pipeline
    from pyspark import StorageLevel

    # DISK_ONLY: "batch-sized" is caller-controlled and a backfill batch
    # is corpus-sized — the r9 promotion-OOM class for serialized
    # memory-eligible levels (BASELINE.md r9 addendum 2)
    batch_digests = _with_digests(
        _shingle_array(fresh, shingle_n, text_col, id_col), num_perm
    ).persist(StorageLevel.DISK_ONLY).transform(_note_persist)
    new_bands = minhash_banded_from_digests(
        batch_digests, num_perm, bands, id_col
    )
    cand = (
        new_bands.join(
            seen_bands.select(
                F.col("band"), F.col("bucket"), F.col(id_col).alias("_seen_id")
            ),
            ["band", "bucket"],
        )
        .select(F.col(id_col), F.col("_seen_id"))
        .distinct()
    )
    new_hh = batch_digests.select(F.col(id_col), F.col("_h").alias("_hh_new"))
    verified = (
        cand.join(new_hh, id_col)
        .join(
            seen_hashes.select(
                F.col("id").alias("_seen_id"), F.col("hh").alias("_hh_seen")
            ),
            "_seen_id",
        )
        .withColumn(
            "_nc", F.size(F.array_intersect("_hh_new", "_hh_seen"))
        )
        .filter(
            F.col("_nc") * 1_000_000
            >= F.lit(thr_millionths)
            * (F.size("_hh_new") + F.size("_hh_seen") - F.col("_nc"))
        )
        .groupBy(id_col)
        .agg(F.min("_seen_id").alias("near_dup_of"))
    )
    return (
        exact_flag.join(verified, id_col, "left")
        .drop("_ch")
    )
