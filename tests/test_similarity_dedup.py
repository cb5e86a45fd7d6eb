"""Similarity / near-dup operator tests: planted-duplicate recall for the
multi-table hyperplane LSH, bucket determinism, SimHash banded hamming
exactness, and BPE tokenization."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_lookout_for_equipment_python_sdk_spark.operators import (
    dedup as dd,
    similarity as sim,
    text as tx,
)


@pytest.fixture(scope="module")
def planted_vectors(spark):
    """40 random unit-ish vectors + a near-copy of each of the first 10
    (cos > 0.99) — the planted near-dup ground truth."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    for i in range(10):
        noisy = base[i] + rng.normal(scale=0.02, size=64)
        rows.append((100 + i, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_finds_planted_pairs(spark, planted_vectors):
    out = sim.embedding_near_dup(
        planted_vectors, threshold=0.95, num_tables=4, planes_per_table=4
    ).collect()
    found = {(r["a"], r["b"]) for r in out}
    expected = {(i, 100 + i) for i in range(10)}
    # multi-table banding: recall for cos≈0.999 pairs is ~1; allow one miss
    assert len(expected & found) >= 9, sorted(found)
    # no false positives: every returned pair really has cos >= threshold
    assert all(r["cos"] >= 0.95 for r in out)


def test_hyperplane_buckets_deterministic_and_real(spark, planted_vectors):
    """Regression for the r1 lambda-capture bug: all planes collapsed to
    one garbage salt, so 8-plane buckets could only ever be 0 or 255.
    Real planes must spread vectors over many buckets, identically across
    two plan constructions."""
    b1 = {
        r["vec_id"]: r["b"]
        for r in planted_vectors.select(
            "vec_id",
            sim.hyperplane_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }
    assert len(set(b1.values())) > 4, "buckets degenerate — planes collapsed?"
    b2 = {
        r["vec_id"]: r["b"]
        for r in planted_vectors.select(
            "vec_id",
            sim.hyperplane_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }
    assert b1 == b2


def test_lsh_cosine_topk_subset_of_bruteforce(spark, planted_vectors):
    """ANN results are exact-cosine-correct for whatever candidates the
    bucket join admits: every (query, hit) must appear in the brute-force
    ranking with the same cos."""
    queries = planted_vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in sim.cosine_topk(planted_vectors, queries, k=50).collect()
    }
    ann = sim.lsh_cosine_topk(planted_vectors, queries, k=5).collect()
    assert ann, "LSH returned nothing — bucket join broken"
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        assert key in brute and abs(brute[key] - r["cos"]) < 1e-12
    # multi-table banding must recover each query's planted near-copy
    by_q = {}
    for r in ann:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in range(3):
        assert 100 + q in by_q.get(q, set()), (q, by_q)


def test_lsh_cosine_topk_precomputed_n_lazy_and_equal(spark, planted_vectors):
    """r9 (ADVICE r8): adaptive geometry (planes_per_table=None) needs
    the corpus size; without it the builder runs an eager count() job at
    plan-construction time.  Passing a precomputed ``n`` must (1) keep
    the builder lazy — zero jobs until an action — and (2) produce the
    identical plan/result as the self-counted path."""
    queries = planted_vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = planted_vectors.count()

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    lazy = sim.lsh_cosine_topk(
        planted_vectors, queries, k=5, planes_per_table=None, n=n
    )
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, "builder ran a Spark job despite n"

    a = sorted(map(tuple, lazy.collect()))
    b = sorted(
        map(
            tuple,
            sim.lsh_cosine_topk(
                planted_vectors, queries, k=5, planes_per_table=None
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_ivf_ann_recall(spark, planted_vectors):
    """IVF: seeded build is deterministic; probing nprobe cells recovers
    most of the brute-force top-5 (clustered planted data)."""
    cents, assigned = sim.ivf_build(planted_vectors, n_cells=8, seed=42)
    assert cents.shape == (8, 64)
    assert assigned.count() == 50
    queries = planted_vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    brute = {}
    for r in sim.cosine_topk(planted_vectors, queries, k=5).collect():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])
    out_bcast = sim.ivf_cosine_topk(
        planted_vectors, queries, cents, assigned, k=5, nprobe=4
    )
    ivf = {}
    for r in out_bcast.collect():
        ivf.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(brute[q] & ivf.get(q, set())) / len(brute[q]) for q in brute
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # the planted near-copy (cos ~0.999) must be found for every query
    for q in range(5):
        assert 100 + q in ivf.get(q, set()), (q, sorted(ivf.get(q, set())))
    # the legacy driver probe path returns the identical result set
    driver_rows = {
        (r["query_id"], r["vec_id"])
        for r in sim.ivf_cosine_topk(
            planted_vectors, queries, cents, assigned, k=5, nprobe=4,
            probe_mode="driver",
        ).collect()
    }
    bcast_rows = {(r["query_id"], r["vec_id"]) for r in out_bcast.collect()}
    assert bcast_rows == driver_rows
    # distributed probes: the whole probe selection lives in ONE plan (a
    # broadcast centroid join + per-query window) — queries never collect
    probe_plan = (
        sim.ivf_probe_cells(queries, cents, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in probe_plan, probe_plan
    assert probe_plan.count("Window [") == 1, probe_plan
    # determinism: rebuilding with the same seed gives identical centroids
    cents2, _ = sim.ivf_build(planted_vectors, n_cells=8, seed=42)
    import numpy as np

    np.testing.assert_array_equal(cents, cents2)


def test_simhash_near_pairs_exact_within_radius(spark):
    """Banded hamming join is exact for hamming <= bands-1: a doc pair
    differing in one token (few simhash bits) is found; bands guard
    raises when the radius breaks the pigeonhole guarantee."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely different text about spark query planning together"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in dd.simhash48(df).collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in dd.simhash_near_pairs(df, max_hamming=3, bands=4).collect()
    }
    if ham12 <= 3:
        assert pairs.get((1, 2)) == ham12
    assert (1, 3) not in pairs and (2, 3) not in pairs
    with pytest.raises(ValueError, match="bands"):
        dd.simhash_near_pairs(df, max_hamming=5, bands=4)


def test_near_dup_clusters_and_removal(spark):
    """Chained near-dups (A~B, B~C but A!~C) must land in ONE cluster
    (transitive closure), with the min id surviving."""
    base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    words = base.split()
    v1 = " ".join(words)
    v2 = " ".join(words[:-1] + ["yesterday"])          # ~ v1
    v3 = " ".join(["hey"] + words[:-1] + ["someday"])  # ~ v2, less ~ v1
    other = "completely different content about spark catalyst planner internals and shuffles"
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3), (9, other)], "doc_id long, text string"
    )
    pairs = dd.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.4)
    got_pairs = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got_pairs and (2, 3) in got_pairs
    clusters = {
        r["doc_id"]: r["cluster"]
        for r in dd.near_dup_clusters(
            df.select("doc_id"), pairs.select("a", "b")
        ).collect()
    }
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[9] == 9
    kept = sorted(
        r["doc_id"] for r in dd.dedup_near(df, threshold=0.4).collect()
    )
    assert kept == [1, 9]


def test_short_docs_do_not_crash_shingling(spark):
    """Docs shorter than the shingle width must yield empty shingle sets,
    not a crashed job (Spark's sequence(1, 0) steps DOWN to [1, 0] and
    slice(arr, 0, n) throws)."""
    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "a much longer document with several words here")],
        "doc_id long, text string",
    )
    pairs = dd.ngram_jaccard_pairs(df, shingle_n=3, threshold=0.1)
    assert pairs.count() == 0  # nothing shares shingles; and no crash
    assert dd.minhash_banded(df).select("doc_id").distinct().count() == 1
    from amazon_lookout_for_equipment_python_sdk_spark.operators import text as _tx
    from pyspark.sql import functions as _F

    sh = df.select(_tx.shingles(_F.col("text"), 3).alias("s")).collect()
    assert [len(r["s"]) for r in sh] == [0, 0, 6]


def test_bpe_tokens(spark):
    df = spark.createDataFrame(
        [(1, "hello world42 it's a test-case!!")], "id int, text string"
    )
    row = df.select(
        tx.bpe_tokens(F.col("text")).alias("t"),
        tx.token_count(F.col("text")).alias("ws"),
    ).collect()[0]
    assert row["t"] == [
        "hello", "world", "42", "it", "'", "s", "a", "test", "-", "case", "!!",
    ]
    assert row["ws"] == 5


def test_max_bucket_caps_degenerate_corpus(spark):
    """The posting-list cap: 1k identical docs (one giant LSH bucket) must
    complete with a BOUNDED candidate count when capped — and the drop is
    recorded via the cap Observation, never silent.  Uncapped, this bucket
    alone would emit ~500k pairs (the quadratic blowup the cap exists to
    stop at 100 TB)."""
    from pyspark.sql import Observation

    rows = [(i, "the exact same document text repeated") for i in range(1000)]
    # a second, tiny duplicate group (bucket size 2, far under the cap)
    rows += [(2000, "a genuinely different document about other things"),
             (2001, "a genuinely different document about other things")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation()
    out = dd.ngram_jaccard_lsh(
        df, shingle_n=3, threshold=0.5, max_bucket=50, cap_observation=obs
    )
    pairs = out.collect()
    # the 1000-dup bucket is dropped; the small near-dup pair survives
    assert {(r["a"], r["b"]) for r in pairs} == {(2000, 2001)}
    assert obs.get["dropped_buckets"] >= 1
    assert obs.get["max_bucket_seen"] == 1000
    # and the registered defaults keep a cap wired (not None)
    import inspect

    assert inspect.signature(dd.ngram_jaccard_lsh).parameters[
        "max_bucket"
    ].default == 10_000
    assert inspect.signature(dd.dedup_near).parameters[
        "max_bucket"
    ].default == 10_000


def test_benched_lsh_topk_recall_vs_bruteforce(spark):
    """The benched ANN query must hold recall >= 0.9 against the exact
    brute-force baseline on the real embeddings testdata before anyone
    relies on it at scale."""
    from amazon_lookout_for_equipment_python_sdk_spark.plans import queries as q

    sf_dir = "/root/testdata/sf0.001"
    brute = {}
    for r in q.QUERIES["cosine_topk"](spark, sf_dir).collect():
        brute.setdefault(r["query_id"], set()).add(r["vec_id"])
    ann = {}
    for r in q.QUERIES["lsh_cosine_topk"](spark, sf_dir).collect():
        ann.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(brute[qq] & ann.get(qq, set())) / len(brute[qq]) for qq in brute
    ]
    assert len(recalls) == 5
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_fused_candidates_equal_legacy_distinct_path(spark):
    """The fused single-shuffle candidate generator (first-matching-band
    ownership) must emit EXACTLY the pair set of the legacy shape
    (banded -> groupBy -> distinct) on corpora with heavy cross-band
    collisions — duplicates from many docs sharing both bands included."""
    rows = []
    # 3 groups of similar docs + singletons; identical docs collide in
    # EVERY band, exercising the cross-band dedup
    for g in range(3):
        base = f"group {g} shares this exact sentence body for overlap"
        for i in range(4):
            rows.append((g * 10 + i, base))
    for i in range(5):
        rows.append((100 + i, f"unique document number {i} with its own words"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    legacy = {
        (r["a"], r["b"])
        for r in dd.candidate_pairs_from_banded(
            dd.minhash_banded(df, 8, 2, 3), "doc_id"
        ).collect()
    }
    # both dedup strategies: pair-level groupBy (capped, the default) and
    # first-matching-band ownership (uncapped)
    for mb in (10_000, None):
        fused = [
            (r["a"], r["b"])
            for r in dd.minhash_candidate_pairs(
                df, 8, 2, 3, max_bucket=mb
            ).collect()
        ]
        assert len(fused) == len(set(fused)), (mb, "duplicates emitted")
        assert set(fused) == legacy, mb


def test_quantized_cosine_close_to_exact(spark, planted_vectors):
    """int8 quantization: top-5 over dequantized cosine keeps high overlap
    with the exact ranking, and every planted near-copy (cos ~0.999)
    survives quantization."""
    queries = planted_vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {}
    for r in sim.cosine_topk(planted_vectors, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    quant = {}
    for r in sim.dequantized_cosine_topk(
        planted_vectors, queries, k=5
    ).collect():
        quant.setdefault(r["query_id"], set()).add(r["vec_id"])
    overlaps = [
        len(exact[q] & quant.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps
    for q in range(3):
        assert 100 + q in quant.get(q, set()), (q, sorted(quant.get(q, set())))


def test_dequantized_cosine_degenerate_corpus(spark):
    """Empty corpus -> empty result (scale is null); all-zero corpus ->
    no NaN/Inf poisoning (scale is 0).  Both default the collected scale
    to 1.0 instead of dividing by null/zero."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0])], schema
    ).withColumnRenamed("vec_id", "query_id")
    empty = spark.createDataFrame([], schema)
    assert sim.dequantized_cosine_topk(empty, probes, k=3).count() == 0
    zeros = spark.createDataFrame([(1, [0.0, 0.0]), (2, [0.0, 0.0])], schema)
    rows = sim.dequantized_cosine_topk(zeros, probes, k=3).collect()
    for r in rows:
        assert r["qcos"] is None or not (
            r["qcos"] != r["qcos"] or abs(r["qcos"]) == float("inf")
        ), rows


def test_pq_encoding_invariants(spark, planted_vectors):
    """PQ: a vector that IS a codebook seed has d2 = 0 against its own
    code in every subspace, so it must encode to its own index; all
    codes are in range; ADC of a seed against itself reproduces the
    exact subspace-dot sum."""
    cb = sim.pq_codebooks_from_seeds(planted_vectors, m=8, n_codes=16)
    assert cb.shape == (8, 16, 8)
    enc = {
        r["vec_id"]: r["codes"]
        for r in sim.pq_encode(planted_vectors, cb).collect()
    }
    for vid, codes in enc.items():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)
    seeds = sorted(enc)[:16]
    for idx, vid in enumerate(sorted(vid for vid in enc if vid < 16)):
        assert enc[vid] == [idx] * 8, (vid, enc[vid])
    # ADC top-k runs end-to-end and ranks the planted near-copy first
    queries = planted_vectors.filter(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = sim.pq_adc_topk(planted_vectors, queries, cb, k=5).collect()
    assert len(rows) == 5 and all(r["query_id"] == 0 for r in rows)


def test_duplicate_spans_and_removal(spark):
    """ExactSubstr (Lee et al. 2022): shared boilerplate is found as one
    merged maximal span per doc, unique text is untouched, and
    remove_duplicate_spans cuts exactly the flagged characters."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "aaaa SHARED BOILERPLATE TEXT HERE bbbb unique tail one"),
            (2, "cccc SHARED BOILERPLATE TEXT HERE dddd another ending"),
            (3, "totally unique document with no repeats at all xyz"),
            (4, "short"),  # below k: no grams, no crash
        ],
        "doc_id long, text string",
    )
    sp = duplicate_spans(docs, k=20)
    rows = {r.doc_id: (r.span_start, r.span_end) for r in sp.collect()}
    assert set(rows) == {1, 2}  # only the two sharing docs
    t1 = docs.filter("doc_id = 1").first().text
    s, e = rows[1]
    assert "SHARED BOILERPLATE TEXT HERE" in t1[s:e]
    # maximality: extending either side leaves the duplicated region
    assert sp.filter("doc_id = 1").count() == 1  # merged into ONE span
    out = {r.doc_id: r.text for r in remove_duplicate_spans(docs, sp).collect()}
    assert out[1] == "aaaa bbbb unique tail one"
    assert out[2] == "cccc dddd another ending"
    assert out[3] == docs.filter("doc_id = 3").first().text  # untouched
    assert out[4] == "short"
    # intra-document repetition also counts (the gram occurs twice)
    rep = spark.createDataFrame(
        [(9, "INTERNAL REPEATED PHRASE xx INTERNAL REPEATED PHRASE yy")],
        "doc_id long, text string",
    )
    sp9 = duplicate_spans(rep, k=20).collect()
    assert len(sp9) >= 1 and all(r.doc_id == 9 for r in sp9)


def test_ann_join_table_to_table(spark):
    """Cross-table ANN join: recall vs brute force on clustered vectors,
    with NO broadcast requirement on either side (plan runs as a shuffle
    join when broadcast is disabled)."""
    import numpy as np

    from amazon_lookout_for_equipment_python_sdk_spark.operators.similarity import (
        ann_join,
        cosine_topk,
    )

    rng = np.random.RandomState(31)
    dim = 16
    centers = rng.normal(0, 1, (5, dim))
    right_rows, left_rows = [], []
    for i in range(200):
        c = centers[i % 5]
        right_rows.append((i, [float(x) for x in c + rng.normal(0, 0.05, dim)]))
    for i in range(20):
        c = centers[i % 5]
        left_rows.append((1000 + i, [float(x) for x in c + rng.normal(0, 0.05, dim)]))
    right = spark.createDataFrame(right_rows, "vec_id long, embedding array<double>")
    left = spark.createDataFrame(left_rows, "query_id long, embedding array<double>")

    got = ann_join(left, right, k=5, dim=dim)
    pairs = {
        (r["query_id"], r["vec_id"]) for r in got.collect()
    }
    # brute-force truth via cosine_topk (right as corpus, left as queries)
    truth = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(right, left, k=5).collect()
    }
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.9, recall
    # per-left k bound holds
    from collections import Counter

    per_left = Counter(q for q, _ in pairs)
    assert max(per_left.values()) <= 5

    # shuffle-join viability: same answer with broadcast disabled
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out2 = ann_join(left, right, k=5, dim=dim)
        plan = out2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        pairs2 = {(r["query_id"], r["vec_id"]) for r in out2.collect()}
        assert pairs2 == pairs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_semantic_dedup_drops_higher_id_of_close_pair(spark):
    """SemDeDup: within a cell the lowest id of a near-identical group
    survives; distant vectors survive everywhere; the max_cell cap
    excludes oversized cells from comparison (members pass undropped)."""
    import numpy as np
    from pyspark.sql import Observation

    from amazon_lookout_for_equipment_python_sdk_spark.operators.similarity import (
        semantic_dedup,
    )

    centroids = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = [
        (0, [1.0, 0.05]),   # cell 0
        (1, [1.0, 0.06]),   # cell 0, ~identical to 0 -> dropped
        (2, [0.9, 0.4]),    # cell 0, distinct direction
        (10, [0.0, 1.0]),   # cell 1
        (11, [0.05, 1.0]),  # cell 1, ~identical to 10 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cell"], r["dropped"])
        for r in semantic_dedup(df, centroids, threshold=0.99).collect()
    }
    assert got[0] == (0, False) and got[1] == (0, True)
    assert got[10] == (1, False) and got[11] == (1, True)
    assert got[2][1] is False  # similar-but-not-duplicate survives

    # cap: cell 0 (3 members) excluded from comparison entirely
    obs = Observation()
    capped = semantic_dedup(
        df, centroids, threshold=0.99, max_cell=2, cap_observation=obs
    )
    got = {r["vec_id"]: r["dropped"] for r in capped.collect()}
    assert got[1] is False  # would-be duplicate passes through uncompared
    assert got[11] is True  # cell 1 (2 members) still compared
    assert obs.get["dropped_cells"] == 1


def test_dsir_prefers_target_shaped_documents(spark):
    """DSIR: raw docs built from the target domain's vocabulary must
    outscore raw docs from a disjoint vocabulary, and scores are exact
    1e-4-grid values."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dsir import (
        dsir_logratio,
        dsir_scores,
        hashed_ngram_counts,
    )

    target = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "alpha beta gamma beta"),   # target-shaped
            (101, "zeta eta theta iota"),     # off-domain
            (102, "alpha beta alpha beta"),   # target-shaped
        ],
        "doc_id long, text string",
    )
    rawc = hashed_ngram_counts(raw, 256)
    tgc = hashed_ngram_counts(target, 256)
    lr = dsir_logratio(rawc, tgc, 256)
    got = {r["doc_id"]: r["logw"] for r in dsir_scores(rawc, lr).collect()}
    assert got[100] > got[101] and got[102] > got[101]
    for v in got.values():
        assert abs(v * 1e4 - round(v * 1e4)) < 1e-9  # exact grid value


def test_embedding_near_dup_auto_planes_scales_with_corpus(spark):
    """planes_per_table=None derives the plane count from the corpus
    size (expected bucket occupancy ~ target_bucket), and recall against
    the explicit-plane run holds on a corpus with known near-dups."""
    import numpy as np

    from amazon_lookout_for_equipment_python_sdk_spark.operators.similarity import (
        embedding_near_dup,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # every 8th vector gets a near-identical twin
        if i % 8 == 0:
            rows.append((1000 + i, [float(x) for x in v + rng.normal(scale=0.01, size=64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 45 rows, target_bucket 8 -> planes = ceil(log2(45/8)) = 3 -> floor 4
    auto = embedding_near_dup(df, threshold=0.95, target_bucket=8)
    explicit = embedding_near_dup(df, threshold=0.95, planes_per_table=4)
    pa = {(r.a, r.b) for r in auto.collect()}
    pe = {(r.a, r.b) for r in explicit.collect()}
    twins = {(i, 1000 + i) for i in range(0, 40, 8)}
    assert twins <= pa and twins <= pe  # all real twins found both ways


def test_semantic_dedup_adaptive_cells(spark):
    """centroids=None derives n_cells = clamp(isqrt(n), 16, 4096) and
    seeds Voronoi cells with the n_cells LOWEST-id vectors.  Pinned
    non-vacuously (r7 ADVICE: the old 66-row fixture sat under the
    16-cell floor and compared only colinear dropped flags, which match
    for ANY seed set): n=300 puts isqrt(300)=17 above the floor, the
    explicit comparison seeds the SAME 17 centroids the derivation must
    pick, and the assertion covers CELL ASSIGNMENTS — with 300 diverse
    8-dim directions, a wrong cell count or wrong seed selection yields
    different cells, not just different flags."""
    import math

    import numpy as np

    from amazon_lookout_for_equipment_python_sdk_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(297, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, rows[i][1]) for i in (3, 50, 200)]  # exact dupes
    assert math.isqrt(len(rows)) == 17  # fixture sized above the 16 floor
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    auto = {
        r["vec_id"]: (r["cell"], r["dropped"])
        for r in semantic_dedup(df, None, threshold=0.999999).collect()
    }
    seeds = np.stack(
        [np.asarray(rows[i][1], dtype=np.float64) for i in range(17)]
    )
    explicit = {
        r["vec_id"]: (r["cell"], r["dropped"])
        for r in semantic_dedup(df, seeds, threshold=0.999999).collect()
    }
    assert auto == explicit  # same cells AND same flags, per vector
    # every one of the 17 derived cells is occupied (each seed is its own
    # nearest centroid) — a 16-cell floor fallback could not produce this
    assert len({c for c, _ in auto.values()}) == 17
    # exact dupes land in their original's cell and drop; originals survive
    for i in (3, 50, 200):
        assert auto[i][1] is False and auto[1000 + i][1] is True
        assert auto[i][0] == auto[1000 + i][0]


def test_decontaminate_spans_cross_corpus(spark):
    """Span-level decontamination: exactly the train characters that
    occur verbatim in the eval corpus are located (0-based [start, end)
    maximal spans) and surgically removable; train-internal duplicates
    alone do NOT mark (cross-corpus, not self)."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        decontaminate_spans,
        remove_duplicate_spans,
    )

    leak = "the quick brown fox jumps over the lazy dog"  # 43 chars
    train = spark.createDataFrame(
        [
            (1, f"AAA {leak} ZZZ"),
            (2, "completely unrelated training text with no overlap here"),
            # train-internal dup pair (same text twice) — must NOT mark
            (3, "train internal duplicate sentence body padding padding"),
            (4, "train internal duplicate sentence body padding padding"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark prompt: {leak} (answer: dog)")],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in decontaminate_spans(train, ev, k=20).collect()
    }
    assert set(spans) == {1}
    s, e = spans[1]
    # the marked span is the leaked substring PLUS its flanking spaces —
    # " the quick…" and "…lazy dog " (20-grams spanning the boundary)
    # also occur verbatim in the eval text
    assert (s, e) == (3, 4 + len(leak) + 1)
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            train, decontaminate_spans(train, ev, k=20)
        ).collect()
    }
    assert cleaned[1] == "AAA ZZZ"
    assert leak not in cleaned[1]
    src3 = train.filter("doc_id = 3").collect()[0]["text"]
    assert cleaned[3] == src3  # untouched


def test_keep_best_per_cluster_quality_argmax(spark):
    """Keep-best survival: per cluster the HIGHEST-quality member wins,
    ties break to the lowest id, singletons always survive."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    docs = spark.createDataFrame(
        [
            (1, "short", 5.0),
            (2, "the long clean copy", 9.0),   # cluster {1,2,3}: best
            (3, "mangled", 9.0),               # ties 2 on quality; 2 wins (lower id)
            (7, "solo", 1.0),                  # singleton
        ],
        "doc_id long, text string, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "doc_id long, cluster long"
    )
    kept = {
        r["doc_id"]
        for r in keep_best_per_cluster(docs, clusters, "q").collect()
    }
    assert kept == {2, 7}


def test_keep_best_per_cluster_partial_coverage_and_string_ids(spark):
    """Two r7-verdict hardenings pinned together: (1) ids ABSENT from the
    ``clusters`` frame survive — a caller passing a pairs-derived label
    frame (covering only dup'd docs) must not silently drop singletons;
    (2) string ids work, ordering lexicographically on quality ties (the
    old ``-F.col(id)`` tie-break required numeric ids)."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    docs = spark.createDataFrame(
        [
            ("doc-a", 5.0),
            ("doc-b", 9.0),   # ties doc-c on quality; wins lexicographically
            ("doc-c", 9.0),
            ("doc-x", 1.0),   # NOT covered by clusters -> must survive
            ("doc-y", 0.0),   # NOT covered by clusters -> must survive
        ],
        "doc_id string, q double",
    )
    clusters = spark.createDataFrame(
        [("doc-a", "doc-a"), ("doc-b", "doc-a"), ("doc-c", "doc-a")],
        "doc_id string, cluster string",
    )
    kept = {
        r["doc_id"]
        for r in keep_best_per_cluster(docs, clusters, "q").collect()
    }
    assert kept == {"doc-b", "doc-x", "doc-y"}


def test_keep_best_per_cluster_null_quality_always_loses(spark):
    """r8 review finding: the min_by(struct(-q, id)) rewrite would let a
    NULL-quality doc WIN its cluster (NULL sorts first ascending),
    inverting the max_by-era rule that unscored docs never beat scored
    ones.  Pinned: scored best wins over NULL; an all-NULL cluster
    falls back to its lowest id."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    docs = spark.createDataFrame(
        [(1, 9.0), (2, None), (3, 1.0), (10, None), (11, None)],
        "doc_id long, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster long",
    )
    kept = {
        r["doc_id"]
        for r in keep_best_per_cluster(docs, clusters, "q").collect()
    }
    assert kept == {1, 10}


def test_keep_best_per_cluster_non_finite_quality(spark):
    """r9 (ADVICE r8): the +inf NULL sentinel made quality == -inf
    indistinguishable from unscored, and NaN quality (Spark orders NaN
    greatest, so -q = NaN sorts past +inf) lost even to NULL.  The
    explicit null-flag struct restores the documented rule at non-finite
    inputs: any SCORED doc — including -inf and NaN — beats NULL, and
    among scored docs NaN is the worst, -inf next-worst."""
    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    inf, nan = float("inf"), float("nan")
    docs = spark.createDataFrame(
        [
            # cluster 1: -inf is a scored doc and must beat NULL
            (1, None), (2, -inf),
            # cluster 10: NaN is a scored doc and must beat NULL
            (10, nan), (11, None),
            # cluster 20: NaN is the WORST scored value (after -inf)
            (20, nan), (21, -inf),
            # cluster 30: +inf beats any finite score
            (30, inf), (31, 1e308),
        ],
        "doc_id long, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10), (20, 20), (21, 20),
         (30, 30), (31, 30)],
        "doc_id long, cluster long",
    )
    kept = {
        r["doc_id"]
        for r in keep_best_per_cluster(docs, clusters, "q").collect()
    }
    assert kept == {2, 10, 21, 30}


def test_keep_best_per_cluster_matches_python_reference_randomized(spark):
    """Randomized (seeded) equivalence vs a plain-python reference of the
    full r8 contract: per cluster keep argmax by (quality desc, NULLs
    strictly last, ties lowest id); ids uncovered by the clusters frame
    always survive.  One Spark round-trip over 3 seeds keeps it cheap."""
    import random

    from amazon_lookout_for_equipment_python_sdk_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    for seed in (7, 41, 1009):
        rng = random.Random(seed)
        n = 60
        docs = [
            (i, rng.choice([None, round(rng.uniform(0, 5), 3)]))
            for i in range(n)
        ]
        covered = [i for i in range(n) if rng.random() < 0.7]
        clusters = [(i, rng.randrange(8)) for i in covered]

        # python reference
        by_cluster: dict[int, list[int]] = {}
        qual = dict(docs)
        for i, c in clusters:
            by_cluster.setdefault(c, []).append(i)
        expect = {i for i in range(n) if i not in dict(clusters)}
        for members in by_cluster.values():
            expect.add(
                min(
                    members,
                    key=lambda i: (
                        (0, -qual[i]) if qual[i] is not None else (1, 0),
                        i,
                    ),
                )
            )

        ddf = spark.createDataFrame(docs, "doc_id long, q double")
        cdf = spark.createDataFrame(clusters, "doc_id long, cluster long")
        got = {
            r["doc_id"]
            for r in keep_best_per_cluster(ddf, cdf, "q").collect()
        }
        assert got == expect, (seed, got ^ expect)


def test_near_dup_clusters_deep_chain_converges(spark):
    """Chain-shaped duplicate cluster (1-2-3-...-n): diameter = n-1, so
    label propagation needs ~n rounds.  Each round references the
    previous labels TWICE, so without the every-4-rounds localCheckpoint
    plan cut the analyzed tree doubles per round (2^29 plan nodes for
    this chain — analysis hangs long before compute; the r14 pagerank
    lesson).  The test both pins correctness on a deep diameter and
    times out on a plan-growth regression."""
    import amazon_lookout_for_equipment_python_sdk_spark.operators.dedup as dd
    from pyspark.sql import functions as F

    n = 30
    ids = spark.range(1, n + 1).select(F.col("id").alias("doc_id"))
    pairs = spark.range(1, n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    clusters = {
        r["doc_id"]: r["cluster"]
        for r in dd.near_dup_clusters(ids, pairs, max_iter=n + 2).collect()
    }
    assert set(clusters.values()) == {1} and len(clusters) == n
