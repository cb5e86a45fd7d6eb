"""Deterministic mergeable sketches: HyperLogLog distinct counting and
count-min frequency estimation.

Production profilers run these over corpora where exact answers need a
full shuffle of the key space: a 100 TB corpus has billions of distinct
shingles, and ``count(DISTINCT x)`` materializes all of them, while an
HLL register table is a CONSTANT 2^p rows per group and a count-min table
``depth x width`` counters — both built by one map-combinable aggregation
and mergeable across partitions/days by construction (max for HLL, sum
for CMS).

Unlike the engines' built-ins (``approx_count_distinct`` etc.), whose
hash functions differ per engine, these sketches hash with the repo's
portable md5 idiom (``conv(substr(md5(x),1,12),16,10)``) and do all
estimate arithmetic in exact integers plus fixed-shape IEEE double
expressions — so a DuckDB oracle reproduces every register, counter, and
estimate bit-for-bit (the repo's float-discipline, plans/registry.py).

HLL per Flajolet et al. 2007: p index bits, rank = leading zeros of the
40-bit hash suffix + 1, registers = per-bucket max rank, estimate =
alpha_m * m^2 / sum(2^-M) with linear counting below 2.5m.  The
indicator sum is computed as an EXACT integer (sum of 2^(41-M), missing
buckets contributing 2^41 algebraically — no register-grid join).

Count-min per Cormode & Muthukrishnan 2005: depth independent hash rows,
estimate = min over rows of the (row, hash(item)) counter; strictly an
overestimate with the classic (eps, delta) guarantee.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .._persist import note_persist as _note_persist


def _hash48(col: Column, salt: str | None = None) -> Column:
    """Portable 48-bit md5 hash (same construction as text.fingerprint_
    bucket); ``salt`` derives independent hash functions for CMS rows."""
    s = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


# --- HyperLogLog ------------------------------------------------------------

_HLL_P = 8  # 2^8 = 256 registers; suffix = 40 bits; max rank = 41


def hll_registers(
    df: DataFrame,
    item_col: str,
    group_col: str,
) -> DataFrame:
    """HLL register table: one row per (group, bucket) with the max rank
    seen — the sketch's mergeable state (merge = max by bucket).  Only
    OCCUPIED buckets appear; absent buckets are rank 0 by convention and
    :func:`hll_estimate` accounts for them algebraically.

    Scale: one map-combinable aggregation; output is <= groups x 256 rows
    no matter the corpus size."""
    m = 1 << _HLL_P
    h = _hash48(F.col(item_col))
    v = F.shiftright(h, _HLL_P)  # 40-bit suffix (exact bit shift)
    # rank = leading zeros of the 40-bit suffix + 1 = 41 - bit_length(v);
    # bin() prints without leading zeros in both engines, so bit_length
    # is just length(bin(v)); v = 0 means 40 zeros -> rank 41
    rank = F.when(v == 0, F.lit(41)).otherwise(
        F.lit(41) - F.length(F.bin(v))
    )
    return (
        df.select(
            F.col(group_col),
            (h % F.lit(m)).alias("bucket"),
            rank.alias("_rank"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("_rank").alias("register"))
    )


#: alpha_256 * m^2 * 2^41 — precomputed to one double literal so both
#: engines parse the identical constant (0.7213 / (1 + 1.079/256) scaled)
_HLL_NUMERATOR = 1.0351398986589102e17


def hll_estimate(registers: DataFrame, group_col: str) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    The harmonic indicator sum(2^-M) over ALL m buckets is the exact
    integer sum(2^(41 - M)) / 2^41 — present buckets contribute their
    register term, the (m - n_present) absent buckets contribute 2^41
    each (rank 0), so no grid join is needed and the only float ops are
    one division and (in the small range) one ln, each a fixed-shape
    expression mirrored by the oracle.  Linear counting (m * ln(m / V))
    applies below 2.5m when zero registers remain, per the paper."""
    m = 1 << _HLL_P
    agg = registers.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(
            # pyspark's shiftleft() only takes a literal bit count; the
            # SQL form shifts by a column expression
            F.expr("shiftleft(cast(1 as bigint), 41 - register)")
        ).alias("_s2p"),
    )
    s2 = (
        F.col("_s2p")
        + (F.lit(m) - F.col("_n_present")) * F.lit(1 << 41).cast("long")
    )
    zeros = F.lit(m) - F.col("_n_present")  # occupied buckets have rank >= 1
    raw = F.lit(_HLL_NUMERATOR) / s2.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        group_col,
        F.floor(est * 10_000).alias("estimate_e4"),
    )


def hll_distinct(
    df: DataFrame, item_col: str, group_col: str
) -> DataFrame:
    """One-shot per-group distinct estimate (registers + estimate);
    ``estimate_e4`` is the estimate in exact 1e-4 quanta (long)."""
    return hll_estimate(hll_registers(df, item_col, group_col), group_col)


def hll_distinct_with_exact(
    df: DataFrame, item_col: str, group_col: str
) -> DataFrame:
    """Per-group EXACT distinct count and HLL estimate from ONE linear
    aggregation chain — the calibration shape a profiler runs when it
    wants both (r15, guide §2.4).

    The naive composition (``count(DISTINCT x)`` in one branch,
    :func:`hll_distinct` in the other) clones the whole corpus subtree
    per consumer — Catalyst optimizes each branch clone independently
    and ReuseExchange does not dedup them once their pushed projections
    diverge (r15 plan audit).  Here everything is one chain:

    1. distinct (group, item)              — the only corpus-wide shuffle;
    2. per (group, bucket): max rank AND the bucket's distinct-item
       count — one aggregation;
    3. per group: the register harmonic sum (identical to
       :func:`hll_estimate` — registers are a per-bucket max, invariant
       under the dedup in step 1) plus ``sum`` of the bucket counts,
       which IS the exact distinct count.

    Output: (group, n_exact, estimate_e4), bit-identical to the
    two-branch composition."""
    m = 1 << _HLL_P
    d = df.select(F.col(group_col), F.col(item_col)).distinct()
    h = _hash48(F.col(item_col))
    v = F.shiftright(h, _HLL_P)
    rank = F.when(v == 0, F.lit(41)).otherwise(
        F.lit(41) - F.length(F.bin(v))
    )
    g = (
        d.select(
            F.col(group_col),
            (h % F.lit(m)).alias("bucket"),
            rank.alias("_rank"),
            F.col(item_col),
        )
        .groupBy(group_col, "bucket")
        .agg(
            F.max("_rank").alias("register"),
            F.count(item_col).alias("_nb"),
        )
    )
    agg = g.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n_present"),
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), 41 - register)")
        ).alias("_s2p"),
        F.sum("_nb").alias("n_exact"),
    )
    s2 = (
        F.col("_s2p")
        + (F.lit(m) - F.col("_n_present")) * F.lit(1 << 41).cast("long")
    )
    zeros = F.lit(m) - F.col("_n_present")
    raw = F.lit(_HLL_NUMERATOR) / s2.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        group_col,
        F.col("n_exact"),
        F.floor(est * 10_000).alias("estimate_e4"),
    )


# --- count-min sketch -------------------------------------------------------


def cms_counters(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min counter table: ``depth`` independent salted hash rows x
    ``width`` columns; counter (d, w) accumulates the total weight of
    items hashing to w under hash d.  Output <= depth x width rows —
    CONSTANT in corpus size; merge across shards/days = sum by (d, w).

    Scale: ONE md5 per item OCCURRENCE (the 48-bit base hash), the depth
    row cells derived by universal-hash multiply-adds (the
    dedup._PERM_A/B scheme — md5 dominated the old per-(d,item) salting
    at ~4x the digests, r6 measured ~2x on the registered query), then
    one map-combinable (d, hash) aggregation."""
    rows = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("d")
    wgt = (
        F.col(weight_col) if weight_col is not None else F.lit(1).cast("long")
    )
    based = df.select(_base_h(F.col(item_col)).alias("_h"), wgt.alias("_w"))
    fanned = based.select("_h", "_w", rows)
    cell = _cell_from(F.col("_h"), F.col("d"), depth, width)
    return (
        fanned.select("d", cell.alias("w"), "_w")
        .groupBy("d", "w")
        .agg(F.sum("_w").alias("counter"))
    )


def _base_h(item: Column) -> Column:
    """48-bit md5 base hash — computed ONCE per item, shared by every
    sketch row."""
    return F.conv(F.substring(F.md5(item), 1, 12), 16, 10).cast("long")


def _cell_from(h: Column, d: Column, depth: int, width: int) -> Column:
    """Row-d cell from the base hash: ``((A[d]*h + B[d]) mod P) mod
    width`` with the same overflow-safe universal-hash constants the
    MinHash permutations use (A < 2^15 keeps A*h < 2^63 — identical
    BIGINT values on both engines)."""
    from .dedup import _PERM_A, _PERM_B, _PERM_P

    if depth > len(_PERM_A):
        # element_at past the constant table returns NULL (or errors
        # under ANSI), silently collapsing rows 8+ into one NULL cell
        # (r6 ADVICE) — refuse instead of corrupting the sketch
        raise ValueError(
            f"CMS depth {depth} exceeds the {len(_PERM_A)}-entry "
            "universal-hash constant table (operators/dedup.py _PERM_A); "
            "extend the tables or use depth <= "
            f"{len(_PERM_A)} (error bounds: delta = e^-depth)"
        )
    a = F.element_at(
        F.array(*[F.lit(x) for x in _PERM_A[:depth]]), d.cast("int") + 1
    )
    b = F.element_at(
        F.array(*[F.lit(x) for x in _PERM_B[:depth]]), d.cast("int") + 1
    )
    return ((a * h + b) % F.lit(_PERM_P)) % F.lit(width)


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query estimates for ``probes[item_col]``: min over the depth
    counters each probe hashes to.  The counter table is depth x width
    rows — broadcast — so probing any number of items is one row-local
    fan-out plus a broadcast join and a (item) min-aggregation."""
    fanned = probes.select(
        item_col,
        _base_h(F.col(item_col)).alias("_h"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
    )
    cell = _cell_from(F.col("_h"), F.col("d"), depth, width)
    probed = fanned.select(item_col, "d", cell.alias("w")).join(
        F.broadcast(counters), ["d", "w"], "left"
    )
    return probed.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_count")
    )


# --- KMV (k-minimum-values) distinct sketch ---------------------------------
#
# Bar-Yossef et al. 2002 / the DataSketches theta family: keep the k
# smallest distinct hash values per group.  Beyond cardinality (which HLL
# also gives), KMV supports SET OPERATIONS: the k smallest of a union of
# two sketches is the union's sketch, and counting how many of those fall
# in both inputs estimates Jaccard overlap — corpus-vs-corpus overlap
# estimation from two constant-size summaries, no join of the full key
# spaces.


def kmv_sketch(
    df: DataFrame,
    item_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group k smallest distinct 48-bit hashes: ``(group, rn, h)``
    with ``rn`` in [1, k].  The row_number-over-hash plan compiles to
    Spark's WindowGroupLimit: each map task pre-prunes to its local
    top-k BEFORE the shuffle, so the exchange carries k rows per
    (group, partition), never the distinct key space."""
    h = _hash48(F.col(item_col))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("h")
    return (
        df.select(F.col(group_col), h.alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        # a sketch is BY DEFINITION a constant-size summary (<= k rows
        # per group) that downstream code probes repeatedly (estimate,
        # jaccard, set ops) — persist so each consumer reads the k rows
        # instead of recomputing the corpus-wide hash+distinct lineage
        # (r7 scan audit: kmv_corpus_overlap re-ran the shingle explode
        # 4x)
        .persist()
        .transform(_note_persist)
    )


#: hash domain of _hash48
_KMV_DOMAIN = float(1 << 48)


def kmv_estimate(sketch: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: ``(k-1) / (h_k / 2^48)`` with
    the k-th smallest hash as the threshold (groups with fewer than k
    distinct values report their EXACT count)."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    exact = F.col("n_kept").cast("double")
    est = (
        (F.col("n_kept") - 1).cast("double")
        * F.lit(_KMV_DOMAIN)
        / F.col("h_k").cast("double")
    )
    return agg.select(
        group_col,
        "n_kept",
        "h_k",
        F.when(F.col("n_kept") < k, exact).otherwise(est).alias("est_distinct"),
    )


def kmv_jaccard(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """ONE-row Jaccard estimate between two single-group sketches: take
    the k smallest of the union of both hash sets, count how many appear
    in both inputs; ``jaccard_est = |both| / k`` (Beyer et al. 2007).
    All integer until the final division.

    Shape: union-all + group-by(h) with max membership flags — one
    exchange over <= 2k rows — rather than a full-outer join (which is
    broadcast-ineligible, so it cost a SortMergeJoin with an exchange +
    sort per side).  A sketch holds each h at most once, so max(flag)
    over the group is exactly the full-outer membership coalesce."""
    a = sketch_a.select(
        F.col("h").alias("h"),
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    b = sketch_b.select(
        F.col("h").alias("h"),
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    union = (
        a.unionAll(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    return union.agg(
        F.count(F.lit(1)).alias("k_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count(F.lit(1))
        ).alias("jaccard_est"),
    )


# --- GK-style mergeable quantile summaries ----------------------------------

#: (grp, src, v, r): v is the r-th smallest (1-based, EXACT) of source
#: stream ``src`` of group ``grp``
GK_PART_SCHEMA = "grp string, src string, v double, r long"

#: merged form: rank of v within the whole group is inside [rmin, rmax]
GK_SCHEMA = "grp string, v double, rmin long, rmax long"


_GK_CALL_SEQ = [0]  # per-session call counter: default source-tag salt


def _gk_sample_indices(n: int, m: int) -> list[int]:
    """0-based indices kept from a sorted block of ``n``: every
    ceil(n/m)-th element plus always the last — the pure invariant
    gk_merge composes from (property-tested directly)."""
    if n <= 0:
        return []
    step = max(1, -(-n // m))  # ceil(n/m)
    idx = list(range(step - 1, n, step))
    if not idx or idx[-1] != n - 1:
        idx.append(n - 1)
    return idx


def gk_partition_summaries(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 256,
    tag: str | None = None,
) -> DataFrame:
    """Per-task quantile summaries with EXACT local ranks (the
    Greenwald-Khanna / Agarwal et al. mergeable-summaries construction):
    each Arrow batch sorts its slice of each group and keeps every
    ceil(n_p/m)-th element plus the last, so a kept element's rank within
    its source slice is known exactly.

    Where Spark's ``percentile_approx`` hides its summary inside an
    aggregate, this one IS a DataFrame — persist it beside the data (like
    the HLL/KMV sketch tables above) and fold tomorrow's batch in with
    :func:`gk_merge` instead of rescanning history.  Zero shuffle;
    O(m) rows per (batch, group); `src` tags the slice so the merge can
    compose rank bounds additively across sources.

    ``tag`` salts the source ids — REQUIRED to be distinct when summaries
    from several builds are unioned before :func:`gk_merge` (e.g. daily
    increments), else two builds' chains collide into one source and
    rank bounds undercount.  Defaults to a per-session call counter, so
    distinct calls never collide; summaries persisted across sessions
    should pass an explicit tag (the ingest date)."""
    from collections.abc import Iterator

    if tag is None:
        _GK_CALL_SEQ[0] += 1
        tag = f"c{_GK_CALL_SEQ[0]}"
    pid = F.spark_partition_id()

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for bi, pdf in enumerate(batches):
            out_g, out_s, out_v, out_r = [], [], [], []
            for (g, p), sub in pdf.groupby([group_col, "_pid"], sort=True):
                vals = np.sort(sub[value_col].to_numpy(dtype=np.float64))
                n = len(vals)
                if n == 0:
                    continue
                idx = _gk_sample_indices(n, m)
                src = f"{tag}-{p}-{bi}"
                for i in idx:
                    out_g.append(str(g))
                    out_s.append(src)
                    out_v.append(float(vals[i]))
                    out_r.append(i + 1)
            yield pd.DataFrame(
                {"grp": out_g, "src": out_s, "v": out_v, "r": out_r}
            )

    return (
        df.select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(value_col).cast("double").alias(value_col),
            pid.alias("_pid"),
        ).mapInPandas(summarize, schema=GK_PART_SCHEMA)
    )


def gk_merge(summaries: DataFrame, m: int = 256) -> DataFrame:
    """Merge source-tagged summaries into one O(m)-row rank-interval
    summary per group.

    For candidate value v (an exact-rank point of source i), the classic
    additive composition over sources j:

        rmin(v) = Σ_j L_j(v)   L_j = rank of largest point of j <= v (0 if none)
        rmax(v) = r_i + Σ_{j≠i} U_j(v)   U_j = rank(smallest point >= v) - 1,
                                              or n_j when v > all of j

    then prune to rank spacing n/(2m) (first/last always kept).  ONE
    shuffle on the group key over summary rows only.  Two-level build
    error: per-source gap (<= n_j/m each, Σ <= n/m) + prune spacing
    (n/(2m)) — max rank error ~1.5 n/m, asserted in tests."""

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        srcs = {}
        for s, sub in pdf.groupby("src", sort=True):
            # sort by (v, r): ties on v must keep rank order so rj stays
            # monotone and rj.max() is the true source size
            sub = sub.sort_values(["v", "r"], kind="mergesort")
            srcs[s] = (
                sub["v"].to_numpy(dtype=np.float64),
                sub["r"].to_numpy(dtype=np.int64),
            )
        cand_v = pdf["v"].to_numpy(dtype=np.float64)
        cand_r = pdf["r"].to_numpy(dtype=np.int64)
        cand_s = pdf["src"].to_numpy()
        order = np.lexsort((cand_r, cand_v))
        cand_v, cand_r, cand_s = cand_v[order], cand_r[order], cand_s[order]
        nc = len(cand_v)
        rmin = np.zeros(nc, dtype=np.int64)
        rmax = np.zeros(nc, dtype=np.int64)
        for s, (vj, rj) in srcs.items():
            nj = int(rj.max())
            # L_j: largest point <= v (side='right' so ties at v count)
            pos_r = np.searchsorted(vj, cand_v, side="right")
            L = np.where(pos_r > 0, rj[np.maximum(pos_r - 1, 0)], 0)
            # U_j: first point STRICTLY above v (side='right' — a tied
            # sampled point at v must count BELOW the bound, else ties
            # shrink rmax and break the interval contract)
            U = np.where(
                pos_r < len(vj), rj[np.minimum(pos_r, len(vj) - 1)] - 1, nj
            )
            own = cand_s == s
            rmin += L
            rmax += np.where(own, cand_r, U)
        # prune to rank spacing; keep first/last
        n_total = int(rmax.max()) if nc else 0
        spacing = max(1, n_total // (2 * m))
        keep_idx = []
        last = -(10**18)
        for i in range(nc):
            if i == 0 or i == nc - 1 or rmin[i] - last >= spacing:
                keep_idx.append(i)
                last = rmin[i]
        k = np.array(keep_idx, dtype=np.int64)
        return pd.DataFrame(
            {
                "grp": [key[0]] * len(k),
                "v": cand_v[k],
                "rmin": rmin[k],
                "rmax": rmax[k],
            }
        )

    return summaries.groupBy("grp").applyInPandas(merge, schema=GK_SCHEMA)


def gk_quantile(summary: DataFrame, q: float) -> DataFrame:
    """Query a merged summary: per group, the point whose rank-interval
    midpoint is closest to 1 + q·(n-1) (ties -> smaller value).  Pure
    DataFrame: one tiny window over the O(m)-row summary."""
    from pyspark.sql import Window

    n = F.max("rmax").over(Window.partitionBy("grp"))
    target = 1.0 + F.lit(float(q)) * (n - 1).cast("double")
    dist = F.abs((F.col("rmin") + F.col("rmax")).cast("double") / 2.0 - target)
    w = Window.partitionBy("grp").orderBy(dist.asc(), F.col("v").asc())
    return (
        summary.withColumn("_n", n)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("grp", F.col("v").alias("q_est"), F.col("_n").alias("n"))
    )


def gk_sketch_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float,
    m: int = 256,
) -> DataFrame:
    """Two-level build + query: the one-call form."""
    return gk_quantile(
        gk_merge(gk_partition_summaries(df, group_col, value_col, m), m), q
    )
