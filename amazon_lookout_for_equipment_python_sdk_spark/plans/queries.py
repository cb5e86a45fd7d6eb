"""Aggregated query registry — importing each layer registers its queries.

Registry ORDER is part of the driver contract: the driver's correctness
harness evaluates the first 50 registered queries, so any query whose
implementation changed since its last green CORRECTNESS row MUST sit
inside that window.  ``_MUST_VERIFY`` pins the queries that lack a green
driver row from the previous round to the FRONT of the registry, and
``_STABLE_TAIL`` rotates long-green, untouched queries past position 50.
tests/test_driver_contract.py asserts both properties.
"""

from __future__ import annotations

from .registry import ORACLE_SQL, QUERIES, load  # noqa: F401
from . import timeseries_q  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import corpus_q  # noqa: F401,E402
from . import anomaly_q  # noqa: F401,E402

# Queries lacking a green driver CORRECTNESS row as of r4 (r4's driver
# checked registry positions 0-49 of 57; these sat at 50-56 or returned a
# non-atomic column), plus queries whose implementation changed this round.
_MUST_VERIFY: list[str] = [
    "embedding_l2_normalize",   # r4 red: array cell crashed driver canonicalizer
    "sessionize_events",        # never driver-green (r3 err, r4 skipped)
    "sessionize_events_skew",
    "tfidf_top_terms",          # reworked in r4 after last green row
    "length_quantiles_by_source",
    "redact_pii",
    "pack_documents",
    "corpus_pipeline",
    "ivf_cosine_topk",           # new in r5
    "repetition_stats",          # new in r5
    "lang_centroid_components",  # new in r5
    "json_props_stats",          # new in r5
    "zipf_top_tokens",           # new in r5
    "winnow_shared_fingerprints",  # new in r5
    "pack_texts",                # new in r5
    "pq_adc_topk",               # new in r5
    "ivfpq_adc_topk",            # new in r5
    "asof_join_purchases",       # new in r5
    "temperature_sample_lang",   # new in r5
    "hll_distinct_shingles",     # new in r5
    "cms_token_counts",          # new in r5
    "bloom_prune_semi_join",     # new in r5
    "line_dedup_survivors",      # new in r5
    "bigram_lm_perplexity",      # new in r5
    "zorder_key_events",         # new in r5
    "kmv_corpus_overlap",        # new in r5
    "incremental_dedup_batch",   # new in r5
    "duplicate_spans_k20",       # new in r5
    "q3_shipping_priority",      # new in r5
    "q5_local_supplier_volume",  # new in r5
    "q6_forecast_revenue",       # new in r5
    "rolling_zscore_anomalies",  # new in r5
    "rolling_zscore_anomalies_chunked",  # new in r5
    "cusum_drift_flags",         # new in r5
    "signal_spearman_corr",      # new in r5
    "signal_autocorr_lag1",      # new in r5
    "orders_upsert_merge",       # new in r5
    "cdc_latest_state",          # new in r5
    "q10_returned_items",        # new in r5
    "funnel_conversion",         # new in r5
    "mad_robust_outliers",       # new in r5
    "dq_violations_events",      # new in r5
    # implementation touched in r5 (in-expansion pair verify; grid-join
    # broadcast side) — must re-verify even though green in r4
    "simhash_near_pairs",
    "ngram_jaccard_lsh",
    "minhash_lsh_candidates",
    "embedding_near_dup",
    "near_dup_clusters",
    "histogram_20bin",
    "wasserstein_rank",
    "wasserstein_raw_rank",
]

# R6 VERIFICATION QUEUE: _MUST_VERIFY is at the 50-entry driver window
# cap, so these late-r5 additions register in the MIDDLE section (past
# position 50 — locally oracle-verified via tools/check.py, no driver row
# this round).  They MUST move into _MUST_VERIFY at the start of r6:
#   token_entropy, orders_cube_rollup, sensor_gap_report,
#   seasonal_hourly_anomalies, scd2_orders_history, normalize_text_md5,
#   dq_embeddings, funnel_three_step, ntile_quartile_stats,
#   except_all_event_types, fuzzy_name_pairs, forecast_smape_baseline,
#   rolling_corr_click_view, unpivot_lineitem_measures,
#   seasonal_decompose_profile, interval_overlap_error_click,
#   hashed_embedding_components, ewma_chart, session_window_native,
#   top3_orders_per_segment, distinct_users_per_signal
# (tests/test_driver_contract.py pins the window property; this list is
# the hand-off note.)

# Long-stable queries (green since r1/r2, untouched) rotated past the
# driver's 50-query window to make room.  Anything here must NOT be
# modified without moving it back into the window.
_STABLE_TAIL: list[str] = [
    "resample_mean",
    "resample_first",
    "minmax_per_signal",
    "floor_slot_15min",
    "shift_restamp",
    "positional_restamp",
    "topk_orders",
    "top_customers_by_spend",
    "union_distinct_labels",
    "membership_isin",
    "range_expand_1min",
    "pivot_wide",
    "time_features",
    "status_filter_counts",
    "off_condition_filter",
    "semi_join_active_customers",
    "train_eval_split",
    "lead_pairs_chunks",
    "q1_pricing_summary",
    "anti_join_inactive_customers",
]


def _reorder() -> None:
    order = (
        [n for n in _MUST_VERIFY if n in QUERIES]
        + [n for n in QUERIES if n not in _MUST_VERIFY and n not in _STABLE_TAIL]
        + [n for n in _STABLE_TAIL if n in QUERIES]
    )
    assert len(order) == len(QUERIES), "reorder lost/duplicated queries"
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_reorder()
