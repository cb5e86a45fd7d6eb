"""Structured Streaming scheduler semantics (SURVEY §2.10 ST1-ST8)."""

from .stateful import (  # noqa: F401
    compact_runs_stream,
    sessionize_stream,
    streaming_dedup_exact,
    streaming_lang_centroids,
    streaming_minhash_candidates,
    streaming_ngram_jaccard_lsh,
    streaming_resample_mean,
    streaming_quantile_p2,
    streaming_ewma,
    streaming_gap_monitor,
    streaming_zscore,
    streaming_topk_tokens,
)
from .scheduler import (  # noqa: F401
    InferenceScheduler,
    SchedulerConfig,
    build_inspection_report,
    expected_filenames,
    export_report_to_html,
    generate_replay_data,
    next_wakeup,
    prepare_inference_data,
    slot_bounds_for,
)
