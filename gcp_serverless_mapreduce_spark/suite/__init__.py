"""Query suite: importing this package registers every query family.

Submodules (one per operator family, mirroring SURVEY.md §2 + the
LLM-pipeline extensions):

- ``anagram_q``    : the reference's pipeline (P1-P9, A1-A4)
- ``relational_q`` : joins/aggs/windows/setops/date/json (SURVEY §2.6)
- ``dedup_q``      : exact + MinHash-LSH + SimHash + Jaccard + embedding
- ``similarity_q`` : brute-force cosine top-k + SRP-LSH ANN
- ``textstats_q``  : language-ID, quality, token counts, fingerprints
- ``streaming_q``  : Structured Streaming windowed stats + sessionization
- ``multimodal_q`` : binary payloads through pandas decode/frame/resize
- ``temporal_q``   : as-of join + binned range join
"""

from ..registry import oracle_sql, promote, queries, register  # noqa: F401

# The driver's correctness gate checks registry entries front-to-back
# within a bounded window (50 in rounds 1-2).  Round 1 led with the
# relational block, round 2 with the LLM-pipeline families; the
# ``promote()`` call below now rotates exactly the queries that have
# never had (or newly need) a green oracle row to the front, so every
# round's window covers the unverified frontier first.
from . import anagram_q  # noqa: F401, E402
from . import dedup_q  # noqa: F401, E402
from . import similarity_q  # noqa: F401, E402
from . import textstats_q  # noqa: F401, E402
from . import streaming_q  # noqa: F401, E402
from . import multimodal_q  # noqa: F401, E402
from . import temporal_q  # noqa: F401, E402
from . import relational_q  # noqa: F401, E402
from . import tpch_extra_q  # noqa: F401, E402
from . import formats_q  # noqa: F401, E402
from . import curation_q  # noqa: F401, E402
from . import layout_q  # noqa: F401, E402
from . import behavior_q  # noqa: F401, E402
from . import graph_q  # noqa: F401, E402
from . import retrieval_q  # noqa: F401, E402
from . import sketch_q  # noqa: F401, E402
from . import linkage_q  # noqa: F401, E402
from . import profiling_q  # noqa: F401, E402

# Round-9 window head (the driver checks the FIRST ~50 registered).
# The window retires attestation debt, oldest first (VERDICT r8
# items 1-2), plus the one query new this round:
# 1) ALL 20 queries last driver-attested in round 4 — after this round
#    no query's attestation is older than round 5;
# 1b) pq_trained_adc_topk, NEW this round (PQ-ADC over codebooks
#    trained by deterministic per-subspace Lloyd rounds — closes the
#    "a deployment would train the books" gap; the measured recall
#    lift is in TUNING.md);
# 2) the two queries whose SEMANTICS changed this round:
#    gopher_rule_filter (the symbol/ellipsis battery now also counts
#    the Unicode ellipsis U+2026 in both engines) and bpe_learn_merges
#    (2 rounds x batch 8 instead of 4 x 4 — same max vocab, half the
#    corpus scans; the learned table differs);
# 3) 27 of the 48 round-5-era queries, leading with bpe_piece_stats
#    (pins the FIXED merge-table chain untouched by the learn-side
#    re-batch) and the streaming block (most stateful, hardest to
#    re-derive from builder parity alone).  The remaining 21 r5
#    queries lead round 10:
#    srp_multiprobe_topk, source_token_kl, quality_logit_scores,
#    sessionize_user_events, sorted_neighborhood_dups,
#    user_error_purchase_overlap, value_histogram_quantiles,
#    vocab_top_words, walkforward_fold_counts,
#    weighted_sample_per_source, window_event_value_delta,
#    word_cooccurrence_pmi, ngram_jaccard_dups, logistic_gd_train,
#    leakage_safe_split_counts, lang_mixture_reweight,
#    kmv_distinct_users, incremental_order_totals, hybrid_rrf_topk,
#    image_phash_groups, hourly_event_anomalies.
promote([
    # -- last driver-checked in round 4 (all 20) --
    "asof_click_before_purchase",
    "bucket_histogram",
    "chunk_dedup_docs",
    "daily_orders_gapfilled",
    "hot_key_join_aqe",
    "image_resize_plan",
    "locf_hourly_event_values",
    "media_feature_summary",
    "ngram_contamination",
    "orders_by_month",
    "part_string_functions",
    "pii_redaction_stats",
    "pivot_priority_by_status",
    "pq_adc_topk",
    "pq_code_stats",
    "price_quantiles_by_flag",
    "setops_customer_segments",
    "top20_lineitems_by_price",
    "udaf_geomean_by_status",
    "video_frame_samples",
    # -- new this round (1) --
    "pq_trained_adc_topk",
    # -- semantics changed this round (2) --
    "gopher_rule_filter",
    "bpe_learn_merges",
    # -- round-5-era re-attestation (29 of 48) --
    "bpe_piece_stats",
    "stream_click_purchase_full_join",
    "stream_click_purchase_join",
    "stream_click_purchase_left_join",
    "stream_hourly_topk_events",
    "stream_session_stats",
    "stream_user_totals_stateful",
    "stream_windowed_event_stats",
    "stream_windowed_event_stats_pyds",
    "stream_windowed_event_stats_rate",
    "pyds_click_user_stats",
    "events_csv_roundtrip_fingerprint",
    "events_json_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "clicks_within_1h_of_error",
    "cms_heavy_hitter_words",
    "containment_dups",
    "contrastive_negatives",
    "corpus_prep_pipeline_v2",
    "customer_record_linkage",
    "doc_token_entropy",
    "doc_token_ids_fingerprint",
    "dsir_importance_weights",
    "dup_clusters",
    "embedding_dim_stats",
    "epoch_shuffle_plan",
    "event_pattern_matches",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
