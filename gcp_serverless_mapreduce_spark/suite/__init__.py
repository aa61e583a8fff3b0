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

# Round-7 window head (the driver checks the FIRST ~50 registered).
# Priority order:
# 1) the six queries NEW this round (never driver-checked);
# 2) the ATTESTATION-FRESHNESS rotation the round-6 verdict asked for:
#    the 43 queries last driver-checked in r2/r3 (before the r5/r6
#    refactors of shared helpers), oldest first — after r7 the maximum
#    attestation age of any query drops to 3 rounds;
# 3) the queries whose code changed THIS round, riskiest first (the
#    format-roundtrip trio at the tail changed only its scratch path).
promote([
    # -- new this round (6) --
    "knn_label_consistency",
    "dup_cluster_representatives",
    "bpe_fertility_by_lang",
    "value_outliers_mad",
    "unimax_language_budget",
    "table_quality_audit",
    # -- last driver-checked in round 2 (8) --
    "customers_with_big_orders",
    "customers_without_orders",
    "distinct_status_priority",
    "order_fill_stats",
    "orders_per_nation",
    "q3_top_unshipped_orders",
    "q5_supplier_volume_by_nation",
    "window_running_spend",
    # -- last driver-checked in round 3 (32 of 35; the three behind
    #    the window rotate to round 8's head) --
    "audio_decode_roundtrip",
    "clean_text_stats",
    "corpus_prep_pipeline",
    "cosine_topk_bruteforce",
    "doc_fingerprints",
    "doc_quality_scores",
    "docs_per_word_salted",
    "embedding_near_dup_pairs",
    "events_json_stats",
    "image_decode_roundtrip",
    "ivf_fixed_cells_topk",
    "language_confusion",
    "language_id",
    "language_id_chargram",
    "media_decode_features",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "multimodal_feature_table",
    "multires_event_rollup",
    "q16_parts_supplier_relationship",
    "q20_excess_shipments_suppliers",
    "q21_suppliers_kept_orders_waiting",
    "repetition_quality_filter",
    "simhash_fingerprints",
    "simhash_near_dups",
    "sq8_ann_topk",
    "srp_ann_topk",
    "srp_bucket_stats",
    "stratified_sample_by_lang",
    "stream_distinct_user_event_pairs",
    "tfidf_top_terms",
    "token_count_by_source",
    # -- changed this round: fresh green needed; all four semantics-
    #    changed queries sit inside the 50-query window (6 new + 8 r2
    #    + 32 r3 + these 4 = 50 exactly) --
    "ivf_ann_topk",            # Lloyd now trains on the 1-in-4 hash-sample
    "bpe_learn_merges",        # keep rule extended with concat clauses
    "max_shared_span_pairs",   # exact per-pair span refinement
    "events_parquet_schema_evolution",  # props sentinel parity changed
    # -- behind the window: first the six queries added in the round-7
    #    continuation (builder-parity-green at sf0.001+sf0.01 this
    #    round; they lead round 8's window for driver attestation —
    #    the 50 slots above are reserved for the verdict's stale-
    #    rotation plan), then r3 stragglers + scratch-path-only
    #    changes --
    "hll_distinct_users",
    "hll_merge_equivalence",
    "hll_hourly_rollup_daily",
    "stream_hll_distinct_users",
    "fim_split_plan",
    "join_key_skew_profile",
    "source_boilerplate_prefix",
    "bloom_semijoin_reduction",
    "neyman_allocation_sample",
    "video_decode_roundtrip",
    "word_bigram_freq_udtf",
    "word_commonness_by_source_salted",
    "events_json_roundtrip_fingerprint",   # per-session scratch path only
    "events_csv_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
