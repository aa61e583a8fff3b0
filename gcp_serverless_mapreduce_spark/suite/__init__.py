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

# Round-5 window head (the driver checks the FIRST ~50 registered).
# Priority order:
# 1) the queries RED in CORRECTNESS_r04 — the three roundtrip
#    fingerprints (never green in any round; NTZ fix + unix_micros
#    rewrite now pass locally), window_event_value_delta,
#    clicks_within_1h_of_error, and the NTZ-broken streaming family
#    (all repaired by the load_table TIMESTAMP_NTZ normalization);
# 2) ngram_jaccard_dups + dup_clusters — the Jaccard oracle gained the
#    df_max hot-shingle cap this round and needs a fresh driver green;
# 3) queries NEW this round (sketches, linkage, DSIR/quality scoring,
#    token-id fingerprints, splits, entropy/KL);
# 4) as many of the earlier never-driver-checked round-5 additions as
#    fit (multi-probe ANN, outer stream joins, containment, vocab/PMI,
#    hybrid RRF, weighted sampling, BM25/chunks/splits, PageRank,
#    prefix-Jaccard, SemDeDup, behavioral analytics, CDC, z-order);
#    the remainder rotates into the round-6 window.  Local full-suite
#    parity evidence for everything: PARITY_LOCAL.txt / PARITY_SF01.txt.
promote([
    # -- red in r4: must turn green --
    "events_json_roundtrip_fingerprint",
    "events_csv_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "window_event_value_delta",
    "clicks_within_1h_of_error",
    "stream_windowed_event_stats",
    "stream_windowed_event_stats_rate",
    "stream_click_purchase_join",
    "stream_session_stats",
    "sessionize_user_events",
    "stream_user_totals_stateful",
    # -- oracle changed this round --
    "ngram_jaccard_dups",
    "dup_clusters",
    # -- new this round --
    "logistic_gd_train",
    "bpe_learn_merges",
    "stream_windowed_event_stats_pyds",
    "pyds_click_user_stats",
    "corpus_prep_pipeline_v2",
    "weighted_sample_per_source",
    "contrastive_negatives",
    "event_pattern_matches",
    "embedding_dim_stats",
    "bpe_piece_stats",
    "walkforward_fold_counts",
    "image_phash_groups",
    "stream_hourly_topk_events",
    "epoch_shuffle_plan",
    "lang_mixture_reweight",
    "value_histogram_quantiles",
    "hourly_event_anomalies",
    "incremental_order_totals",
    "user_error_purchase_overlap",
    "pmi_graph_triangles",
    "cms_heavy_hitter_words",
    "kmv_distinct_users",
    "sorted_neighborhood_dups",
    "customer_record_linkage",
    "dsir_importance_weights",
    "quality_logit_scores",
    "doc_token_ids_fingerprint",
    "leakage_safe_split_counts",
    "doc_token_entropy",
    "source_token_kl",
    # -- earlier round-5 additions, never driver-checked --
    "srp_multiprobe_topk",
    "stream_click_purchase_full_join",
    "stream_click_purchase_left_join",
    "containment_dups",
    "vocab_top_words",
    "word_cooccurrence_pmi",
    "hybrid_rrf_topk",
    "weighted_sample_bychars",
    "bm25_doc_scores",
    "doc_overlapping_chunks",
    "dataset_split_counts",
    "pagerank_customer_supplier",
    "jaccard_prefix_dups",
    "semdedup_discards",
    "funnel_signup_click_purchase",
    "event_transition_matrix",
    "user_retention_cohorts",
    "label_centroid_distances",
    "quality_percentile_filter",
    "stream_static_enrich",
    "snapshot_diff_customers",
    "time_weighted_avg_value",
    "m4_downsample_hourly",
    "bigram_coherence_score",
    "dedup_resolution_by_source",
    "regression_price_vs_quantity",
    "events_json_corrupt_routing",
    "stream_dedup_windowed_stats",
    "symspell_handle_match",
    "sequence_packing_plan",
    "temperature_mixed_sample",
    "scd2_customer_order_versions",
    "stream_dedup_replayed_events",
    "domain_capped_corpus",
    "latest_event_per_user",
    "zorder_layout_keys",
    "ann_recall_eval",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
