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

# Round-11 window head (the driver checks the FIRST ~50 registered).
# Composition, per VERDICT r10 items 1-2 + the rotation invariant
# (every query driver-attested within the last 4 rounds):
# 1) the 6 queries that have NEVER been driver-attested — the five
#    post-window round-10 additions (badwords_filter_rates,
#    hilbert_layout_keys, k_anonymity_audit, kcenter_coreset_sample,
#    lpa_word_communities) plus audio_fingerprint_groups, new this
#    round (chromaprint-style band-energy-sign fingerprints over the
#    WAV decoder — the audio sibling of image_phash_groups);
# 2) the 4 queries whose SEMANTICS/PLAN changed this round:
#    join_key_skew_profile (dual-typed stacking lanes — integral keys
#    stay LONG through the hash aggregate, string lane only for
#    string keys; losslessness kept, the r10 1.54x cast tax retired),
#    and ivf_ann_topk / ivf_capped_train_topk / pq_trained_adc_topk
#    (training-sample modulus now derived from parquet footer
#    num_rows metadata instead of a dedicated count() scan);
#    badwords_filter_rates also changed (short-document guard +
#    quote escaping, ADVICE r10) but is already in block 1;
# 3) ALL 24 queries last driver-attested in round 6 — after this
#    round no attestation predates round 7;
# 4) 10 of the 46 round-7-era queries, leading with the ANN / sketch
#    / stateful operators (hardest to re-derive from builder parity
#    alone).  The remaining 36 r7-era queries lead round 12:
#    audio_decode_roundtrip, bpe_fertility_by_lang, clean_text_stats,
#    corpus_prep_pipeline, customers_with_big_orders,
#    customers_without_orders, distinct_status_priority,
#    doc_fingerprints, doc_quality_scores, docs_per_word_salted,
#    dup_cluster_representatives, embedding_near_dup_pairs,
#    events_json_stats, events_parquet_schema_evolution,
#    image_decode_roundtrip, language_confusion, language_id,
#    language_id_chargram, media_decode_features,
#    multimodal_feature_table, multires_event_rollup, order_fill_stats,
#    orders_per_nation, q16_parts_supplier_relationship,
#    q20_excess_shipments_suppliers, q21_suppliers_kept_orders_waiting,
#    q3_top_unshipped_orders, q5_supplier_volume_by_nation,
#    repetition_quality_filter, simhash_fingerprints, srp_bucket_stats,
#    stratified_sample_by_lang, tfidf_top_terms, value_outliers_mad,
#    window_running_spend.
promote([
    # -- never driver-attested (6) --
    "badwords_filter_rates",
    "hilbert_layout_keys",
    "k_anonymity_audit",
    "kcenter_coreset_sample",
    "lpa_word_communities",
    "audio_fingerprint_groups",
    # -- new this round: incremental IVF ingestion (ANN sibling of
    #    incremental_dedup_new_docs) + its streaming routing face,
    #    scene-change keyframe selection (the video sibling of
    #    audio_fingerprint_groups), small-file compaction planning, GDPR
    #    erasure rewrite planning, and the watermark-delay advisor --
    "ivf_incremental_ingest_topk",
    "stream_ivf_cell_routing",
    "video_keyframe_selection",
    "file_compaction_plan",
    "erasure_rewrite_plan",
    "watermark_delay_advisor",
    # -- semantics/plan changed this round (4) --
    "join_key_skew_profile",
    "ivf_ann_topk",
    "ivf_capped_train_topk",
    "pq_trained_adc_topk",
    # -- round-6-era re-attestation (all 24 remaining) --
    "m4_downsample_hourly",
    "approx_stats_parts",
    "zorder_layout_keys",
    "bigram_coherence_score",
    "bm25_doc_scores",
    "dataset_split_counts",
    "dedup_resolution_by_source",
    "doc_overlapping_chunks",
    "domain_capped_corpus",
    "funnel_signup_click_purchase",
    "label_centroid_distances",
    "latest_event_per_user",
    "length_bucketed_batches",
    "pc1_projection_buckets",
    "quality_percentile_filter",
    "regression_price_vs_quantity",
    "sequence_packing_plan",
    "shingle_novelty_scores",
    "symspell_handle_match",
    "temperature_mixed_sample",
    "time_weighted_avg_value",
    "touch_attribution_revenue",
    "user_retention_cohorts",
    "weighted_sample_bychars",
    # -- round-7-era re-attestation (10 of 46) --
    "srp_ann_topk",
    "sq8_ann_topk",
    "ivf_fixed_cells_topk",
    "cosine_topk_bruteforce",
    "knn_label_consistency",
    "simhash_near_dups",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "table_quality_audit",
    "stream_distinct_user_event_pairs",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
