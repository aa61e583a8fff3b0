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

# Round-10 window head (the driver checks the FIRST ~50 registered).
# The window finishes the attestation ledger (VERDICT r9 items 1/8):
# 1) ALL 21 queries last driver-attested in round 5 — after this round
#    every round-5-era query has an attestation <=3 rounds old;
# 2) the four queries whose SEMANTICS changed this round:
#    ivf_ann_topk + pq_trained_adc_topk (the Lloyd/PQ training sample
#    is now CAPPED — modulus = max(1, corpus_count // 4096) instead of
#    a fixed 1-in-4 fraction, mirrored in the oracle as a
#    greatest(1, count(*) // target) scalar subquery),
#    join_key_skew_profile (keys stack as lossless strings and every
#    audited label emits a row even over an empty base table), and
#    matryoshka_recall_eval (NULL embeddings pass through the
#    trunc_dim guard to the zero-norm drop instead of erroring);
# 2b) ivf_capped_train_topk, NEW this round: the trained-IVF plan
#    under train_target=128, making the count-scaled sampling modulus
#    exceed 1 at test scale (mod 3 at sf0.01) so the capped-training
#    contract is driver-attested on real data, not just unit-replayed;
# 2c) mmr_diverse_topk + source_drift_psi, NEW late in round 10
#    (MMR diversified retrieval; PSI snapshot drift) — first
#    attestation;
# 3) 22 of the 46 round-6-era queries, leading with the stateful /
#    iterative / sketch operators (hardest to re-derive from builder
#    parity alone).  The remaining 24 r6 queries lead round 11,
#    together with the four post-window round-10 additions
#    lpa_word_communities, k_anonymity_audit, kcenter_coreset_sample
#    and badwords_filter_rates:
#    m4_downsample_hourly, approx_stats_parts, zorder_layout_keys,
#    bigram_coherence_score, bm25_doc_scores, dataset_split_counts,
#    dedup_resolution_by_source, doc_overlapping_chunks,
#    domain_capped_corpus, funnel_signup_click_purchase,
#    label_centroid_distances, latest_event_per_user,
#    length_bucketed_batches, pc1_projection_buckets,
#    quality_percentile_filter, regression_price_vs_quantity,
#    sequence_packing_plan, shingle_novelty_scores,
#    symspell_handle_match, temperature_mixed_sample,
#    time_weighted_avg_value, touch_attribution_revenue,
#    user_retention_cohorts, weighted_sample_bychars.
promote([
    # -- last driver-checked in round 5 (all 21) --
    "hourly_event_anomalies",
    "hybrid_rrf_topk",
    "image_phash_groups",
    "incremental_order_totals",
    "kmv_distinct_users",
    "lang_mixture_reweight",
    "leakage_safe_split_counts",
    "logistic_gd_train",
    "ngram_jaccard_dups",
    "quality_logit_scores",
    "sessionize_user_events",
    "sorted_neighborhood_dups",
    "source_token_kl",
    "srp_multiprobe_topk",
    "user_error_purchase_overlap",
    "value_histogram_quantiles",
    "vocab_top_words",
    "walkforward_fold_counts",
    "weighted_sample_per_source",
    "window_event_value_delta",
    "word_cooccurrence_pmi",
    # -- semantics changed this round (4) --
    "ivf_ann_topk",
    "pq_trained_adc_topk",
    "join_key_skew_profile",
    "matryoshka_recall_eval",
    # -- new this round (1) --
    "ivf_capped_train_topk",
    # -- round-6-era re-attestation (22 of 46) --
    "stream_dedup_replayed_events",
    "stream_dedup_windowed_stats",
    "stream_static_enrich",
    "pagerank_customer_supplier",
    "lsh_candidate_precision",
    "kmv_merge_equivalence",
    "minhash_estimate_error",
    "bloom_decontamination",
    "power_iteration_pc1",
    "pmi_graph_triangles",
    "anagram_groups",
    "anagram_pairs",
    "ann_recall_eval",
    "exact_dedup_groups",
    "jaccard_prefix_dups",
    "semdedup_discards",
    "sorted_neighborhood_multipass",
    "source_overlap_jaccard",
    "scd2_customer_order_versions",
    "snapshot_diff_customers",
    "event_transition_matrix",
    "events_json_corrupt_routing",
    # -- new this round (2): MMR diversified retrieval + PSI drift --
    "mmr_diverse_topk",
    "source_drift_psi",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
