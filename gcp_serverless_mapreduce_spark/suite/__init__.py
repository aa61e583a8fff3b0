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

# Round-15 window head (the driver checks the FIRST ~50 registered).
# Composition, per VERDICT r14 task 1 + the rotation invariant: the 45
# queries last driver-attested in round 11 — attestation age 4 this
# round, so they take 45 slots en bloc (after this round no attestation
# predates round 12) — plus the 5 queries whose OPERATOR INTERNALS this
# optimization round restructured most deeply, so the driver's oracle
# re-attests exactly the code that changed:
#   stream_contamination_spans (foreachBatch+guarded-spread harness,
#     r15 batch 6; one-call bitmap literal, batch 7),
#   max_shared_span_pairs (ladder-gram Arrow kernel, batch 8; doc_a
#     refinement spread, batch 6),
#   exact_substring_discard_manifest (shares the ladder kernel +
#     refinement spread, batch 8),
#   sorted_neighborhood_multipass (guarded spread + explicit-width blk
#     exchange, batch 7),
#   dup_clusters (per-round convergence join -> DECIMAL sum check,
#     batch 5).
# Every other query this round touched (bloom family, jaccard/minhash
# eval pair, containment, kcenter, simhash, hilbert, streaming harness
# users) is re-proven by the full-suite 238/238 parity sweeps at sf0.01
# stamped after every batch (PARITY_SUMMARY.json) plus the focused
# per-batch parity runs recorded in OPTIMIZATION_r15.md.
promote([
    # -- r15 restructured operators (5) --
    "stream_contamination_spans",
    "max_shared_span_pairs",
    "exact_substring_discard_manifest",
    "sorted_neighborhood_multipass",
    "dup_clusters",
    # -- round-11-era re-attestation (all 45, age 4) --
    "approx_stats_parts",
    "audio_fingerprint_groups",
    "badwords_filter_rates",
    "bigram_coherence_score",
    "bm25_doc_scores",
    "cosine_topk_bruteforce",
    "dataset_split_counts",
    "doc_overlapping_chunks",
    "domain_capped_corpus",
    "erasure_rewrite_plan",
    "funnel_signup_click_purchase",
    "hilbert_layout_keys",
    "ivf_ann_topk",
    "ivf_capped_train_topk",
    "ivf_fixed_cells_topk",
    "join_key_skew_profile",
    "k_anonymity_audit",
    "kcenter_coreset_sample",
    "knn_label_consistency",
    "label_centroid_distances",
    "latest_event_per_user",
    "length_bucketed_batches",
    "lpa_word_communities",
    "m4_downsample_hourly",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "pc1_projection_buckets",
    "pq_trained_adc_topk",
    "quality_percentile_filter",
    "regression_price_vs_quantity",
    "sequence_packing_plan",
    "shingle_novelty_scores",
    "sq8_ann_topk",
    "srp_ann_topk",
    "stream_distinct_user_event_pairs",
    "symspell_handle_match",
    "table_quality_audit",
    "temperature_mixed_sample",
    "time_weighted_avg_value",
    "touch_attribution_revenue",
    "user_retention_cohorts",
    "video_keyframe_selection",
    "watermark_delay_advisor",
    "weighted_sample_bychars",
    "zorder_layout_keys",
])


# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
