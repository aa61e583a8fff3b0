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

# Round-16 window head (the driver checks the FIRST ~50 registered).
# Composition, per the VERDICT r15 rotation invariant, recomputed from
# the actual CORRECTNESS_r*.json history at round start (the verdict's
# "49 attested in round 12" count was off: the true frontier is 44
# queries whose LAST attestation is round 10 — age 6 — plus 47 at
# round 12): the 44 oldest take their slots en bloc, and the remaining
# 6 go to the queries whose OPERATOR INTERNALS this optimization round
# restructured most deeply, so the driver's oracle re-attests exactly
# the code that changed:
#   stream_windowed_event_stats_pyds / stream_windowed_event_stats_rate
#     (run_rate_replay completion detection moved from per-poll sink
#     aggregation jobs to StreamingQueryProgress row counts; both last
#     attested r12),
#   repetition_quality_filter (rep-stats kernel tokenization made
#     JVM-exact, r12),
#   stream_dedup_new_docs / incremental_dedup_new_docs
#     (inline_band_hashes kernel tokenization made JVM-exact, r12),
#   max_shared_span_pairs (ladder-gram kernel tokenization made
#     JVM-exact; r15-attested but the deepest kernel retouch).
# Everything else this round touched (shingle kernel consumers,
# pagerank — itself in the 44 —, word_bigram_freq_udtf, the load_table/
# spread-probe memos that touch every query build) is re-proven by the
# full-suite 238/238 parity sweeps at sf0.001/sf0.01/sf0.1 stamped in
# PARITY_SUMMARY.json and the per-batch parity runs recorded in
# OPTIMIZATION_r16.md.  After this round no attestation predates
# round 12 (the r12 cohort is age 4 — at the window bound, first in
# line for round 17).
promote([
    # -- r16 restructured operators (6) --
    "stream_windowed_event_stats_pyds",
    "stream_windowed_event_stats_rate",
    "repetition_quality_filter",
    "stream_dedup_new_docs",
    "incremental_dedup_new_docs",
    "max_shared_span_pairs",
    # -- round-10-era re-attestation (all 44, age 6) --
    "anagram_groups",
    "anagram_pairs",
    "ann_recall_eval",
    "bloom_decontamination",
    "event_transition_matrix",
    "events_json_corrupt_routing",
    "exact_dedup_groups",
    "hourly_event_anomalies",
    "hybrid_rrf_topk",
    "image_phash_groups",
    "incremental_order_totals",
    "jaccard_prefix_dups",
    "kmv_distinct_users",
    "kmv_merge_equivalence",
    "lang_mixture_reweight",
    "logistic_gd_train",
    "lsh_candidate_precision",
    "matryoshka_recall_eval",
    "minhash_estimate_error",
    "mmr_diverse_topk",
    "ngram_jaccard_dups",
    "pagerank_customer_supplier",
    "pmi_graph_triangles",
    "power_iteration_pc1",
    "quality_logit_scores",
    "scd2_customer_order_versions",
    "semdedup_discards",
    "sessionize_user_events",
    "snapshot_diff_customers",
    "sorted_neighborhood_dups",
    "source_drift_psi",
    "source_overlap_jaccard",
    "source_token_kl",
    "srp_multiprobe_topk",
    "stream_dedup_replayed_events",
    "stream_dedup_windowed_stats",
    "stream_static_enrich",
    "user_error_purchase_overlap",
    "value_histogram_quantiles",
    "vocab_top_words",
    "walkforward_fold_counts",
    "weighted_sample_per_source",
    "window_event_value_delta",
    "word_cooccurrence_pmi",
])


# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
