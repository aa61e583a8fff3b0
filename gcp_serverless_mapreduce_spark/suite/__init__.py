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

# Round-14 window head (the driver checks the FIRST ~50 registered).
# Composition, per VERDICT r13 task 2 + the rotation invariant (ages
# recomputed from CORRECTNESS_r01..r13 at the start of this round):
# 1) the 3 queries NEVER driver-attested — new this round:
#    bpe_aligned_contamination_spans (tokenizer-aware decontamination:
#    the span manifest's word ranges mapped to exact BPE piece ranges
#    via per-doc piece-offset prefix sums — r13 verdict task 7a),
#    stream_snapshot_diff_customers (CDC streaming face of the
#    snapshot-diff reconciliation: after-period orders stream into a
#    stateful per-customer aggregate, reconciled against the stored
#    before-snapshot batch-side; shares snapshot_diff_customers'
#    oracle — r13 verdict task 7b), and
#    dup_clusters_diagnostics (the CC fixpoint's one-row run telemetry:
#    n_nodes/adaptive cap/postcondition flags, oracle-exact from the
#    pair graph — r13 verdict task 6);
# 2) stream_contamination_spans — its operator (inline_bloom_spans) was
#    REWRITTEN this round: the O(hits^2) accumulator-concat fold became
#    an O(hits) span-break-flag derivation with let-bound arrays (r13
#    watch-item 3 / verdict task 4);
# 3) ALL 46 queries last driver-attested in round 9 — attestation age 5
#    this round, so they take the remaining 46 slots en bloc; after
#    this round no attestation predates round 10.
# Not in the window (no room; 3+1+46 fills all 50): the other three
# bloom-probe queries whose PLAN changed when bloom_hit_expr's bitmap
# became a true array literal (bloom_span_manifest, bloom_decontamination,
# bloom_semijoin_reduction — all age 1, value-identical change) — they
# are re-proven by this round's full-suite parity stamp at HEAD across
# all three scales plus bloom_semijoin_reduction's standalone low-load
# rerun (verdict task 3).  The 45 age-4 queries rotate next round.
promote([
    # -- never driver-attested (3, new this round) --
    "bpe_aligned_contamination_spans",
    "stream_snapshot_diff_customers",
    "dup_clusters_diagnostics",
    # -- operator rewritten this round (1) --
    "stream_contamination_spans",
    # -- round-9-era re-attestation (all 46) --
    "asof_click_before_purchase",
    "bpe_learn_merges",
    "bpe_piece_stats",
    "bucket_histogram",
    "chunk_dedup_docs",
    "clicks_within_1h_of_error",
    "cms_heavy_hitter_words",
    "containment_dups",
    "contrastive_negatives",
    "corpus_prep_pipeline_v2",
    "customer_record_linkage",
    "daily_orders_gapfilled",
    "doc_token_entropy",
    "doc_token_ids_fingerprint",
    "dsir_importance_weights",
    "embedding_dim_stats",
    "epoch_shuffle_plan",
    "event_pattern_matches",
    "events_csv_roundtrip_fingerprint",
    "events_json_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "gopher_rule_filter",
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
    "pyds_click_user_stats",
    "setops_customer_segments",
    "stream_click_purchase_full_join",
    "stream_click_purchase_join",
    "stream_click_purchase_left_join",
    "stream_hourly_topk_events",
    "stream_session_stats",
    "stream_user_totals_stateful",
    "stream_windowed_event_stats",
    "top20_lineitems_by_price",
    "udaf_geomean_by_status",
    "video_frame_samples",
])


# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
