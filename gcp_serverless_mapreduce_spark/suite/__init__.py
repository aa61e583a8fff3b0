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

# Round-12 window head (the driver checks the FIRST ~50 registered).
# Composition, per VERDICT r11 task 1 + the rotation invariant (every
# query driver-attested within the last 4 rounds — the attestation ages
# below are recomputed from CORRECTNESS_r*.json, not carried forward):
# 1) the 3 queries NEVER driver-attested — all new this round:
#    stream_dedup_new_docs (streaming face of incremental-ingest dedup),
#    exact_substring_discard_manifest (Lee et al. 2022 ExactSubstr
#    discard ranges), and crossmodal_pair_curation (CLIP-data basic
#    filtering over decoded image + caption pairs);
# 2) ALL 36 queries last driver-attested in round 7 — they reach
#    attestation age 4 this round, so they lead en bloc; after this
#    round no attestation predates round 8 (the r8 cohort of 47 less
#    the 7 re-attested below leads round 13);
# 3) the 6 queries whose PLAN/semantics changed this round: file_compaction_plan
#    (bin arithmetic now integer div on the long prefix, shared with
#    the executing rewriter), ivf_incremental_ingest_topk and
#    stream_ivf_cell_routing (old-batch training modulus from footer
#    arithmetic — the per-invocation filtered count() scan is gone),
#    the two rate-replay windowed stats (n_expected from footer
#    metadata instead of a count() job), and simhash_near_dups (banded
#    join now bucket-capped at 64 — the sf1 decade check caught the
#    uncapped m^2 blow-up, SCALING_SF1.md);
# 4) 5 of the 47 round-8-era queries, leading with the sketches /
#    stateful / dedup operators hardest to re-derive from builder
#    parity alone (incremental_dedup_new_docs also just gained a
#    shared-oracle streaming twin; max_shared_span_pairs is the new
#    manifest operator's sibling); scd2_user_event_state,
#    soft_dedup_weights and the other 40 r8-era queries lead round 13.
promote([
    # -- never driver-attested (3, new this round) --
    "stream_dedup_new_docs",
    "exact_substring_discard_manifest",
    "crossmodal_pair_curation",
    # -- round-7-era re-attestation (all 36) --
    "audio_decode_roundtrip",
    "bpe_fertility_by_lang",
    "clean_text_stats",
    "corpus_prep_pipeline",
    "customers_with_big_orders",
    "customers_without_orders",
    "distinct_status_priority",
    "doc_fingerprints",
    "doc_quality_scores",
    "docs_per_word_salted",
    "dup_cluster_representatives",
    "embedding_near_dup_pairs",
    "events_json_stats",
    "events_parquet_schema_evolution",
    "image_decode_roundtrip",
    "language_confusion",
    "language_id",
    "language_id_chargram",
    "media_decode_features",
    "multimodal_feature_table",
    "multires_event_rollup",
    "order_fill_stats",
    "orders_per_nation",
    "q16_parts_supplier_relationship",
    "q20_excess_shipments_suppliers",
    "q21_suppliers_kept_orders_waiting",
    "q3_top_unshipped_orders",
    "q5_supplier_volume_by_nation",
    "repetition_quality_filter",
    "simhash_fingerprints",
    "srp_bucket_stats",
    "stratified_sample_by_lang",
    "tfidf_top_terms",
    "token_count_by_source",
    "value_outliers_mad",
    "window_running_spend",
    # -- plan changed this round (5) --
    "file_compaction_plan",
    "ivf_incremental_ingest_topk",
    "stream_ivf_cell_routing",
    "stream_windowed_event_stats_rate",
    "stream_windowed_event_stats_pyds",
    "simhash_near_dups",
    # -- round-8-era re-attestation (7 of 47) --
    "hll_merge_equivalence",
    "stream_hll_distinct_users",
    "incremental_dedup_new_docs",
    "max_shared_span_pairs",
    "ivf_pq_topk",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
