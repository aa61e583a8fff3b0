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

# Round-6 window head (the driver checks the FIRST ~50 registered).
# Priority order:
# 1) the 29 queries that have NEVER had a driver CORRECTNESS row
#    (computed as PARITY names minus the union of CORRECTNESS_r01-r05
#    keys) — every one passes the builder's two-scale DuckDB-parity
#    harness, so this converts builder-attested parity into
#    driver-attested fact;
# 2) the two formerly-`no_oracle` entries, now deterministic +
#    oracle-gated this round (approx_stats_parts via KMV/histogram
#    sketches, ivf_ann_topk via fixed-point Lloyd KMeans the oracle
#    unrolls);
# 3) queries whose PLAN changed this round and need a fresh green
#    (degree-oriented triangles, batched BPE learning);
# 4) queries NEW this round.  Everything already driver-green and
#    unchanged rotates behind the head.
promote([
    # -- never driver-checked (29) --
    "bigram_coherence_score",
    "bm25_doc_scores",
    "dataset_split_counts",
    "dedup_resolution_by_source",
    "doc_overlapping_chunks",
    "domain_capped_corpus",
    "event_transition_matrix",
    "events_json_corrupt_routing",
    "funnel_signup_click_purchase",
    "jaccard_prefix_dups",
    "label_centroid_distances",
    "latest_event_per_user",
    "m4_downsample_hourly",
    "pagerank_customer_supplier",
    "quality_percentile_filter",
    "regression_price_vs_quantity",
    "scd2_customer_order_versions",
    "semdedup_discards",
    "sequence_packing_plan",
    "snapshot_diff_customers",
    "stream_dedup_replayed_events",
    "stream_dedup_windowed_stats",
    "stream_static_enrich",
    "symspell_handle_match",
    "temperature_mixed_sample",
    "time_weighted_avg_value",
    "user_retention_cohorts",
    "weighted_sample_bychars",
    "zorder_layout_keys",
    # -- formerly no_oracle, now deterministic + hash-gated --
    "approx_stats_parts",
    "ivf_ann_topk",
    # -- plan changed this round: fresh green needed --
    "pmi_graph_triangles",
    "bpe_learn_merges",
    # -- new this round --
    "bloom_decontamination",
    "power_iteration_pc1",
    "pc1_projection_buckets",
    "source_overlap_jaccard",
    "max_shared_span_pairs",
    "kmv_merge_equivalence",
    "touch_attribution_revenue",
    "events_parquet_schema_evolution",
    "sorted_neighborhood_multipass",
    "shingle_novelty_scores",
    "lsh_candidate_precision",
    "minhash_estimate_error",
    "length_bucketed_batches",
    "ann_recall_eval",
])
# With approx_stats_parts and ivf_ann_topk oracle-gated this round,
# every registered query has an oracle_sql() twin — zero rows-only
# entries remain.

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
