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

# Round-13 window head (the driver checks the FIRST ~50 registered).
# Composition, per VERDICT r12 task 1 + the rotation invariant (every
# query driver-attested within the last 4 rounds — the attestation ages
# below are recomputed from CORRECTNESS_r*.json, not carried forward):
# 1) the 4 queries NEVER driver-attested — new this round:
#    contamination_span_manifest (span-level decontamination: merged
#    token ranges covering eval-shared n-grams, so pipelines drop the
#    contaminated spans, not whole documents),
#    bloom_span_manifest (same spans with the probe pushed through the
#    8 KiB Bloom bitmap literal — zero joins before the merge; FP spans
#    deterministic and oracle-gated),
#    stream_contamination_spans (stateless streaming decontamination:
#    probe AND interval merge fold in-row, no window/state/exchange —
#    shares bloom_span_manifest's oracle), and
#    stream_file_compaction_plan (the streaming face of the compaction
#    contract: landed-file metadata streams map-only into the landing
#    index; the shared bin-pack plans over it batch-side — one oracle
#    with file_compaction_plan);
# 2) ALL 42 queries last driver-attested in round 8 — they reach
#    attestation age 4 this round, so they lead en bloc (the TPC-H
#    block, cube/rollup/grouping-sets, the HLL pair, SCD2, the sampling
#    and text-analysis cohort); after this round no attestation
#    predates round 9;
# 3) the 4 queries whose OPERATOR changed this round — dup_clusters and
#    its cluster-consuming faces not already in cohort 2
#    (dedup_resolution_by_source, dup_cluster_representatives,
#    leakage_safe_split_counts): the CC cap is now adaptive with a
#    measured-rounds diagnostic;
# (anagram_groups/anagram_pairs, age 3, rotate next round — the
# window is 50 and the four new queries take their slots.)
#    (The corpus-reader repartition guard touches only the text-file
#    source — tools/bench_baseline.py + plan tests cover it; the suite's
#    anagram queries read the parquet fixture, so no re-attestation is
#    forced by that change.)
promote([
    # -- never driver-attested (4, new this round) --
    "contamination_span_manifest",
    "bloom_span_manifest",
    "stream_contamination_spans",
    "stream_file_compaction_plan",
    # -- round-8-era re-attestation (all 42) --
    "bloom_semijoin_reduction",
    "cube_orders_status_priority",
    "fim_split_plan",
    "grouping_sets_order_stats",
    "hashed_ngram_quality_scores",
    "having_orders_per_customer",
    "heldout_bigram_perplexity",
    "hll_distinct_users",
    "hll_hourly_rollup_daily",
    "ivf_cell_balance",
    "kcore_pmi_words",
    "neyman_allocation_sample",
    "normalization_dedup_lift",
    "ntile_customer_value_quartiles",
    "q10_returned_item_revenue",
    "q11_part_value_concentration",
    "q12_priority_line_counts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_order_customers",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q6_revenue_forecast",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "rollup_lineitem_status",
    "scd2_user_event_state",
    "soft_dedup_weights",
    "source_boilerplate_prefix",
    "unimax_language_budget",
    "video_decode_roundtrip",
    "window_top3_orders_per_customer",
    "window_trailing_7d_spend",
    "word_bigram_freq_udtf",
    "word_commonness_by_source_salted",
    "zipf_slope_by_source",
    # -- operator changed this round (4) --
    "dup_clusters",
    "dedup_resolution_by_source",
    "dup_cluster_representatives",
    "leakage_safe_split_counts",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
