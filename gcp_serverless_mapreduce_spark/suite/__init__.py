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

# Round-8 window head (the driver checks the FIRST ~50 registered).
# Priority order:
# 1) the twelve queries NEW this round (never driver-checked);
# 2) the nine round-7-continuation queries the r7 window could not fit
#    (builder-parity-green at both scales, never driver-attested);
# 3) the two queries whose SEMANTICS changed this round
#    (unimax epochs nullif guard; exact-span rolling-hash rewrite);
# 4) attestation-freshness rotation, oldest first: the 3 queries last
#    driver-checked in r3, then 24 of the 44 r4-era queries (the TPC-H
#    q-series + window/agg block that shares the most refactored
#    helpers; the remaining 20 lead round 9).
promote([
    # -- new this round (12) --
    "scd2_user_event_state",
    "zipf_slope_by_source",
    "gopher_rule_filter",
    "hashed_ngram_quality_scores",
    "kcore_pmi_words",
    "matryoshka_recall_eval",
    "ivf_pq_topk",
    "soft_dedup_weights",
    "incremental_dedup_new_docs",
    "normalization_dedup_lift",
    "heldout_bigram_perplexity",
    "ivf_cell_balance",
    # -- round-7 continuation, never driver-attested (9) --
    "hll_distinct_users",
    "hll_merge_equivalence",
    "hll_hourly_rollup_daily",
    "stream_hll_distinct_users",
    "fim_split_plan",
    "join_key_skew_profile",
    "source_boilerplate_prefix",
    "bloom_semijoin_reduction",
    "neyman_allocation_sample",
    # -- semantics changed this round (2) --
    "unimax_language_budget",
    "max_shared_span_pairs",
    # -- last driver-checked in round 3 (3) --
    "word_bigram_freq_udtf",
    "word_commonness_by_source_salted",
    "video_decode_roundtrip",
    # -- last driver-checked in round 4 (24 of 44) --
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q6_revenue_forecast",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_item_revenue",
    "q11_part_value_concentration",
    "q12_priority_line_counts",
    "q13_customer_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_order_customers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "having_orders_per_customer",
    "rollup_lineitem_status",
    "cube_orders_status_priority",
    "grouping_sets_order_stats",
    "window_top3_orders_per_customer",
    "window_trailing_7d_spend",
    "ntile_customer_value_quartiles",
    # -- behind the window: the 20 remaining r4-era queries lead
    #    round 9 (orders_by_month, part_string_functions,
    #    top20_lineitems_by_price, bucket_histogram,
    #    price_quantiles_by_flag, daily_orders_gapfilled,
    #    locf_hourly_event_values, media_feature_summary,
    #    video_frame_samples, image_resize_plan,
    #    asof_click_before_purchase, pii_redaction_stats,
    #    chunk_dedup_docs, ngram_contamination, pq_code_stats,
    #    pq_adc_topk, setops_customer_segments, hot_key_join_aqe,
    #    pivot_priority_by_status, udaf_geomean_by_status), then the
    #    r5 block.
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
