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

# Round-5 window head (the driver checks the FIRST 50 registered):
# 1) the five queries NEW this round (curation + product quantization),
#    never driver-checked;
# 2) the round-4 head — round 4's driver recorded no CORRECTNESS file,
#    so the three fingerprint fixes and the AQE skew-join query are
#    STILL never driver-green;
# 3) the three r02 greens round 4 promised to rotate in
#    (window_event_value_delta, setops_customer_segments,
#    window_top3_orders_per_customer);
# 4) the rest of round 4's list (r01-green-last, then oldest r02) in
#    its original order, truncated to fit 50.
promote([
    "pii_redaction_stats",
    "chunk_dedup_docs",
    "ngram_contamination",
    "pq_code_stats",
    "pq_adc_topk",
    "events_json_roundtrip_fingerprint",
    "events_csv_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "hot_key_join_aqe",
    "window_event_value_delta",
    "setops_customer_segments",
    "window_top3_orders_per_customer",
    "orders_by_month",
    "part_string_functions",
    "top20_lineitems_by_price",
    "bucket_histogram",
    "price_quantiles_by_flag",
    "approx_stats_parts",
    "pivot_priority_by_status",
    "daily_orders_gapfilled",
    "q6_revenue_forecast",
    "q4_order_priority_check",
    "q13_customer_order_distribution",
    "q2_min_cost_supplier",
    "window_trailing_7d_spend",
    "udaf_geomean_by_status",
    "locf_hourly_event_values",
    "grouping_sets_order_stats",
    "ntile_customer_value_quartiles",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_item_revenue",
    "q11_part_value_concentration",
    "q12_priority_line_counts",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_order_customers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "media_feature_summary",
    "video_frame_samples",
    "image_resize_plan",
    "asof_click_before_purchase",
    "clicks_within_1h_of_error",
    "q1_pricing_summary",
    "having_orders_per_customer",
    "rollup_lineitem_status",
    "cube_orders_status_priority",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
