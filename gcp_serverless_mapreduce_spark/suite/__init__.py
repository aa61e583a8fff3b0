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

# Round-4 window head (the driver checks the FIRST 50 registered):
# 1) the three roundtrip fingerprints fixed this round (round 3's only
#    red rows — decimal output canonicalization) and the new AQE
#    skew-join query, none ever driver-green;
# 2) every query whose last driver-green row is round 1 (code unchanged,
#    but evidence is three rounds old);
# 3) the oldest round-2 greens filling the remaining slots.  The three
#    r02 greens left outside (window_event_value_delta,
#    setops_customer_segments, window_top3_orders_per_customer) rotate
#    in next round.
promote([
    "events_json_roundtrip_fingerprint",
    "events_csv_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "hot_key_join_aqe",
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
    "distinct_status_priority",
    "q3_top_unshipped_orders",
    "q5_supplier_volume_by_nation",
    "orders_per_nation",
    "customers_without_orders",
    "customers_with_big_orders",
    "order_fill_stats",
    "window_running_spend",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
