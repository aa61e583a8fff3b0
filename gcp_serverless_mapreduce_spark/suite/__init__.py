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

# Round-3 window head: the 3 TPC-H shapes added after round 2's window
# rotated (never oracle-checked), the two round-1 fixes that rotated out
# before re-verification, and the round-2 red row fixed this round
# (sessionize oracle cast).  New round-3 queries are appended here as
# they land so CORRECTNESS_r03 sees them.
promote([
    "q16_parts_supplier_relationship",
    "q20_excess_shipments_suppliers",
    "q21_suppliers_kept_orders_waiting",
    "events_json_stats",
    "stratified_sample_by_lang",
    "sessionize_user_events",
    "ivf_fixed_cells_topk",
    "stream_windowed_event_stats_rate",
    "image_decode_roundtrip",
    "clean_text_stats",
    "tfidf_top_terms",
    "repetition_quality_filter",
    "stream_user_totals_stateful",
    "word_commonness_by_source_salted",
    "audio_decode_roundtrip",
    "video_decode_roundtrip",
    "events_json_roundtrip_fingerprint",
    "events_csv_roundtrip_fingerprint",
    "events_orc_roundtrip_fingerprint",
    "multimodal_feature_table",
    "sq8_ann_topk",
])

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
