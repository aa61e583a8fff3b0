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

from ..registry import oracle_sql, queries, register  # noqa: F401

# Registration order deliberately leads with the LLM-pipeline families
# (dedup, similarity, textstats, streaming, multimodal, temporal): the
# driver's correctness gate checks registry entries front-to-back, and in
# round 1 these families sat past its horizon and were never oracle-checked
# (VERDICT.md "Next round" #1).  The relational/TPC-H block — 47/47 green in
# CORRECTNESS_r01.json — rotates to the back.
from . import anagram_q  # noqa: F401, E402
from . import dedup_q  # noqa: F401, E402
from . import similarity_q  # noqa: F401, E402
from . import textstats_q  # noqa: F401, E402
from . import streaming_q  # noqa: F401, E402
from . import multimodal_q  # noqa: F401, E402
from . import temporal_q  # noqa: F401, E402
from . import relational_q  # noqa: F401, E402
from . import tpch_extra_q  # noqa: F401, E402

# Re-export the flagship for __spark_entry__.entry
from .anagram_q import anagram_groups  # noqa: F401, E402
