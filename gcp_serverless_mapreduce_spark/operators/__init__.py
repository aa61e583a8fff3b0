"""DataFrame -> DataFrame operators.

- ``anagram``    : the reference's one real query, end-to-end (SURVEY §3.1)
- ``relational`` : joins/aggs/windows/setops/date/json breadth (SURVEY §2.6)
- ``dedup``      : exact + MinHash-LSH + SimHash + n-gram Jaccard +
                   embedding near-dup over ``documents``/``embeddings``
- ``similarity`` : cosine top-k (brute force + LSH-bucketed ANN)
- ``textstats``  : language-ID, quality scoring, token counts, fingerprints
- ``multimodal`` : binary-column plumbing with stubbed decoders
"""
