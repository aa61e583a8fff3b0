"""Iterative graph analytics over edge DataFrames — fixed-iteration
PageRank as the canonical join/agg fixpoint.

The reference's only graph-shaped computation is the connected-component
canonicalization of near-dup pairs (covered in operators/dedup.py:
dup_clusters); PageRank extends the same iterative join/agg pattern to a
weighted fixpoint, the shape any entity-importance ranking over a 100 TB
interaction graph takes (suppliers by customer flow, hosts by link mass,
...).

Scale design:
- Each iteration is ONE join (ranks x edges, shuffled on ``src``) and ONE
  aggregate (contributions grouped by ``dst``) — no driver-side data
  movement; the rank frame has |nodes| rows, the join |edges| rows.
- The degree-annotated edge frame is ``localCheckpoint``-ed once and
  scanned by every round; rank frames stay lazy — the fixed-depth
  fixpoint runs as one job (no per-round driver action to force).
- Determinism across engines: a fixed iteration count (no
  convergence-epsilon whose floating-point evaluation could diverge
  between engines) and a final ``round(rank, 6)`` so the last ~1e-15 of
  double summation-order noise can't reach the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bidirect(edges: DataFrame) -> DataFrame:
    """Undirected graph as a directed edge list: each {a,b} both ways."""
    return (edges.select("src", "dst")
            .unionByName(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
            .distinct())


def pagerank(edges: DataFrame, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """-> (node, rank) after ``iters`` synchronous PageRank iterations.

    ``edges`` is a directed (src, dst) frame in which every node MUST
    appear as a src at least once (true by construction for bidirected
    graphs — use :func:`bidirect`), so there are no dangling nodes and the
    update is exactly::

        rank'(v) = (1 - d)/N + d * sum_{u->v} rank(u) / outdeg(u)

    Rank mass is conserved: sum(rank) == 1 every round (asserted by
    tests, not at runtime — the check would force an extra action per
    round).
    """
    # Fold the static out-degree into the edge list ONCE (instead of a
    # deg join inside every round) and materialize it: it is scanned by
    # all ``iters`` rounds, and without the checkpoint each round would
    # re-run the upstream edge build.  The per-round rank frames are NOT
    # checkpointed — PageRank, unlike dup_clusters, has no per-round
    # driver action, so the whole fixpoint is ONE lazy plan executed once
    # (measured 3.5× faster at sf0.1 than eager per-round
    # materialization); at ``iters`` beyond ~15 add a periodic checkpoint
    # for plan depth.
    w = Window.partitionBy("src")
    edgesw = (edges
              .withColumn("outdeg", F.count("*").over(w))
              .localCheckpoint())
    nodes = edgesw.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # scalar (node count), not a data collect
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (ranks.join(edgesw, ranks["node"] == edgesw["src"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("outdeg")).alias("c")))
        ranks = (contrib.groupBy("node")
                 .agg((F.lit(base) + F.lit(damping) * F.sum("c"))
                      .alias("rank")))
    return ranks


def pagerank_rounded(edges: DataFrame, iters: int = 5,
                     damping: float = 0.85,
                     decimals: int = 6) -> DataFrame:
    """PageRank with the cross-engine value contract applied (see module
    docstring): final ranks rounded to ``decimals``."""
    pr = pagerank(edges, iters, damping)
    return pr.select("node", F.round("rank", decimals).alias("rank"))


def undirect(pairs: DataFrame, a: str = "word_a",
             b: str = "word_b") -> DataFrame:
    """Canonicalize directed pairs into undirected edges (u < v),
    deduplicated.  -> (u, v)."""
    return (pairs.select(F.least(F.col(a), F.col(b)).alias("u"),
                         F.greatest(F.col(a), F.col(b)).alias("v"))
            .where(F.col("u") < F.col("v"))
            .distinct())


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over undirected edges
    (u < v) -> (node, n_triangles).

    Ordered-wedge enumeration: join e1=(x,y) with e2=(y,z) to form the
    wedge x<y<z, then close it against e3=(x,z) — each triangle is found
    exactly once as its ordered vertex triple, with NO post-dedup.  Two
    equi-join shuffles on single vertex keys.  At 100 TB-scale graphs
    the standard refinement is to orient edges by DEGREE (low -> high)
    instead of id order, which bounds every wedge list by O(sqrt(E));
    id-ordering keeps the oracle twin exact here and the plan shape is
    identical.
    """
    e = edges.select("u", "v")
    wedges = (e.alias("e1")
              .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
              .select(F.col("e1.u").alias("x"), F.col("e1.v").alias("y"),
                      F.col("e2.v").alias("z")))
    tris = wedges.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("z")), ["x", "z"])
    per_node = (tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    return per_node
