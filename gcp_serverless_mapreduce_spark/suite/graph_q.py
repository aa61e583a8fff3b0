"""Graph-analytics queries with DuckDB oracle twins.

The reference's pipeline has one graph-shaped step — the transitive
canonicalization of near-dup pairs (dedup_q.dup_clusters).  This module
extends the same iterative join/agg machinery to weighted fixpoints:
PageRank over the customer↔supplier interaction graph derived from
orders ⋈ lineitem (who buys from whom), the entity-importance ranking any
100 TB interaction log supports.

Determinism contract (see operators/graph.py): fixed iteration count, no
floating-point convergence test, final ``round(rank, 6)`` — double
summation-order noise lives at ~1e-15 and can't reach the hash.  The
oracle unrolls the five iterations as CTEs r1..r5; both engines start
from the same exact 1/N and divide by the same integer out-degrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph
from ..registry import register
from ..tables import load_table

PR_ITERS = 5
PR_DAMPING = 0.85

# Bidirected customer↔supplier edge list; node ids prefixed 'C'/'S' so the
# two key spaces can't collide.
_EDGES_CTE = """
WITH e AS (
    SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                    'S' || CAST(l_suppkey AS VARCHAR) AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
bi AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
deg AS (SELECT src, COUNT(*) AS outdeg FROM bi GROUP BY src),
nn AS (SELECT COUNT(DISTINCT src) AS cnt FROM bi),
r0 AS (SELECT DISTINCT src AS node, 1.0 / (SELECT cnt FROM nn) AS rank
       FROM bi)
"""

_ITER = """,
r{i} AS (
    SELECT bi.dst AS node,
           (1.0 - {d}) / (SELECT cnt FROM nn)
           + {d} * SUM(r.rank / deg.outdeg) AS rank
    FROM bi JOIN r{prev} r ON r.node = bi.src
            JOIN deg ON deg.src = bi.src
    GROUP BY bi.dst)
"""

_PR_SQL = (_EDGES_CTE
           + "".join(_ITER.format(i=i, prev=i - 1, d=PR_DAMPING)
                     for i in range(1, PR_ITERS + 1))
           + f"""
SELECT node, round(rank, 6) AS rank FROM r{PR_ITERS}
""")


@register("pagerank_customer_supplier", _PR_SQL)
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITERS}-iteration PageRank (d={PR_DAMPING}) over the bidirected
    customer↔supplier graph from orders ⋈ lineitem.  Spark side: one
    edge-build join, then per-iteration join+agg shuffled on the node id
    over a once-checkpointed degree-annotated edge list, all lazy in one
    job (operators/graph.py); the oracle is the
    same fixpoint unrolled as five CTEs."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    e = (orders.join(lineitem,
                     orders["o_orderkey"] == lineitem["l_orderkey"])
         .select(F.concat(F.lit("C"), F.col("o_custkey").cast("string"))
                 .alias("src"),
                 F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
                 .alias("dst"))
         .distinct())
    # NOT graph.bidirect(): the C-/S- prefixes make the two directions
    # disjoint, so the union of an already-distinct edge set needs no
    # second distinct — skipping it saves a full shuffle of the
    # bidirected frame.
    bi = e.unionByName(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
    return graph.pagerank_rounded(bi, PR_ITERS, PR_DAMPING)
