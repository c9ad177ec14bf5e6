"""Graph-analytics registry queries (operators/graph.py) with DuckDB
oracle twins.

The edge set is the supplier co-occurrence graph derived from lineitem
(suppliers sharing an order). Oracles replicate the degree-ordered
orientation in SQL, so the triangle queries are fully hash-verified —
not rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators import graph as G
from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_oracle_confs(spark)
    return load_table(spark, sf_dir, "lineitem")


_EDGE_CTES = """
os AS (SELECT DISTINCT l_orderkey AS k, l_suppkey AS s FROM lineitem),
edges AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM os a JOIN os b ON a.k = b.k AND a.s < b.s
)"""

_ORIENT_CTES = _EDGE_CTES + """,
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
),
oe AS (
  SELECT CASE WHEN du.degree < dv.degree
                OR (du.degree = dv.degree AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.degree < dv.degree
                OR (du.degree = dv.degree AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e
  JOIN deg du ON e.u = du.node
  JOIN deg dv ON e.v = dv.node
)"""


def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier co-occurrence graph."""
    return G.degree_histogram(G.supplier_edges(_li(spark, sf_dir)))


ORACLE_GRAPH_DEGREE_HISTOGRAM = f"""
WITH {_EDGE_CTES},
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count via degree-ordered wedge enumeration."""
    return G.triangle_count(G.supplier_edges(_li(spark, sf_dir)))


ORACLE_GRAPH_TRIANGLE_COUNT = f"""
WITH {_ORIENT_CTES}
SELECT count(*) AS n_triangles
FROM oe e1 JOIN oe e2 ON e1.src = e2.src AND e1.dst <> e2.dst
WHERE EXISTS (SELECT 1 FROM oe WHERE src = e1.dst AND dst = e2.dst)
"""


def graph_triangles_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation (local clustering numerator)."""
    return G.triangles_per_node(G.supplier_edges(_li(spark, sf_dir)))


# Disk-bounded form (r13 verdict ask #4): the previous shape projected a
# `tri` CTE three times (one per corner), which DuckDB materializes for
# multi-reference — at sf0.1 the full triangle enumeration exhausted the
# /tmp spill disk. This form closes the wedge with an INNER join (oe
# edges are DISTINCT, so join ≡ EXISTS), fans each closed wedge into its
# three corners with a select-list unnest, and aggregates in the SAME
# pipeline — nothing is materialized ahead of the early GROUP BY.
# Exactly one closed-wedge row per triangle survives: an acyclic degree
# orientation of a triangle has one node with two out-edges, and only
# the (e1.dst, e2.dst) order matching the stored closing-edge
# orientation joins.
ORACLE_GRAPH_TRIANGLES_PER_NODE = f"""
WITH {_ORIENT_CTES}
SELECT node, count(*) AS n_triangles
FROM (
  SELECT unnest([e1.src, e1.dst, e2.dst]) AS node
  FROM oe e1
  JOIN oe e2 ON e1.src = e2.src AND e1.dst <> e2.dst
  JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
GROUP BY node
"""


_PR_ITERS = 3
_PR_DAMP = 0.85
_PR_DP = 9


def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration portable PageRank over the supplier co-occurrence
    graph — power iteration with per-round 9dp rounding (the
    `kmeans_fit_portable` discipline), fully ORACLE-BACKED via the
    unrolled trajectory below. Σ pagerank ≈ 1 pinned in pytest."""
    return G.pagerank_portable(
        G.supplier_edges(_li(spark, sf_dir)),
        iters=_PR_ITERS,
        damping=_PR_DAMP,
        round_dp=_PR_DP,
    )


def _pagerank_oracle(
    iters: int = _PR_ITERS, damping: float = _PR_DAMP, dp: int = _PR_DP
) -> str:
    teleport = repr(1.0 - damping)  # exact double both engines compute
    parts = [
        f"""{_EDGE_CTES},
de AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL
  SELECT v AS src, u AS dst FROM edges
),
od AS (SELECT src, count(*) AS od FROM de GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM od),
p0 AS (
  SELECT src AS node, round(1.0 / (SELECT n FROM nn), {dp}) AS pr FROM od
)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
c{i} AS (
  SELECT e.dst AS node, sum(p.pr / o.od) AS s
  FROM de e
  JOIN p{i} p ON p.node = e.src
  JOIN od o ON o.src = e.src
  GROUP BY e.dst
),
p{i + 1} AS (
  SELECT node,
         round({teleport} / (SELECT n FROM nn) + {damping} * s, {dp}) AS pr
  FROM c{i}
)"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"\nSELECT node, pr AS pagerank FROM p{iters}\n"
    )


ORACLE_PAGERANK_SUPPLIERS = _pagerank_oracle()


_KCORE_K = 12
_KCORE_ROUNDS = 6


def kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core dense-subgraph extraction (k=12, 6 fixed peel rounds —
    measured fixpoint is round 4 at the gate SF) over a PLANTED
    fixture: the complete supplier co-occurrence graph is md5-sparsified
    to ~10% of its edges and a clique is planted on the suppliers
    divisible by 7 — the peel must erase the random background (whose
    degrees sit below k) and return exactly the planted quasi-clique
    with its internal degrees. The canonical spam-ring/link-farm
    detection shape, fully oracle-replayed round by round."""
    e = G.supplier_edges(_li(spark, sf_dir))
    mark = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("u").cast("string"),
                    F.col("v").cast("string"),
                    F.lit("e"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    sparse = e.filter(
        (mark % 10 < 1) | ((F.col("u") % 7 == 0) & (F.col("v") % 7 == 0))
    )
    return G.kcore_nodes(sparse, _KCORE_K, rounds=_KCORE_ROUNDS)


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [
        f"""WITH {_EDGE_CTES},
e0 AS MATERIALIZED (
  SELECT u, v FROM edges
  WHERE ('0x' || substr(md5(u::VARCHAR || ':' || v::VARCHAR || ':e'), 1, 8))::BIGINT % 10 < 1
     OR (u % 7 = 0 AND v % 7 = 0)
)"""
    ]
    for i in range(1, rounds + 1):
        # MATERIALIZED: each round references its predecessor several
        # times — inlined CTEs would expand the scan tree exponentially
        # in rounds (observed: DuckDB ran out of file handles at 6)
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT node, count(*) AS dg
  FROM (SELECT u AS node FROM e{i-1} UNION ALL SELECT v AS node FROM e{i-1})
  GROUP BY node
),
k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE dg >= {k}),
e{i} AS MATERIALIZED (
  SELECT u, v FROM e{i-1}
  WHERE u IN (SELECT node FROM k{i}) AND v IN (SELECT node FROM k{i})
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(count(*) AS BIGINT) AS degree
FROM (SELECT u AS node FROM e{rounds} UNION ALL SELECT v AS node FROM e{rounds})
GROUP BY node"""
    )
    return "".join(parts)


ORACLE_KCORE_SUPPLIERS = _kcore_oracle()
