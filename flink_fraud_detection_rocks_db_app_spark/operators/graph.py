"""Iterative graph analytics over the relational fixtures: PageRank on
the customer–supplier trade network.

The reference has no graph operators; this extends the engine's
iterative pillar (connected components in dedup.py, Lloyd k-means in
similarity.py) with the canonical fixed-iteration-count ranking
algorithm, expressed Pregel-as-joins — the standard way to run graph
algorithms on a relational engine without a specialized runtime.

Scale design:
- The graph is materialized ONCE as a weighted edge frame joined to
  its out-degrees and persisted: five rank iterations re-read it, so
  at cluster scale you hash-partition it by src a single time and
  every iteration's contribution join co-locates against the ranks
  frame (itself keyed by node from the previous groupBy) without
  re-exchanging the big side.
- Each iteration is one join + one groupBy(dst) — the message-passing
  shuffle — over contributions, each O(|E|). Rank frames are O(|V|),
  localCheckpoint-ed eagerly per iteration so the lineage (and the
  re-execution cost of a lost partition) stays one-iteration deep
  instead of compounding to the full unrolled DAG.
- Iteration count is FIXED (5), not convergence-tested: a
  deterministic plan the oracle can unroll, and the shape a scheduled
  production refresh runs (bounded latency beats exact convergence).

Engine-exactness: all rank arithmetic is IEEE double with identical
literals on both sides; per-node contribution sums differ only in
summation order (~1e-15 relative), and the emitted ranks are
6dp-rounded per the registry convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load
from ..registry import register

PR_ITERS = 5
PR_DAMPING = 0.85


def _pagerank_oracle() -> str:
    it = """
r{i} AS (
  SELECT d.src AS node_id,
         (1.0 - 0.85) / (SELECT n FROM n) + 0.85 * COALESCE(c.s, 0.0) AS pr
  FROM deg d
  LEFT JOIN (
    SELECT e.dst AS dst, SUM(r.pr / dg.out_deg) AS s
    FROM edges e
    JOIN r{p} r ON e.src = r.node_id
    JOIN deg dg ON e.src = dg.src
    GROUP BY 1
  ) c ON d.src = c.dst
)"""
    iters = ",".join(it.format(i=i, p=i - 1) for i in range(1, PR_ITERS + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM edges GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT src AS node_id, 1.0 / (SELECT n FROM n) AS pr FROM deg),
{iters}
SELECT node_id,
       CASE WHEN node_id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity,
       CAST(node_id // 2 AS BIGINT) AS entity_key,
       round(pr, 6) AS pagerank
FROM r{PR_ITERS}
"""


def _trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (customer, supplier) trading pairs with
    parity-disjoint node ids — the graph's edge source."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )


def _pagerank_loop(spark: SparkSession, sf_dir: str):
    return _pagerank_iterate(_trade_pairs(spark, sf_dir))


def _pagerank_iterate(pairs: DataFrame):
    """Run the persisted-edges iteration shared by the ranking face,
    the convergence monitor and the streamed-ingest twin; returns
    (second-to-last, last) rank frames, both eagerly checkpointed."""
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("out_deg"))
    # degree-annotated edges: the frame every iteration re-reads —
    # hash-partition it by src ONCE and persist; the cached relation
    # advertises that partitioning, so each iteration's contribution
    # join shuffles only the O(V) rank frame, never the O(E) edges
    ew = edges.join(deg, "src").repartition(F.col("src")).persist()
    n_nodes = deg.count()
    base = (1.0 - PR_DAMPING) / n_nodes
    ranks = deg.select(
        F.col("src").alias("node_id"), F.lit(1.0 / n_nodes).alias("pr")
    ).localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node_id"))
    prev = ranks
    for _ in range(PR_ITERS):
        contribs = (
            ew.join(ranks, ew.src == ranks.node_id)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("s"))
        )
        prev = ranks
        ranks = (
            nodes.join(contribs, nodes.node_id == contribs.dst, "left")
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING) * F.coalesce("s", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    return prev, ranks


_ENTITY = (
    "CASE WHEN node_id % 2 = 0 THEN 'customer' ELSE 'supplier' END"
)


def ensure_pagerank_ranks(spark: SparkSession, sf_dir: str) -> str:
    """The rank table as a content-keyed ASSET (the ensure_index
    lifecycle the IVF/BM25 indexes use): the five-iteration loop runs
    once per (orders, lineitem) content — the scheduled-refresh shape
    a production graph ranking runs — and BOTH registered faces read
    the published (node_id, pr, pr_prev) parquet. Keyed on the two
    source tables via the chained fingerprint."""
    from .indexcache import ensure_index

    def build(tmp: str) -> None:
        prev, ranks = _pagerank_loop(spark, sf_dir)
        ranks.join(
            prev.select(
                F.col("node_id").alias("p_node"), F.col("pr").alias("pr_prev")
            ),
            ranks.node_id == F.col("p_node"),
        ).select("node_id", "pr", "pr_prev").write.mode("overwrite").parquet(tmp)

    return ensure_index(
        "pagerank_ranks", sf_dir, ("orders", "lineitem"), build
    )


@register(
    "pagerank_trade_network",
    oracle=_pagerank_oracle(),
    doc=f"PageRank ({PR_ITERS} fixed iterations, damping {PR_DAMPING}) "
    "over the symmetrized customer–supplier trade graph (an edge per "
    "distinct trading pair from orders x lineitem; node ids disjoint "
    "by parity). Pregel-as-joins: the degree-annotated edge frame is "
    "built once and persisted, each iteration is one contribution "
    "join + one groupBy(dst) shuffle, rank frames localCheckpoint "
    "per iteration to keep lineage one-step deep. Symmetrization "
    "removes dangling nodes, so total rank mass is conserved at 1 "
    "(tested). The oracle unrolls the identical five iterations as "
    "chained CTEs; emitted ranks 6dp-rounded on both sides. Served "
    "from the content-keyed ranks ASSET (ensure_pagerank_ranks, keyed "
    "on orders+lineitem via the chained fingerprint): the loop runs "
    "once per source content — the scheduled-refresh shape — and this "
    "face plus the convergence monitor read the published table.",
    tags=("graph", "iterative", "join", "batch"),
)
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = spark.read.parquet(ensure_pagerank_ranks(spark, sf_dir))
    return ranks.select(
        "node_id",
        F.expr(_ENTITY).alias("entity"),
        (F.col("node_id") / F.lit(2)).cast("long").alias("entity_key"),
        F.round("pr", 6).alias("pagerank"),
    )


# ---- convergence monitor -------------------------------------------------

# Convergence call on the 6dp-rounded per-node movement between the
# last two iterations: the fixed-point residual a scheduled refresh
# checks before deciding whether PR_ITERS still suffices as the graph
# grows. Threshold compares the ALREADY-ROUNDED delta, so the boolean
# is engine-exact.
PR_CONV_TOL = 1e-4


def _pagerank_conv_oracle() -> str:
    base = _pagerank_oracle()
    # reuse the unrolled CTE chain, swap the final projection for the
    # r4-vs-r5 residual
    head = base[: base.index("SELECT node_id,")]
    return f"""{head}
SELECT a.node_id,
       CASE WHEN a.node_id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity,
       round(a.pr, 6) AS pagerank,
       round(abs(a.pr - b.pr), 6) AS delta,
       (round(abs(a.pr - b.pr), 6) <= {PR_CONV_TOL!r}) AS converged
FROM r{PR_ITERS} a JOIN r{PR_ITERS - 1} b USING (node_id)
"""


@register(
    "pagerank_convergence_monitor",
    oracle=_pagerank_conv_oracle(),
    doc=f"Convergence monitor for the iterative pillar: per-node "
    f"|r{PR_ITERS} - r{PR_ITERS - 1}| residual of the PageRank fixed "
    f"point, 6dp-rounded, with a converged flag at {PR_CONV_TOL!r} — "
    "the analogue of the index-health monitors for iterative "
    "algorithms (is the FIXED iteration budget still enough as the "
    "graph grows, or does the refresh need another round?). Runs the "
    "same persisted-edges loop keeping the last two rank frames; the "
    "oracle reuses the unrolled CTE chain with an r4-vs-r5 residual "
    "projection, so monitor math and ranking math cannot drift; the "
    "face reads the same published ranks asset as the ranking face "
    "(pr and pr_prev columns) — one loop per source content.",
    tags=("graph", "iterative", "eval"),
)
def pagerank_convergence_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = spark.read.parquet(ensure_pagerank_ranks(spark, sf_dir))
    d = F.round(F.abs(F.col("pr") - F.col("pr_prev")), 6)
    return ranks.select(
        "node_id",
        F.expr(_ENTITY).alias("entity"),
        F.round("pr", 6).alias("pagerank"),
        d.alias("delta"),
        (d <= F.lit(PR_CONV_TOL)).alias("converged"),
    )
