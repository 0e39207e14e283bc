package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph computation as a first-class operator: PageRank
  * over the customer↔supplier purchase graph (who-bought-from-whom,
  * derived from orders⋈lineitem), 3 fixed power iterations.
  *
  * Determinism: float PageRank sums per-node contributions in
  * partition order — no order-independent oracle can replay it
  * bit-exactly. Ranks here live in integer MICRO-units (start
  * 1,000,000 per node; damping 0.85 as the exact integer expression
  * `(r·85) div (100·deg)` per edge), so every per-edge contribution
  * and per-node sum is exact integer arithmetic — commutative,
  * partition-independent, and replayed verbatim by the oracle's three
  * unrolled CTE iterations. The integer truncation per edge loses <1
  * micro-unit per edge versus real division — the standard quantized
  * fixed-point treatment (same as the engine's cents-quantized money
  * sums).
  *
  * Scale shape: each iteration is one join (edges ⋈ ranks, both
  * pre-partitioned on the node key — AQE reuses the layout) + one
  * map-side-combined sum; the edge list is `localCheckpoint`ed once so
  * iterations re-read a materialized table instead of re-deriving the
  * distinct join ([[Dedup]] uses the same lineage-truncation pattern
  * for its label-propagation loop). 3 iterations = 3 shuffles, not a
  * 3-deep recompute tree.
  */
object Graph {

  val DAMPING_PCT = 85L
  val ITERATIONS = 3
  val SUPPLIER_OFFSET = 1000000L

  def pagerankQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("src"),
        ($"l_suppkey" + SUPPLIER_OFFSET).as("dst"))
      .distinct()
    // undirected flow: rank moves both ways along a purchase relation
    val edges = e0
      .union(e0.select($"dst".as("src"), $"src".as("dst")))
      .localCheckpoint() // materialized once; read 3×, lineage cut
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select($"src".as("node")) // every node has deg ≥ 1
    var ranks = nodes.select($"node", lit(1000000L).as("r"))
    (1 to ITERATIONS).foreach { _ =>
      val contrib = edges
        .join(ranks, $"src" === $"node")
        .join(deg, "src")
        .select($"dst",
          expr(s"(r * $DAMPING_PCT) div (100 * deg)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("in_r"))
      ranks = nodes.join(contrib, $"node" === $"dst", "left")
        .select($"node",
          (lit(150000L) + coalesce($"in_r", lit(0L))).as("r"))
    }
    ranks.filter($"node" >= SUPPLIER_OFFSET)
      .select(($"node" - SUPPLIER_OFFSET).as("s_suppkey"),
        $"r".as("rank_ppm"))
      .orderBy($"s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank_q" -> (pagerankQ _),
  )

  /** One unrolled iteration: ranks `rPrev` → contribution sum → new
    * ranks `rNext`, in the exact integer arithmetic of the operator. */
  private def iterSql(rPrev: String, cN: String, rNext: String): String =
    s"""$cN AS (
       |  SELECT e.dst AS node,
       |    sum(($rPrev.r * $DAMPING_PCT) // (100 * deg.deg)) AS s
       |  FROM e JOIN $rPrev ON e.src = $rPrev.node
       |  JOIN deg ON e.src = deg.src
       |  GROUP BY 1),
       |$rNext AS (
       |  SELECT n.node,
       |    CAST(150000 + coalesce($cN.s, 0) AS BIGINT) AS r
       |  FROM n LEFT JOIN $cN ON n.node = $cN.node)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank_q" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey AS src,
         |    l_suppkey + $SUPPLIER_OFFSET AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM e0
         |      UNION ALL SELECT dst, src FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |n AS (SELECT src AS node FROM deg),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
         |${iterSql("r0", "c1", "r1")},
         |${iterSql("r1", "c2", "r2")},
         |${iterSql("r2", "c3", "r3")}
         |SELECT CAST(node - $SUPPLIER_OFFSET AS BIGINT) AS s_suppkey,
         |  r AS rank_ppm
         |FROM r3 WHERE node >= $SUPPLIER_OFFSET
         |ORDER BY s_suppkey""".stripMargin,
  )
}
