package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality audit operators — the Deequ-style validation stage a
  * production pipeline runs before promoting a table: per-column
  * completeness/cardinality profiling and referential-integrity
  * orphan checks across the star schema's FK edges.
  *
  * Both are declarative single-statement plans (Catalyst owns the
  * strategy) and all-integer outputs (counts + truncating permille),
  * so the DuckDB oracle matches hash-exactly.
  */
object Quality {

  /** Profiled table + column list (the full `orders` schema). */
  val PROFILE_TABLE = "orders"
  val PROFILE_COLS: Seq[String] = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Per-column profile in ONE scan: row count, non-null count, exact
    * distinct count, completeness in permille. Spark plans the
    * multi-column distinct as one Expand-based aggregate — k× the scan
    * rows through the first partial aggregate, the price of EXACT NDV
    * per column. At 100 TB the same profile shape swaps
    * `count(distinct)` for the KMV estimator ([[Sketches]]) column by
    * column; the exact form is the validator the estimator is judged
    * against, same role split as the dedup family. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir, PROFILE_TABLE)
    val aggs = PROFILE_COLS.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val one = t.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = PROFILE_COLS
      .map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    one.select($"n_rows",
        expr(s"stack(${PROFILE_COLS.length}, $stacked) AS " +
          "(col_name, n_nonnull, n_distinct)"))
      .select($"col_name", $"n_rows", $"n_nonnull", $"n_distinct",
        expr("n_nonnull * 1000 div n_rows").as("completeness_permille"))
      .orderBy($"col_name")
  }

  /** The star schema's FK edges: (edge label, child table, child key,
    * parent table, parent key). */
  val FK_EDGES: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity audit: one row per FK edge — child row
    * count, orphan count (child keys with no parent), match permille.
    * Each edge is ONE pass over the child: a left outer join against
    * the parent's distinct key projection, with both counts in one
    * aggregate (`count(*)` + conditional orphan sum). Dimension-sized
    * parents broadcast (AQE decides from runtime size), making the
    * whole edge check a narrow scan with map-side-combined counts; at
    * 100 TB the orders/part parents are fact-scale and the join
    * correctly becomes a keyed shuffle — the intrinsic cost of an
    * exact audit. Nothing but 1-row aggregates reaches the driver. */
  def referential(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r20 (guide §2.3 — share one scan): the three lineitem edges used
    // to be three independent branches, each scanning the fact table
    // and running its own join + aggregate. Fused: ONE lineitem pass
    // carries all three key columns, each left-joined (parents still
    // distinct-projected, broadcast by AQE) against its parent, and
    // one aggregate emits all three orphan counts, stacked to the
    // three edge rows. Every parent join is 1:≤1 (distinct keys), so
    // row counts — and therefore every output value — are identical
    // to the per-edge formulation; at 100 TB this is two fewer full
    // fact-table passes. The four dimension-child edges stay separate
    // (their children are different tables).
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey".cast("long").as("k1"),
        $"l_partkey".cast("long").as("k2"),
        $"l_suppkey".cast("long").as("k3"))
    def parentKeys(pt: String, pk: String, as: String, hit: String) =
      Tables(s, dir, pt).select(col(pk).cast("long").as(as))
        .distinct().withColumn(hit, lit(1))
    val fused = li
      .join(parentKeys("orders", "o_orderkey", "k1", "h1"), Seq("k1"), "left")
      .join(parentKeys("part", "p_partkey", "k2", "h2"), Seq("k2"), "left")
      .join(parentKeys("supplier", "s_suppkey", "k3", "h3"), Seq("k3"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when($"h1".isNull, 1L).otherwise(0L)).as("o1"),
        sum(when($"h2".isNull, 1L).otherwise(0L)).as("o2"),
        sum(when($"h3".isNull, 1L).otherwise(0L)).as("o3"))
      .select($"n_child", expr("stack(3, " +
        "'lineitem->orders', o1, " +
        "'lineitem->part', o2, " +
        "'lineitem->supplier', o3) AS (edge, n_orphan)"))
      .select($"edge", $"n_child", $"n_orphan",
        expr("(n_child - n_orphan) * 1000 div n_child")
          .as("match_permille"))
    val rest = FK_EDGES.filterNot(_._2 == "lineitem")
      .map { case (label, ct, ck, pt, pk) =>
        val child = Tables(s, dir, ct).select(col(ck).cast("long").as("k"))
        val parent = Tables(s, dir, pt).select(col(pk).cast("long").as("k"))
          .distinct().withColumn("hit", lit(1))
        child.join(parent, Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when($"hit".isNull, 1L).otherwise(0L)).as("n_orphan"))
          .select(lit(label).as("edge"), $"n_child", $"n_orphan",
            expr("(n_child - n_orphan) * 1000 div n_child")
              .as("match_permille"))
      }
    (fused +: rest).reduce(_ unionAll _).orderBy($"edge")
  }

  /** Freshness / gap audit — the staleness monitor a streaming table
    * gets: per event type, event count, last-seen time, staleness
    * against the newest event anywhere, and the largest inter-event
    * gap in the type's history (SLA breach detection).
    *
    * Scale design: max-gap is NOT one `lag()` over a whole type's
    * history — that is a |types|-partition window over corpus-sized
    * partitions (the q45 pathology). It decomposes hierarchically:
    * intra-day gaps come from (type, day)-partitioned windows (the
    * partition key grows with data), day-boundary gaps from a lag
    * over the BOUNDED (type, day) summary rows, and the final max
    * merges the two. Gap values are insensitive to timestamp-tie
    * ordering (equal neighbors yield gap 0 under any stable order),
    * so the decomposition is deterministic. The closing windows run
    * over ≤ types×days rows — bounded. */
  def freshness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(s, dir, "events")
      .select($"event_type", unix_micros($"ts").as("us"),
        to_date($"ts").as("day"))
    val wDay = Window.partitionBy($"event_type", $"day").orderBy($"us")
    val days = ev
      .withColumn("gap", $"us" - lag($"us", 1).over(wDay))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"), min($"us").as("first_us"),
        max($"us").as("last_us"), max($"gap").as("intra_gap"))
    // from here on everything is types×days rows — bounded
    val wType = Window.partitionBy($"event_type").orderBy($"day")
    val perType = days
      .withColumn("boundary_gap",
        $"first_us" - lag($"last_us", 1).over(wType))
      .groupBy($"event_type")
      .agg(sum($"n").as("n_events"), max($"last_us").as("last_us"),
        greatest(coalesce(max($"intra_gap"), lit(0L)),
          coalesce(max($"boundary_gap"), lit(0L))).as("max_gap_us"))
    perType
      .withColumn("anchor", max($"last_us").over(
        Window.partitionBy())) // unpartitioned but ≤ |types| rows
      .select($"event_type", $"n_events", $"last_us",
        ($"anchor" - $"last_us").as("staleness_us"), $"max_gap_us")
      .orderBy($"event_type")
  }

  /** Histogram buckets / value domain cap / period split for
    * [[histogramDrift]]. Values ≥ [[DRIFT_CAP_CENTS]] clamp into the
    * top bucket, so the bucketing is total without a data-dependent
    * max pass. */
  val DRIFT_BUCKETS = 16L
  val DRIFT_CAP_CENTS = 10000L
  val DRIFT_SPLIT_DAY = "2024-01-16"

  /** Distribution-drift audit — the day-over-day histogram comparison
    * every ingestion pipeline runs to catch silent upstream changes
    * (schema'd the same, distributed differently): per event_type,
    * the `value` histogram of the first half of the month vs the
    * second, compared in integer permille space. Drift =
    * Σ_buckets (p1‰ − p2‰)² (an exact-integer L2 on the permille
    * vectors, bounded by 16·10⁶); the report adds the worst bucket
    * (max |Δ‰|, ties to the lowest bucket via an integer composite
    * key). ONE map-side-combined aggregate over the scan builds both
    * histograms (conditional sums keyed on the split day); everything
    * after is |types|×[[DRIFT_BUCKETS]] rows — bounded at any
    * corpus size. */
  def histogramDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = java.sql.Date.valueOf(DRIFT_SPLIT_DAY)
    val bucketed = Tables(s, dir, "events")
      .select($"event_type",
        (to_date($"ts") < lit(split)).as("p1"),
        expr(s"least(${DRIFT_BUCKETS - 1}L, " +
          "CAST(floor(value * 100.0 + 0.5) AS BIGINT) " +
          s"* $DRIFT_BUCKETS div $DRIFT_CAP_CENTS)").as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(sum(when($"p1", 1L).otherwise(0L)).as("c1"),
        sum(when($"p1", 0L).otherwise(1L)).as("c2"))
    // totals via a window over the aggregated |types|×buckets relation
    // (bounded), so the events scan happens exactly once
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    bucketed
      .withColumn("n1", sum($"c1").over(byType))
      .withColumn("n2", sum($"c2").over(byType))
      .select($"event_type", $"bucket", $"n1", $"n2",
        expr("c1 * 1000 div n1").as("pm1"),
        expr("c2 * 1000 div n2").as("pm2"))
      .select($"event_type", $"bucket", $"n1", $"n2",
        (($"pm1" - $"pm2") * ($"pm1" - $"pm2")).as("d2"),
        abs($"pm1" - $"pm2").as("ad"))
      .groupBy($"event_type")
      .agg(max($"n1").as("n1"), max($"n2").as("n2"),
        sum($"d2").as("drift_l2_pm2"),
        // composite: largest |Δ‰| first, lowest bucket on ties
        min_by($"bucket", (lit(1001L) - $"ad") * 100L + $"bucket")
          .as("worst_bucket"),
        max($"ad").as("worst_abs_pm"))
      .orderBy($"event_type")
  }

  /** Benford expected first-digit frequencies in permille
    * (⌊log10(1+1/d)·1000+0.5⌉ for d = 1..9) — pinned as integer
    * literals so the oracle never touches float log10. */
  val BENFORD_PM = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  /** Benford first-digit audit — the classic anomaly screen for
    * manufactured numeric data (fraud detection, synthetic-data
    * leakage): the leading-digit distribution of order totals vs
    * Benford's law, in exact integer permille. The leading digit is
    * integer string arithmetic on the CENTS quantization (multiplying
    * by 100 shifts the decimal point and preserves the leading
    * digit), so both engines derive it identically with no float
    * formatting in the loop. ONE map-side-combined aggregate; output
    * is 9 rows at any scale. The verdict column reports the absolute
    * permille deviation per digit — on TPC-H-style uniform prices the
    * audit correctly FAILS (uniform data is not Benford), which is
    * the point: the key checks the machinery, not the corpus. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val expected = BENFORD_PM.zipWithIndex
      .map { case (pm, i) => (i + 1L, pm) }.toDF("digit", "benford_pm")
    val digits = Tables(s, dir, "orders")
      .select(expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
        .as("cents"))
      .filter($"cents" > 0L)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) " +
        "AS BIGINT)").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum($"n")).head().getLong(0) // 1 row
    digits.join(broadcast(expected), Seq("digit"), "right")
      .select($"digit", coalesce($"n", lit(0L)).as("n"),
        expr(s"coalesce(n, 0L) * 1000L div ${total}L")
          .as("observed_pm"),
        $"benford_pm")
      .select($"digit", $"n", $"observed_pm", $"benford_pm",
        abs($"observed_pm" - $"benford_pm").as("abs_dev_pm"))
      .orderBy($"digit")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_benford_audit" -> (benfordAudit _),
    "dq_profile" -> (profile _),
    "dq_referential" -> (referential _),
    "dq_freshness" -> (freshness _),
    "dq_histogram_drift" -> (histogramDrift _),
  )

  val oracles: Map[String, String] = Map(
    // same cents-string leading digit, same integer permille; the
    // expected row set is generated from the same pinned literals
    "dq_benford_audit" -> {
      val exp = BENFORD_PM.zipWithIndex
        .map { case (pm, i) => s"(${i + 1}, $pm)" }.mkString(", ")
      s"""WITH ex(digit, benford_pm) AS (VALUES $exp),
         |c AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5)
         |    AS BIGINT) AS cents
         |  FROM orders),
         |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
         |    AS BIGINT) AS digit, CAST(count(*) AS BIGINT) AS n
         |  FROM c WHERE cents > 0 GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d)
         |SELECT CAST(ex.digit AS BIGINT) AS digit,
         |  coalesce(d.n, 0) AS n,
         |  CAST(coalesce(d.n, 0) * 1000 // t.total AS BIGINT)
         |    AS observed_pm,
         |  CAST(ex.benford_pm AS BIGINT) AS benford_pm,
         |  CAST(abs(coalesce(d.n, 0) * 1000 // t.total
         |    - ex.benford_pm) AS BIGINT) AS abs_dev_pm
         |FROM ex LEFT JOIN d ON d.digit = ex.digit CROSS JOIN t
         |ORDER BY digit""".stripMargin
    },
    // same clamped bucketing, permille vectors, L2 and composite
    // worst-bucket key — all integer arithmetic
    "dq_histogram_drift" ->
      s"""WITH b AS (SELECT event_type,
         |    CAST(ts AS DATE) < DATE '$DRIFT_SPLIT_DAY' AS p1,
         |    least(${DRIFT_BUCKETS - 1},
         |      CAST(floor(value * 100.0 + 0.5) AS BIGINT)
         |        * $DRIFT_BUCKETS // $DRIFT_CAP_CENTS) AS bucket
         |  FROM events),
         |c AS (SELECT event_type, bucket,
         |    CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(sum(CASE WHEN p1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
         |  FROM b GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
         |    CAST(sum(c2) AS BIGINT) AS n2
         |  FROM c GROUP BY 1),
         |p AS (SELECT c.event_type, bucket, n1, n2,
         |    c1 * 1000 // n1 AS pm1, c2 * 1000 // n2 AS pm2
         |  FROM c JOIN t ON c.event_type = t.event_type)
         |SELECT event_type, max(n1) AS n1, max(n2) AS n2,
         |  CAST(sum((pm1 - pm2) * (pm1 - pm2)) AS BIGINT)
         |    AS drift_l2_pm2,
         |  arg_min(bucket,
         |    (1001 - abs(pm1 - pm2)) * 100 + bucket) AS worst_bucket,
         |  CAST(max(abs(pm1 - pm2)) AS BIGINT) AS worst_abs_pm
         |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,
    // the oracle takes the flat one-level form (one lag per type) —
    // the hierarchical engine decomposition must agree with it exactly
    "dq_freshness" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type, us,
        |    us - lag(us) OVER (PARTITION BY event_type ORDER BY us)
        |      AS gap
        |  FROM e),
        |t AS (SELECT event_type, count(*) AS n, max(us) AS last_us,
        |    coalesce(max(gap), 0) AS max_gap
        |  FROM g GROUP BY 1),
        |a AS (SELECT max(last_us) AS anchor FROM t)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(last_us AS BIGINT) AS last_us,
        |  CAST(anchor - last_us AS BIGINT) AS staleness_us,
        |  CAST(max_gap AS BIGINT) AS max_gap_us
        |FROM t, a ORDER BY event_type""".stripMargin,
    "dq_profile" -> {
      val branches = PROFILE_COLS.map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count($c) AS nn, count(DISTINCT $c) AS nd
           |FROM $PROFILE_TABLE""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH p AS (
         |$branches)
         |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(nn AS BIGINT) AS n_nonnull,
         |  CAST(nd AS BIGINT) AS n_distinct,
         |  CAST(nn * 1000 // n_rows AS BIGINT) AS completeness_permille
         |FROM p ORDER BY col_name""".stripMargin
    },
    "dq_referential" -> {
      val branches = FK_EDGES.map { case (label, ct, ck, pt, pk) =>
        s"""SELECT '$label' AS edge, count(*) AS n_child,
           |  count(*) FILTER (WHERE p.k IS NULL) AS n_orphan
           |FROM (SELECT CAST($ck AS BIGINT) AS k FROM $ct) c
           |LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS k
           |  FROM $pt) p ON c.k = p.k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |$branches)
         |SELECT edge, CAST(n_child AS BIGINT) AS n_child,
         |  CAST(n_orphan AS BIGINT) AS n_orphan,
         |  CAST((n_child - n_orphan) * 1000 // n_child AS BIGINT)
         |    AS match_permille
         |FROM e ORDER BY edge""".stripMargin
    },
  )
}
