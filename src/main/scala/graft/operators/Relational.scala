package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2.6 checklist: scans,
  * projection, filters, joins incl. semi/anti, aggregations, windows,
  * sorts, limits, set ops, grouping sets, scalar functions).
  *
  * Written DataFrame-first so Catalyst handles predicate pushdown,
  * column pruning and join strategy selection. Only true dimension
  * tables ([[Tables.broadcastable]]: region/nation/supplier) carry
  * explicit broadcast hints; fact-scale tables (customer, orders,
  * lineitem) never do — AQE decides from runtime sizes, so small-SF
  * speed never becomes a large-SF driver OOM.
  *
  * Every query is deterministically ordered (unique sort key) so the
  * driver's hash compare is order-stable, and every floating-point
  * aggregate is rounded to absorb summation-order differences between
  * Spark's parallel partial aggregation and DuckDB's serial fold.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private def r2(c: Column): Column = round(c, 2)

  /** TPC-H Q1 shape: scan + filter + hash aggregate + sort. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1999-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r2(sum($"l_quantity")).as("sum_qty"),
        r2(sum($"l_extendedprice")).as("sum_base_price"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        r2(avg($"l_quantity")).as("avg_qty"),
        r2(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + filter; both must reach the parquet scan
    * (PushedFilters / ReadSchema pruned to 3 columns). */
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderstatus" === "F" && $"o_totalprice" > 200000.0)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** TPC-H Q3 shape: 3-way join + aggregate + top-N. Customer side is
    * filtered before the join so at scale the shuffle carries only the
    * BUILDING segment. Customer is FACT-scale (grows with SF —
    * [[Tables.broadcastable]] excludes it), so no broadcast hint: AQE
    * picks broadcast at small SF from runtime sizes and falls back to
    * shuffle join when the filtered side outgrows the threshold. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = t(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(20)
  }

  /** TPC-H Q4 shape: EXISTS → left-semi join (no row duplication, no
    * post-join dedup). */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q5 shape: 6-way join through the dimension chain. True
    * dimensions (nation/region/supplier — [[Tables.broadcastable]]) are
    * broadcast explicitly; customer is fact-scale (GBs at sf100), so
    * its join carries no hint — AQE broadcasts at small SF and shuffles
    * when it would blow the driver. */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = t(s, dir, "region").filter($"r_name" === "ASIA")
    val nation = t(s, dir, "nation")
    val supp = t(s, dir, "supplier")
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(supp),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q6 shape: tight filter + single global aggregate — the whole
    * query collapses to a scan with pushed predicates + partial agg. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.03 && $"l_discount" <= 0.07 && $"l_quantity" < 24.0)
      .agg(r2(sum($"l_extendedprice" * $"l_discount")).as("revenue"))
  }

  /** Window: top-3 orders per customer by price (row_number with a
    * deterministic tiebreak). */
  def q7TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", r2($"o_totalprice").as("price"))
      .orderBy($"o_custkey", $"rn")
  }

  /** Same top-3-per-customer result as [[q7TopOrdersPerCustomer]],
    * computed by the bounded [[graft.functions.TopK.TopKAgg]] typed
    * Aggregator instead of a window sort. Why both exist: the window
    * variant shuffles and sorts EVERY order row on `o_custkey`; this
    * one participates in partial aggregation, so each map task ships
    * at most k=3 entries per customer it saw — shuffle volume is
    * O(k·customers), independent of the fact-table row count. At
    * 100 TB, that's the difference between moving the whole table and
    * moving the answer. Deterministic: the aggregator's order is total
    * (price DESC, orderkey ASC), so any partitioning yields the same
    * buffer. Oracle: the exact window SQL q7 uses — both formulations
    * must agree row-for-row, which is itself the equivalence check. */
  def q25TopkAggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.TopK
    val topk = new TopK.TopKAgg(3).toColumn.name("topk")
    t(s, dir, "orders")
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => TopK.Entry(r._2, r._3))
      .agg(topk)
      .flatMap { case (cust, entries) =>
        entries.iterator.zipWithIndex.map { case (e, i) =>
          (cust, (i + 1).toLong, e.key, e.price)
        }
      }
      .toDF("o_custkey", "rn", "o_orderkey", "price")
      .withColumn("price", r2($"price"))
      .orderBy($"o_custkey", $"rn")
  }

  /** Pivot (long→wide): per-user event-type counts as columns. With an
    * explicit values list this reads events ONCE into a two-phase
    * aggregate ((user,type) count, then pivot_first per user — both
    * map-side combined), no join; without the list Spark first runs a
    * separate distinct scan to discover categories, a second full pass
    * at 100 TB. PlanSpec pins the one-scan/no-join shape. */
  def q28Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = t(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(wide)((df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L))))
      .orderBy($"user_id")
  }

  /** Exact discrete percentiles (p50/p90 document token length per
    * source) via an explicit row_number formulation — `value at row
    * ceil(p·n)` — rather than an engine quantile function, because
    * interpolating quantile implementations differ across engines
    * while this formulation is pure integer selection, bit-portable
    * by construction. Quantiles intrinsically need a per-group order:
    * one shuffle+sort on `source`, both percentiles read from the
    * same sorted pass. */
  def q29PercentileDisc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy($"source").orderBy($"n_tok", $"doc_id")
    docs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      .groupBy($"source")
      .agg(
        max(when($"rn" === ceil($"n" * 0.5), $"n_tok")).as("p50_tok"),
        max(when($"rn" === ceil($"n" * 0.9), $"n_tok")).as("p90_tok"),
        max($"n").as("n_docs"))
      .orderBy($"source")
  }

  /** RANGE-interval window frame: per-user trailing-1-hour event count
    * and value sum at every event — the time-based sliding frame (vs
    * q15's running frame). The order column is epoch MICROS (exact
    * integer) and the frame is `RANGE -3_600_000_000..0`, identical in
    * both engines. The summed value is pre-quantized to integer cents
    * (`floor(v·100 + 0.5)`): Spark's sliding frame re-aggregates
    * sequentially while DuckDB's uses a segment tree, so a DOUBLE
    * window sum has engine-dependent fold order — integers make the
    * frame sum order-free. One shuffle+sort on user_id. */
  def q35RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        floor($"value" * 100.0 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600000000L, 0L)
    ev.withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum($"cents").over(w))
      .select($"event_id", $"user_id", $"n_1h", $"cents_1h")
      .orderBy($"event_id")
  }

  /** GROUPING SETS with an explicit grouping id — the generalized
    * rollup/cube form (q12 covers rollup). The id is computed as
    * `grouping(status)·2 + grouping(priority)` in BOTH engines rather
    * than trusting each engine's grouping_id() bit convention, and
    * NULL group keys are coalesced to 'ALL' so the output carries no
    * NULLs (engines disagree on default null sort order). Compiles to
    * ONE expand+aggregate pass — not one scan per set. */
  def q36GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q36_orders")
    s.sql("""
      SELECT cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               AS BIGINT) AS gid,
             coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM graft_q36_orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderstatus), ())
      ORDER BY gid, status, priority""")
  }

  /** Full outer join — the reconciliation shape (which BUILDING-segment
    * customers have no orders; which order keys belong to other
    * segments): both sides survive with NULLs for the missing partner,
    * coalesced away so the output is engine-portable. Shuffles both
    * sides on the key like any fact-fact join; neither side can
    * broadcast in a full outer (every row of BOTH sides must find
    * non-matches), which is why Spark only offers SMJ/shuffle-hash
    * here — the plan is the honest one. */
  def q37FullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val byCust = t(s, dir, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), r2(sum($"o_totalprice")).as("total"))
    cust.join(byCust, $"c_custkey" === $"o_custkey", "full_outer")
      .select(
        coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_custkey".isNotNull.cast("long").as("is_building"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"total", lit(0.0)).as("total"))
      .orderBy($"custkey")
  }

  /** Global sort + limit (TakeOrderedAndProject — no full sort at scale). */
  def q8TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", r2($"o_totalprice").as("price"), $"o_orderdate")
      .orderBy($"price".desc, $"o_orderkey")
      .limit(10)
  }

  /** Set operations: INTERSECT / EXCEPT / UNION (all distinct). */
  def q9SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val active = cust.filter($"c_acctbal" > 0.0).select($"c_custkey".as("key"))
      .intersect(ord.select($"o_custkey".as("key")))
    val autoNoF = cust.filter($"c_mktsegment" === "AUTOMOBILE")
      .select($"c_custkey".as("key"))
      .except(ord.filter($"o_orderstatus" === "F").select($"o_custkey".as("key")))
    active.union(autoNoF).distinct().orderBy($"key")
  }

  /** Distinct aggregates. */
  def q10DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  /** NOT EXISTS → left-anti join (customers with no open order). */
  def q11CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter($"o_orderstatus" === "O")
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Grouping sets (ROLLUP) with explicit NULLS FIRST ordering. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), r2(sum($"l_quantity")).as("qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Time-bucketed aggregation over the events stream table. */
  def q13EventsDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), r2(sum($"value")).as("total"))
      .orderBy($"day", $"event_type")
  }

  /** Scalar-function surface: string / math / conditional, with
    * explicit casts so Spark and DuckDB output types line up. */
  def q14ScalarFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        length($"p_name").cast("long").as("name_len"),
        substring($"p_type", 1, 5).as("type5"),
        concat($"p_brand", lit("#"), $"p_type").as("tagged"),
        r2($"p_retailprice" * 1.1).as("bumped"),
        ($"p_size" % 7).cast("long").as("size_mod"),
        when($"p_size" >= 25, lit("LARGE")).otherwise(lit("small")).as("bucket"))
      .orderBy($"p_partkey")
  }

  /** Window: lag + running sum per user over the events table — the
    * frame defines the summation order, so doubles match exactly. */
  def q15EventsRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select(
        $"event_id", $"user_id",
        r2($"value" - lag($"value", 1).over(w)).as("delta"),
        r2(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .as("running"),
        rank().over(w).cast("long").as("rnk"))
      .orderBy($"event_id")
  }

  /** Correlated scalar-aggregate shape: orders 1.5× above their
    * customer's average. The threshold test is done in exact decimal
    * arithmetic (price·n·2 > sum·3 ⇔ price > 1.5·avg) so the row set
    * is bit-for-bit reproducible across engines — a float avg would
    * land exactly on .xx5 half-way points (sum of cents / 2) where
    * Spark's and DuckDB's rounding disagree. */
  def q16AboveAverageOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .withColumn("price_d", $"o_totalprice".cast("decimal(18,2)"))
    val byCust = ord.groupBy($"o_custkey".as("ac_custkey"))
      .agg(sum($"price_d").as("sum_d"), count(lit(1)).as("n_ord"))
      .filter($"n_ord" >= 2)
    ord.join(byCust, $"o_custkey" === $"ac_custkey")
      .filter($"price_d" * $"n_ord" * 2 > $"sum_d" * 3)
      .select($"o_orderkey", $"o_custkey", r2($"o_totalprice").as("price"),
        $"n_ord")
      .orderBy($"o_orderkey")
  }

  /** TPC-H Q22 shape (global-scalar-subquery threshold + anti-join):
    * customers whose balance exceeds the average positive balance AND
    * who have placed no RECENT orders (none since 2000 — the Q22
    * "lapsed but valuable" semantics), rolled up per nation.
    * Complements q16 (PER-GROUP scalar subquery) with the GLOBAL
    * variant: the 1-row aggregate broadcasts onto the scan as a
    * constant — the decorrelation Spark plans for
    * `WHERE x > (SELECT avg(...))`. The anti-join side carries the
    * recency predicate, which pushes to the orders scan. Threshold in
    * exact cross-multiplied decimals (`bal·n > sum` ⇔ `bal > avg`)
    * for the same reason as q16: a float avg lands on half-way points
    * where the engines' rounding disagrees. */
  def q51IdleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
      .withColumn("bal_d", $"c_acctbal".cast("decimal(18,2)"))
    val thr = cust.filter($"bal_d" > 0)
      .agg(sum($"bal_d").as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
    cust.crossJoin(broadcast(thr))
      .filter($"bal_d" * $"n_pos" > $"sum_pos")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey".cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum($"c_acctbal"), 2).as("total_bal"))
      .orderBy($"nationkey")
  }

  /** Trailing 7-day DISTINCT user count per day — the canonical
    * non-decomposable window aggregate: distinct is not subtractable,
    * so no sliding-frame trick applies. The scalable exact treatment
    * is expand-then-dedup: dedup to (user, day) FIRST (the only
    * event-proportional step, map-side combinable), then each such
    * row contributes to the 7 window-days it falls in (a bounded ×7
    * relational expansion via `sequence`), dedup again on
    * (user, window_day) — users active on several days of one window
    * count once — and count. Every shuffle key is (user, day)-shaped;
    * nothing is ever a per-window re-scan of raw events. Window-days
    * with no activity are absent (q48 shows the densification
    * composition). */
  def q52TrailingDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val userDays = t(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d"))
      .distinct()
    userDays
      .select($"user_id",
        explode(sequence($"d", date_add($"d", 6))).as("window_day"))
      .distinct()
      .groupBy($"window_day")
      .agg(count(lit(1)).as("n_active_7d"))
      .orderBy($"window_day")
  }

  /** Skew-safe aggregation: event_type has only 5 values, so a naive
    * groupBy concentrates each key on one reducer. Salting fans each
    * hot key across 16 partial groups, then a second (tiny) aggregation
    * merges the partials — the standard two-phase treatment for skewed
    * keys at scale (counts and 2-decimal sums recombine exactly, so the
    * oracle is the plain GROUP BY). */
  def q17SaltedSkewAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val salted = t(s, dir, "events")
      .withColumn("salt", pmod($"event_id", lit(16)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"),
        sum($"value".cast("decimal(18,2)")).as("psum"))
    salted.groupBy($"event_type")
      .agg(sum($"pn").as("n"),
        r2(sum($"psum").cast("double")).as("total"))
      .orderBy($"event_type")
  }

  /** The spark.sql surface: the same ANSI SQL the DuckDB oracle runs,
    * executed verbatim through `spark.sql` over registered views — an
    * EXISTS correlated subquery exercising Catalyst's subquery
    * decorrelation (rewritten to a semi join; see PlanSpec). */
  def q19SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE c_acctbal > 0 AND EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the
    * decorrelation family EXISTS (q19) doesn't exercise: Catalyst
    * rewrites the per-row dependent subquery into a DomainJoin and
    * ultimately a ranked join, instead of re-executing the inner query
    * per outer row (which is what LATERAL means naively and what would
    * never survive a fact-scale outer side). Top-2 orders per
    * high-balance customer, SQL-surface formulation of the q7/q25
    * top-n shape. */
  def q39LateralTopn(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |WHERE c_acctbal > 9000.0
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin)
  }

  /** Date/time scalar surface: extraction, truncation, arithmetic —
    * with explicit casts where Spark and DuckDB output types differ. */
  def q20DatetimeFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate".cast("date"), 30).as("due_date"),
        datediff(lit("2000-01-01").cast("date"),
          $"o_orderdate".cast("date")).cast("long").as("days_to_y2k"))
      .orderBy($"o_orderkey")
  }

  /** TPC-H Q21 shape on this schema: the sole "problem" supplier of a
    * multi-supplier order (returned lineitem where no OTHER supplier's
    * lineitem was returned) — the hardest relational pattern in the
    * checklist: fact self-joins as one LEFT-SEMI (exists another
    * supplier) and one LEFT-ANTI (no other returned supplier), then a
    * broadcast dim join and a top-n. Both existence probes shuffle on
    * l_orderkey only; Catalyst plans them as semi/anti hash joins, no
    * correlated re-execution. */
  def q21SoleProblemSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val l1 = li.filter($"l_returnflag" === "R")
      .join(t(s, dir, "orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
    val others = li.select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2"))
    val othersR = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("ok3"), $"l_suppkey".as("sk3"))
    l1.join(others,
        $"l_orderkey" === $"ok2" && $"l_suppkey" =!= $"sk2", "left_semi")
      .join(othersR,
        $"l_orderkey" === $"ok3" && $"l_suppkey" =!= $"sk3", "left_anti")
      .join(broadcast(t(s, dir, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  /** Gap-based sessionization — the canonical event-analytics window
    * pattern: a new session starts after >30 min of user inactivity.
    * Two stacked windows (lag to flag session starts, running sum to
    * number them) then one aggregation; all three shuffle on user_id
    * ONCE — Catalyst collapses same-partitioning windows into a single
    * exchange. The streaming twin of this query is
    * flatMapGroupsWithState sessionization (graft.streaming). */
  def q24Sessionization(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gap = unix_micros($"ts") -
      unix_micros(lag($"ts", 1).over(byUser))
    val flagged = t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts")
      .withColumn("new_s",
        when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
    flagged
      .withColumn("sid", sum($"new_s")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("duration_us"))
      .orderBy($"user_id", $"sid")
  }

  /** Ordered conversion funnel view → click → purchase: each step's
    * timestamp is the FIRST qualifying event strictly after the
    * previous step (the standard product-analytics funnel, not mere
    * per-type existence). Expressed as a chain of conditional min
    * aggregations — step N's min joins back to the events filtered to
    * step N+1's type — so every shuffle is keyed on user_id and AQE
    * reuses the exchange across the chain; no per-event window, no
    * collect_list of a user's (unbounded) history. Users who never
    * reach step 1 still appear with reached = 0. */
  def q42FunnelSteps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", $"event_type", $"ts")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("view_ts"))
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"view_ts")
      .groupBy($"user_id").agg(min($"ts").as("click_ts"))
    val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"click_ts")
      .groupBy($"user_id").agg(min($"ts").as("purchase_ts"))
    ev.select($"user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select($"user_id",
        when($"purchase_ts".isNotNull, 3L)
          .when($"click_ts".isNotNull, 2L)
          .when($"view_ts".isNotNull, 1L)
          .otherwise(0L).as("reached"),
        $"view_ts", $"click_ts", $"purchase_ts")
      .orderBy($"user_id")
  }

  /** TPC-H Q2 shape (minimum-cost supplier) over this schema: for each
    * small part (`p_size <= 5`), every EUROPE-region supplier achieving
    * that part's minimum observed unit cost. The testdata has no
    * partsupp table, so the part-supplier cost relation is derived from
    * lineitem (min observed `l_extendedprice / l_quantity` per
    * (part, supplier)) — same correlated-scalar-subquery semantics.
    *
    * The interesting part is the DECORRELATION: the reference
    * formulation is a correlated scalar subquery (`cost = (SELECT
    * min(cost) ... WHERE same part)`), which naively re-executes per
    * outer row. Expressed Spark-first it becomes aggregate-then-rejoin:
    * one groupBy(part) min, joined back on (part, cost) equality —
    * both sides share the partkey exchange, so AQE plans one shuffle
    * leg; the supplier→nation→region dimension chain (≤100 rows) and
    * the filtered part table broadcast. Cost equality on doubles is
    * safe because both sides are the SAME min over the SAME division
    * results — bit-identical by IEEE determinism (the oracle replays
    * the identical float path). */
  def q43MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val eur = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(t(s, dir, "region").filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val smallPart = t(s, dir, "part").filter($"p_size" <= 5)
      .select($"p_partkey", $"p_brand", $"p_type")
    // The naive decorrelation (aggregate min per part, REJOIN on the
    // fact) plans two full lineitem scans + a sort-merge join — at
    // 100 TB the fact scan is the whole cost, so instead: semi-join
    // the fact down to qualifying parts FIRST (broadcast, prunes ~90%
    // of rows before any shuffle), aggregate once, and take the
    // per-part min as a WINDOW over the aggregated (part, supplier)
    // rows — partitions are per-part supplier lists (bounded), the
    // window rides the same partkey exchange the aggregation already
    // made, and lineitem is scanned exactly once.
    val ps = t(s, dir, "lineitem")
      .join(broadcast(smallPart.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("unit_cost"))
    ps.join(broadcast(eur), $"l_suppkey" === $"s_suppkey")
      .withColumn("min_cost",
        min($"unit_cost").over(Window.partitionBy($"l_partkey")))
      .filter($"unit_cost" === $"min_cost")
      .join(broadcast(smallPart), $"l_partkey" === $"p_partkey")
      .select($"p_partkey", $"p_brand", $"p_type", $"s_name", $"n_name",
        $"unit_cost")
      .orderBy($"p_partkey", $"s_name")
      .limit(100)
  }

  /** PERCENTILE_CONT (linear-interpolated quantiles) per group — the
    * companion to q29's PERCENTILE_DISC. q29's scaladoc explains why
    * built-in interpolating quantiles were avoided: engines differ in
    * HOW they interpolate. This operator instead owns the
    * interpolation: integer rank selection picks the bracketing VALUES
    * (`lo` at floor(p·(n−1)), `hi` at ceil — exactly q29's machinery),
    * then one pinned-association expression `lo + (hi−lo)·frac`
    * computes the interpolation from them, identically replayable
    * (the oracle CASTs its literals to DOUBLE: DuckDB parses bare
    * `0.95` as DECIMAL, whose exact arithmetic diverges from Spark's
    * double in the last ulp). One shuffle+sort per group — quantiles
    * intrinsically need the per-group order; both percentiles and the
    * bracketing rows come from the same sorted pass. */
  def q45PercentileCont(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // DISTRIBUTED rank selection, not row_number over a per-group
    // window: with 3 return-flag groups the window sorts the whole
    // fact on 3 tasks — the parallelism cliff measured at 8.6× wall
    // for 10× data. Instead range-sort (l_returnflag, v) across ALL
    // partitions and take global ranks via zipWithIndex (the
    // maint_histogram_equiheight machinery); per-group 0-based ranks
    // are global index − the group's first index. Ranks of tied
    // values are interchangeable, so the selected VALUES — and the
    // interpolation — are deterministic under any partitioning.
    val sorted = t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice".as("v"))
      .repartitionByRange(
        s.conf.get("spark.sql.shuffle.partitions").toInt,
        $"l_returnflag", $"v")
      .sortWithinPartitions($"l_returnflag", $"v")
      .as[(String, Double)].rdd.zipWithIndex()
      .map { case ((f, v), i) => (f, v, i) }
      .toDF("l_returnflag", "v", "idx")
    val grouped = sorted.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"), min($"idx").as("first_idx"))
    val ranked = sorted.join(broadcast(grouped), "l_returnflag")
      .withColumn("rn0", $"idx" - $"first_idx")
    def pos(p: Double) = lit(p) * ($"n_rows" - 1L).cast("double")
    def lo(p: Double) = max(when($"rn0" === floor(pos(p)), $"v"))
    def hi(p: Double) = max(when($"rn0" === ceil(pos(p)), $"v"))
    def interp(p: Double, l: org.apache.spark.sql.Column,
        h: org.apache.spark.sql.Column) = {
      val fullPos = lit(p) * ($"n_rows" - 1L).cast("double")
      l + (h - l) * (fullPos - floor(fullPos).cast("double"))
    }
    ranked.groupBy($"l_returnflag")
      .agg(max($"n_rows").as("n_rows"),
        lo(0.5).as("lo50"), hi(0.5).as("hi50"),
        lo(0.95).as("lo95"), hi(0.95).as("hi95"))
      .select($"l_returnflag", $"n_rows",
        interp(0.5, $"lo50", $"hi50").as("p50"),
        interp(0.95, $"lo95", $"hi95").as("p95"))
      .orderBy($"l_returnflag")
  }

  /** Semi-structured schema-on-read: extract a field from the raw JSON
    * `props` column with the codegen'd `get_json_object` scalar and
    * aggregate on it — the Spark-native path for JSON payload columns
    * (the engine's own jsonpath surface is exercised separately by the
    * e2 family; this is what an analyst writes). The extraction stays
    * inside whole-stage codegen (Jackson parse per row, no UDF), the
    * aggregate is map-side combined, and nulls from malformed/missing
    * paths flow through count/sum semantics identically in both
    * engines. */
  def q46JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count($"k").as("n_with_k"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Calendar densification — the time-series gap-fill every dashboard
    * and forecasting pipeline needs: daily counts per event type with
    * MISSING (day, type) cells present as explicit zeros. The dense
    * axis is generated relationally (`sequence` over the observed date
    * bounds, exploded — no driver collect, the bounds travel as a
    * 1-row frame), cross-joined with the distinct type dimension
    * (bounded), and the sparse counts left-join onto it. At 100 TB the
    * only data-proportional work is the map-side-combined daily count;
    * the dense frame is days × types regardless of input size. */
  def q48CalendarFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .select(to_date($"ts").as("day"), $"event_type")
    val counts = ev.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"))
    val days = ev.agg(min($"day").as("mn"), max($"day").as("mx"))
      .select(explode(sequence($"mn", $"mx", expr("interval 1 day")))
        .as("day"))
    val types = ev.select($"event_type").distinct()
    days.crossJoin(types)
      .join(counts, Seq("day", "event_type"), "left")
      .select($"day", $"event_type",
        coalesce($"n", lit(0L)).as("n_events"))
      .orderBy($"day", $"event_type")
  }

  /** Cohort retention — the product-analytics matrix: users cohorted
    * by their first active ISO week; each (cohort, week-offset) cell
    * counts the cohort's users still active that week. Three
    * aggregations, all keyed on user_id or the bounded (cohort, week)
    * pair — the per-user distinct-week dedup is the only
    * data-proportional shuffle, and it map-side combines. Week
    * arithmetic stays exact: both weeks are `date_trunc('week')`
    * Mondays, so their day difference is a multiple of 7 and the
    * offset division is exact in both engines. */
  def q50CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weeks = t(s, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
      .distinct()
    val cohorts = weeks.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    weeks.join(cohorts, "user_id")
      .select($"cohort_wk",
        (datediff($"wk".cast("date"), $"cohort_wk".cast("date")) / 7)
          .cast("long").as("week_n"))
      .groupBy($"cohort_wk", $"week_n")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_wk", $"week_n")
  }

  /** Forward-fill (last observation carried forward) — the sparse
    * sensor-reading pattern: only 'view' events carry a reading (the
    * JSON `k` field); every event row gets the user's most recent
    * reading at that point in event time, null before the first one.
    * `last(col, ignoreNulls)` over a per-user running frame — one
    * key-partitioned window, no self-join; DuckDB replays it with
    * `last_value(... IGNORE NULLS)`. */
  def q49FillForward(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type",
        when($"event_type" === "view",
          get_json_object($"props", "$.k").cast("long")).as("reading"))
      .withColumn("filled", last($"reading", ignoreNulls = true).over(w))
      .select($"event_id", $"user_id", $"filled")
      .orderBy($"event_id")
  }

  /** Ranking-window coverage beyond rank/row_number (q7) and frames
    * (q15/q35): ntile, percent_rank, cume_dist and lag in one pass
    * over the per-customer order history. The window key is
    * o_custkey — cardinality grows with the data and each window is a
    * bounded order history, so at 100 TB this is a well-distributed
    * sort within hash partitions, never a global or few-partition
    * window (the q45 lesson). Window order is (o_orderdate,
    * o_orderkey): the tiebreak makes ntile — a pure row-position
    * function — deterministic across engines; percent_rank/cume_dist
    * are emitted in integer parts-per-million form (the q67
    * convention) rather than comparing rounded float divisions, whose
    * tie behavior differs between Spark (HALF_UP) and DuckDB
    * (half-away-from-zero). Under the total order rank == row_number
    * and cume_dist == rn/n, so the ppm forms are exact. */
  def q53WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy($"o_custkey")))
      .withColumn("days_since_prev",
        datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)))
      .select($"o_orderkey", $"o_custkey", $"quartile",
        expr("CASE WHEN cnt > 1 THEN (rn - 1) * 1000000 div (cnt - 1) " +
          "ELSE 0 END").as("pct_rank_ppm"),
        expr("rn * 1000000 div cnt").as("cume_ppm"),
        $"days_since_prev")
      .orderBy($"o_orderkey")
  }

  /** Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL — the
    * multiplicity-preserving complement to q9's distinct set ops.
    * Operand multisets are each customer's key repeated once per
    * order in a half-year; INTERSECT ALL keeps min(multiplicity),
    * EXCEPT ALL the positive difference — i.e. "matched order
    * capacity" vs "surplus H1 orders" per customer. Spark plans both
    * as one aggregate per side + a join on the counts (no row-by-row
    * matching), so the shape scales like any key-count aggregate. */
  def q54MultisetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def half(lo: String, hi: String) =
      t(s, dir, "orders")
        .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
          $"o_orderdate" < lit(hi).cast("timestamp"))
        .select($"o_custkey")
    val h1 = half("1997-01-01", "1997-07-01")
    val h2 = half("1997-07-01", "1998-01-01")
    h1.intersectAll(h2).withColumn("op", lit("intersect_all"))
      .union(h1.exceptAll(h2).withColumn("op", lit("except_all")))
      .groupBy($"op", $"o_custkey")
      .agg(count(lit(1)).as("multiplicity"))
      .orderBy($"op", $"o_custkey")
  }

  /** Explicit bloom runtime-filter join — the engine-owned version of
    * Spark's `InjectRuntimeFilter`, made deterministic and guaranteed:
    * the filtered dim side (3 of 25 part brands) collapses into a
    * 128 KB bit set ([[graft.functions.Bloom]]) that prefilters the
    * fact scan BEFORE the join's shuffle, so at 100 TB the exchange
    * carries ~12% of lineitem instead of all of it. The probe is a
    * codegen'd scalar branch per row (no UDF); false positives just
    * ride into the join and drop there, so the result is bit-equal to
    * the plain join — which is exactly what the oracle checks. The
    * driver-side bloom build collects `M_BITS/8` bytes (128 KB,
    * flat in data size — documented bound). */
  def q55BloomJoinPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{Bloom, GraftFunctions}
    val brands = Seq("Brand#13", "Brand#24", "Brand#5")
    val dim = t(s, dir, "part")
      .filter($"p_brand".isin(brands: _*))
      .select($"p_partkey", $"p_brand")
    val words = dim
      .select(GraftFunctions.mix64($"p_partkey").as("h")).as[Long]
      .select(new Bloom.BloomAgg(Bloom.M_BITS, Bloom.K).toColumn)
      .head() // bounded: M_BITS/64 longs, flat in data size
    val pruned = t(s, dir, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .filter(Bloom.mightContainCol(
        GraftFunctions.mix64($"l_partkey"), words))
    pruned.join(dim, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  /** 2-D skyline (Pareto frontier) over parts: the cheapest-for-its-
    * size set — every part no other part beats on BOTH price (≤) and
    * size (≥) with one strict. The operator a catalog/feature-store
    * query layer needs for dominance filtering.
    *
    * Scale shape — the naive formulations both fail at 100 TB: the
    * NOT EXISTS dominance anti-join is O(n²), and a single global
    * `max().over(Window.orderBy(price))` sorts the table on ONE task
    * (the q45 parallelism cliff). This is instead a DISTRIBUTED
    * PREFIX SCAN:
    *  1. collapse to one row per distinct price with its max size —
    *     the only per-price survivor candidate (equal-price smaller
    *     sizes are dominated by definition). One map-side-combined
    *     aggregate.
    *  2. range-partition by price, window ONLY within each partition
    *     (`partitionBy(spark_partition_id())` — all partitions scan
    *     in parallel), and carry the cross-partition prefix max via a
    *     bounded per-partition stats collect (≤ shuffle-partitions
    *     rows) broadcast back — the classic scan-with-carry.
    *  3. frontier rows (size > prefix max of all strictly-cheaper
    *     prices) broadcast-join back to parts to emit members
    *     (frontier size ≤ the maximal antichain — small by nature).
    * All arithmetic integer (price in cents); the oracle checks the
    * same set via the O(n²) NOT EXISTS definition — two independent
    * formulations agreeing is the point. */
  def q59Skyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val np = s.conf.get("spark.sql.shuffle.partitions").toInt
    val pts = t(s, dir, "part")
      .select(
        expr("CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)")
          .as("price_cents"),
        $"p_size".cast("long").as("size"), $"p_partkey")
    val perPrice = pts.groupBy($"price_cents")
      .agg(max($"size").as("size"))
      .repartitionByRange(np, $"price_cents")
      .sortWithinPartitions($"price_cents")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pid must be stable across the two reads
    // carry: running max of sizes in all partitions BEFORE pid
    // (bounded collect: ≤ np rows)
    val pmaxes = perPrice.groupBy($"pid").agg(max($"size").as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val carry = pmaxes.map(_._1).zip(
      pmaxes.scanLeft(Long.MinValue) { case (acc, (_, m)) => acc max m })
      .toSeq.toDF("pid", "carry") // pid -> max size of preceding pids
    val wPrev = Window.partitionBy($"pid").orderBy($"price_cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice
      .join(broadcast(carry), "pid")
      .withColumn("prefix_max",
        greatest(coalesce(max($"size").over(wPrev), lit(Long.MinValue)),
          $"carry"))
      .filter($"size" > $"prefix_max")
      .select($"price_cents", $"size")
    pts.join(broadcast(frontier), Seq("price_cents", "size"))
      .select($"p_partkey", $"price_cents", $"size")
      .orderBy($"p_partkey")
  }

  /** Median absolute deviation of order value — the robust
    * location/spread profile (median, MAD) a data-quality monitor
    * prefers over mean/stddev under heavy tails. Exact and
    * integer-only: values in cents, both medians are the LOWER median
    * (the rank-⌊(n−1)/2⌋ element, percentile_disc semantics — no
    * interpolation float), each selected by the q45 distributed
    * rank-selection machinery (range-sort + zipWithIndex; never a
    * single-task window). Two range-sorts of the column is the
    * intrinsic cost of two exact order statistics. */
  def q60MadRobust(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val np = s.conf.get("spark.sql.shuffle.partitions").toInt
    def lowerMedian(vals: org.apache.spark.sql.Dataset[Long]): Long = {
      val n = vals.count()
      val target = (n - 1) / 2
      vals.repartitionByRange(np, $"value")
        .sortWithinPartitions($"value")
        .rdd.zipWithIndex()
        .filter(_._2 == target).map(_._1)
        .first()
    }
    val cents = t(s, dir, "orders")
      .select(expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
        .as("value")).as[Long]
    val n = cents.count()
    val med = lowerMedian(cents)
    val mad = lowerMedian(
      cents.select(abs($"value" - med).as("value")).as[Long])
    Seq((n, med, mad)).toDF("n_orders", "median_cents", "mad_cents")
  }

  /** Event-sequence transition matrix (first-order Markov counts): for
    * each user's time-ordered event stream, count (prev_type →
    * next_type) transitions and each transition's share of its source
    * state in integer permille. The per-user ordering is ONE window
    * (lag over user_id — the same exchange sessionization rides);
    * everything after is a map-side-combinable aggregate, and the
    * permille normalization is a window over the |types|² aggregated
    * relation, which is bounded regardless of corpus size. Integer
    * division keeps the share partition-independent. */
  def q62EventTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_permille",
        expr("n * 1000 div sum(n) OVER (PARTITION BY prev_type)"))
      .orderBy($"prev_type", $"next_type")
  }

  /** Robust per-group anomaly flags: daily value totals per event
    * type, flagged when the day deviates from its type's median by
    * more than 3× the type's MAD (the classic robust z-score monitor —
    * outliers cannot drag the threshold the way mean/stddev lets
    * them). Exact and integer-only: values quantized to cents PER ROW
    * (then Long sums — partition-independent), both medians are the
    * lower median selected by row_number over the DAILY relation.
    * Scale shape: the events scan reduces to (type × day) rows FIRST —
    * one map-side-combinable aggregate — so the four windows run over
    * a bounded relation (days per type), never over raw events;
    * `greatest(mad, 1)` keeps a zero-spread group from dividing by
    * zero while still flagging any deviation. */
  def q63RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events")
      .select($"event_type", date_trunc("day", $"ts").as("day"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
      .groupBy($"event_type", $"day")
      .agg(sum($"vc").as("v"))
      .localCheckpoint() // bounded (type × day); referenced 4× below —
      // without this every reference re-scans the raw events table
    val overType = Window.partitionBy($"event_type")
    val med = daily
      .withColumn("rn",
        row_number().over(overType.orderBy($"v", $"day")))
      .withColumn("cnt", count(lit(1)).over(overType))
      .filter($"rn" === expr("(cnt + 1) div 2"))
      .select($"event_type", $"v".as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("ad", abs($"v" - $"med"))
    val mad = dev
      .withColumn("rn",
        row_number().over(overType.orderBy($"ad", $"day")))
      .withColumn("cnt", count(lit(1)).over(overType))
      .filter($"rn" === expr("(cnt + 1) div 2"))
      .select($"event_type", $"ad".as("mad"))
    dev.join(mad, "event_type")
      .select($"event_type", $"day", $"v", $"med", $"mad",
        when($"ad" > lit(3) * greatest($"mad", lit(1L)), 1L)
          .otherwise(0L).as("is_outlier"))
      .orderBy($"event_type", $"day")
  }

  /** RFM customer segmentation with FIXED breakpoints — recency /
    * frequency / monetary scores 1–5 from business-defined thresholds
    * (30/90/180/365 days; 2/5/10/20 orders; 100/500/1k/5k monetary),
    * segment code = r·100 + f·10 + m. Fixed breakpoints rather than
    * ntile quantiles ON PURPOSE: quantile scoring needs a global sort
    * (or 12 distributed rank selections) over the customer relation,
    * while fixed thresholds keep the whole query ONE map-side-combined
    * aggregate + a narrow codegen'd scoring projection — the shape
    * that survives a 100× customer scale-up — and make scores stable
    * period-over-period (a quantile scheme re-grades everyone when
    * the mix shifts). Recency anchors to the corpus max order date
    * (one bounded collect); monetary is cents-quantized per row. */
  def q65RfmSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_custkey", to_date($"o_orderdate").as("d"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("cents"))
      .localCheckpoint() // read twice (anchor, per-customer rollup)
    val anchor = o.agg(max($"d")).first().getDate(0)
    val rfm = o.groupBy($"o_custkey")
      .agg(max($"d").as("last_day"), count(lit(1)).as("freq"),
        sum($"cents").as("monetary_cents"))
      .withColumn("recency_days",
        datediff(lit(anchor), $"last_day").cast("long"))
    def score(c: Column, cuts: Seq[Long], ascending: Boolean): Column = {
      // 5 = best; recency is better-small, freq/monetary better-large
      val ranks = if (ascending) Seq(5L, 4L, 3L, 2L) else Seq(1L, 2L, 3L, 4L)
      val default = if (ascending) 1L else 5L
      cuts.zip(ranks).foldRight(lit(default): Column) {
        case ((cut, r), acc) => when(c <= cut, r).otherwise(acc)
      }
    }
    rfm.select($"o_custkey", $"recency_days", $"freq", $"monetary_cents",
        score($"recency_days", Seq(30L, 90L, 180L, 365L),
          ascending = true).as("r"),
        score($"freq", Seq(2L, 5L, 10L, 20L), ascending = false).as("f"),
        score($"monetary_cents", Seq(10000L, 50000L, 100000L, 500000L),
          ascending = false).as("m"))
      .withColumn("segment", $"r" * 100 + $"f" * 10 + $"m")
      .orderBy($"o_custkey")
  }

  /** Distribution-position windows done scale-safe: quartile (ntile),
    * rank, and integer permille rank of each supplier WITHIN ITS
    * NATION by account balance. Every window partitions on the nation
    * key — bounded per-partition row counts — so this is the
    * legitimate home for ntile/rank position scoring (contrast
    * [[q65RfmSegments]], which deliberately avoids a GLOBAL ntile).
    * The permille is `(rank−1)·1000 div (n−1)` (truncating, 0 for a
    * singleton group) — the integer form of percent_rank, so the
    * oracle matches bit-exactly instead of comparing float
    * divisions. Order is total ((acctbal, suppkey)), pinning every
    * tie on both engines. */
  def q67NtileRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val win = Window.partitionBy($"s_nationkey")
      .orderBy($"s_acctbal", $"s_suppkey")
    t(s, dir, "supplier")
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nationkey"),
        $"s_acctbal")
      .withColumn("quartile", ntile(4).over(win).cast("long"))
      .withColumn("rnk", rank().over(win).cast("long"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy($"s_nationkey")))
      .select($"s_suppkey", $"s_nationkey", $"quartile", $"rnk",
        expr("CASE WHEN cnt > 1 THEN (rnk - 1) * 1000 div (cnt - 1) " +
          "ELSE 0 END").as("rank_permille"))
      .orderBy($"s_suppkey")
  }

  /** Exact DECIMAL money arithmetic — the audited-ledger path where
    * float rounding is not acceptable: per-status totals and an exact
    * 6%-tax projection, computed end-to-end in DECIMAL. The source
    * doubles carry 2-decimal money values, so the DECIMAL(12,2) cast
    * is value-preserving, and from there every operation is exact
    * integer-scaled arithmetic — no `round()` absorbing float drift
    * anywhere (contrast q1, which rounds), and no decimal rounding
    * mode is ever exercised (p*0.06 is exact at 4dp; Spark rounds
    * HALF_UP where DuckDB differs on ties — avoided by construction).
    * The WIRE type is the suite's integer-quantized money convention
    * (total_cents / tax_e4 / max_price_cents as BIGINT): the decimal
    * values are exactly integral at their scale, so the scale-up +
    * long cast is lossless, and BIGINT headroom (9.2e18) covers the
    * sum out past sf1000 — the DECIMAL(18,2) internal cast is the
    * binding capacity bound, good to ~1e16 cents. */
  /** The decimal-typed aggregate BEFORE the integer wire projection —
    * exposed so DecimalComplexSpec can pin that the internal
    * arithmetic is genuinely DecimalType end to end. */
  def q70DecimalAggInternal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderstatus",
        $"o_totalprice".cast("decimal(12,2)").as("p"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"p").cast("decimal(18,2)").as("total_dec"),
        sum($"p" * lit(BigDecimal("0.06")).cast("decimal(4,2)"))
          .cast("decimal(18,4)").as("tax_dec"),
        max($"p").as("max_dec"))
  }

  def q70DecimalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    q70DecimalAggInternal(s, dir)
      .select($"o_orderstatus", $"n",
        ($"total_dec" * lit(100)).cast("long").as("total_cents"),
        ($"tax_dec" * lit(10000)).cast("long").as("tax_e4"),
        ($"max_dec" * lit(100)).cast("long").as("max_price_cents"))
      .orderBy($"o_orderstatus")
  }

  /** Complex-type function surface: per-order part LISTS (sorted,
    * deduped, rendered to a canonical string — deterministic on both
    * engines), element membership, and a MAP built from entries then
    * read back. Collection functions are codegen'd column ops, so the
    * whole query is one order-keyed aggregation. */
  def q71ComplexTypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey").as("parts"),
        sum(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"))
          .as("cents"))
      .select($"l_orderkey",
        size($"parts").cast("long").as("n_parts"),
        concat_ws(",", sort_array($"parts")).as("part_csv"),
        array_contains($"parts", 1L).as("has_part_1"),
        element_at(
          map_from_arrays(array(lit("cents"), lit("parts")),
            array($"cents", size($"parts").cast("long"))),
          "cents").as("cents_via_map"))
      .orderBy($"l_orderkey")
  }

  /** Activity heatmap: event counts + cents by (day-of-week ×
    * hour-of-day) — the product-analytics usage matrix. Convention
    * pinned to DuckDB's `%w` (0 = Sunday), so Spark's `dayofweek`
    * (1 = Sunday) shifts by one; hours are session-UTC on both
    * engines. One map-side-combined aggregate into ≤ 168 groups. */
  def q72DowHourHeatmap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select((dayofweek($"ts") - 1).cast("long").as("dow"),
        hour($"ts").cast("long").as("hod"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
      .groupBy($"dow", $"hod")
      .agg(count(lit(1)).as("n_events"), sum($"vc").as("sum_cents"))
      .orderBy($"dow", $"hod")
  }

  /** CUBE — all four grouping combinations of (event_type, dow) in
    * one Expand-based aggregate, completing the rollup (q12) /
    * grouping-sets (q36) trio. `grouping()` flags disambiguate a
    * grouping NULL from a data NULL, and the coalesced sentinels keep
    * the sort key total so the oracle's ordering matches. */
  def q73Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type",
        (dayofweek($"ts") - 1).cast("long").as("dow"),
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
      .cube($"event_type", $"dow")
      .agg(count(lit(1)).as("n"), sum($"vc").as("sum_cents"),
        grouping($"event_type").cast("long").as("g_type"),
        grouping($"dow").cast("long").as("g_dow"))
      .select(
        coalesce($"event_type", lit("(all)")).as("event_type"),
        coalesce($"dow", lit(-1L)).as("dow"),
        $"g_type", $"g_dow", $"n", $"sum_cents")
      .orderBy($"event_type", $"dow")
  }

  /** Regex function surface — extract / count / strip with patterns
    * chosen to mean the same thing under Java regex (Spark) and RE2
    * (DuckDB): plain character classes and anchored groups only, no
    * backreferences or lookaround (which RE2 lacks — the documented
    * portability boundary). All codegen'd scalar projections over one
    * scan. */
  def q74RegexFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        expr("CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT)")
          .as("brand_num"),
        expr("regexp_extract(p_name, '^([a-z]+)', 1)").as("first_word"),
        expr("CAST(regexp_count(p_name, '[aeiou]') AS BIGINT)")
          .as("n_vowels"),
        length(regexp_replace($"p_name", "[aeiou ]", ""))
          .cast("long").as("n_consonants"))
      .orderBy($"p_partkey")
  }

  /** DECIMAL division across the engine divergence — the decimal twin
    * of q74's regex-portability key. DuckDB's native DECIMAL/DECIMAL
    * silently widens to DOUBLE (verified: `typeof(d/d) = 'DOUBLE'`),
    * while Spark keeps DECIMAL and rounds HALF_UP at a derived scale —
    * so engine-native decimal division is NOT portable. The portable
    * contract (documented in BASELINE.md): pin the quotient in integer
    * space with an explicit half-up formula,
    * `(a*2 + b) div (2*b)` for positive a,b. This key deliberately
    * crosses the seam: the Spark side computes `avg_e4` via NATIVE
    * decimal division + `round(…, 4)` (HALF_UP), the oracle computes
    * it via the integer pin — the hash match proves Spark's decimal
    * division obeys the pinned contract. (Exactness argument: the
    * quotient is a rational with denominator 100n, so its distance
    * from any 4dp tie boundary is ≥ 1/(2e6·n) — far above Spark's
    * scale-22 intermediate rounding, so no double-rounding hazard.) */
  def q75DecimalDiv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderstatus",
        $"o_totalprice".cast("decimal(12,2)").as("p"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"p").cast("decimal(18,2)").as("total_dec"))
      .select($"o_orderstatus", $"n",
        ($"total_dec" * lit(100)).cast("long").as("total_cents"),
        (round($"total_dec" / $"n".cast("decimal(20,0)"), 4)
          * lit(10000)).cast("long").as("avg_e4"))
      .orderBy($"o_orderstatus")
  }

  /** Recursive hierarchy traversal (the WITH RECURSIVE class): a
    * bill-of-materials walk to the root with per-edge quantity
    * multiplication. The component hierarchy is data-driven — an EDGE
    * TABLE (child, parent, qty) derived deterministically from `part`
    * (parent = child div 10, qty = child mod 5 + 1) so the DuckDB
    * oracle can replay the same walk as a genuine recursive CTE.
    *
    * Spark has no recursive CTE; the Spark-first expression is
    * FRONTIER ITERATION: keep (part, cur, depth, eff) states, join the
    * still-walking rows against the edge table once per level, union
    * with the finished rows, `localCheckpoint` per round to cut
    * lineage (the [[Graph]]/[[Dedup]] iterative-join discipline). The
    * level count is ceil(log10(max key)) — known up front from a
    * 1-row bounds pass, so no driver-side convergence polling. At
    * scale each level is ONE key-equi shuffle join over a frontier
    * that only shrinks; depth is logarithmic in the key domain (a
    * real BOM's depth is similarly bounded). Product stays in Long:
    * qty ≤ 5, depth ≤ 13 digits → ≤ 5^13 ≈ 1.2e9. */
  def q76RecursiveBom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = t(s, dir, "part")
      .select($"p_partkey".as("child"),
        expr("p_partkey div 10").as("parent"),
        expr("p_partkey % 5 + 1").as("qty"))
      .localCheckpoint() // read once per level
    // depth bound from the key domain: digits(max) - 1 levels suffice
    val maxKey = edges.agg(max($"child")).head().getLong(0) // 1-row
    val levels = math.max(1, maxKey.toString.length - 1)
    var state = edges.select($"child".as("part"), $"child".as("cur"),
      lit(0L).as("depth"), lit(1L).as("eff"))
    (1 to levels).foreach { _ =>
      val stepped = state.filter($"cur" >= 10)
        .join(edges, $"cur" === $"child")
        .select($"part", $"parent".as("cur"),
          ($"depth" + 1).as("depth"), ($"eff" * $"qty").as("eff"))
      state = state.filter($"cur" < 10).union(stepped).localCheckpoint()
    }
    state.select($"part".as("p_partkey"), $"cur".as("root_key"),
      $"depth", $"eff".as("eff_qty"))
      .orderBy($"p_partkey")
  }

  /** UNPIVOT (melt) — the wide→long reshape, via Spark's native
    * `Dataset.unpivot` (plans as Expand, the same codegen'd operator
    * CUBE/ROLLUP use: k output rows per input row, no shuffle until
    * the final sort). Measures are integer-quantized upfront so the
    * long `value` column is exact on both engines. */
  def q77Unpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey",
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("price_cents"),
        $"o_custkey".cast("long").as("cust_key"),
        datediff($"o_orderdate".cast("date"),
          lit(java.sql.Date.valueOf("1995-01-01"))).cast("long")
          .as("day_offset"))
      .unpivot(
        ids = Array(col("o_orderkey")),
        values = Array(col("price_cents"), col("cust_key"),
          col("day_offset")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy($"o_orderkey", $"measure")
  }

  /** MAP aggregation surface — build a map column FROM an aggregation
    * (per-status priority→count histogram via `map_from_entries` over
    * a sorted entry list), read it back (`element_at`), and render it
    * canonically (sorted k:v CSV — the deterministic wire form, since
    * map iteration order is not comparable across engines). Two
    * stacked aggregates, both map-side combined; the entry lists are
    * bounded by the priority domain. */
  def q78MapAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .groupBy($"o_orderstatus")
      .agg(sort_array(collect_list(struct($"o_orderpriority".as("p"),
        $"n"))).as("entries"))
      .select($"o_orderstatus",
        aggregate($"entries", lit(0L), (acc, x) => acc + x("n"))
          .as("n_total"),
        concat_ws(",", transform($"entries",
          x => concat(x("p"), lit(":"), x("n")))).as("prio_counts"),
        coalesce(element_at(
          map_from_entries($"entries"), "1-URGENT"), lit(-1L))
          .as("urgent_n"))
      .orderBy($"o_orderstatus")
  }

  /** OHLC resampling — the time-series bucket-summary shape (candle
    * charts, market-data rollups, metric downsampling): per
    * (series, day) emit the first/last observation plus min/max/sum/
    * count. First/last are `min_by`/`max_by` keyed on the unique,
    * monotone `event_id` (arrival order) — deterministic on both
    * engines, unlike a timestamp key that can tie. ONE map-side-
    * combined hash aggregate over the scan, no window, no shuffle
    * beyond the group keys — the resample stays scan-bound at any
    * scale, and the output is bounded by series×days. Money is
    * integer cents per the suite's quantized-money convention. */
  def q79OhlcResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type", date_trunc("day", $"ts").as("day"),
        $"event_id",
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(min_by($"cents", $"event_id").as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max_by($"cents", $"event_id").as("close_cents"),
        count(lit(1)).as("volume"),
        sum($"cents").as("total_cents"))
      .orderBy($"event_type", $"day")
  }

  /** Gaps-and-islands — contiguous-run detection (activity streaks,
    * sensor uptime, SLA windows) via the row_number-difference
    * technique: within a user, consecutive active days share
    * `day - row_number()`, so one window + one aggregate recovers
    * every island. The window runs over the PRE-AGGREGATED distinct
    * (user, day) relation — bounded by users × day-domain, never the
    * raw event stream — which is what keeps the single-partition-per-
    * user window safe at 100 TB (a user-year is ≤ 366 rows no matter
    * how many raw events back it). The per-user report picks the
    * longest island (earliest start on ties) through an integer
    * composite order key, exact on both engines. */
  def q80GapIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"d")
    val days = t(s, dir, "events")
      .select($"user_id",
        datediff(to_date($"ts"), lit(java.sql.Date.valueOf("2024-01-01")))
          .cast("long").as("d"))
      .distinct()
    val islands = days
      .withColumn("grp", $"d" - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(min($"d").as("start_d"), max($"d").as("end_d"),
        count(lit(1)).as("len"))
    islands.groupBy($"user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum($"len").as("active_days"),
        max($"len").as("max_len"),
        // longest island first, then earliest start — struct ordering,
        // not an arithmetic composite: (1000-len)*1000+start silently
        // corrupts past day offset 1000 (r14 advice)
        min_by($"start_d", struct((-$"len").as("nl"), $"start_d"))
          .as("best_start"))
      .orderBy($"user_id")
  }

  /** Interval union (merge-overlaps) — the continuous-time sibling of
    * [[q80GapIslands]]: each event opens an interval
    * `[ts, ts + value seconds)`; per user, overlapping intervals merge
    * and the report is merged-interval count, total covered time and
    * span (uptime/SLA-coverage accounting). The sweep is the
    * running-max technique: an interval starts a new merged group iff
    * its start exceeds the max end seen so far — two windows (running
    * max, running sum) under the unique total order `(ts_us,
    * event_id)`, then two aggregates. Windows are user-partitioned
    * and per-user density is bounded by design, so no partition
    * outgrows an executor at scale. All integer microseconds. */
  def q81IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val prevEnd = max($"end_us")
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    t(s, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        (unix_micros($"ts") +
          expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)") * 10000L)
          .as("end_us"))
      .withColumn("new_iv",
        when(prevEnd.isNull || $"ts_us" > prevEnd, 1L).otherwise(0L))
      .withColumn("island", sum($"new_iv").over(w))
      .groupBy($"user_id", $"island")
      .agg(min($"ts_us").as("s"), max($"end_us").as("e"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_merged"),
        sum($"e" - $"s").as("covered_us"),
        (max($"e") - min($"s")).as("span_us"))
      .orderBy($"user_id")
  }

  /** Fuzzy entity linking (record linkage / ER), canonicalize-then-
    * link: a dirty name column is resolved against a clean dimension
    * by (a) DEDUPLICATING both name columns first — name cardinality
    * is orders of magnitude below row count, so the expensive edit-
    * distance work runs on the distinct-name relation, (b) a BLOCKED
    * candidate join (first letter of the damaged token + the intact
    * second token — textbook stable-token blocking, never all-pairs),
    * (c) `levenshtein ≤ 2` scoring with a deterministic integer
    * argmin (distance, then key), and (d) a hash join back from the
    * resolved name map to the full table. The dirty side is derived
    * from `part` by a seeded single-char deletion inside the first
    * word (position keyed by p_partkey, first char preserved), so the
    * oracle replays the corruption and the link from first
    * principles, and `recovered` is checkable ground truth. */
  def q82FuzzyLink(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = t(s, dir, "part").select($"p_partkey", $"p_name")
    // seeded corruption: delete char at pos 2..len(w1) of word 1
    val dirty = parts.select($"p_partkey",
      split($"p_name", " ").as("ws"))
      .select($"p_partkey", $"ws"(0).as("w1"), $"ws"(1).as("w2"))
      .select($"p_partkey", $"w2",
        ($"p_partkey" % (length($"w1") - 1) + 2).cast("int").as("pos"),
        $"w1")
      .select($"p_partkey",
        concat(expr("substring(w1, 1, pos - 1)"),
          expr("substring(w1, pos + 1, 100)"), lit(" "), $"w2")
          .as("dirty_name"))
    val dirtyNames = dirty.select($"dirty_name").distinct()
      .withColumn("bkey", concat(substring($"dirty_name", 1, 1),
        lit("|"), substring_index($"dirty_name", " ", -1)))
    val cleanNames = parts.select($"p_name").distinct()
      .withColumn("bkey", concat(substring($"p_name", 1, 1),
        lit("|"), substring_index($"p_name", " ", -1)))
    // the distinct-name link is dimension-sized -> broadcast both ways
    val resolved = dirtyNames
      .join(broadcast(cleanNames), "bkey")
      .withColumn("dist", levenshtein($"dirty_name", $"p_name"))
      .filter($"dist" <= 2)
      .groupBy($"dirty_name")
      .agg(min($"dist").cast("long").as("best_dist"),
        min_by($"p_name", struct($"dist", $"p_name")).as("best_clean"),
        count(lit(1)).as("n_cands"))
    dirty.join(broadcast(resolved), Seq("dirty_name"), "left")
      .join(parts, "p_partkey") // ground truth for `recovered`
      .select($"p_partkey", $"dirty_name",
        $"best_clean", coalesce($"best_dist", lit(-1L)).as("best_dist"),
        coalesce($"n_cands", lit(0L)).as("n_cands"),
        ($"best_clean" <=> $"p_name").as("recovered"))
      .orderBy($"p_partkey")
  }

  /** Generator surface with OUTER semantics — `posexplode_outer`
    * (the LATERAL VIEW OUTER class): rows whose generator input is
    * empty must SURVIVE as a single null row instead of vanishing
    * (the classic silent-data-loss bug in flattening pipelines —
    * q77's Expand covers the dense reshape; this covers the sparse
    * one). Status-P orders get an empty token array on purpose. A
    * generator is map-local (no shuffle until the final sort). */
  def q83ExplodeOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus",
        when($"o_orderstatus" === "P", array().cast("array<string>"))
          .otherwise(split($"o_orderpriority", "-")).as("parts"))
      .select($"o_orderkey", $"o_orderstatus",
        posexplode_outer($"parts"))
      .select($"o_orderkey", $"o_orderstatus",
        $"pos".cast("long").as("pos"), $"col".as("token"))
      .orderBy($"o_orderkey", $"pos")
  }

  /** PIVOT with MULTIPLE aggregates per pivot value (q28 pivots one
    * measure; real reporting pivots count AND sum together): per
    * priority row, each order status contributes a `<STATUS>_n` and a
    * `<STATUS>_cents` column. Spark plans this as ONE hash aggregate
    * whose grouping expands values × aggs conditional columns — no
    * extra shuffle versus the single-agg pivot; the explicit value
    * list keeps the output schema static (a discovery pass at 100 TB
    * would scan once just to learn the columns). Money in integer
    * cents. */
  def q86PivotMultiAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderpriority",
        $"o_orderstatus",
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("cents"))
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      // absent (priority, status) cells pivot to NULL; pin them to 0
      // so the wire is total at any SF
      .select($"o_orderpriority" +:
        Seq("O", "F", "P").flatMap(v => Seq(
          coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"),
          coalesce(col(s"${v}_cents"), lit(0L)).as(s"${v}_cents"))): _*)
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_pivot_multi_agg" -> (q86PivotMultiAgg _),
    "q83_explode_outer" -> (q83ExplodeOuter _),
    "q82_fuzzy_link" -> (q82FuzzyLink _),
    "q81_interval_coverage" -> (q81IntervalCoverage _),
    "q80_gap_islands" -> (q80GapIslands _),
    "q79_ohlc_resample" -> (q79OhlcResample _),
    "q78_map_agg" -> (q78MapAgg _),
    "q77_unpivot" -> (q77Unpivot _),
    "q76_recursive_bom" -> (q76RecursiveBom _),
    "q75_decimal_div" -> (q75DecimalDiv _),
    "q74_regex_funcs" -> (q74RegexFuncs _),
    "q73_cube" -> (q73Cube _),
    "q72_dow_hour_heatmap" -> (q72DowHourHeatmap _),
    "q70_decimal_agg" -> (q70DecimalAgg _),
    "q71_complex_types" -> (q71ComplexTypes _),
    "q67_ntile_ranks" -> (q67NtileRanks _),
    "q65_rfm_segments" -> (q65RfmSegments _),
    "q59_skyline" -> (q59Skyline _),
    "q60_mad_robust" -> (q60MadRobust _),
    "q62_event_transitions" -> (q62EventTransitions _),
    "q63_robust_outliers" -> (q63RobustOutliers _),
    "q55_bloom_join_prune" -> (q55BloomJoinPrune _),
    "q53_window_funcs" -> (q53WindowFuncs _),
    "q54_multiset_ops" -> (q54MultisetOps _),
    "q42_funnel_steps" -> (q42FunnelSteps _),
    "q43_min_cost_supplier" -> (q43MinCostSupplier _),
    "q45_percentile_cont" -> (q45PercentileCont _),
    "q46_json_extract" -> (q46JsonExtract _),
    "q48_calendar_fill" -> (q48CalendarFill _),
    "q49_fill_forward" -> (q49FillForward _),
    "q50_cohort_retention" -> (q50CohortRetention _),
    "q17_salted_skew_agg" -> (q17SaltedSkewAgg _),
    "q24_sessionization" -> (q24Sessionization _),
    "q21_sole_problem_supplier" -> (q21SoleProblemSupplier _),
    "q19_sql_exists_subquery" -> (q19SqlSurface _),
    "q39_lateral_topn" -> (q39LateralTopn _),
    "q20_datetime_funcs" -> (q20DatetimeFuncs _),
    "q1_pricing_agg" -> (q1Pricing _),
    "q2_filter_pushdown" -> (q2FilterPushdown _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority_semijoin" -> (q4OrderPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_window_topn" -> (q7TopOrdersPerCustomer _),
    "q25_topk_aggregator" -> (q25TopkAggregator _),
    "q28_pivot" -> (q28Pivot _),
    "q29_percentile_disc" -> (q29PercentileDisc _),
    "q35_range_frame" -> (q35RangeFrame _),
    "q36_grouping_sets" -> (q36GroupingSets _),
    "q37_full_outer_join" -> (q37FullOuter _),
    "q8_sort_limit" -> (q8TopOrders _),
    "q9_set_ops" -> (q9SetOps _),
    "q10_distinct_agg" -> (q10DistinctAgg _),
    "q11_anti_join" -> (q11CustomersWithoutOrders _),
    "q12_rollup" -> (q12Rollup _),
    "q13_events_daily" -> (q13EventsDaily _),
    "q14_scalar_funcs" -> (q14ScalarFuncs _),
    "q15_events_running_window" -> (q15EventsRunning _),
    "q16_above_avg_orders" -> (q16AboveAverageOrders _),
    "q51_idle_rich_customers" -> (q51IdleRichCustomers _),
    "q52_trailing_distinct" -> (q52TrailingDistinct _),
  )

  val oracles: Map[String, String] = Map(
    // conditional-aggregation replay with the same <STATUS>_<agg>
    // column names and 0-pinned absent cells
    "q86_pivot_multi_agg" -> {
      val cols = Seq("O", "F", "P").flatMap(v => Seq(
        s"""CAST(coalesce(sum(CASE WHEN o_orderstatus = '$v'
           |    THEN 1 END), 0) AS BIGINT) AS "${v}_n"""".stripMargin,
        s"""CAST(coalesce(sum(CASE WHEN o_orderstatus = '$v'
           |    THEN cents END), 0) AS BIGINT) AS "${v}_cents""""
          .stripMargin)).mkString(",\n  ")
      s"""WITH b AS (SELECT o_orderpriority, o_orderstatus,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders)
         |SELECT o_orderpriority,
         |  $cols
         |FROM b GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
    },
    // parallel unnests zip in DuckDB; the empty-array rows come back
    // via the UNION ALL null branch (the OUTER semantics)
    "q83_explode_outer" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'P' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split(o_orderpriority, '-') END AS parts
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CAST(unnest(range(1, len(parts) + 1)) AS BIGINT) - 1 AS pos,
        |  unnest(parts) AS token
        |FROM o WHERE len(parts) > 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, NULL, NULL
        |FROM o WHERE len(parts) = 0
        |ORDER BY o_orderkey, pos NULLS FIRST""".stripMargin,
    // same running-max sweep under the same unique total order
    "q81_interval_coverage" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts)
        |      + CAST(floor(value * 100.0 + 0.5) AS BIGINT) * 10000
        |      AS end_us
        |  FROM events),
        |pe AS (SELECT *, max(end_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_end
        |  FROM iv),
        |f AS (SELECT *, CASE WHEN prev_end IS NULL
        |    OR ts_us > prev_end THEN 1 ELSE 0 END AS new_iv FROM pe),
        |g AS (SELECT *, sum(new_iv) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS island FROM f),
        |isl AS (SELECT user_id, island, min(ts_us) AS s,
        |    max(end_us) AS e
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_merged,
        |  CAST(sum(e - s) AS BIGINT) AS covered_us,
        |  CAST(max(e) - min(s) AS BIGINT) AS span_us
        |FROM isl GROUP BY 1 ORDER BY user_id""".stripMargin,
    // corruption, blocking, scoring and the deterministic argmin all
    // replayed from first principles; the (min dist, then min name)
    // composite is expressed as the two-step min
    "q82_fuzzy_link" ->
      """WITH parts AS (SELECT p_partkey, p_name,
        |    split_part(p_name, ' ', 1) AS w1,
        |    split_part(p_name, ' ', 2) AS w2
        |  FROM part),
        |dirty AS (SELECT p_partkey,
        |    substr(w1, 1, CAST(p_partkey % (length(w1) - 1) + 2
        |        AS INTEGER) - 1)
        |      || substr(w1, CAST(p_partkey % (length(w1) - 1) + 2
        |        AS INTEGER) + 1)
        |      || ' ' || w2 AS dirty_name
        |  FROM parts),
        |dn AS (SELECT DISTINCT dirty_name,
        |    substr(dirty_name, 1, 1) || '|'
        |      || split_part(dirty_name, ' ', 2) AS bkey
        |  FROM dirty),
        |cn AS (SELECT DISTINCT p_name,
        |    substr(p_name, 1, 1) || '|'
        |      || split_part(p_name, ' ', 2) AS bkey
        |  FROM part),
        |scored AS (SELECT dn.dirty_name, cn.p_name,
        |    levenshtein(dn.dirty_name, cn.p_name) AS dist
        |  FROM dn JOIN cn USING (bkey)
        |  WHERE levenshtein(dn.dirty_name, cn.p_name) <= 2),
        |r1 AS (SELECT dirty_name, CAST(min(dist) AS BIGINT)
        |    AS best_dist, CAST(count(*) AS BIGINT) AS n_cands
        |  FROM scored GROUP BY 1),
        |r2 AS (SELECT s.dirty_name, min(s.p_name) AS best_clean
        |  FROM scored s JOIN r1 ON s.dirty_name = r1.dirty_name
        |    AND s.dist = r1.best_dist
        |  GROUP BY 1)
        |SELECT d.p_partkey, d.dirty_name, r2.best_clean,
        |  coalesce(r1.best_dist, -1) AS best_dist,
        |  coalesce(r1.n_cands, 0) AS n_cands,
        |  (r2.best_clean IS NOT DISTINCT FROM p.p_name) AS recovered
        |FROM dirty d
        |LEFT JOIN r1 ON d.dirty_name = r1.dirty_name
        |LEFT JOIN r2 ON d.dirty_name = r2.dirty_name
        |JOIN part p ON p.p_partkey = d.p_partkey
        |ORDER BY d.p_partkey""".stripMargin,
    // arg_min/arg_max on the unique event_id replay min_by/max_by
    "q79_ohlc_resample" ->
      """WITH e AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_type, day,
        |  arg_min(cents, event_id) AS open_cents,
        |  max(cents) AS high_cents,
        |  min(cents) AS low_cents,
        |  arg_max(cents, event_id) AS close_cents,
        |  CAST(count(*) AS BIGINT) AS volume,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    // same rn-difference islands over the distinct (user, day) grid
    "q80_gap_islands" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS d
        |  FROM events),
        |tagged AS (SELECT user_id, d,
        |    d - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS grp
        |  FROM days),
        |islands AS (SELECT user_id, grp,
        |    min(d) AS start_d, max(d) AS end_d,
        |    CAST(count(*) AS BIGINT) AS len
        |  FROM tagged GROUP BY 1, 2),
        |w AS (SELECT *, max(len) OVER (PARTITION BY user_id) AS mx
        |  FROM islands)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(len) AS BIGINT) AS active_days,
        |  CAST(max(len) AS BIGINT) AS max_len,
        |  min(CASE WHEN len = mx THEN start_d END) AS best_start
        |FROM w GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q74_regex_funcs" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT)
        |    AS brand_num,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT)
        |    AS n_vowels,
        |  CAST(length(regexp_replace(p_name, '[aeiou ]', '', 'g'))
        |    AS BIGINT) AS n_consonants
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q73_cube" ->
      """WITH e AS (SELECT event_type,
        |    CAST(strftime(ts, '%w') AS BIGINT) AS dow,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events)
        |SELECT coalesce(event_type, '(all)') AS event_type,
        |  coalesce(dow, -1) AS dow,
        |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        |  CAST(GROUPING(dow) AS BIGINT) AS g_dow,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vc) AS BIGINT) AS sum_cents
        |FROM e GROUP BY CUBE(event_type, dow)
        |ORDER BY coalesce(event_type, '(all)'),
        |  coalesce(dow, -1)""".stripMargin,
    "q72_dow_hour_heatmap" ->
      """SELECT CAST(strftime(ts, '%w') AS BIGINT) AS dow,
        |  CAST(strftime(ts, '%H') AS BIGINT) AS hod,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin,
    // ORDER BY inside the list aggregate pins the same entry order the
    // Spark side gets from sort_array
    "q78_map_agg" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority AS p,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus,
        |  CAST(sum(n) AS BIGINT) AS n_total,
        |  array_to_string(
        |    list(p || ':' || CAST(n AS VARCHAR) ORDER BY p), ',')
        |    AS prio_counts,
        |  coalesce(max(CASE WHEN p = '1-URGENT' THEN n END),
        |    CAST(-1 AS BIGINT)) AS urgent_n
        |FROM c GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // UNION ALL replay of the Expand (portable; DuckDB's UNPIVOT
    // keyword would also work but adds nothing the hash can see)
    "q77_unpivot" ->
      """WITH w AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
        |      AS price_cents,
        |    CAST(o_custkey AS BIGINT) AS cust_key,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day_offset
        |  FROM orders)
        |SELECT o_orderkey, measure, value FROM (
        |  SELECT o_orderkey, 'price_cents' AS measure,
        |    price_cents AS value FROM w
        |  UNION ALL
        |  SELECT o_orderkey, 'cust_key', cust_key FROM w
        |  UNION ALL
        |  SELECT o_orderkey, 'day_offset', day_offset FROM w)
        |ORDER BY o_orderkey, measure""".stripMargin,
    // genuine recursive CTE replay of the frontier iteration
    "q76_recursive_bom" ->
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS child, p_partkey // 10 AS parent,
        |    p_partkey % 5 + 1 AS qty FROM part),
        |walk(part, cur, depth, eff) AS (
        |  SELECT child, child, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  FROM e
        |  UNION ALL
        |  SELECT w.part, e.parent, w.depth + 1, w.eff * e.qty
        |  FROM walk w JOIN e ON w.cur = e.child WHERE w.cur >= 10)
        |SELECT part AS p_partkey, CAST(cur AS BIGINT) AS root_key,
        |  CAST(depth AS BIGINT) AS depth, CAST(eff AS BIGINT) AS eff_qty
        |FROM walk WHERE cur < 10 ORDER BY p_partkey""".stripMargin,
    // integer half-up pin for the mean: NOT DuckDB's native decimal
    // division (which silently widens to DOUBLE) — see q75DecimalDiv
    "q75_decimal_div" ->
      """WITH a AS (SELECT o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        |      AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, n, total_cents,
        |  CAST((total_cents * 100 * 2 + n) // (2 * n) AS BIGINT)
        |    AS avg_e4
        |FROM a ORDER BY o_orderstatus""".stripMargin,
    "q70_decimal_agg" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        |    AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))
        |      * CAST(0.06 AS DECIMAL(4,2)))
        |    AS DECIMAL(18,4)) * 10000 AS BIGINT) AS tax_e4,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) * 100
        |    AS BIGINT) AS max_price_cents
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "q71_complex_types" ->
      """SELECT l_orderkey,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  array_to_string(list_sort(list(DISTINCT l_partkey)), ',')
        |    AS part_csv,
        |  bool_or(l_partkey = 1) AS has_part_1,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents_via_map
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,
    "q67_ntile_ranks" ->
      """WITH s AS (SELECT s_suppkey,
        |    CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
        |  FROM supplier),
        |w AS (SELECT s_suppkey, s_nationkey,
        |    CAST(ntile(4) OVER win AS BIGINT) AS quartile,
        |    CAST(rank() OVER win AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY s_nationkey) AS cnt
        |  FROM s WINDOW win AS (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal, s_suppkey))
        |SELECT s_suppkey, s_nationkey, quartile, rnk,
        |  CAST(CASE WHEN cnt > 1 THEN (rnk - 1) * 1000 // (cnt - 1)
        |    ELSE 0 END AS BIGINT) AS rank_permille
        |FROM w ORDER BY s_suppkey""".stripMargin,
    "q65_rfm_segments" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |a AS (SELECT max(d) AS anchor FROM o),
        |r AS (SELECT o_custkey, max(d) AS last_day, count(*) AS freq,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM o GROUP BY 1),
        |x AS (SELECT o_custkey,
        |    CAST(date_diff('day', last_day, anchor) AS BIGINT)
        |      AS recency_days,
        |    CAST(freq AS BIGINT) AS freq, monetary_cents FROM r, a),
        |sc AS (SELECT *,
        |    CASE WHEN recency_days <= 30 THEN 5
        |      WHEN recency_days <= 90 THEN 4
        |      WHEN recency_days <= 180 THEN 3
        |      WHEN recency_days <= 365 THEN 2 ELSE 1 END AS r,
        |    CASE WHEN freq <= 2 THEN 1 WHEN freq <= 5 THEN 2
        |      WHEN freq <= 10 THEN 3 WHEN freq <= 20 THEN 4
        |      ELSE 5 END AS f,
        |    CASE WHEN monetary_cents <= 10000 THEN 1
        |      WHEN monetary_cents <= 50000 THEN 2
        |      WHEN monetary_cents <= 100000 THEN 3
        |      WHEN monetary_cents <= 500000 THEN 4 ELSE 5 END AS m
        |  FROM x)
        |SELECT o_custkey, recency_days, freq, monetary_cents,
        |  CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |  CAST(m AS BIGINT) AS m,
        |  CAST(r * 100 + f * 10 + m AS BIGINT) AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    "q62_event_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, count(*) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000 // sum(n) OVER (PARTITION BY prev_type)
        |    AS BIGINT) AS p_permille
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "q63_robust_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, v AS med FROM (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, day) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM daily) WHERE rn = (cnt + 1) // 2),
        |d AS (SELECT daily.event_type, day, v, med, abs(v - med) AS ad
        |  FROM daily JOIN m USING (event_type)),
        |md AS (SELECT event_type, ad AS mad FROM (
        |  SELECT event_type, ad,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ad, day) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM d) WHERE rn = (cnt + 1) // 2)
        |SELECT d.event_type, day, v, med, mad,
        |  CAST(CASE WHEN ad > 3 * greatest(mad, 1) THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_outlier
        |FROM d JOIN md USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    // independent formulation: the O(n²) NOT EXISTS dominance
    // definition — agreeing with the engine's prefix-scan is the check
    "q59_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
        |      AS price_cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part)
        |SELECT a.p_partkey, a.price_cents, a.size
        |FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
        |    AND (b.price_cents < a.price_cents OR b.size > a.size))
        |ORDER BY a.p_partkey""".stripMargin,
    // both medians as rank-⌊(n−1)/2⌋ selections (lower median), the
    // same percentile_disc convention as the engine
    "q60_mad_robust" ->
      """WITH o AS (SELECT
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |c AS (SELECT count(*) AS n FROM o),
        |r1 AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM o),
        |med AS (SELECT v FROM r1, c WHERE rn = (n - 1) // 2 + 1),
        |dev AS (SELECT abs(v - (SELECT v FROM med)) AS v FROM o),
        |r2 AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM dev),
        |mad AS (SELECT v FROM r2, c WHERE rn = (n - 1) // 2 + 1)
        |SELECT (SELECT n FROM c) AS n_orders,
        |  (SELECT v FROM med) AS median_cents,
        |  (SELECT v FROM mad) AS mad_cents""".stripMargin,
    // the bloom is a lossless prefilter (FPs drop in the join, no FNs
    // by construction) — the contract is the plain join result
    "q55_bloom_join_prune" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand IN ('Brand#13', 'Brand#24', 'Brand#5')
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "q53_window_funcs" ->
      """WITH x AS (SELECT o_orderkey, o_custkey,
        |    CAST(ntile(4) OVER w AS INT) AS quartile,
        |    row_number() OVER w AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS cnt,
        |    CAST(date_diff('day',
        |      CAST(lag(o_orderdate, 1) OVER w AS DATE),
        |      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey))
        |SELECT o_orderkey, o_custkey, quartile,
        |  CAST(CASE WHEN cnt > 1
        |    THEN (rn - 1) * 1000000 // (cnt - 1)
        |    ELSE 0 END AS BIGINT) AS pct_rank_ppm,
        |  CAST(rn * 1000000 // cnt AS BIGINT) AS cume_ppm,
        |  days_since_prev
        |FROM x ORDER BY o_orderkey""".stripMargin,
    "q54_multiset_ops" ->
      """WITH h1 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-07-01'),
        |h2 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'),
        |both_ops AS (
        |  SELECT o_custkey, 'intersect_all' AS op
        |  FROM (SELECT o_custkey FROM h1 INTERSECT ALL
        |        SELECT o_custkey FROM h2)
        |  UNION ALL
        |  SELECT o_custkey, 'except_all' AS op
        |  FROM (SELECT o_custkey FROM h1 EXCEPT ALL
        |        SELECT o_custkey FROM h2))
        |SELECT op, o_custkey, CAST(count(*) AS BIGINT) AS multiplicity
        |FROM both_ops GROUP BY 1, 2 ORDER BY op, o_custkey""".stripMargin,
    "q52_trailing_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |expanded AS (
        |  SELECT DISTINCT user_id,
        |    CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
        |      INTERVAL 1 DAY)) AS DATE) AS window_day
        |  FROM ud)
        |SELECT window_day, CAST(count(*) AS BIGINT) AS n_active_7d
        |FROM expanded GROUP BY 1 ORDER BY window_day""".stripMargin,
    "q51_idle_rich_customers" ->
      """WITH c AS (SELECT *, CAST(c_acctbal AS DECIMAL(18,2)) AS bal_d
        |  FROM customer),
        |thr AS (SELECT sum(bal_d) AS sum_pos, count(*) AS n_pos
        |  FROM c WHERE bal_d > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM c, thr
        |WHERE bal_d * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c.c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,
    "q50_cohort_retention" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |  FROM events),
        |cohorts AS (SELECT user_id, min(wk) AS cohort_wk
        |  FROM weeks GROUP BY 1)
        |SELECT c.cohort_wk,
        |  CAST(date_diff('day', CAST(c.cohort_wk AS DATE),
        |    CAST(w.wk AS DATE)) // 7 AS BIGINT) AS week_n,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM weeks w JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_n""".stripMargin,
    "q48_calendar_fill" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type
        |  FROM events),
        |counts AS (SELECT day, event_type, count(*) AS n
        |  FROM ev GROUP BY 1, 2),
        |days AS (SELECT CAST(unnest(generate_series(
        |    (SELECT min(day) FROM ev), (SELECT max(day) FROM ev),
        |    INTERVAL 1 DAY)) AS DATE) AS day),
        |types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT d.day, t.event_type,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
        |FROM days d CROSS JOIN types t
        |LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin,
    "q49_fill_forward" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'view'
        |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    END IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "q46_json_extract" ->
      """SELECT event_type,
        |  CAST(count(k) AS BIGINT) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events) t
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q45_percentile_cont" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS BIGINT) - 1 AS rn0,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag, max(n) AS n_rows,
        |    max(CASE WHEN rn0 = floor(CAST(0.5 AS DOUBLE)
        |      * CAST(n - 1 AS DOUBLE)) THEN v END) AS lo50,
        |    max(CASE WHEN rn0 = ceil(CAST(0.5 AS DOUBLE)
        |      * CAST(n - 1 AS DOUBLE)) THEN v END) AS hi50,
        |    max(CASE WHEN rn0 = floor(CAST(0.95 AS DOUBLE)
        |      * CAST(n - 1 AS DOUBLE)) THEN v END) AS lo95,
        |    max(CASE WHEN rn0 = ceil(CAST(0.95 AS DOUBLE)
        |      * CAST(n - 1 AS DOUBLE)) THEN v END) AS hi95
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
        |  lo50 + (hi50 - lo50) * (CAST(0.5 AS DOUBLE)
        |    * CAST(n_rows - 1 AS DOUBLE)
        |    - floor(CAST(0.5 AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE)))
        |    AS p50,
        |  lo95 + (hi95 - lo95) * (CAST(0.95 AS DOUBLE)
        |    * CAST(n_rows - 1 AS DOUBLE)
        |    - floor(CAST(0.95 AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE)))
        |    AS p95
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "q43_min_cost_supplier" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2),
        |pse AS (SELECT ps.*, s_name, n_name
        |  FROM ps JOIN eur ON l_suppkey = s_suppkey),
        |minc AS (SELECT l_partkey, min(unit_cost) AS min_cost
        |  FROM pse GROUP BY 1)
        |SELECT p_partkey, p_brand, p_type, s_name, n_name, unit_cost
        |FROM pse JOIN minc ON pse.l_partkey = minc.l_partkey
        |  AND unit_cost = min_cost
        |JOIN part ON pse.l_partkey = p_partkey
        |WHERE p_size <= 5
        |ORDER BY p_partkey, s_name LIMIT 100""".stripMargin,
    "q42_funnel_steps" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t1 AS (SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.view_ts GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.click_ts GROUP BY 1)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3.purchase_ts IS NOT NULL THEN 3
        |       WHEN t2.click_ts IS NOT NULL THEN 2
        |       WHEN t1.view_ts IS NOT NULL THEN 1
        |       ELSE 0 END AS BIGINT) AS reached,
        |  t1.view_ts, t2.click_ts, t3.purchase_ts
        |FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q24_sessionization" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid,
        |  min(ts) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
        |    AS duration_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin,
    "q21_sole_problem_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q19_sql_exists_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer
        |WHERE c_acctbal > 0 AND EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q39_lateral_topn" ->
      """SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) AS t
        |WHERE c_acctbal > 9000.0
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin,
    "q20_datetime_funcs" ->
      """SELECT o_orderkey,
        | cast(year(o_orderdate) AS BIGINT) AS yr,
        | cast(month(o_orderdate) AS BIGINT) AS mo,
        | cast(day(o_orderdate) AS BIGINT) AS dom,
        | date_trunc('month', o_orderdate) AS month_start,
        | cast(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
        | cast(datediff('day', cast(o_orderdate AS DATE), DATE '2000-01-01')
        |   AS BIGINT) AS days_to_y2k
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q17_salted_skew_agg" ->
      """SELECT event_type, count(*) AS n,
        | round(cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_discount), 2) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-03-15'
        | AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,
    "q4_order_priority_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1997-01-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24.0""".stripMargin,
    "q7_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        | SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |  cast(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q25_topk_aggregator" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        | SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |  cast(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q28_pivot" ->
      """SELECT user_id,
        | CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        | CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q29_percentile_disc" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT source, n_tok,
        |  row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n
        |  FROM d)
        |SELECT source,
        | max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_tok END) AS p50_tok,
        | max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN n_tok END) AS p90_tok,
        | CAST(max(n) AS BIGINT) AS n_docs
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,
    "q35_range_frame" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q36_grouping_sets" ->
      """SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
        |       AS BIGINT) AS gid,
        |     coalesce(o_orderstatus, 'ALL') AS status,
        |     coalesce(o_orderpriority, 'ALL') AS priority,
        |     CAST(count(*) AS BIGINT) AS n_orders,
        |     round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY gid, status, priority""".stripMargin,
    "q37_full_outer_join" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        | CAST(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |   AS is_building,
        | coalesce(n_orders, 0) AS n_orders,
        | coalesce(total, 0.0) AS total
        |FROM (SELECT c_custkey FROM customer
        |      WHERE c_mktsegment = 'BUILDING') c
        |FULL OUTER JOIN (SELECT o_custkey,
        |      CAST(count(*) AS BIGINT) AS n_orders,
        |      round(sum(o_totalprice), 2) AS total
        |    FROM orders GROUP BY 1) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q8_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, o_orderdate
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,
    "q9_set_ops" ->
      """SELECT key FROM (
        | (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0.0
        |  INTERSECT SELECT o_custkey AS key FROM orders)
        | UNION
        | (SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  EXCEPT SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |) ORDER BY key""".stripMargin,
    "q10_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        | count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13_events_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
        | round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q14_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        | cast(length(p_name) AS BIGINT) AS name_len,
        | substr(p_type, 1, 5) AS type5,
        | p_brand || '#' || p_type AS tagged,
        | round(p_retailprice * 1.1, 2) AS bumped,
        | cast(p_size % 7 AS BIGINT) AS size_mod,
        | CASE WHEN p_size >= 25 THEN 'LARGE' ELSE 'small' END AS bucket
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_events_running_window" ->
      """SELECT event_id, user_id,
        | round(value - lag(value, 1) OVER w, 2) AS delta,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
        | cast(rank() OVER w AS BIGINT) AS rnk
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q16_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price, n_ord
        |FROM orders JOIN (
        |  SELECT o_custkey AS ac_custkey,
        |   sum(cast(o_totalprice AS DECIMAL(18,2))) AS sum_d,
        |   count(*) AS n_ord
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 2) a
        | ON o_custkey = ac_custkey
        |WHERE cast(o_totalprice AS DECIMAL(18,2)) * n_ord * 2 > sum_d * 3
        |ORDER BY o_orderkey""".stripMargin,
  )
}
