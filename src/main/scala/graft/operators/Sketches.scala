package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, Sketch, TextHashes}
import graft.sources.Tables

/** Cardinality / frequency sketches — the bounded-state answers to
  * "how many distinct?" and "how often?" that a 100 TB deployment asks
  * constantly (CBO NDV stats, stream monitoring, heavy-key detection)
  * and that exact `count(DISTINCT)` / `groupBy(key).count()` answer at
  * the cost of shuffling every distinct key.
  *
  * Both sketches here are DETERMINISTIC (splitmix64 hash family, no
  * RNG), so unlike HyperLogLog via `approx_count_distinct` their
  * entire state is replayable from first principles by the DuckDB
  * oracle — the correctness gate checks the sketch CONTENTS, not just
  * a tolerance band:
  *
  *  - KMV (k-minimum-values) NDV estimator: one scan, ≤ k longs per
  *    map task cross the shuffle ([[Sketch.KmvAgg]]), estimator
  *    `(k−1) · ⌊(2^64−1) / kth_min⌋` in pure integer arithmetic.
  *  - Count-min point-frequency sketch: d×w integer matrix built with
  *    map-side combine (≤ d·w rows shuffle regardless of input size),
  *    point estimates = min over the d cells — the one-sided
  *    (overestimate-only) guarantee, asserted in SketchSpec.
  */
object Sketches {

  val KMV_K = 256
  val CMS_DEPTH = 4
  val CMS_WIDTH = 512L
  val CMS_QUERY_KEYS = 25
  /** HLL precision: 2^12 = 4096 registers (σ ≈ 1.04/√m ≈ 1.6%). */
  val HLL_P = 12
  val HLL_REGS = 1 << HLL_P

  /** Absolute-rate alert threshold for [[cmsHeavyHitters]] (events per
    * key). Absolute, not φ·N: this corpus grows by adding KEYS at a
    * steady per-key rate, so a relative support threshold selects
    * nothing at larger SFs while an absolute rate threshold is the
    * monitoring semantics ("alert on any key above 80 events"). */
  val HH_THRESHOLD = 80L

  /** KMV estimator from the k-minimum sketch contents: (kth-min hash,
    * NDV estimate). Shared by the batch and streaming variants so the
    * two can never diverge. */
  private[operators] def kmvEstimate(mins: Seq[Long]): (Long, Long) = {
    val n = mins.size
    val kth = mins.last
    val est =
      if (n < KMV_K) n.toLong // fewer distincts than k: sketch exact
      else if (kth == 0L) n.toLong // degenerate guard (hash == 0)
      else (KMV_K - 1).toLong * java.lang.Long.divideUnsigned(-1L, kth)
    (kth, est)
  }

  // as a STRING: the value is -1L in signed-Long bits, which is what
  // the JVM divideUnsigned uses, but the SQL literal must be unsigned
  private val U64_MAX = "18446744073709551615"

  /** KMV NDV estimates for three representative key columns. Each
    * column costs one scan + one k-bounded aggregation; the estimate,
    * the k-th minimum hash (the sketch's entire decision state), and k
    * are all in the output so the oracle replays the math exactly. */
  def kmvNdv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq(
      ("events.user_id", Tables(s, dir, "events").select($"user_id")),
      ("lineitem.l_partkey",
        Tables(s, dir, "lineitem").select($"l_partkey")),
      ("orders.o_custkey", Tables(s, dir, "orders").select($"o_custkey")))
    val rows = cols.map { case (name, df) =>
      val mins = df
        .select(GraftFunctions.mix64(df.columns.map(col).head).as("h"))
        .as[Long]
        .select(new Sketch.KmvAgg(KMV_K).toColumn)
        .head() // bounded: one row of ≤ k longs
      val (kth, est) = kmvEstimate(mins)
      (name, KMV_K.toLong, kth, est)
    }
    rows.toDF("column_name", "k", "kth_hash", "ndv_est")
      .orderBy($"column_name")
  }

  /** Count-min frequency sketch over `events.user_id`, point-queried
    * for the first [[CMS_QUERY_KEYS]] keys. Hash row d buckets by
    * `mix64(mix64(key) + d) mod w` — nested mix64 keeps rows pairwise
    * independent and replayable. The matrix build is the scale path:
    * explode ×d then groupBy(d, bucket) map-side combines to ≤ d·w
    * rows per task, so shuffle volume is constant in input size. */
  def cmsFreq(s: SparkSession, dir: String): DataFrame =
    cmsEstimates(s, cmsMatrix(Tables(s, dir, "events")
      .select(GraftFunctions.mix64(col("user_id")).as("hv"))))

  /** d×w count matrix from a column `hv` of pre-mixed hashes — shared
    * by the batch operator and the streaming variant so the two can
    * never diverge (the [[kmvEstimate]] convention). Works on batch
    * AND streaming inputs: explode ×d then groupBy(d, bucket) is a
    * bounded complete-mode aggregate either way. */
  private[operators] def cmsMatrix(hashed: DataFrame): DataFrame = {
    import hashed.sparkSession.implicits._
    hashed
      .select($"hv",
        explode(array((0 until CMS_DEPTH).map(d => lit(d.toLong)): _*))
          .as("d"))
      .select($"d",
        GraftFunctions.mix64_bucket($"hv" + $"d", CMS_WIDTH).as("bucket"))
      .groupBy($"d", $"bucket").agg(count(lit(1)).as("c"))
  }

  /** Point estimates for the fixed probe keys against a
    * (d, bucket, c) matrix: CMS_QUERY_KEYS × CMS_DEPTH probe cells,
    * computed with the same JVM hash the native expression compiles
    * to; estimate = min over the d cells. */
  private[operators] def cmsEstimates(
      s: SparkSession, matrix: DataFrame): DataFrame = {
    import s.implicits._
    val probes = for {
      key <- 0 until CMS_QUERY_KEYS
      d <- 0 until CMS_DEPTH
    } yield (key.toLong,
      d.toLong,
      java.lang.Long.remainderUnsigned(
        TextHashes.mix64(TextHashes.mix64(key.toLong) + d), CMS_WIDTH))
    probes.toDF("user_id", "d", "bucket")
      .join(matrix, Seq("d", "bucket"), "left")
      .groupBy($"user_id")
      .agg(min(coalesce($"c", lit(0L))).as("cms_est"))
      .orderBy($"user_id")
  }

  /** Per-group KMV: distinct users per event type — the sketch
    * composing with groupBy, which is how a 100 TB deployment gets a
    * per-dimension NDV profile in one pass: state is ≤ k longs PER
    * GROUP (groups × k, not distinct-keys), partial-aggregated like
    * any typed Aggregator, estimator shared with [[kmvNdv]]. */
  def kmvGrouped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"event_type", GraftFunctions.mix64($"user_id").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Sketch.KmvAgg(KMV_K).toColumn.name("mins"))
      .map { case (et, mins) =>
        val (kth, est) = kmvEstimate(mins)
        (et, KMV_K.toLong, kth, est)
      }
      .toDF("event_type", "k", "kth_hash", "ndv_est")
      .orderBy($"event_type")
  }

  /** CMS-prefiltered heavy hitters: every key with ≥ HH_THRESHOLD
    * events, with EXACT final counts. Two passes:
    *
    *  1. Build a count-min matrix (width sized so expected cell
    *     background ≈ thr/16; shuffle ≤ d·w cells after map-side
    *     combine).
    *  2. Re-scan, look each row's d cells up via BROADCAST hash joins
    *     (no shuffle), keep rows whose min-cell estimate clears the
    *     threshold, and exact-count only those.
    *
    * The CMS one-sided guarantee (estimate ≥ truth) makes the filter
    * lossless: a true heavy key can never be dropped, so after the
    * exact count the output EQUALS the plain `GROUP BY HAVING` — which
    * is exactly what the oracle runs, blind to the sketch. At 100 TB
    * the win is that only candidate rows enter the exact-count
    * exchange: with billions of mostly-light keys, the map-side filter
    * removes the ndv-proportional partial-aggregate shuffle that a
    * plain exact count pays. Width caps at 65536 (4·w cells ≈ 6 MB —
    * stays broadcastable); past the cap the filter degrades gracefully
    * toward pass-through (background/thr ratio documents the operating
    * range). */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events").select($"user_id")
    val n = ev.count()
    val w = math.min(65536L, math.max(2048L, 16L * n / HH_THRESHOLD))
    val keyed = ev.withColumn("hv", GraftFunctions.mix64($"user_id"))
    val matrix = keyed
      .select($"hv",
        explode(array((0 until CMS_DEPTH).map(d => lit(d.toLong)): _*))
          .as("d"))
      .select($"d",
        GraftFunctions.mix64_bucket($"hv" + $"d", w).as("bucket"))
      .groupBy($"d", $"bucket").agg(count(lit(1)).as("c"))
      .localCheckpoint() // ≤ d·w rows; computed once, read 4×
    val probed = (0 until CMS_DEPTH).foldLeft(keyed) { (df, d) =>
      df.join(
        broadcast(matrix.filter($"d" === d.toLong)
          .select($"bucket".as(s"bk$d"), $"c".as(s"c$d"))),
        GraftFunctions.mix64_bucket($"hv" + lit(d.toLong), w) === col(s"bk$d"))
    }
    probed
      .filter(least((0 until CMS_DEPTH).map(d => col(s"c$d")): _*)
        >= HH_THRESHOLD)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
      .filter($"n_events" >= HH_THRESHOLD)
      .orderBy($"user_id")
  }

  /** HyperLogLog register table over `lineitem.l_orderkey` — the third
    * NDV sketch next to KMV (order statistics) and CMS (frequencies),
    * and the one every production system actually deploys. Split the
    * mixed hash: top [[HLL_P]] bits pick a register, the rank of the
    * remaining 52-bit suffix (leading zeros + 1; 53 for suffix 0) is
    * the observation; per-register state is `max(rank)` — commutative
    * and idempotent, so partial aggregation ships ≤ 2^p tiny rows per
    * task no matter the input size, and two sketches union by taking
    * the element-wise max (the streaming variant below IS that merge).
    *
    * The output is the ENTIRE sketch state (register → max rank), in
    * integers — no harmonic-mean float ever crosses the gate; the
    * DuckDB oracle replays rank as `53 − length(printf('%b', w))`,
    * pure integer arithmetic, and HllSpec checks the standard
    * bias-corrected estimate against true NDV separately. Built from
    * `bin()`/`shiftrightunsigned` — plain codegen'd built-ins, no
    * custom expression needed. */
  def hllRegisters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    hllRegisterTable(
      Tables(s, dir, "lineitem")
        .select(GraftFunctions.mix64($"l_orderkey").as("hv")))
  }

  /** hash column `hv` → (register, max_rank) table; shared by the
    * batch and streaming ([[StreamBatch.streamingHll]]) variants so
    * the two can never diverge. */
  private[operators] def hllRegisterTable(hashed: DataFrame): DataFrame = {
    import hashed.sparkSession.implicits._
    hashed
      .select(shiftrightunsigned($"hv", 64 - HLL_P).as("register"),
        $"hv".bitwiseAND(lit((1L << (64 - HLL_P)) - 1L)).as("w"))
      .select($"register",
        when($"w" === 0L, lit(64 - HLL_P + 1))
          .otherwise(lit(64 - HLL_P + 1) - length(bin($"w")))
          .as("rank"))
      .groupBy($"register").agg(max($"rank").as("max_rank"))
      .orderBy($"register")
  }

  /** Bias-corrected HLL estimate from a register table (registers
    * absent from the map are zeros) — the classic Flajolet et al. 2007
    * formula with the small-range linear-counting correction. Not part
    * of any gate output (floats); HllSpec asserts its accuracy. */
  def hllEstimate(regs: Map[Long, Int]): Double = {
    val m = HLL_REGS.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zeros = HLL_REGS - regs.size
    val sum = zeros * 1.0 +
      regs.valuesIterator.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  /** KMV SET-OPERATION estimates (the θ-sketch idea, Beyer et al.
    * 2007): the distinct-user sketches of the `view` and `purchase`
    * event streams, their MERGED union sketch (k unsigned-smallest of
    * the two sketches' contents — KMV sketches are mergeable, which
    * is the whole reason they work across partitions AND across
    * sets), and the intersection estimate
    * `matched · est_union div |union sketch|` where `matched` counts
    * union-sketch hashes present in BOTH input sketches. Everything
    * after the two k-bounded aggregations is driver-side arithmetic
    * on ≤ 3k longs; all divisions truncate, so the DuckDB replay is
    * bit-exact. */
  def kmvSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def sketchOf(tpe: String): Seq[Long] = Tables(s, dir, "events")
      .filter(col("event_type") === tpe)
      .select(GraftFunctions.mix64(col("user_id")).as("h")).as[Long]
      .select(new Sketch.KmvAgg(KMV_K).toColumn)
      .head() // bounded: ≤ k longs
    def est(m: Seq[Long]): Long = if (m.isEmpty) 0L else kmvEstimate(m)._2
    val a = sketchOf("view")
    val b = sketchOf("purchase")
    val merged = (a ++ b).distinct
      .sortBy(_ ^ Long.MinValue).take(KMV_K)
    val (as, bs) = (a.toSet, b.toSet)
    val matched = merged.count(u => as(u) && bs(u)).toLong
    val interEst = matched * est(merged) / math.max(merged.size, 1)
    Seq((KMV_K.toLong, est(a), est(b), est(merged), matched, interEst))
      .toDF("k", "ndv_a", "ndv_b", "ndv_union", "matched", "ndv_inter")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_setops" -> (kmvSetOps _),
    "sketch_hll_registers" -> (hllRegisters _),
    "sketch_kmv_ndv" -> (kmvNdv _),
    "sketch_cms_freq" -> (cmsFreq _),
    "sketch_hdr_quantiles" -> (hdrQuantiles _),
    "sketch_heavy_hitters" -> (cmsHeavyHitters _),
    "sketch_kmv_grouped" -> (kmvGrouped _),
  )

  private[operators] def kmvColumnSql(name: String, table: String,
      column: String): String = {
    val h = OracleSql.mix64(s"CAST($column AS HUGEINT)")
    s"""SELECT '$name' AS column_name, CAST($KMV_K AS BIGINT) AS k,
       |  CAST(CASE WHEN kth >= 9223372036854775808
       |       THEN kth - 18446744073709551616 ELSE kth END
       |    AS BIGINT) AS kth_hash,
       |  CAST(CASE WHEN n < $KMV_K THEN n
       |       WHEN kth = 0 THEN n
       |       ELSE ${KMV_K - 1} * ($U64_MAX // kth) END
       |    AS BIGINT) AS ndv_est
       |FROM (SELECT count(*) AS n, max(u) AS kth FROM (
       |  SELECT DISTINCT $h AS u FROM $table ORDER BY u LIMIT $KMV_K))""".stripMargin
  }

  private def cmsBucketSql(keyExpr: String): String = {
    val inner = OracleSql.mix64(s"CAST($keyExpr AS HUGEINT)")
    val outer = OracleSql.mix64(s"(($inner) + d) % 18446744073709551616")
    s"(($outer) % $CMS_WIDTH)"
  }

  /** Register/max-rank replay of the HLL split for `keyExpr` rows of
    * `fromClause` — pure integer arithmetic (binary-string length, no
    * log2 floats). */
  private[operators] def hllRegistersSql(
      keyExpr: String, fromClause: String): String = {
    val h = OracleSql.mix64(s"CAST($keyExpr AS HUGEINT)")
    val wMod = 1L << (64 - HLL_P) // 2^52
    val rankMax = 64 - HLL_P + 1
    s"""WITH h AS (SELECT $h AS hv FROM $fromClause),
       |r AS (SELECT hv >> ${64 - HLL_P} AS register,
       |  hv % $wMod AS w FROM h)
       |SELECT CAST(register AS BIGINT) AS register,
       |  CAST(max(CASE WHEN w = 0 THEN $rankMax
       |    ELSE $rankMax - length(printf('%b', CAST(w AS BIGINT)))
       |    END) AS INT) AS max_rank
       |FROM r GROUP BY 1 ORDER BY register""".stripMargin
  }

  /** Percentiles reported by [[hdrQuantiles]]. */
  val HDR_PCTS = Seq(50L, 95L, 99L)

  /** HDR-histogram-style approximate quantiles per event type — the
    * monitoring-side quantile (p50/p95/p99 latency-panel shape) that
    * EXACT rank selection (q45/q60) is too expensive to run per
    * dashboard refresh at 100 TB. Bucket = binary exponent of the
    * cents value plus 2 sub-exponent bits (≤ 12.5 % relative error,
    * ≤ 64 buckets per group), so the histogram is a bounded,
    * merge-by-addition sketch: one scan, map-side-combined counts,
    * O(types · 64) rows ever shuffled or collected. The bucket math
    * is pure integer (binary-digit length — no float log2), so the
    * oracle replays the sketch CONTENTS and the quantile selection
    * rule (smallest bucket with cumulative count ≥ ⌈pct·n/100⌉)
    * exactly — the repo-wide sketch contract. */
  /** (event_type, bucket, n) histogram from a raw events frame —
    * shared by the batch operator and the streaming twin (works on
    * both: the groupBy is a bounded complete-mode aggregate). */
  private[operators] def hdrHistogram(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select($"event_type",
        expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("c"))
      .select($"event_type",
        expr("length(conv(c, 10, 2))").cast("long").as("L"), $"c")
      .select($"event_type",
        expr("CASE WHEN L >= 3 THEN L * 4 + (shiftright(c, " +
          "CAST(L - 3 AS INT)) & 3) ELSE L * 4 END").as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile selection from collected histogram cells (bounded:
    * types × ≤ 64 buckets) — shared driver-side tail. */
  private[operators] def hdrSelect(
      s: SparkSession, counts: Seq[(String, Long, Long)]): DataFrame = {
    import s.implicits._
    val rows = counts.groupBy(_._1).toSeq.flatMap { case (et, bs) =>
      val sorted = bs.sortBy(_._2)
      val total = sorted.map(_._3).sum
      // explicit cumulative sum, then a pure find — a side-effecting
      // guard inside collectFirst would double-count if isDefinedAt
      // were ever re-evaluated (e.g. under a .view)
      val cumulative = sorted.scanLeft(0L)(_ + _._3).tail
      HDR_PCTS.map { pct =>
        val threshold = (total * pct + 99L) / 100L
        val idx = cumulative.indexWhere(_ >= threshold)
        val bucket = sorted(idx)._2
        val l = bucket / 4
        val sub = bucket % 4
        val lb =
          if (l < 3) 1L << (l - 1).toInt
          else (1L << (l - 1).toInt) + (sub << (l - 3).toInt)
        (et, pct, bucket, lb)
      }
    }
    rows.toDF("event_type", "pct", "bucket", "lb_cents")
      .orderBy($"event_type", $"pct")
  }

  def hdrQuantiles(s: SparkSession, dir: String): DataFrame = {
    val counts = hdrHistogram(Tables(s, dir, "events")
        .select(col("event_type"), col("value")))
      .collect() // bounded: types × ≤ 64 buckets
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    hdrSelect(s, counts)
  }

  val oracles: Map[String, String] = Map(
    // full sketch-contents replay: unsigned k-min sets per side, the
    // merged union sketch, the matched count, and every estimator in
    // the same truncating integer form as kmvEstimate
    "sketch_kmv_setops" -> {
      val h = OracleSql.mix64("CAST(user_id AS HUGEINT)")
      def estSql(cte: String) =
        s"""CASE WHEN $cte.n < $KMV_K THEN $cte.n
           |    WHEN $cte.kth = 0 THEN $cte.n
           |    ELSE ${KMV_K - 1} * ($U64_MAX // $cte.kth) END""".stripMargin
      s"""WITH ska AS (SELECT DISTINCT $h AS u FROM events
         |    WHERE event_type = 'view' ORDER BY u LIMIT $KMV_K),
         |skb AS (SELECT DISTINCT $h AS u FROM events
         |    WHERE event_type = 'purchase' ORDER BY u LIMIT $KMV_K),
         |un AS (SELECT u FROM
         |    (SELECT u FROM ska UNION SELECT u FROM skb)
         |  ORDER BY u LIMIT $KMV_K),
         |ea AS (SELECT count(*) AS n, max(u) AS kth FROM ska),
         |eb AS (SELECT count(*) AS n, max(u) AS kth FROM skb),
         |eu AS (SELECT count(*) AS n, max(u) AS kth FROM un),
         |m AS (SELECT count(*) AS c FROM un
         |  WHERE u IN (SELECT u FROM ska) AND u IN (SELECT u FROM skb))
         |SELECT CAST($KMV_K AS BIGINT) AS k,
         |  CAST(${estSql("ea")} AS BIGINT) AS ndv_a,
         |  CAST(${estSql("eb")} AS BIGINT) AS ndv_b,
         |  CAST(${estSql("eu")} AS BIGINT) AS ndv_union,
         |  CAST(m.c AS BIGINT) AS matched,
         |  CAST(m.c * (${estSql("eu")}) // greatest(eu.n, 1) AS BIGINT)
         |    AS ndv_inter
         |FROM ea, eb, eu, m""".stripMargin
    },
    // sketch-contents replay: identical integer bucket formula,
    // cumulative window, and ceil-threshold selection rule
    "sketch_hdr_quantiles" -> {
      val pcts = HDR_PCTS.map(p => s"($p)").mkString(", ")
      s"""WITH v AS (SELECT event_type,
         |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |b AS (SELECT event_type, CAST(length(bin(c)) AS BIGINT) AS L, c
         |      FROM v),
         |bb AS (SELECT event_type,
         |    CASE WHEN L >= 3 THEN L * 4 + ((c >> (L - 3)) & 3)
         |         ELSE L * 4 END AS bucket
         |  FROM b),
         |g AS (SELECT event_type, bucket, count(*) AS n
         |      FROM bb GROUP BY 1, 2),
         |cw AS (SELECT event_type, bucket, n,
         |    sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         |    sum(n) OVER (PARTITION BY event_type) AS tot
         |  FROM g),
         |q(pct) AS (VALUES $pcts),
         |sel AS (SELECT event_type, CAST(pct AS BIGINT) AS pct,
         |    min(bucket) AS bucket
         |  FROM cw, q WHERE cum >= (tot * pct + 99) // 100
         |  GROUP BY 1, 2)
         |SELECT event_type, pct, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(CASE WHEN bucket // 4 < 3
         |    THEN CAST(1 AS BIGINT) << CAST(bucket // 4 - 1 AS INTEGER)
         |    ELSE (CAST(1 AS BIGINT) << CAST(bucket // 4 - 1 AS INTEGER))
         |      + ((bucket % 4) << CAST(bucket // 4 - 3 AS INTEGER))
         |    END AS BIGINT) AS lb_cents
         |FROM sel ORDER BY event_type, pct""".stripMargin
    },
    "sketch_hll_registers" -> hllRegistersSql("l_orderkey", "lineitem"),
    // the sketch is an internal lossless prefilter — the contract is
    // the plain exact heavy-key relation
    "sketch_heavy_hitters" ->
      s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
         |FROM events GROUP BY 1 HAVING count(*) >= $HH_THRESHOLD
         |ORDER BY user_id""".stripMargin,
    // per-group replay of the same sketch: distinct hashes ranked
    // within each group, first k, same estimator CASE
    "sketch_kmv_grouped" -> {
      val h = OracleSql.mix64("CAST(user_id AS HUGEINT)")
      s"""WITH hh AS (
         |  SELECT DISTINCT event_type, $h AS u FROM events),
         |rk AS (
         |  SELECT event_type, u,
         |    row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
         |  FROM hh),
         |st AS (
         |  SELECT event_type, count(*) AS n, max(u) AS kth
         |  FROM rk WHERE rn <= $KMV_K GROUP BY 1)
         |SELECT event_type, CAST($KMV_K AS BIGINT) AS k,
         |  CAST(CASE WHEN kth >= 9223372036854775808
         |       THEN kth - 18446744073709551616 ELSE kth END
         |    AS BIGINT) AS kth_hash,
         |  CAST(CASE WHEN n < $KMV_K THEN n
         |       WHEN kth = 0 THEN n
         |       ELSE ${KMV_K - 1} * ($U64_MAX // kth) END
         |    AS BIGINT) AS ndv_est
         |FROM st ORDER BY event_type""".stripMargin
    },
    "sketch_kmv_ndv" ->
      Seq(
        kmvColumnSql("events.user_id", "events", "user_id"),
        kmvColumnSql("lineitem.l_partkey", "lineitem", "l_partkey"),
        kmvColumnSql("orders.o_custkey", "orders", "o_custkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    "sketch_cms_freq" -> {
      s"""WITH dd AS (SELECT unnest(range($CMS_DEPTH)) AS d),
         |m AS (
         |  SELECT d, ${cmsBucketSql("user_id")} AS bucket,
         |    count(*) AS c
         |  FROM events CROSS JOIN dd GROUP BY 1, 2),
         |q AS (SELECT unnest(range($CMS_QUERY_KEYS)) AS user_id),
         |qb AS (SELECT user_id, d, ${cmsBucketSql("user_id")} AS bucket
         |  FROM q CROSS JOIN dd)
         |SELECT CAST(user_id AS BIGINT) AS user_id,
         |  CAST(min(coalesce(c, 0)) AS BIGINT) AS cms_est
         |FROM qb LEFT JOIN m USING (d, bucket)
         |GROUP BY 1 ORDER BY user_id""".stripMargin
    },
  )
}
