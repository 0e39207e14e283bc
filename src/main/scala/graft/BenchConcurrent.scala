package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Simulator, StateCodec}
import graft.sources.Tables
import graft.streaming.StateTable

/** Concurrent-query interference benchmark (VERDICT r14 item 5).
  *
  * Every per-query number in BENCH/BASELINE is one-query-at-a-time; a
  * real deployment runs the SERVING path (point lookups on the WFRun
  * state table — the reference's `lhctl get WFRun` against a live
  * API) at the same time as heavy analytics. This main measures the
  * interference both ways under Spark's FAIR scheduler:
  *
  *  1. serving alone — fixed-QPS distributed point lookups
  *     ([[StateTable.byId]] over a parquet-materialized snapshot
  *     table, each request one small Spark job), p50/p99 over ~15 s;
  *  2. analytics alone — the three heaviest dedup-family queries
  *     back-to-back, per-query wall;
  *  3. both — serving keeps its QPS in pool `serving` while the
  *     analytics batch runs in pool `analytics`; FAIR scheduling
  *     (equal default pool weights) shares executor slots, so the
  *     serving p99 under load measures queueing delay, and the
  *     analytics ratio measures the slot tax of the serving stream.
  *
  * One JSON line on stdout; no gate — the numbers land in BASELINE.md
  * ("Concurrent-query interference"). Usage:
  *   runMain graft.BenchConcurrent <sfDir> [qps] [serveSecs]
  */
object BenchConcurrent {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qps = if (args.length > 1) args(1).toInt else 20
    val serveSecs = if (args.length > 2) args(2).toInt else 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- build the serving state: fold one run per order into the
    // snapshot shape the state sink materializes, parquet-backed so
    // lookups exercise the real scan + filter path ----
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-conc-state").toString
    val spec = graft.operators.EngineQueries.benchMutationSpec
    Tables(spark, sfDir, "orders").select($"o_orderkey")
      .transform(Tables.repartitionForCpu(_, col("o_orderkey"))).as[Long]
      .map { ok =>
        val (st, _) = Simulator.run(spec,
          Map("x" -> (ok % 1000).toInt, "f" -> 2.5),
          runId = s"run-$ok")
        (s"run-$ok", st.wfSpecName, st.status, 1L,
          StateCodec.encode(st), st.aliasMap)
      }
      .toDF("wfRunId", "wfSpecName", "status", "seq", "json", "aliases")
      .write.mode(SaveMode.Overwrite).parquet(stateDir)
    val state = spark.read.parquet(stateDir)
    val nRuns = state.count()
    val ids = Array.tabulate(64)(i => s"run-${i * 97 % nRuns}")

    def lookup(i: Int): Unit = {
      val rows = StateTable.byId(state, ids(i % ids.length))
        .select($"json").collect()
      require(rows.length == 1, s"lookup miss at $i")
    }

    // ---- analytics batch: the suite's heaviest scan/join family ----
    val analytics: Seq[(String, () => DataFrame)] = Seq(
      ("dedup_minhash_lsh",
        () => graft.operators.Dedup.queries("dedup_minhash_lsh")(spark, sfDir)),
      ("text_ngram_novelty",
        () => graft.operators.TextAnalysis.queries("text_ngram_novelty")(spark, sfDir)),
      ("dedup_clusters",
        () => graft.operators.Dedup.queries("dedup_clusters")(spark, sfDir)))

    def runAnalytics(): Map[String, Double] =
      analytics.map { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().collect()
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap

    // warm both plan families untimed
    lookup(0); lookup(1)
    runAnalytics()

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }

    /** Fixed-rate open-ish loop: one request per 1000/qps ms slot (a
      * slow request delays followers — queueing shows up in p99, which
      * is the point). Returns latencies ms. */
    def serveLoop(pool: String, untilNanos: () => Boolean): Seq[Double] = {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      val out = new ConcurrentLinkedQueue[Double]()
      val interval = 1000L / qps
      var i = 0
      while (untilNanos()) {
        val t0 = System.nanoTime()
        lookup(i); i += 1
        val ms = (System.nanoTime() - t0) / 1e6
        out.add(ms)
        val sleep = interval - ms.toLong
        if (sleep > 0) Thread.sleep(sleep)
      }
      import scala.jdk.CollectionConverters._
      out.asScala.toVector
    }

    // ---- phase 1: serving alone ----
    val aloneDeadline = System.nanoTime() + serveSecs * 1000000000L
    val aloneLat = serveLoop("serving", () => System.nanoTime() < aloneDeadline)

    // ---- phase 2: analytics alone ----
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "analytics")
    val analyticsAlone = runAnalytics()

    // ---- phase 3: concurrent ----
    @volatile var analyticsDone = false
    @volatile var analyticsConc: Map[String, Double] = Map.empty
    val worker = new Thread(() => {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "analytics")
      analyticsConc = runAnalytics()
      analyticsDone = true
    }, "conc-analytics")
    worker.start()
    val loadedLat = serveLoop("serving", () => !analyticsDone)
    worker.join()

    def m(xs: Map[String, Double]): String =
      xs.toSeq.sortBy(_._1).map { case (k, v) =>
        f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"concurrent_interference","qps":$qps,""" +
      f""""n_state_rows":$nRuns,"serve_alone_n":${aloneLat.length},""" +
      f""""serve_alone_p50_ms":${pct(aloneLat, 0.5)}%.1f,""" +
      f""""serve_alone_p99_ms":${pct(aloneLat, 0.99)}%.1f,""" +
      f""""serve_loaded_n":${loadedLat.length},""" +
      f""""serve_loaded_p50_ms":${pct(loadedLat, 0.5)}%.1f,""" +
      f""""serve_loaded_p99_ms":${pct(loadedLat, 0.99)}%.1f,""" +
      f""""analytics_alone_sec":${m(analyticsAlone)},""" +
      f""""analytics_concurrent_sec":${m(analyticsConc)},""" +
      s""""scheduler":"FAIR","pools":["serving","analytics"]}""")
    spark.stop()
  }
}
