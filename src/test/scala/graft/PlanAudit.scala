package graft

/** Scratch plan auditor (not part of the suite): prints per-query
  * counts of parquet scans and exchanges in the executed plan, to
  * spot duplicated heavy subtrees (the lpaModularity class). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = args.toSeq
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(plan).length
        val tables = "documents|embeddings|orders|lineitem|customer|supplier|part|nation|region|events".r
        val perTable = "Scan parquet[^\\n]*".r.findAllIn(plan)
          .flatMap(l => tables.findFirstIn(l)).toSeq
          .groupBy(identity).map { case (t0, v) => s"$t0:${v.size}" }
          .toSeq.sorted.mkString(",")
        // exch must not double-count reuse markers: the bare "Exchange"
        // pattern also matches inside every "ReusedExchange" occurrence,
        // so subtract — and the reuse column is named for what it counts
        // (ReusedExchange nodes), not "reused scans" (ADVICE r17)
        val reusedExch = c("ReusedExchange")
        println(f"$k%-28s scans=${c("Scan parquet")}%2d reusedExch=$reusedExch%2d exch=${c("Exchange") - reusedExch}%3d aggs=${c("HashAggregate|SortAggregate|ObjectHashAggregate")}%3d joins=${c("Join")}%3d  [$perTable]")
      } catch { case e: Throwable => println(s"$k ERR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
