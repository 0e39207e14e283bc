package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for selected queries so plan properties
  * (pushed filters, pruned schemas, broadcast joins, whole-stage
  * codegen spans) can be reviewed and regression-checked.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_agg", "q2_filter_pushdown", "q3_shipping_priority",
        "q5_local_supplier", "q6_forecast_revenue", "dedup_minhash_lsh",
        "ann_brute_force_topk", "text_fingerprint")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
