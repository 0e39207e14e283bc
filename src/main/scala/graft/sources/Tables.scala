package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All reads go through here so that
  * column pruning / predicate pushdown are applied uniformly and a
  * future switch to a catalog (bucketed tables, Delta, …) is one-line.
  *
  * Scale notes: at 100 TB these would be partitioned/bucketed tables
  * (e.g. lineitem bucketed by l_orderkey, orders by o_orderkey) so the
  * big fact-fact joins below co-locate without a shuffle. Parquet scans
  * here still exercise the same pushdown surface.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
      // default. The flag belongs at session construction (Verify/
      // Bench/TestSpark all set it); this fallback only writes when a
      // caller-built session lacks it, so concurrent readers on a
      // properly-built session never touch shared conf — and a racing
      // pair here both write the same constant before their own read.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
          != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      // integer division: `/` would go through DOUBLE, whose 53-bit
      // mantissa cannot hold epoch nanos — rounding flips ~half of all
      // values by 1 µs vs DuckDB's exact integer division
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (used by tests / SQL surface). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
