package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-replica generator for benchmark scaling curves: writes a K×
  * copy of an input SF directory by replicating tables with shifted
  * keys. The driver only ships sf ≤ 0.1, so 100×-claims need at least
  * one measured 10× point — this makes that data.
  *
  * Replication preserves WORKLOAD SHAPE, not just row count:
  *  - orders: o_orderkey shifted by multiples of 600,000,000 (divisible
  *    by every modulus the engine-fold specs use, so per-run behavior
  *    distributions are identical across replicas).
  *  - documents: every word gets a per-replica suffix — replicas share
  *    NO shingles, so near-dup structure is copied per replica instead
  *    of collapsing into cross-replica 10-cliques of exact duplicates
  *    (which would measure a different, degenerate workload).
  *  - embeddings: vectors rotated by replica index — same value
  *    distribution, uncorrelated directions across replicas.
  *
  * Usage: runMain graft.BenchScale <srcSfDir> <outDir> <K>
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val orders = spark.read.parquet(s"$src/orders.parquet")
    (0 until k).map(i => orders
        .withColumn("o_orderkey", $"o_orderkey" + lit(i * 600000000L)))
      .reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    // customer unchanged: orders fan-in grows K×, like a real bigger day
    spark.read.parquet(s"$src/customer.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    (0 until k).map { i =>
      docs.as[(Long, String, String, String, Long)].map {
        case (id, text, lang, source, n) =>
          val tagged =
            if (i == 0) text
            else text.split(' ').map(w => w + "_" + i).mkString(" ")
          (id + i * 10000000L, tagged, lang, source, tagged.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until k).map { i =>
      emb.select(
        ($"vec_id" + lit(i * 10000000L)).as("vec_id"),
        concat(slice($"embedding", lit(i + 1), lit(10000)),
          slice($"embedding", lit(1), lit(i))).as("embedding"))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    println(s"""{"generated":"$out","k":$k}""")
    spark.stop()
  }
}
