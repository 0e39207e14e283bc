package graft
import org.apache.spark.sql.SparkSession

/** Targeted benchmark: time selected queries in isolation (fresh-ish
  * session, chosen order), for regression triage and scaling curves —
  * `Bench` times everything in map order, so a heavy query's GC/shuffle
  * pressure can bleed into whoever runs next; this main isolates that.
  *
  * Usage: runMain graft.BenchOne <sfDir> <repeats> <query> [query ...]
  * Prints one JSON line per (query, repeat).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions default to cores but can be raised
    // independently: partition count must scale with DATA (so each
    // partition still fits in memory), cores with the box — conflating
    // them is exactly what breaks single-box scale-replica runs (see
    // SCALING.md round-5 triage).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { r =>
        // isolated-floor honesty: the BPE merge memo exists to share
        // training across the gate run's train->encode pair; a
        // REPEAT here must re-pay training or min-of-N measures a
        // memo hit, not the operator
        graft.operators.TextAnalysis.clearBpeMemo()
        graft.operators.TextAnalysis.clearClsMemo()
        graft.operators.TextAnalysis.clearUniMemo()
        val t0 = System.nanoTime()
        val n = BenchExec.materialize(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","repeat":$r,"rows":$n,"sec":$sec%.3f}""")
        // streaming triage: per-batch progress of the drain just timed
        if (sys.env.contains("SPARK_GRAFT_STREAM_DIAG"))
          Option(graft.operators.StreamBatch.lastDrainProgress.get(name))
            .foreach(_.foreach(j => println(s"PROGRESS $name $j")))
      }
    }
    spark.stop()
  }
}
