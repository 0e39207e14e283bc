package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names (iteration aid —
    // the driver always runs the full set)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(',').map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // partitions scale with DATA, cores with the box (the BenchOne
    // rule) — replica-dir dumps for at-scale oracle replays need the
    // override; the driver's gate run leaves both at defaults
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
    new java.io.File(outDir).mkdirs()
    // Self-owned manifest (round-10 post-mortem): one {ok|err} row PER
    // QUERY, including load-time failures, written even when a table
    // read throws — so an environment shift (e.g. the driver
    // regenerating a parquet with a new physical type) is visible
    // in-repo as N err rows instead of as silently-absent keys in the
    // driver's correctness artifact.
    val manifest = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          name -> None
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          name -> Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("\\s+", " ").take(300))
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val manifestJson = manifest.map {
      case (k, None) => s"${q(k)}: {${q("ok")}: true}"
      case (k, Some(e)) => s"${q(k)}: {${q("ok")}: false, ${q("err")}: ${q(e)}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifestJson)
    val nErr = manifest.count(_._2.isDefined)
    println(s"[verify] ${manifest.size} queries, $nErr errored " +
      s"(manifest: $outDir/manifest.json)")
    spark.stop()
  }
}
