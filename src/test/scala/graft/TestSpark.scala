package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole forked test JVM. Suites must
  * NOT stop it — `SparkSession.builder().getOrCreate()` returns the
  * same session to every suite, so a per-suite `stop()` in `afterAll`
  * kills whichever suites run later (observed as order-dependent
  * flakiness). The JVM exit tears it down.
  */
object TestSpark {
  lazy val session: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-test-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
