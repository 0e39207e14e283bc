package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The filesystem half of [[Maintenance]] — content preservation is
  * the driver-oracle-checked query; file topology is asserted here.
  */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0).toSeq

  test("compaction collapses the fragmented layout to size-targeted files") {
    val root = Maintenance.ensure(spark, dir)
    val before = parquetFiles(s"$root/fragmented")
    val after = parquetFiles(s"$root/compacted")
    val rows = spark.read.parquet(s"$root/compacted").count()
    val want =
      ((rows + Maintenance.COMPACT_ROWS_PER_FILE - 1) /
        Maintenance.COMPACT_ROWS_PER_FILE).toInt
    assert(before.size > after.size,
      s"no compaction: ${before.size} -> ${after.size}")
    assert(after.size == want, s"expected $want files, got ${after.size}")
    // the whole point: mean bytes per file went UP
    val meanBefore = before.map(_.length()).sum / before.size
    val meanAfter = after.map(_.length()).sum / after.size
    assert(meanAfter > meanBefore,
      s"mean file size did not grow: $meanBefore -> $meanAfter")
  }

  test("table stats carry exact ndv and bounds") {
    import spark.implicits._
    val out = Maintenance.tableStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val keys = graft.sources.Tables(spark, dir, "orders")
      .select($"o_orderkey").as[Long].collect()
    val row = out("o_orderkey")
    assert(row.getLong(1) == keys.length)
    assert(row.getLong(3) == keys.distinct.length)
    assert(row.getDouble(4) == keys.min.toDouble)
    assert(row.getDouble(5) == keys.max.toDouble)
  }
}
