package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates + streaming exact-dedup — the remaining SURVEY
  * §7.2-7 items: approx_count_distinct within its error bound against
  * the exact answer, and watermarked `dropDuplicates` on a stream.
  */
class ApproxStreamSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within its error bound") {
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    val relErr = math.abs(approx - exact) / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("streaming dropDuplicates dedups within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = input.toDS().toDF("ts", "content_hash")
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("content_hash")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      input.addData((ts(10), "h1"), (ts(11), "h2"), (ts(12), "h1"))
      input.addData((ts(13), "h2"), (ts(14), "h3"), (ts(15), "h1"))
      val deadline = System.currentTimeMillis() + 20000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(150)
        rows = spark.sql("SELECT content_hash FROM stream_dedup").collect()
      }
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("h1", "h2", "h3"),
        s"got ${rows.toSeq}")
    } finally query.stop()
  }
}
