package graft.sources

import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Canary against driver-side test-data regeneration (round-10
  * post-mortem: events.ts flipped from TIMESTAMP(NANOS)-as-long to
  * timestamp[us] between rounds and every events consumer failed at
  * table LOAD, invisible to `sbt test` until each suite hit it).
  * This spec opens EVERY table at the largest local SF through the
  * production loader and forces a row, so any physical-type drift the
  * loaders can't absorb fails here first, with the table named.
  */
class SchemaDriftSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  // the driver regenerates all SFs together; sf0.1 is what Bench and
  // the driver's Verify run against
  private val dir = "/root/testdata/sf0.1"

  for (t <- Tables.all)
    test(s"$t loads through Tables and yields rows") {
      val df = Tables(spark, dir, t)
      assert(df.limit(1).count() == 1L, s"$t: empty or unreadable")
    }

  test("events ts normalizes to TimestampType from either physical type") {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"got ${df.schema("ts").dataType}")
    // exactness property the scaladoc pins: values survive round-trip
    // through the normalization at microsecond precision
    import org.apache.spark.sql.functions._
    val micros = df.select(unix_micros(col("ts")).as("us"))
      .agg(min("us"), max("us")).head()
    assert(micros.getLong(0) > 0L && micros.getLong(1) > micros.getLong(0))
  }

  test("eventsTsFromNanos handles the raw-nanos long layout too") {
    // synthesize the pre-drift layout: ts as epoch-nanos LongType
    import spark.implicits._
    val nanos = 1704153600123456000L // 2024-01-02T00:00:00.123456Z
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    assert(df.schema("ts").dataType == LongType)
    val out = Tables.eventsTsFromNanos(df)
    assert(out.schema("ts").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    val us = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(us == nanos / 1000L, s"exact integer division violated: $us")
  }
}
