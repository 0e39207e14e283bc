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

  // ---- physical-type pinning for every column a loader or operator
  // branches/casts on (round-12, VERDICT item 7). These assert the
  // CURRENT parquet physical type is one the adaptive readers can
  // absorb — a regeneration that ships a novel type fails HERE with
  // the table and column named, instead of deep inside an operator.

  private def physical(table: String) =
    spark.read.parquet(s"$dir/$table.parquet").schema

  test("events physical types are absorbable by the loaders") {
    import org.apache.spark.sql.types._
    val s = physical("events")
    // ts: the three layouts eventsTsFromNanos normalizes — anything
    // else must extend the normalization (Tables.eventsTsFromNanos)
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)
      .contains(s("ts").dataType), s"events.ts drifted to ${s("ts").dataType}")
    val integral = Set[DataType](LongType, IntegerType, ShortType, ByteType)
    for (c <- Seq("event_id", "user_id"))
      assert(integral.contains(s(c).dataType),
        s"events.$c drifted to ${s(c).dataType}")
    assert(s("value").dataType.isInstanceOf[NumericType],
      s"events.value drifted to ${s("value").dataType}")
    // props is parsed as a JSON string (LHJson/q13-family)
    assert(s("props").dataType == StringType,
      s"events.props drifted to ${s("props").dataType}")
    assert(s("event_type").dataType == StringType,
      s"events.event_type drifted to ${s("event_type").dataType}")
  }

  test("documents physical types are absorbable by the text operators") {
    import org.apache.spark.sql.types._
    val s = physical("documents")
    val integral = Set[DataType](LongType, IntegerType, ShortType, ByteType)
    assert(integral.contains(s("doc_id").dataType),
      s"documents.doc_id drifted to ${s("doc_id").dataType}")
    for (c <- Seq("text", "lang", "source"))
      assert(s(c).dataType == StringType,
        s"documents.$c drifted to ${s(c).dataType}")
    assert(integral.contains(s("n_chars").dataType),
      s"documents.n_chars drifted to ${s("n_chars").dataType}")
  }

  test("embeddings physical types are absorbable by the ANN operators") {
    import org.apache.spark.sql.types._
    val s = physical("embeddings")
    assert(Set[DataType](LongType, IntegerType, ShortType, ByteType)
      .contains(s("vec_id").dataType),
      s"embeddings.vec_id drifted to ${s("vec_id").dataType}")
    s("embedding").dataType match {
      case ArrayType(et, _) =>
        // Similarity/Dedup cast to array<double>; float and double are
        // the two element types that cast losslessly at float precision
        assert(et == FloatType || et == DoubleType,
          s"embeddings.embedding element drifted to $et — audit every " +
            "cast(\"array<double>\") site for precision before widening")
      case other => fail(s"embeddings.embedding drifted to $other")
    }
    // the cast path the operators use preserves values bit-for-bit at
    // float precision (float→double widening is exact)
    import org.apache.spark.sql.functions._
    val row = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding"), col("embedding").cast("array<double>"))
      .limit(1).head()
    val raw = row.getSeq[Any](0).map {
      case f: Float => f.toDouble
      case d: Double => d
    }
    val cast = row.getSeq[Double](1)
    assert(raw == cast, "embedding cast to array<double> changed values")
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
