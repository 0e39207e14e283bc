package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Planted checks for [[Relational.q70DecimalAgg]] (exact decimal
  * money path) and [[Relational.q71ComplexTypes]] (collection
  * functions).
  */
class DecimalComplexSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  test("decimal agg: sums and tax are exact, no float drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dec").toString
    val t0 = new Timestamp(1700000000000L)
    // 0.1 + 0.2 is the classic float trap: decimal path must yield
    // exactly 0.30, and 6% of 0.25 is exactly 0.0150 at 4dp
    Seq((1L, 1L, "O", 0.10, t0, "x"), (2L, 1L, "O", 0.20, t0, "x"),
      (3L, 1L, "F", 0.25, t0, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val out = Relational.q70DecimalAgg(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDecimal(2).toPlainString, r.getDecimal(3).toPlainString,
        r.getDecimal(4).toPlainString)).toMap
    assert(out("O") == ((2L, "0.30", "0.0180", "0.20")))
    assert(out("F") == ((1L, "0.25", "0.0150", "0.25")))
  }

  test("complex types: sorted csv, membership, map round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cx").toString
    Seq((1L, 5L, 1.00), (1L, 1L, 2.00), (1L, 5L, 3.00), (2L, 9L, 0.50))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val out = Relational.q71ComplexTypes(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getBoolean(3), r.getLong(4))).toMap
    assert(out(1L) == ((2L, "1,5", true, 600L)))
    assert(out(2L) == ((1L, "9", false, 50L)))
  }
}
