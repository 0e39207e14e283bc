package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HLL register sketch: estimate accuracy (the float math the gate
  * output deliberately excludes), merge algebra, and batch/stream
  * equivalence.
  */
class HllSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bias-corrected estimate within 5% on 100k distinct keys") {
    import spark.implicits._
    val regs = regsOf(Sketches.hllRegisterTable(
      spark.range(100000)
        .select(graft.functions.GraftFunctions.mix64($"id").as("hv"))))
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.05,
      s"estimate $est (σ at 4096 registers is ~1.6%)")
    assert(regs.size <= Sketches.HLL_REGS)
  }

  test("small-range linear counting: 100 keys nearly exact") {
    import spark.implicits._
    val regs = regsOf(Sketches.hllRegisterTable(
      spark.range(100)
        .select(graft.functions.GraftFunctions.mix64($"id").as("hv"))))
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 100.0) < 3.0, s"estimate $est")
  }

  test("union-by-max: sketch of A∪B == element-wise max of sketches") {
    import spark.implicits._
    def sk(lo: Long, hi: Long) = regsOf(Sketches.hllRegisterTable(
      spark.range(lo, hi)
        .select(graft.functions.GraftFunctions.mix64($"id").as("hv"))))
    val (a, b, ab) = (sk(0, 6000), sk(4000, 10000), sk(0, 10000))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == ab)
  }

  test("streaming register table equals the batch computation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val streamed = regsOf(StreamBatch.streamingHll(spark, dir))
    val batch = regsOf(Sketches.hllRegisterTable(
      graft.sources.Tables(spark, dir, "events")
        .select(graft.functions.GraftFunctions.mix64($"event_id").as("hv"))))
    assert(streamed == batch)
  }
}
