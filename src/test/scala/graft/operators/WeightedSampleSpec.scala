package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Priority-sampling semantics of [[Curation.weightedSample]]: weight
  * bias, determinism, and agreement with a window-computed reference.
  */
class WeightedSampleSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  test("heavy documents dominate the sample; ranking replays exactly") {
    import spark.implicits._
    // one source, 1000 light docs (w=10) + 1000 heavy docs (w=10000)
    val rows = (0L until 1000L).map(i => (i, "x" * 10, "en", "s", 10L)) ++
      (1000L until 2000L).map(i => (i, "y" * 20, "en", "s", 10000L))
    val dir = java.nio.file.Files.createTempDirectory("graft_ws").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.parquet(s"$dir/documents.parquet")

    val out = Curation.weightedSample(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap // doc_id -> rn
    assert(out.size == Curation.WEIGHTED_K)
    val heavy = out.keys.count(_ >= 1000L)
    // inclusion odds scale with weight (1000:1 here); expected heavy
    // count ≈ 25·(1 − 1/1001·…) ≈ 25 — 20 is a deterministic-fixture
    // floor, not a statistical bound
    assert(heavy >= 20, s"only $heavy of ${out.size} picks are heavy")

    // exact agreement with the window-computed reference ranking
    import graft.functions.TextHashes.mix64
    val ref = rows.map { case (id, _, _, _, w) =>
      (java.lang.Long.divideUnsigned(mix64(id), math.max(w, 1L)), id)
    }.sorted.take(Curation.WEIGHTED_K).map(_._2).toSet
    assert(out.keySet == ref)
  }
}
