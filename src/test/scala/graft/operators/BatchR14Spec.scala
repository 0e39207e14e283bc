package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Planted fixtures for the round-14 batch-A operators:
  * [[Relational.q76RecursiveBom]] (frontier-iterated recursive walk),
  * [[TextAnalysis.bpePairStats]] (BPE merge-candidate counting) and
  * [[Curation.mixEpochs]] (epoch-aware source upsampling manifest).
  */
class BatchR14Spec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  test("q76: walk reaches the root with multiplied quantities") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bom").toString
    // 157 -> 15 (qty 157%5+1=3) -> 1 (qty 15%5+1=1); 42 -> 4 (qty 3);
    // 1 and 3 are roots themselves
    Seq(1L, 3L, 15L, 42L, 157L)
      .map(k => (k, s"part-$k", "Brand#11"))
      .toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    val out = Relational.q76RecursiveBom(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((1L, 0L, 1L)))
    assert(out(3L) == ((3L, 0L, 1L)))
    assert(out(15L) == ((1L, 1L, 1L)))
    assert(out(42L) == ((4L, 1L, 3L)))
    assert(out(157L) == ((1L, 2L, 3L)))
  }

  test("bpe pair stats: corpus-frequency-weighted char pairs, ranked") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // vocab: abab (freq 2) -> pairs ab,ba,ab each occurrence;
    //        ab (freq 1) -> pair ab. totals: ab=5, ba=2
    Seq((1L, "abab ab", "en"), (2L, "abab x", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.bpePairStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "ab", 5L), (2L, "ba", 2L)))
  }

  test("mm embedding dedup: same-cell pairs only within a modality") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mmd").toString
    def e(i: Int, sign: Double): Array[Float] = {
      val v = Array.fill(4)(0.0f); v(i) = sign.toFloat; v
    }
    // centroids 0..7: +-one-hots (pairwise cosine <= 0); 9,12 hug
    // centroid 0 (image cell); 10,14 hug centroid 4 (audio cell) but
    // 14 is video -> the (10,14)/(4,14) pairs must be suppressed
    val rows = Seq(
      0L -> e(0, 1), 1L -> e(1, 1), 2L -> e(2, 1), 3L -> e(3, 1),
      4L -> e(0, -1), 5L -> e(1, -1), 6L -> e(2, -1), 7L -> e(3, -1),
      9L -> e(0, 0.9), 12L -> e(0, 0.9),
      10L -> e(0, -0.9), 14L -> e(0, -0.9))
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = Multimodal.embeddingDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("image", 0L, 9L), ("image", 0L, 12L), ("image", 9L, 12L),
      ("audio", 4L, 10L)))
  }

  test("dq freshness: hierarchical max-gap equals the flat definition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dqf").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val us = 1000000L
    Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-03-01 10:00:05"), 1L, "a", 1.0),
      (3L, ts("2024-03-02 10:00:10"), 1L, "a", 1.0), // crosses a day
      (4L, ts("2024-03-01 09:00:00"), 2L, "b", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = Quality.freshness(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // a: gaps 5 s and 86405 s (day-boundary) -> max 86405 s; fresh
    assert(out("a") == ((3L, 0L, 86405L * us)))
    // b: single event -> gap 0; staleness = a.last - b.last
    val staleB = (ts("2024-03-02 10:00:10").getTime -
      ts("2024-03-01 09:00:00").getTime) * 1000L
    assert(out("b") == ((1L, staleB, 0L)))
  }

  test("mix epochs: full-epoch and partial-permille integer arithmetic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    // wiki: 2 docs x 3 tokens = 6 toks -> 333 full epochs, rem 2,
    // permille 333; web: one 3000-token doc -> 0 epochs, permille 666
    val webText = Seq.fill(3000)("w").mkString(" ")
    Seq((1L, "a b c", "wiki"), (2L, "d e f", "wiki"), (3L, webText, "web"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Curation.mixEpochs(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (wikiDocs, wikiToks, wikiEp, wikiPm, wikiNp, wikiEst) = out("wiki")
    assert((wikiDocs, wikiToks, wikiEp, wikiPm) == ((2L, 6L, 333L, 333L)))
    // partial membership is the splitmix64 bucket — structural bound
    // here; the DuckDB oracle pins the exact membership at sf0.01
    assert(wikiNp >= 0L && wikiNp <= 2L)
    assert(wikiEst == 333L * 6L + wikiNp * 3L)
    val (webDocs, webToks, webEp, webPm, webNp, webEst) = out("web")
    assert((webDocs, webToks, webEp, webPm) == ((1L, 3000L, 0L, 666L)))
    assert(webEst == webNp * 3000L)
  }
}
