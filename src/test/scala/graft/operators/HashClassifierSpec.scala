package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validates [[TextAnalysis.hashClassifier]] three ways:
  *  - plain-Scala replay of the whole scoring path (tokenize →
  *    uni/bigram features → FNV hash → masked bucket → weight sum →
  *    threshold) on the real sf0.001 corpus, row for row;
  *  - a PLANTED fixture where the seeded weight table provably
  *    separates a "low-quality" doc family from a clean one (the
  *    words are chosen by searching the weight table, so the test
  *    pins real routing, not vacuous all-one-class output);
  *  - plan pins: one pruned parquet scan, features never explode into
  *    rows, and no shuffle before the output sort.
  */
class HashClassifierSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def weightOf(feature: String): Long = {
    val h = graft.functions.TextHashes.hash64(feature, 0L)
    TextAnalysis.hashClsWeights(
      (h & (TextAnalysis.HASH_CLS_DIM - 1)).toInt)
  }

  /** First-principles replay of the operator's per-doc contract. */
  private def replay(text: String): (Long, Long, Boolean) = {
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    val feats = toks.toSeq ++
      toks.toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val score = feats.map(weightOf).sum
    (feats.length.toLong, score, score < TextAnalysis.HASH_CLS_THRESHOLD)
  }

  test("scores and routing match a plain-Scala replay on the corpus") {
    import spark.implicits._
    val got = TextAnalysis.hashClassifier(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      val (nf, score, low) = replay(text)
      assert(got(id) == ((nf, score, low)),
        s"doc $id: got ${got(id)}, expected ($nf, $score, $low)")
    }
    // non-vacuity: the corpus itself routes BOTH ways
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "corpus routed to a single class — separation untested")
  }

  test("planted low-quality family separates from the clean family") {
    import spark.implicits._
    // search the seeded weight table for single-word features with
    // strongly negative / strongly positive weights: a one-word doc
    // has exactly one feature, so its routing is the weight's sign
    val candidates = (0 until 4000).map(i => s"w$i")
    val neg = candidates.filter(w => weightOf(w) <= -4L).take(5)
    val pos = candidates.filter(w => weightOf(w) >= 4L).take(5)
    assert(neg.size == 5 && pos.size == 5,
      "weight table has no strong buckets — seed degenerate?")
    // multi-word docs from the same families: all-neg words keep the
    // doc negative only if the bigrams don't flip it — assert on the
    // REPLAY (ground truth), then on the engine agreeing with it
    val planted = (neg.zipWithIndex.map { case (w, i) =>
      (100L + i, s"$w $w $w")
    } ++ pos.zipWithIndex.map { case (w, i) =>
      (200L + i, s"$w $w $w")
    }).toSeq
    val tmp = java.nio.file.Files
      .createTempDirectory("hash_cls_planted").toString
    planted.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.hashClassifier(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    planted.foreach { case (id, text) =>
      assert(got(id) == replay(text)._3, s"doc $id diverges from replay")
    }
    // the planted families actually separate: every repeated-negative
    // doc whose replay routes low must be flagged, and at least 4 of
    // each family land on their intended side (bigram self-pairs can
    // flip at most a minority at these weight magnitudes)
    val lowCount = (100L to 104L).count(got(_))
    val cleanCount = (200L to 204L).count(!got(_))
    assert(lowCount >= 4 && cleanCount >= 4,
      s"planted separation too weak: low=$lowCount clean=$cleanCount")
  }

  test("plan: one pruned scan, no row explosion, no pre-sort shuffle") {
    val df = TextAnalysis.hashClassifier(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(2000))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan not pruned to (doc_id, text)")
    assert(!plan.contains("Generate"), "features exploded into rows")
    // the only exchange is the output sort's range partitioning
    val exch = "Exchange [a-z]+".r.findAllIn(plan).toSeq
    assert(exch.forall(_.contains("rangepartitioning")),
      s"unexpected shuffle: $exch")
  }
}
