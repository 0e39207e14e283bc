package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validates [[TextAnalysis.bpeTrain]] against a direct plain-Scala
  * BPE trainer over token LISTS (textbook Sennrich greedy merge),
  * independently of the ||-delimited-string representation the
  * operator uses — if the string `replace` trick ever deviated from
  * true greedy left-to-right merge application, the two would diverge
  * here before any oracle run.
  */
class BpeTrainSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = graft.TestSpark.session

  private def mergeOnce(toks: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  test("bpe train: merge table matches a plain-Scala greedy trainer") {
    import spark.implicits._
    val got = TextAnalysis.bpeTrain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.length == TextAnalysis.BPE_TRAIN_ROUNDS)

    var vocab: Map[Vector[String], Long] =
      graft.sources.Tables(spark, dir, "documents")
        .select(explode(split($"text", " ")).as("w"))
        .filter($"w".rlike("^[a-z]+$"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
        .as[(String, Long)].collect()
        .map { case (w, f) => w.toVector.map(_.toString) -> f }.toMap
    val expect = (1 to TextAnalysis.BPE_TRAIN_ROUNDS).map { r =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (toks, f) =>
        toks.iterator.sliding(2).withPartial(false)
          .foreach { p => counts((p(0), p(1))) += f }
      }
      assert(counts.nonEmpty, s"round $r exhausted on test data")
      val ((pa, pb), n) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.groupMapReduce { case (toks, _) =>
        mergeOnce(toks, pa, pb)
      }(_._2)(_ + _)
      (r.toLong, pa, pb, pa + pb, n)
    }
    assert(got.toSeq == expect,
      s"merge tables diverge:\n got=${got.toSeq}\n exp=$expect")
  }

  /** Plain-Scala greedy trainer (full recount every round) — the
    * independent reference the incremental-delta loop must match. */
  private def plainTrain(rounds: Int)
      : Seq[(Long, String, String, String, Long)] = {
    import spark.implicits._
    var vocab: Map[Vector[String], Long] =
      graft.sources.Tables(spark, dir, "documents")
        .select(explode(split($"text", " ")).as("w"))
        .filter($"w".rlike("^[a-z]+$"))
        .groupBy($"w").agg(count(lit(1)).as("f"))
        .as[(String, Long)].collect()
        .map { case (w, f) => w.toVector.map(_.toString) -> f }.toMap
    (1 to rounds).flatMap { r =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (toks, f) =>
        toks.iterator.sliding(2).withPartial(false)
          .foreach { p => counts((p(0), p(1))) += f }
      }
      if (counts.isEmpty) None
      else {
        val ((pa, pb), n) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.groupMapReduce { case (toks, _) =>
          mergeOnce(toks, pa, pb)
        }(_._2)(_ + _)
        Some((r.toLong, pa, pb, pa + pb, n))
      }
    }
  }

  test("bpe train at K=128: incremental delta loop == full-recount " +
      "trainer (real-vocab path)") {
    val rounds = 128
    val got = TextAnalysis.bpeMerges(spark, dir, rounds)
    val expect = plainTrain(rounds)
    assert(got.length == expect.length,
      s"round counts diverge: got ${got.length}, expect ${expect.length}")
    // compare round-by-round so a divergence names its round
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"merge tables diverge at round ${e._1}:" +
        s"\n got=$g\n exp=$e")
    }
  }

  test("bpe encode consumes the trained table (no retrain): " +
      "bpeEncodeTable == bpeEncode") {
    val viaTable = TextAnalysis.bpeEncodeTable(
      spark, dir, TextAnalysis.bpeTrain(spark, dir)).collect().toSeq
    val direct = TextAnalysis.bpeEncode(spark, dir).collect().toSeq
    assert(viaTable == direct)
  }

  test("bpe encode: token counts match a plain-Scala tokenizer replay") {
    import spark.implicits._
    val merges = TextAnalysis.bpeTrain(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val got = TextAnalysis.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.sources.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      val words = text.split(' ').filter(_.matches("^[a-z]+$"))
      val before = words.map(_.length.toLong).sum
      // greedy replay per word, merges in training order
      val after = words.map { w =>
        merges.foldLeft(w.toVector.map(_.toString)) {
          case (toks, (a, b)) => mergeOnce(toks, a, b)
        }.length.toLong
      }.sum
      val pm = if (before > 0) after * 1000 / before else 1000L
      assert(got(id) == ((before, after, pm)),
        s"doc $id: got ${got(id)}, expected ($before, $after, $pm)")
    }
    // sanity: training actually compresses this corpus
    val (b, a) = (docs.map(d => got(d._1)._1).sum,
      docs.map(d => got(d._1)._2).sum)
    assert(a < b, "12 merges should shrink the token count")
  }
}
