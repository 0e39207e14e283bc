package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validates [[Dedup.lshScurve]]: a first-principles replay of the
  * whole measurement (bigram-hash shingles, exact probe-pair Jaccard
  * deciles, the XOR-seeded splitmix minhash families, 16×2 band
  * collision, ppm rollup) on the real corpus, plus a PLANTED corpus
  * with pairs at mid deciles — the S-transition region the synthetic
  * corpus's bimodal J distribution leaves empty. */
class LshScurveSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.001"
  private val K = 32
  private val BANDS = 16

  private def shingles(text: String): Set[Long] = {
    val ws = text.split(' ')
    ws.iterator.sliding(2).filter(_.size == 2)
      .map(a => graft.functions.TextHashes.hash64(a(0) + " " + a(1), 0L))
      .toSet
  }

  private def sig(ss: Set[Long]): Vector[Long] =
    (0 until K).map { i =>
      val seed = graft.functions.TextHashes.mix64(i.toLong)
      ss.iterator.map(g =>
        graft.functions.TextHashes.mix64(g ^ seed)).min
    }.toVector

  private def collide(a: Vector[Long], b: Vector[Long]): Boolean =
    (0 until BANDS).exists(band =>
      a(2 * band) == b(2 * band) && a(2 * band + 1) == b(2 * band + 1))

  /** Full replay: (decile → (n_pairs, n_collided, recall_ppm)). */
  private def replay(rows: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val sh = rows.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty).toMap
    val probes = sh.keys.filter(_ < Dedup.LSH_SCURVE_PROBES)
    val sigs = scala.collection.mutable.Map.empty[Long, Vector[Long]]
    def sigOf(id: Long) = sigs.getOrElseUpdate(id, sig(sh(id)))
    val hits = for {
      p <- probes.toSeq
      // toSeq: an inner SET generator would dedupe the yielded
      // (decile, collide) tuples per probe and silently collapse
      // the tally
      d <- sh.keys.toSeq
      if d != p && (d >= Dedup.LSH_SCURVE_PROBES || p < d)
      inter = (sh(p) & sh(d)).size.toLong
      if inter > 0
    } yield {
      val union = sh(p).size + sh(d).size - inter
      ((inter * 10L) / union, collide(sigOf(p), sigOf(d)))
    }
    hits.groupBy(_._1).map { case (dec, v) =>
      val n = v.size.toLong
      val c = v.count(_._2).toLong
      dec -> (n, c, c * 1000000L / n)
    }
  }

  private def run(d: String): Map[Long, (Long, Long, Long)] =
    Dedup.lshScurve(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("corpus curve matches the first-principles replay") {
    import spark.implicits._
    val rows = graft.sources.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = run(dir)
    val exp = replay(rows)
    assert(got == exp, s"curve diverges:\n got=$got\n exp=$exp")
    // the corpus witnesses both ends: a noise floor decile (low
    // recall over many unrelated pairs) and the near-dup decile at
    // total recall
    assert(got.contains(0L) && got(0L)._1 > 1000 &&
      got(0L)._3 < 100000L, s"noise floor row off: ${got.get(0L)}")
    assert(got.exists { case (dec, (_, _, r)) => dec >= 9L && r == 1000000L },
      s"near-dup decile not at full recall: $got")
  }

  test("planted mid-decile pairs pin the S-transition") {
    import spark.implicits._
    // per pair k: docA = 21 chained unique words (20 bigrams); docB
    // shares the first s words then diverges — shared bigrams s-1,
    // sizes 20/20, J = (s-1)/(40-(s-1)). s=9 -> J=8/32=0.25 (decile
    // 2); s=19 -> J=18/22=0.818 (decile 8). Disjoint vocab per pair.
    def docA(k: Int) = (0 to 20).map(j => s"p${k}a$j").mkString(" ")
    def docB(k: Int, s: Int) =
      ((0 until s).map(j => s"p${k}a$j") ++
        (s to 20).map(j => s"p${k}b$j")).mkString(" ")
    val lowPairs = (0 until 20).map { k =>
      Seq((k.toLong, docA(k)), (1000L + k, docB(k, 9)))
    }
    val highPairs = (20 until 40).map { k =>
      Seq((k.toLong, docA(k)), (1000L + k, docB(k, 19)))
    }
    val rows = (lowPairs ++ highPairs).flatten
    val tmp = java.nio.file.Files
      .createTempDirectory("scurve_planted").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fix"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = run(tmp)
    val exp = replay(rows)
    assert(got == exp, s"planted curve diverges:\n got=$got\n exp=$exp")
    assert(got.contains(2L) && got.contains(8L), got.toString)
    // the S-shape: J≈0.25 collides sometimes but not always
    // (P ≈ 1-(1-0.25²)¹⁶ ≈ 0.64 per pair; 20 pairs make all-or-none
    // astronomically unlikely), J≈0.82 collides always
    // (miss probability (1-0.82²)¹⁶ ≈ 4e-8)
    val (n2, c2, r2) = got(2L)
    assert(n2 == 20L && c2 > 0L && c2 < 20L,
      s"decile-2 recall degenerate: $c2/20")
    assert(got(8L) == ((20L, 20L, 1000000L)), got(8L).toString)
    assert(r2 < got(8L)._3, "curve not increasing across deciles")
  }
}
