package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.pqTopK]]: retrieval quality where it is measurable.
  * On i.i.d. random embeddings every pairwise cosine is ≈ noise
  * (documented for the LSH/IVF family in BASELINE.md "ANN recall
  * reporting"), so corpus overlap vs brute force is the method's
  * noise floor and only lower-bounded loosely; the REAL quality check
  * is the planted-twin corpus, where a true near-neighbor exists.
  */
class PqAnnSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session
  private val dir = "/root/testdata/sf0.01"

  private def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  test("planted twins: ADC retrieves every query's true near-duplicate") {
    import spark.implicits._
    // corpus: 300 deterministic pseudo-random 64-dim vectors; each
    // query id q < 10 gets a twin at id 1000+q = tiny perturbation
    def vec(seed: Long): Array[Float] = Array.tabulate(64) { d =>
      (java.lang.Long.remainderUnsigned(
        graft.functions.TextHashes.mix64(seed * 131L + d),
        1000000L) / 1000000.0f) - 0.5f
    }
    val base = (0L until 300L).map(i => (i, vec(i)))
    val twins = (0L until 10L).map { q =>
      (1000L + q, vec(q).zipWithIndex.map { case (x, d) =>
        x + (if (d % 7 == 0) 0.01f else -0.01f)
      })
    }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val pq = sets(Similarity.pqTopKOn(emb))
    (0L until 10L).foreach { q =>
      assert(pq(q).contains(1000L + q),
        s"query $q: twin not in top-5 ${pq(q)}")
    }
  }

  test("corpus overlap vs brute force stays above the noise floor") {
    val pq = sets(Similarity.pqTopK(spark, dir))
    val exact = sets(Similarity.bruteForceTopK(spark, dir))
    assert(pq.keySet == exact.keySet && pq.keySet.size == 10)
    val mean = pq.keys.toSeq.map(q => (pq(q) & exact(q)).size)
      .sum.toDouble / (pq.size * 5)
    // random-embedding noise floor (measured 0.16 with 4-bit medoid
    // codebooks; chance is 5/500 = 0.01) — planted-twin above is the
    // headline quality metric, mirroring the LSH/IVF reporting
    assert(mean >= 0.08, s"mean top-5 overlap $mean")
  }

  test("determinism: two runs produce identical rankings") {
    val a = Similarity.pqTopK(spark, dir).collect().map(_.toString).toSeq
    val b = Similarity.pqTopK(spark, dir).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
