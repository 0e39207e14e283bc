package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHashes
import graft.sources.Tables

/** Eval-set decontamination — the training-data-pipeline stage that
  * flags training documents sharing any 13-word n-gram with a
  * benchmark/eval corpus (the GPT-3 appendix-C convention), so
  * contaminated documents can be dropped before training.
  *
  * Scale design (100 TB): the benchmark side is SMALL BY CONTRACT —
  * eval suites are megabytes (thousands of questions), not corpora —
  * so its distinct gram-hash set broadcasts and the whole pass is one
  * narrow scan of the training corpus + a broadcast semi-join: no
  * corpus shuffle at all except the final per-doc count aggregation,
  * which is map-side combined on doc_id. Never an all-pairs join.
  * A benchmark too large to broadcast (>100s of MB of distinct grams)
  * would be mis-use of the operator, not a missing code path.
  */
object Decontaminate {

  /** n-gram width: 13 words, the published decontamination convention. */
  val NGRAM = 13

  /** Benchmark fixture selection: mix64(doc_id) mod 1000 < 100 — the
    * same deterministic splitmix64 permille convention as
    * [[Curation.stratifiedSample]], so the DuckDB oracle recomputes
    * membership bit-exactly. */
  val BENCH_PERMILLE = 100L

  /** Modulus for the splitmix64 bucket split — shared by the engine
    * side and every interpolating oracle ([[Curation.dataFunnel]]'s
    * included) so the two can never silently desynchronize. */
  val BUCKET_MOD = 1000L

  /** Distinct, sorted `width`-gram hashes per doc. Plain JVM loop per
    * doc (same rationale as [[Dedup]]'s shingleSets: ~15x faster than
    * interpreted HOF lambdas for per-doc work); the benchmark BUCKET
    * is deliberately NOT computed here — it's a columnar native
    * `mix64_bucket` expression added by [[decontaminate]], keeping the
    * membership predicate codegen'd. Width is a parameter because the
    * same pass serves three operators: 13-gram decontamination (this
    * module), 20-word cross-doc span census ([[Dedup.spanCrossdoc]]),
    * 5-word similarity shingles ([[Retrieval.docSimilarity]]). */
  private[operators] def gramSets(
      s: SparkSession, dir: String,
      width: Int = NGRAM): Dataset[(Long, Array[Long])] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"text")
      .transform(Tables.repartitionForCpu(_, col("doc_id")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(' ')
        val n = math.max(words.length - (width - 1), 0)
        val raw = new Array[Long](n)
        var i = 0
        while (i < n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < width) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          raw(i) = TextHashes.hash64(sb.toString, 0L)
          i += 1
        }
        java.util.Arrays.sort(raw)
        var w = 0
        var r = 0
        while (r < n) {
          if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
          r += 1
        }
        (id, java.util.Arrays.copyOf(raw, w))
      }
  }

  /** Core: contaminated docs of `corpus` against `bench`, both shaped
    * (doc_id, grams: array&lt;long&gt; of distinct gram hashes). The bench
    * gram set carries an EXPLICIT broadcast hint — bounded by contract
    * (see object doc), and the hinted subtree is an aggregated
    * projection, never a raw fact table. Output: one row per
    * contaminated doc — (doc_id, n_grams, n_hits) where n_hits counts
    * the doc's distinct grams that appear anywhere in the benchmark. */
  def decontaminateAgainst(corpus: DataFrame, bench: DataFrame): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val benchGrams = bench
      .select(explode($"grams").as("g")).distinct()
    corpus
      .select($"doc_id", size($"grams").cast("long").as("n_grams"),
        explode($"grams").as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy($"doc_id", $"n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .select($"doc_id", $"n_grams", $"n_hits")
      .orderBy($"doc_id")
  }

  /** Driver query: decontaminate the non-benchmark 90% of `documents`
    * against the seeded 10% benchmark fixture. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = gramSets(s, dir).toDF("doc_id", "grams")
      .withColumn("bucket",
        graft.functions.GraftFunctions.mix64_bucket($"doc_id", BUCKET_MOD))
    decontaminateAgainst(
      grams.filter($"bucket" >= BENCH_PERMILLE),
      grams.filter($"bucket" < BENCH_PERMILLE))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_decontaminate" -> (decontaminate _),
  )

  val oracles: Map[String, String] = Map(
    // Joins on the raw 13-gram STRINGS (no hash): an independent
    // re-derivation of the same relation — a Spark-side hash collision
    // would show up as a count mismatch here.
    "text_decontaminate" -> {
      val bucket =
        s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % $BUCKET_MOD"
      s"""WITH d AS (SELECT doc_id, text, $bucket AS bkt FROM documents),
         |words AS (SELECT doc_id, bkt, string_split(text, ' ') AS w FROM d),
         |grams AS (SELECT DISTINCT doc_id, bkt,
         |    unnest(list_transform(range(1, len(w) - ${NGRAM - 2}),
         |      i -> array_to_string(w[i:i+${NGRAM - 1}], ' '))) AS g
         |  FROM words WHERE len(w) >= $NGRAM),
         |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
         |  WHERE bkt >= $BENCH_PERMILLE GROUP BY 1),
         |bench AS (SELECT DISTINCT g FROM grams WHERE bkt < $BENCH_PERMILLE),
         |hits AS (SELECT doc_id, count(*) AS n_hits FROM grams
         |  WHERE bkt >= $BENCH_PERMILLE AND g IN (SELECT g FROM bench)
         |  GROUP BY 1)
         |SELECT h.doc_id, s.n_grams, h.n_hits
         |FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
         |ORDER BY h.doc_id""".stripMargin
    },
  )
}
