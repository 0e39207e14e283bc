package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextHashes}
import graft.sources.Tables

/** Deduplication operators for training-data pipelines over the
  * `documents` table: exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup (the LLM-pipeline surface from
  * BASELINE.json's north star).
  *
  * Scale design (100 TB):
  *  - exact: hash-groupBy — one shuffle on a 128-bit digest, map-side
  *    partial aggregation collapses duplicates early.
  *  - n-gram Jaccard (exact): the GROUND-TRUTH operator. All-pairs with
  *    a broadcast corpus side and allocation-free merge-intersection of
  *    sorted shingle-hash arrays. O(n²) by definition — it exists to
  *    validate the approximate operators; do not point it at 100 TB.
  *    (Measured: interpreted higher-order-function lambdas and
  *    per-candidate hash-set intersections were 10-30× slower than the
  *    typed-map + merge-intersect kernel on this corpus, whose shingle
  *    document frequencies are near-uniform — prefix filtering cannot
  *    prune it.)
  *  - MinHash+LSH: the scale path — signatures are 32 aggregated mins
  *    (map-side combine), candidates come from 16 band-buckets (2 rows
  *    each), and only candidates are verified exactly. Shuffle volume
  *    is O(docs × bands), not O(docs²).
  *  - SimHash: 64-bit bigram fingerprint per doc (native codegen'd
  *    expression); candidate generation by 8-bit chunk blocking
  *    (pigeonhole: Hamming ≤ 7 ⇒ some chunk equal), verify with
  *    bit_count(xor) — never a cross join at scale.
  *  - embedding cosine: exact pairwise via the native dot-product
  *    kernel; the ANN operators in [[Similarity]] are the scale path.
  */
object Dedup {

  private val JACCARD_THRESHOLD = 0.8
  private val MINHASH_K = 32 // 16 bands × 2 rows
  private val BANDS = 16

  /** Distinct, sorted word-bigram shingle hashes per doc, built in a
    * typed map — a plain JVM loop is ~15× faster than interpreted
    * higher-order-function lambdas for this per-doc work, and sorted
    * arrays enable allocation-free merge-intersection later. */
  private def shingleSets(s: SparkSession, dir: String): Dataset[(Long, Array[Long])] = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      // the table arrives as one parquet split; spread per-doc work
      .repartition(col("doc_id"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(' ')
        val n = math.max(words.length - 1, 0)
        val raw = new Array[Long](n)
        var i = 0
        while (i < n) {
          raw(i) = TextHashes.hash64(words(i) + " " + words(i + 1), 0L)
          i += 1
        }
        java.util.Arrays.sort(raw)
        // dedup in place on the sorted array (distinct + sorted output)
        var w = 0
        var r = 0
        while (r < n) {
          if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
          r += 1
        }
        (id, java.util.Arrays.copyOf(raw, w))
      }
      .filter(_._2.nonEmpty)
  }

  /** Intersection size of two sorted long arrays — no allocation. */
  private def mergeIntersect(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  /** Exact dedup: group by content digest, keep the smallest doc_id
    * (reference pipeline: drop exact copies before near-dup passes). */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper_id")
  }

  /** Exact n-gram (word-bigram) Jaccard near-dup pairs ≥ 0.8 — the
    * ground truth the approximate operators are validated against.
    * Broadcast all-pairs with merge-intersection (see class doc). */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = shingleSets(s, dir).collect().sortBy(_._1) // one job
    val bc = s.sparkContext.broadcast(corpus)
    // left side rebuilt by index from the already-collected corpus —
    // re-running the shingling scan a second time doubled the query cost
    val ds = s.createDataset(corpus.indices.toSeq)
      .repartition(col("value")).as[Int]
      .map(i => bc.value(i))
    ds.flatMap { case (ida, va) =>
      val all = bc.value
      val out = Vector.newBuilder[(Long, Long)]
      var k = 0
      while (k < all.length) {
        val (idb, vb) = all(k)
        if (idb > ida) {
          val inter = mergeIntersect(va, vb)
          val jac = inter.toDouble / (va.length + vb.length - inter)
          if (jac >= JACCARD_THRESHOLD) out += ((ida, idb))
        }
        k += 1
      }
      out.result()
    }
      .toDF("da", "db")
      .orderBy($"da", $"db")
  }

  /** MinHash + LSH near-dup: signature of 32 per-family min-hashes,
    * banded into 16 buckets of 2 rows; candidates verified with exact
    * Jaccard. With s ≥ 0.8 the miss probability per pair is
    * (1-s²)¹⁶ ≤ 5e-8, so verified output equals the exact pair set —
    * which is exactly what the oracle checks. */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = shingleSets(s, dir).toDF("doc_id", "shingle_set")

    // 32 min-hashes, computed per exploded shingle then aggregated —
    // map-side combine keeps the shuffle at one row per (doc, family).
    val exploded = docs.select($"doc_id", explode($"shingle_set").as("s"))
    val minhashAggs = (0 until MINHASH_K).map(i =>
      min(xxhash64(lit(i), $"s")).as(s"h$i"))
    val sigs = exploded.groupBy($"doc_id").agg(minhashAggs.head, minhashAggs.tail: _*)

    // band key = hash of the band's rows; explode to (doc, band, key)
    val bandCols = (0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("key"))
    }
    val buckets = sigs.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))

    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .distinct()

    // exact verification of candidates only: re-attach the (sorted)
    // shingle arrays via broadcast and intersect in place
    val sets = broadcast(docs.select($"doc_id", $"shingle_set",
      size($"shingle_set").as("n")))
    candidates
      .join(sets.as("za"), $"da" === $"za.doc_id")
      .join(sets.as("zb"), $"db" === $"zb.doc_id")
      .withColumn("inter",
        size(array_intersect($"za.shingle_set", $"zb.shingle_set")))
      .filter($"inter" / ($"za.n" + $"zb.n" - $"inter") >= JACCARD_THRESHOLD)
      .select($"da", $"db")
      .orderBy($"da", $"db")
  }

  /** SimHash near-dup: 64-bit bigram fingerprints (native expression),
    * 8-bit chunk blocking for candidates (pigeonhole: Hamming ≤ 7 ⇒ at
    * least one of 8 chunks equal), Hamming ≤ 6 verification via
    * bit_count(xor). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .repartition(col("doc_id"))
      .select($"doc_id", GraftFunctions.simhash64($"text").as("sig"))
    val chunks = docs.select($"doc_id", $"sig",
      explode(array((0 until 8).map(c =>
        struct(lit(c).as("c"),
          shiftright($"sig", c * 8).bitwiseAND(lit(0xffL)).as("v"))): _*))
        .as("chunk"))
      .select($"doc_id", $"sig", $"chunk.c".as("c"), $"chunk.v".as("v"))
    chunks.as("a")
      .join(chunks.as("b"),
        $"a.c" === $"b.c" && $"a.v" === $"b.v" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= 6)
      .orderBy($"da", $"db")
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.4 — the synthetic
    * embeddings have no planted copies, max cos ≈ 0.51), computed in
    * double precision via the native dot-product kernel (sequential
    * fold order ⇒ the oracle's double-cast cosine is bit-identical). */
  def embeddingCosinePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorOps.dot
    val emb = Tables(s, dir, "embeddings")
      .repartition(col("vec_id"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    emb.as("a").join(broadcast(emb).as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cosine", dot($"a.v", $"b.v") / ($"a.norm" * $"b.norm"))
      .filter($"cosine" >= 0.4)
      .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"))
      .orderBy($"va", $"vb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exactDedup _),
    "dedup_ngram_jaccard" -> (ngramJaccardPairs _),
    "dedup_minhash_lsh" -> (minhashLshPairs _),
    "dedup_simhash" -> (simhashPairs _),
    "dedup_embedding_cosine" -> (embeddingCosinePairs _),
  )

  private val jaccardOracle =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
      |  FROM words),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db FROM pairs
      |JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
      |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY da, db""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle,
    // LSH with 16 bands × 2 rows has miss prob ≤ 5e-8 at s ≥ 0.8 and the
    // candidates are exactly verified, so the output equals the exact set.
    "dedup_minhash_lsh" -> jaccardOracle,
    "dedup_embedding_cosine" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(
        |  CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY va, vb""".stripMargin,
    // dedup_simhash: DuckDB recomputes the engine's bigram-FNV SimHash
    // bit-exactly (OracleSql), then checks ALL pairs at Hamming ≤ 6 —
    // a true semantic oracle that also proves the 2-of-8-chunk blocking
    // loses nothing (pigeonhole: ≤6 differing bits leave ≥2 of the 8
    // 8-bit chunks untouched).
    "dedup_simhash" -> {
      val bigramHash = OracleSql.fnv1a64("bigram")
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
         |  FROM toks WHERE len(t) >= 2),
         |bh AS (SELECT doc_id, $bigramHash AS h FROM bg),
         |votes AS (
         |  SELECT doc_id, b.b AS bit,
         |    sum(CASE WHEN (h >> CAST(b.b AS INTEGER)) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM bh, (SELECT unnest(range(64)) AS b) b
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)
         |        ELSE CAST(0 AS HUGEINT) END) AS s
         |  FROM votes GROUP BY 1),
         |sigall AS (
         |  SELECT d.doc_id, ${OracleSql.toSigned("COALESCE(sig.s, 0)")} AS s
         |  FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id)
         |SELECT a.doc_id AS da, b.doc_id AS db,
         |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         |FROM sigall a JOIN sigall b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 6
         |ORDER BY da, db""".stripMargin
    },
  )
}
