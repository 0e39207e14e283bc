package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Incremental (batch-vs-corpus) deduplication — the production shape
  * of near-dup removal for a continuously crawled training corpus: a
  * NEW batch of documents arrives and must be checked against the
  * EXISTING corpus, never corpus-vs-corpus. Each batch doc gets a
  * verdict:
  *
  *   - `exact_dup`  — identical text exists in the corpus
  *                    (match_id = smallest such corpus doc_id)
  *   - `near_dup`   — no exact copy, but some corpus doc has word-bigram
  *                    Jaccard ≥ 0.8 (match_id = smallest such doc_id)
  *   - `new`        — neither (match_id NULL); only these rows would be
  *                    appended to the corpus by the surrounding pipeline.
  *
  * Batch membership is the deterministic splitmix64 permille convention
  * shared with [[Curation.stratifiedSample]]/[[Decontaminate]]
  * (mix64(doc_id) mod 1000 &lt; 100 → batch), so the DuckDB oracle replays
  * the split bit-exactly.
  *
  * Scale design (100 TB corpus, GB-scale daily batch):
  *  - the corpus side of every join — content digests for the exact
  *    layer, MinHash band keys + shingle sets for the near layer — is
  *    exactly the state a production deployment MAINTAINS as a bucketed
  *    store, appended once per accepted batch; only the (small) batch is
  *    fingerprinted fresh. This operator derives both sides from the
  *    table so the oracle can replay it, but every join is already
  *    shaped batch-probe-into-corpus:
  *  - exact layer: equi-join on a 128-bit digest — shuffle keys are
  *    digests, map-side min on the corpus side; with a digest-bucketed
  *    corpus store the corpus side never reshuffles.
  *  - near layer: the batch's band keys join the corpus band-key table
  *    (the [[Dedup.minhashBandBuckets]] layout, 16 bands × 2 rows);
  *    candidates are O(batch × collisions), never corpus²; only
  *    candidates re-attach shingle arrays for exact verification. With
  *    s ≥ 0.8 the per-pair LSH miss probability is (1-s²)¹⁶ ≤ 5e-8, so
  *    the verified output equals the exact batch×corpus Jaccard
  *    relation — which is exactly what the oracle checks.
  *  - verdict assembly: two left joins of per-batch-doc aggregates onto
  *    the batch id list — all keyed on doc_id, broadcast-eligible
  *    because both aggregates are ≤ batch-sized.
  *
  * Docs with fewer than two words have no shingles and can only be
  * exact dups — same contract as [[Dedup]] (shingleSets drops them) and
  * mirrored in the oracle's `len(w) >= 2` guard.
  */
object Incremental {

  /** mix64(doc_id) mod 1000 < 100 → the incoming batch (10%). */
  val BATCH_PERMILLE = 100L

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bkt",
      GraftFunctions.mix64_bucket(col("doc_id"), 1000L))

  /** Driver query: dedup the 10% batch split of `documents` against the
    * 90% corpus split. Output (doc_id, verdict, match_id) per batch
    * doc, ordered by doc_id. */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._

    val docs = withBucket(
      Tables(s, dir, "documents").select($"doc_id", $"text"))
    val batchDocs = docs.filter($"bkt" < BATCH_PERMILLE)
    val corpusDocs = docs.filter($"bkt" >= BATCH_PERMILLE)

    // exact layer: batch digests probe the corpus digest table — with a
    // BLOOM PREFILTER on the batch side ([[graft.functions.Bloom]]):
    // the corpus digests fold into a 128 KB bit set (one scan, OR-merge,
    // flat in corpus size), and only batch docs whose digest MIGHT be in
    // the corpus enter the join. No false negatives by construction and
    // false positives drop in the equi-join, so the layer's output is
    // bit-equal to the unfiltered join (BloomSpec asserts it) — but at
    // 100 TB the join's batch side shrinks to true-dups + a vanishing
    // FP margin, and since most of a crawl batch is NEW, the exact
    // layer's join cost collapses to near zero.
    import graft.functions.{Bloom, GraftFunctions}
    val corpusDigests = corpusDocs
      .select(GraftFunctions.rolling_hash64($"text").as("h"),
        $"doc_id".as("cid"), $"text".as("ctext"))
    val bloomWords = corpusDigests.select($"h").as[Long]
      .select(new Bloom.BloomAgg(Bloom.M_BITS, Bloom.K).toColumn)
      .head() // bounded: M_BITS/64 longs, flat in corpus size
    val exact = batchDocs
      .select($"doc_id", $"text",
        GraftFunctions.rolling_hash64($"text").as("h"))
      .filter(Bloom.mightContainCol($"h", bloomWords))
      .join(corpusDigests, "h")
      // digest match re-verified on raw text: a rolling-hash collision
      // can never produce a wrong exact_dup verdict
      .filter($"text" === $"ctext")
      .groupBy($"doc_id")
      .agg(min($"cid").as("exact_match"))

    // near layer: batch band keys probe the corpus band-key table.
    // localCheckpoint (r20, guide §2.4 — don't recompute what you can
    // materialize once): the shingle relation feeds FOUR consumers
    // below (batch band buckets, corpus band buckets, and the two
    // verify re-joins), whose pruned subplans differ, so ReuseExchange
    // can't dedupe and the per-doc shingle map (hash+sort+dedup — the
    // dominant CPU of this operator) ran 4× per invocation. Same fix
    // ngramJaccardPairs/containmentPairs ship; the materialized
    // relation is one row per doc.
    val sets = withBucket(
      Dedup.shingleSets(s, dir).toDF("doc_id", "shingle_set"))
      .localCheckpoint()
    val batchSets = sets.filter($"bkt" < BATCH_PERMILLE)
      .select($"doc_id", $"shingle_set")
    val corpusSets = sets.filter($"bkt" >= BATCH_PERMILLE)
      .select($"doc_id", $"shingle_set")

    val candidates = Dedup.minhashBandBuckets(batchSets).as("a")
      .join(Dedup.minhashBandBuckets(corpusSets).as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key")
      .select($"a.doc_id".as("bd"), $"b.doc_id".as("cd"))
      .distinct()

    // exact Jaccard verification of candidates only (cf. Dedup.minhashLshPairs)
    val withSize = (df: DataFrame, id: String) => df.select(
      col("doc_id").as(id), col("shingle_set"),
      size(col("shingle_set")).as(s"n_$id"))
    val near = candidates
      .join(withSize(batchSets, "bd").as("za"), "bd")
      .join(withSize(corpusSets, "cd").as("zb"), "cd")
      .withColumn("inter",
        size(array_intersect($"za.shingle_set", $"zb.shingle_set")))
      .filter($"inter" / ($"n_bd" + $"n_cd" - $"inter") >=
        Dedup.JACCARD_THRESHOLD)
      .groupBy($"bd".as("doc_id"))
      .agg(min($"cd").as("near_match"))

    batchDocs.select($"doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"exact_match".isNotNull, lit("exact_dup"))
          .when($"near_match".isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        coalesce($"exact_match", $"near_match").as("match_id"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> (incrementalDedup _),
  )

  val oracles: Map[String, String] = Map(
    // Independent re-derivation: raw-text equality for the exact layer
    // (no digest — a Spark-side md5 collision would surface here) and
    // the exact batch×corpus Jaccard relation for the near layer (the
    // LSH completeness argument above makes them equal sets).
    "dedup_incremental" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 1000"
      s"""WITH d AS (SELECT doc_id, text, $bucket AS bkt FROM documents),
         |batch AS (SELECT * FROM d WHERE bkt < $BATCH_PERMILLE),
         |corpus AS (SELECT * FROM d WHERE bkt >= $BATCH_PERMILLE),
         |ex AS (SELECT b.doc_id, min(c.doc_id) AS m
         |  FROM batch b JOIN corpus c ON c.text = b.text GROUP BY 1),
         |words AS (SELECT doc_id, bkt, string_split(text, ' ') AS w FROM d
         |  WHERE len(string_split(text, ' ')) >= 2),
         |sh AS (SELECT DISTINCT doc_id, bkt,
         |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
         |  FROM words),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id bd, b.doc_id cd, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s
         |    AND a.bkt < $BATCH_PERMILLE AND b.bkt >= $BATCH_PERMILLE
         |  GROUP BY 1, 2),
         |near AS (SELECT bd AS doc_id, min(cd) AS m FROM pairs
         |  JOIN sizes sa ON bd = sa.doc_id JOIN sizes sb ON cd = sb.doc_id
         |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8 GROUP BY 1)
         |SELECT b.doc_id,
         |  CASE WHEN ex.m IS NOT NULL THEN 'exact_dup'
         |       WHEN near.m IS NOT NULL THEN 'near_dup'
         |       ELSE 'new' END AS verdict,
         |  coalesce(ex.m, near.m) AS match_id
         |FROM batch b
         |LEFT JOIN ex ON b.doc_id = ex.doc_id
         |LEFT JOIN near ON b.doc_id = near.doc_id
         |ORDER BY b.doc_id""".stripMargin
    },
  )
}
