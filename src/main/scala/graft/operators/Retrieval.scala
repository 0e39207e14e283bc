package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TopK
import graft.sources.Tables

/** Text retrieval over the document corpus — the index-side operators
  * a RAG / eval-retrieval pipeline runs at corpus scale: BM25 ranked
  * search and fixed-window chunking with overlap.
  *
  * Everything is integer-quantized so the DuckDB oracle replays every
  * score bit-exactly (the repo-wide rule: float folds are partition-
  * order-dependent, integer sums are commutative):
  *
  *  - BM25's `ln((N-df+0.5)/(df+0.5)+1)` idf is replaced by its
  *    rational surrogate `(N-df)·10^6 div (df+1)` in micro-units —
  *    monotone in the true idf (both decrease in df), so per-term
  *    ranking is order-equivalent; the log's cross-term damping is
  *    traded for exact replayability, the same quantized-fixed-point
  *    treatment as [[Graph]]'s micro-unit PageRank.
  *  - The tf saturation `tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` with
  *    k1=1.2, b=0.75 is computed in per-mille units with truncating
  *    integer division (Spark `div` == DuckDB `//`, both toward zero).
  *
  * Scale shape (100 TB corpus): tf/df/dl are one tokenize scan with
  * map-side-combined aggregation; the QUERY set is tiny and broadcast
  * (never the corpus); candidates = docs containing ≥1 query term
  * (inverted-index semantics via the broadcast hash join on `term`);
  * per-query top-k goes through the bounded [[TopK.BottomKLongAgg]]
  * (≤ k rows per query per map task cross the shuffle), not a window
  * over the candidate set.
  */
object Retrieval {

  /** BM25 k1 = K1_X10/10, b = B_X100/100. */
  val K1_X10 = 12L
  val B_X100 = 75L
  val IDF_SCALE = 1000000L
  val BM25_K = 5

  /** The fixed query workload (id, whitespace terms) — literal, like
    * [[Sketches.CMS_QUERY_KEYS]]: the operator under test is the
    * index math, not query parsing. Terms come from the synthetic
    * corpus vocabulary. */
  val BM25_QUERIES: Seq[(Long, Seq[String])] = Seq(
    (1L, Seq("spark", "join", "window")),
    (2L, Seq("customer", "order", "query")),
    (3L, Seq("hash", "table", "scan")))

  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
    // one scan feeds tf; dl derives from tf (sum of tf per doc) so the
    // corpus is tokenized exactly once
    val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // read 3× below (dl, df, candidate join)
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // corpus constants: one row each, bounded collect
    val n = docs.count()
    // INTEGER division (not a double cast): Spark's double→long cast
    // truncates but DuckDB's rounds, so avgdl must never pass through
    // a float on either side
    val avgdl = dl.agg(expr("sum(dl) div count(1)")).as[Long].head()
    val qterms = BM25_QUERIES
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("qid", "term")
    val scored = tf
      .join(broadcast(qterms), "term") // inverted-index probe
      .join(broadcast(df_.join(qterms, "term").select($"term", $"df")
        .distinct()), "term")
      .join(dl, "doc_id")
      .select($"qid", $"doc_id",
        // idf_q: rational surrogate in micro-units (see scaladoc);
        // the +1 keeps a term present in EVERY doc at a positive
        // epsilon instead of hard zero (the BM25+ lower-bound idea) so
        // tf/length still discriminate on an all-stopword query
        expr(s"(($n - df) * $IDF_SCALE) div (df + 1) + 1").as("idf_q"),
        // norm_x1000 = 1000*(1-b) + 1000*b*dl/avgdl, truncating
        expr(s"(1000 - $B_X100 * 10) + ($B_X100 * 10 * dl) div $avgdl")
          .as("norm_x1000"),
        $"tf")
      .select($"qid", $"doc_id",
        // contrib = idf_q * tf*(k1+1) / (tf + k1*norm), all x1000:
        // num = idf_q*tf*(10+k1_x10)*100, den = tf*1000 + k1_x10*norm/10
        expr(s"(idf_q * tf * (10 + $K1_X10) * 100) div " +
          s"(tf * 1000 + ($K1_X10 * norm_x1000) div 10)").as("contrib"))
      .groupBy($"qid", $"doc_id").agg(sum($"contrib").as("score_q"))
    // bounded per-query top-k: rank = -score (asc) with doc_id tiebreak
    val agg = new TopK.BottomKLongAgg(BM25_K).toColumn.name("topk")
    scored
      .select($"qid", struct((-$"score_q").as("rank"), $"doc_id".as("key"))
        .as("e"))
      .as[(Long, TopK.LEntry)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .flatMap { case (qid, es) =>
        es.zipWithIndex.map { case (e, i) =>
          (qid, (i + 1).toLong, e.key, -e.rank)
        }
      }
      .toDF("qid", "rank", "doc_id", "score_q")
      .orderBy($"qid", $"rank")
  }

  /** Chunk window / stride in characters: 200-char chunks every 150
    * chars (50-char overlap) — the RAG-ingest splitter. A doc of n
    * chars yields chunks at starts 0, 150, … ≤ n−1: short tail chunks
    * are kept (deterministic; the embedder downstream pads). */
  val CHUNK_CHARS = 200
  val CHUNK_STRIDE = 150

  /** Fixed-window chunking with overlap — row-proportional to OUTPUT
    * (≈ n_chars/stride rows per doc), one narrow codegen'd projection:
    * `posexplode(sequence(...))` then `substring`; no shuffle at all.
    * At 100 TB this is the embarrassingly-parallel shape: each input
    * split chunks independently; the output partitioning inherits the
    * scan's. */
  def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", $"text",
        posexplode(sequence(lit(0),
          greatest(length($"text") - 1, lit(0)), lit(CHUNK_STRIDE))))
      .select($"doc_id", $"pos".cast("long").as("chunk_id"),
        $"col".cast("long").as("start"),
        expr(s"substring(text, col + 1, $CHUNK_CHARS)").as("chunk"))
      .withColumn("chunk_len", length($"chunk").cast("long"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Minimum chunk length that is worth embedding: short overlap
    * tails are dropped before dedup. */
  val RAG_MIN_CHARS = 80

  /** The RAG-ingest pipeline as ONE composite operator — what a
    * retrieval corpus build actually runs, end to end: chunk with
    * overlap ([[CHUNK_CHARS]]/[[CHUNK_STRIDE]]), gate out sub-
    * [[RAG_MIN_CHARS]] tails, dedup chunks EXACTLY by rolling-hash
    * fingerprint (identical boilerplate chunks must embed once, not
    * once per document — keeper = smallest (doc_id, chunk_id); the
    * near-dup complement is the [[Dedup]] minhash family), and report
    * the per-language index manifest (candidates, kept, kept chars —
    * the numbers that size the embedding job downstream).
    *
    * Scale shape: chunk+gate+fingerprint is one narrow codegen'd pass
    * (the fingerprint is the native rolling-hash expression); the
    * dedup is one shuffle keyed on the 64-bit fingerprint with a
    * map-side-combinable `min(struct(...))` keeper — the same argmin
    * aggregation as the snapshot read, never a window; the manifest
    * aggregates are map-side combined. Nothing is collected. */
  def ragIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gated = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", $"text",
        posexplode(sequence(lit(0),
          greatest(length($"text") - 1, lit(0)), lit(CHUNK_STRIDE))))
      .select($"doc_id", $"lang", $"pos".cast("long").as("chunk_id"),
        expr(s"substring(text, col + 1, $CHUNK_CHARS)").as("chunk"))
      .withColumn("chunk_len", length($"chunk").cast("long"))
      .filter($"chunk_len" >= RAG_MIN_CHARS)
      .withColumn("fp",
        graft.functions.GraftFunctions.rolling_hash64($"chunk"))
    val keepers = gated
      .groupBy($"fp")
      .agg(min(struct($"doc_id", $"chunk_id", $"lang", $"chunk_len"))
        .as("m"))
      .select($"m.lang".as("lang"), $"m.chunk_len".as("chunk_len"))
    val candidates = gated.groupBy($"lang")
      .agg(count(lit(1)).as("n_candidates"))
    keepers.groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), sum($"chunk_len").as("kept_chars"))
      .join(candidates, "lang")
      .select($"lang", $"n_candidates", $"n_kept", $"kept_chars")
      .orderBy($"lang")
  }

  /** Doc-doc similarity shingle width / boilerplate df cap / top-k. */
  val SIM_SHINGLE_W = 5
  val SIM_DF_CAP = 100L
  val SIM_K = 5

  /** Sparse document-to-document similarity search: for every
    * document, its [[SIM_K]] most similar peers ranked by the
    * idf-weighted count of shared [[SIM_SHINGLE_W]]-word shingles —
    * the inverted-index AllPairs shape (Bayardo et al. 2007), the
    * ranked complement of the thresholded [[Dedup]] family. The idf
    * weight is the integer-log2 bit count `bits(N div df)` (same
    * quantization as the surprisal family), squared per shared
    * shingle (binary-tf vectors: the product of the two idf weights),
    * so every score is a partition-independent Long the oracle
    * replays bit-exactly.
    *
    * Scale shape (100 TB): join volume is Σ_shingle df², kept sparse
    * by construction — shingles with df = 1 can't contribute and are
    * pruned BEFORE the pair join, shingles with df > [[SIM_DF_CAP]]
    * are boilerplate (near-zero idf, quadratic pair cost) and dropped
    * like AllPairs' stop-term prefix filter (documented loss). The
    * per-doc top-k goes through the bounded [[TopK.BottomKLongAgg]]
    * (≤ k rows per doc per map task cross the shuffle), never a
    * window over the pair set. */
  def docSimilarity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables(s, dir, "documents").count()
    val grams = Decontaminate.gramSets(s, dir, SIM_SHINGLE_W)
      .toDF("doc_id", "grams")
      .select($"doc_id", explode($"grams").as("g"))
      .localCheckpoint() // read twice (df census, both pair-join sides)
    val wt = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2 && $"df" <= SIM_DF_CAP)
      .select($"g", expr(s"CAST(length(conv($n div df, 10, 2)) * " +
        s"length(conv($n div df, 10, 2)) AS BIGINT)").as("w2"))
    val pairs = grams.join(wt, "g")
      .select($"g", $"doc_id".as("a"), $"w2")
      .join(grams.select($"g", $"doc_id".as("b")), "g")
      .filter($"a" =!= $"b")
      .groupBy($"a", $"b").agg(sum($"w2").as("dot_q"))
    val agg = new TopK.BottomKLongAgg(SIM_K).toColumn.name("topk")
    pairs
      .select($"a", struct((-$"dot_q").as("rank"), $"b".as("key")).as("e"))
      .as[(Long, TopK.LEntry)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .flatMap { case (a, es) =>
        es.zipWithIndex.map { case (e, i) =>
          (a, (i + 1).toLong, e.key, -e.rank)
        }
      }
      .toDF("doc_id", "rank", "nbr_id", "dot_q")
      .orderBy($"doc_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25_topk" -> (bm25TopK _),
    "text_chunk_overlap" -> (chunkOverlap _),
    "text_doc_similarity" -> (docSimilarity _),
    "pipeline_rag_index" -> (ragIndex _))

  val oracles: Map[String, String] = Map(
    // full replay on the raw shingle STRINGS (no hash — collisions
    // would mismatch): same df gates, same integer-log2 idf bits,
    // same (dot DESC, nbr ASC) ranking via row_number
    "text_doc_similarity" ->
      s"""WITH words AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |grams AS (SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(w) - ${SIM_SHINGLE_W - 2}),
         |      i -> array_to_string(w[i:i+${SIM_SHINGLE_W - 1}], ' '))) AS g
         |  FROM words WHERE len(w) >= $SIM_SHINGLE_W),
         |nn AS (SELECT count(*) AS n FROM documents),
         |c AS (SELECT g, count(*) AS df FROM grams GROUP BY 1),
         |wt AS (SELECT g,
         |    CAST(length(bin(n // df)) * length(bin(n // df)) AS BIGINT)
         |      AS w2
         |  FROM c, nn WHERE df >= 2 AND df <= $SIM_DF_CAP),
         |p AS (SELECT ga.doc_id AS doc_id, gb.doc_id AS nbr_id,
         |    CAST(sum(w2) AS BIGINT) AS dot_q
         |  FROM grams ga JOIN wt USING (g) JOIN grams gb USING (g)
         |  WHERE ga.doc_id <> gb.doc_id GROUP BY 1, 2),
         |r AS (SELECT doc_id, nbr_id, dot_q,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY dot_q DESC, nbr_id) AS rank
         |  FROM p)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, nbr_id, dot_q
         |FROM r WHERE rank <= $SIM_K ORDER BY doc_id, rank""".stripMargin,
    // full BM25 replay: same integer idf surrogate / per-mille
    // saturation / truncating division; top-k via row_number (the
    // oracle can afford the window; the engine side uses the bounded
    // aggregator)
    "text_bm25_topk" -> {
      val qvals = BM25_QUERIES
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
        .mkString(", ")
      s"""WITH q(qid, term) AS (VALUES $qvals),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |        FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |c AS (SELECT count(*) AS n FROM documents),
         |ad AS (SELECT sum(dl) // count(*) AS avgdl FROM dl),
         |scored AS (
         |  SELECT q.qid, tf.doc_id,
         |    sum(((((c.n - df.df) * $IDF_SCALE) // (df.df + 1) + 1)
         |      * tf.tf * (10 + $K1_X10) * 100)
         |     // (tf.tf * 1000 + ($K1_X10 *
         |        ((1000 - $B_X100 * 10) + ($B_X100 * 10 * dl.dl) // ad.avgdl))
         |        // 10)) AS score_q
         |  FROM tf JOIN q USING (term) JOIN df USING (term)
         |    JOIN dl ON tf.doc_id = dl.doc_id, c, ad
         |  GROUP BY 1, 2),
         |ranked AS (SELECT qid, doc_id, score_q,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score_q DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
         |  doc_id, CAST(score_q AS BIGINT) AS score_q
         |FROM ranked WHERE rank <= $BM25_K
         |ORDER BY qid, rank""".stripMargin
    },
    // full pipeline replay: same chunking lateral, same gate, the
    // rolling-hash fingerprint recomputed from first principles
    // (OracleSql HUGEINT arithmetic), keeper via row_number on
    // (doc_id, chunk_id)
    "pipeline_rag_index" -> {
      val fp = OracleSql.rollingHash("chunk")
      s"""WITH ch AS (
         |  SELECT doc_id, lang, i AS chunk_id,
         |    substr(text, CAST(i * $CHUNK_STRIDE + 1 AS BIGINT),
         |      $CHUNK_CHARS) AS chunk
         |  FROM documents,
         |    LATERAL (SELECT unnest(range(0,
         |      (greatest(length(text) - 1, 0)) // $CHUNK_STRIDE + 1))
         |      AS i)),
         |g AS (SELECT doc_id, lang, chunk_id, chunk,
         |    CAST(length(chunk) AS BIGINT) AS chunk_len
         |  FROM ch WHERE length(chunk) >= $RAG_MIN_CHARS),
         |f AS (SELECT doc_id, lang, chunk_id, chunk_len, $fp AS fp
         |      FROM g),
         |k AS (SELECT lang, chunk_len,
         |    row_number() OVER (PARTITION BY fp
         |      ORDER BY doc_id, chunk_id) AS rn
         |  FROM f),
         |kept AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |    CAST(sum(chunk_len) AS BIGINT) AS kept_chars
         |  FROM k WHERE rn = 1 GROUP BY lang),
         |cand AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM g GROUP BY lang)
         |SELECT lang, n_candidates, n_kept, kept_chars
         |FROM kept JOIN cand USING (lang)
         |ORDER BY lang""".stripMargin
    },
    "text_chunk_overlap" ->
      s"""SELECT doc_id,
         |  CAST(i AS BIGINT) AS chunk_id,
         |  CAST(i * $CHUNK_STRIDE AS BIGINT) AS start,
         |  substr(text, i * $CHUNK_STRIDE + 1, $CHUNK_CHARS) AS chunk,
         |  CAST(length(substr(text, i * $CHUNK_STRIDE + 1, $CHUNK_CHARS))
         |    AS BIGINT) AS chunk_len
         |FROM documents,
         |  LATERAL (SELECT unnest(range(0,
         |    (greatest(length(text) - 1, 0)) // $CHUNK_STRIDE + 1)) AS i)
         |ORDER BY doc_id, chunk_id""".stripMargin)
}
