package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The end-to-end training-data curation pipeline, composed from the
  * individual operators: quality-score filter → near-dup removal (keep
  * the lowest doc_id of each Jaccard ≥ 0.8 pair) → per-doc token stats.
  * One narrow scan + an anti-join against the dup-loser id set — the
  * shape this pipeline keeps at 100 TB, with the loser set coming from
  * the LSH path instead of the exact one. The loser side carries no
  * broadcast hint: its cardinality is O(duplicates), which a
  * duplicate-heavy crawl makes corpus-sized — AQE broadcasts when the
  * measured size is small and shuffles when it isn't.
  */
object Curation {

  /** The composite quality score over a `text` column (alpha ratio /
    * stopword ratio / mean-word-length blend) — shared by
    * [[curatedDocs]] and [[dataFunnel]] so the gate cannot drift
    * between the two pipelines. Pure columnar arithmetic: stays in
    * whole-stage codegen. */
  private[operators] def qualityOf(
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val words = split(text, " ")
    val alphaRatio =
      length(regexp_replace(text, "[^a-z]", "")) / length(text)
    val stopRatio = size(filter(words, w => w.isInCollection(Seq(
      "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as")))) / size(words)
    val meanWordLen = (length(text) - size(words) + 1) / size(words)
    alphaRatio * 0.5d + stopRatio * 0.3d +
      (lit(1.0d) / (meanWordLen + 1.0d)) * 0.2d
  }

  def curatedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quality = qualityOf($"text")

    // losers: the higher doc_id of every near-dup pair, via the
    // MinHash+LSH scale path (verified identical to the exact pair set
    // at this threshold — both share the same oracle in Dedup)
    val losers = Dedup.minhashLshPairs(s, dir).select($"db".as("loser"))

    Tables(s, dir, "documents")
      .withColumn("quality", quality)
      .filter($"quality" >= 0.46)
      .join(losers, $"doc_id" === $"loser", "left_anti")
      .select(
        $"doc_id",
        size(split($"text", " ")).cast("long").as("ws_tokens"),
        round($"quality", 4).as("quality"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sampling — the per-stratum downsampling
    * pass a training mix runs before blending sources (keep 50% of
    * images, 25% of audio, 10% of video here; strata from the same
    * doc_id%3 modality convention as [[Multimodal.binaryPayloads]]).
    * Membership = splitmix64(doc_id) mod 1000 < stratum permille: a
    * pure narrow filter — no shuffle at scale (the conditional
    * [[Tables.repartitionForCpu]] fix-up fires only on
    * under-partitioned scans), no join, no RNG state —
    * reproducible run to run and machine to machine, which is what
    * makes a 100 TB sample auditable; the oracle recomputes the
    * hash bit-exactly (OracleSql HUGEINT splitmix64). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    // fully columnar: the membership predicate is the native
    // mix64_bucket expression, so the whole operator is one codegen'd
    // scan+filter — no typed closure, no DeserializeToObject
    // (PlanSpec pins this)
    val m = pmod($"doc_id", lit(3L))
    Tables(s, dir, "documents").select($"doc_id")
      .transform(Tables.repartitionForCpu(_, col("doc_id")))
      .select(
        $"doc_id",
        when(m === 0, "image").when(m === 1, "audio").otherwise("video")
          .as("modality"),
        GraftFunctions.mix64_bucket($"doc_id", 1000L).as("bucket"))
      .withColumn("permille",
        when($"modality" === "image", 500L)
          .when($"modality" === "audio", 250L).otherwise(100L))
      .filter($"bucket" < $"permille")
      .select($"doc_id", $"modality", $"bucket")
      .orderBy($"doc_id")
  }

  /** Context-window budget for [[packSequences]] — the GPT-style
    * concat-and-chunk length. */
  val PACK_BUDGET = 2048L

  /** Sequence packing — the pass that turns curated documents into
    * fixed-length training chunks: documents are concatenated in
    * (source, doc_id) order and cut every [[PACK_BUDGET]] tokens, so a
    * document may straddle a chunk boundary (the standard GPT packing,
    * vs bin-packing whose greedy remainder-reset is inherently
    * sequential and does not distribute). Each source is an independent
    * packing stream: one shuffle on `source`, then a running-sum window
    * per stream — at 100 TB the streams are the unit of parallelism
    * (a real mix has thousands of sources/shards, not one global
    * order). Emits per-document chunk spans; the chunks themselves are
    * a slice-and-explode away and carry no extra shuffle. */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("end_tok", sum($"n_tok").over(w))
      .select(
        $"doc_id", $"source", $"n_tok",
        ($"end_tok" - $"n_tok").as("start_tok"),
        floor(($"end_tok" - $"n_tok") / lit(PACK_BUDGET))
          .cast("long").as("pack_first"),
        floor(($"end_tok" - 1) / lit(PACK_BUDGET))
          .cast("long").as("pack_last"))
      .orderBy($"source", $"doc_id")
  }

  /** Best-fit-decreasing sequence packing — the BOUNDARY-RESPECTING
    * alternative to [[packSequences]]' concat-and-chunk (r17 verdict
    * #4): no document ever straddles an example boundary; instead,
    * documents bin-pack into [[PACK_BUDGET]]-token examples by
    * deterministic first-fit-decreasing (n_tok DESC, doc_id ASC; first
    * open bin that fits, else a new bin — a doc larger than the budget
    * naturally lands alone in its own oversized bin). The output is
    * ONE relation carrying both the exact FFD placement (source,
    * doc_id → bin_id) and the per-source waste/crossing tradeoff
    * against the concat strategy: FFD pays `ffd_waste_tok` padding
    * tokens and zero crossings, concat pays `concat_crossings` split
    * documents and only end-of-stream waste.
    *
    * Scale shape: FFD is inherently sequential WITHIN a packing
    * stream, so the stream is the unit of parallelism — one shuffle
    * on `source` (groupByKey), then a per-group JVM pass over
    * (doc_id, n_tok) pairs, 16 bytes/doc: a 10M-doc source shard
    * holds ~160 MB, and a production run packs per (source, shard)
    * exactly as [[packSequences]] argues. Both strategies' metrics
    * come from the SAME group pass, so the comparison adds no second
    * shuffle (PlanSpec pins the one-shuffle shape). All arithmetic is
    * integer; the oracle replays the FFD loop exactly as a recursive
    * CTE with the same (n_tok DESC, doc_id) order and first-fit
    * index. */
  def packBestFit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .as[(String, Long, Long)]
    docs.groupByKey(_._1).flatMapGroups { (src, it) =>
      val ds = it.map(t => (t._2, t._3)).toArray
      // FFD placement: n_tok DESC, doc_id ASC — deterministic
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      val bin = scala.collection.mutable.LongMap.empty[Long]
      ds.sortBy { case (id, n) => (-n, id) }.foreach { case (id, n) =>
        var i = 0
        var found = -1
        while (found < 0 && i < fills.length) {
          if (fills(i) + n <= PACK_BUDGET) found = i
          i += 1
        }
        if (found >= 0) { fills(found) += n; bin(id) = found.toLong }
        else { fills += n; bin(id) = (fills.length - 1).toLong }
      }
      val ffdBins = fills.length.toLong
      val ffdWaste = fills.iterator.map(f => math.max(0L, PACK_BUDGET - f)).sum
      val oversize = ds.count(_._2 > PACK_BUDGET).toLong
      // concat-and-chunk replay in doc_id order (packSequences' cut)
      val idOrder = ds.sortBy(_._1)
      val total = ds.iterator.map(_._2).sum
      val chunks = (total + PACK_BUDGET - 1) / PACK_BUDGET
      val concatWaste = chunks * PACK_BUDGET - total
      var running = 0L
      val spans = idOrder.map { case (id, n) =>
        val start = running
        running += n
        (id, n, start / PACK_BUDGET, (running - 1) / PACK_BUDGET)
      }
      val crossings = spans.count(sp => sp._3 != sp._4).toLong
      spans.iterator.map { case (id, n, first, last) =>
        (src, id, n, bin(id), first, last,
          ffdBins, ffdWaste, oversize, chunks, concatWaste, crossings)
      }
    }.toDF("source", "doc_id", "n_tok", "bin_id",
      "concat_first", "concat_last", "ffd_bins", "ffd_waste_tok",
      "oversize_docs", "concat_chunks", "concat_waste_tok",
      "concat_crossings")
      .orderBy($"source", $"doc_id")
  }

  /** Per-source token budget for [[tokenBudgetSample]]. */
  val TOKEN_BUDGET = 500L

  /** Token-budget mixing — the data-mixing stage that downsamples each
    * source toward a target token budget (the knob DoReMi-style mix
    * weights turn): per-source token totals (a SOURCES-row aggregate)
    * set a keep-permille `min(1000, 1000·B div total)` in exact
    * integer math, membership is the same splitmix64(doc_id) permille
    * filter as [[stratifiedSample]] — deterministic, auditable,
    * machine-independent. Scale shape: one map-side-combined agg down
    * to |sources| rows, joined back (no hint — AQE broadcasts the
    * tiny aggregate), then a narrow filter; the corpus never shuffles
    * at scale (only the conditional under-partitioned-scan fix-up).
    * Oversampling guarantee is statistical (≈B per source), which is
    * how production mixes work — exact-count would need a global sort. */
  def tokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
    val totals = docs.groupBy($"source").agg(sum($"n_tok").as("total"))
    docs.join(totals, "source")
      .withColumn("permille",
        expr(s"least(CAST(1000 AS BIGINT), (1000 * $TOKEN_BUDGET) div total)"))
      // columnar membership via the native mix64_bucket expression —
      // same unsigned-remainder semantics as the former typed closure
      .filter(graft.functions.GraftFunctions
        .mix64_bucket($"doc_id", 1000L) < $"permille")
      .select($"doc_id", $"source", $"n_tok", $"permille")
      .orderBy($"doc_id")
  }

  /** Temperature-flattened source mixing (α = 0.5) — the multi-source
    * rebalancing pass a multilingual/multi-domain training mix runs so
    * large sources do not drown small ones (the GPT-3/PaLM-style
    * `p_s ∝ n_s^α` reweighting): every source is downsampled at rate
    * `sqrt(n_min / n_s)`, so EXPECTED kept counts are `sqrt(n_min·n_s)`
    * ∝ `n_s^0.5` — the α = 0.5 temperature curve, with the smallest
    * source kept whole. Formulated against `n_min` rather than the
    * textbook `Σ n_t^α` normalizer deliberately: the only float work is
    * `sqrt` of a ratio of two EXACT integers (both correctly-rounded
    * IEEE in Spark and DuckDB), while a global Σ of doubles would be
    * addition-order-sensitive and break the bit-exact oracle.
    *
    * Scale shape: one map-side-combined count per source (B rows), a
    * one-row min aggregate, both broadcast back onto a columnar
    * scan+filter whose membership test is the native splitmix64
    * permille expression — deterministic, machine-independent, no
    * per-row RNG state, no shuffle of the corpus itself. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    temperatureMixOn(Tables(s, dir, "documents").select($"doc_id", $"source"))
  }

  /** Core of [[temperatureMix]] over any (doc_id, source) frame —
    * exposed so specs can run it on SKEWED source distributions (the
    * driver test corpus ships perfectly balanced sources, where the
    * α-curve keeps everything). */
  private[graft] def temperatureMixOn(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import graft.functions.GraftFunctions
    val totals = docs.groupBy($"source").agg(count(lit(1)).as("n_source"))
    val minN = totals.agg(min($"n_source").as("n_min"))
    docs.join(broadcast(totals), "source")
      .crossJoin(broadcast(minN)) // one row: the global minimum
      .withColumn("permille",
        least(lit(1000L),
          floor(lit(1000.0) *
            sqrt($"n_min".cast("double") / $"n_source".cast("double")))
            .cast("long")))
      .filter(GraftFunctions.mix64_bucket($"doc_id", 1000L) < $"permille")
      .select($"doc_id", $"source", $"n_source", $"permille")
      .orderBy($"doc_id")
  }

  /** Per-source sample size for [[fixedKSample]]. */
  val FIXED_K = 10
  val WEIGHTED_K = 25

  /** Exact-k deterministic sampling — keep exactly the k documents per
    * source with the SMALLEST splitmix64(doc_id) (fewer if the source
    * is smaller): the companion to [[stratifiedSample]]'s
    * statistically-sized permille filter when a mix recipe demands
    * exact counts ("exactly 10k docs from each source"). Hash-ranked,
    * so the choice is reproducible, machine-independent, and stable
    * under data REORDERING — only adding/removing docs changes it.
    *
    * Scale shape: ranking by a 64-bit hash cannot ride a
    * `row_number()` window (that sorts every row of every source on
    * one exchange); it rides the bounded [[TopK.BottomKLongAgg]]
    * buffer — map-side partial combine ships ≤ k entries per source
    * per task, shuffle volume O(k·sources), independent of corpus
    * size. Rank order is UNSIGNED hash order (sign bit flipped before
    * ranking) so the DuckDB oracle's HUGEINT ordering replays it
    * bit-exactly. */
  def fixedKSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{GraftFunctions, TopK}
    val bottomk = new TopK.BottomKLongAgg(FIXED_K).toColumn.name("picks")
    Tables(s, dir, "documents")
      .select($"source", $"doc_id",
        GraftFunctions.mix64($"doc_id")
          .bitwiseXOR(lit(Long.MinValue)).as("rank"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => TopK.LEntry(r._3, r._2))
      .agg(bottomk)
      .flatMap { case (src, picks) =>
        picks.iterator.zipWithIndex.map { case (e, i) =>
          (src, e.key, (i + 1).toLong)
        }
      }
      .toDF("source", "doc_id", "rn")
      .orderBy($"source", $"doc_id")
  }

  /** WEIGHTED sampling — k docs per source with inclusion biased
    * toward weight (length in chars, the "sample ∝ token count"
    * curation primitive): Duffield–Lund–Thorup PRIORITY SAMPLING with
    * the uniform draw derandomized to `mix64(doc_id)`. Each doc's
    * priority is `u ÷ w` (unsigned; smaller wins — the integer form
    * of ranking by w/u descending), so doubling a doc's weight halves
    * its priority; the k smallest priorities per source win. Same
    * reproducibility contract as [[fixedKSample]] (stable under
    * reordering, machine-independent) and the same bounded-aggregator
    * scale shape: ≤ k entries per source per map task, never a
    * corpus-wide window sort. The oracle replays `u // w` in HUGEINT
    * and ranks identically. */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{TextHashes, TopK}
    val bottomk = new TopK.BottomKLongAgg(WEIGHTED_K).toColumn.name("picks")
    Tables(s, dir, "documents")
      .select($"source", $"doc_id", greatest($"n_chars", lit(1L)).as("w"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, id, w) =>
        // sign bit flipped: signed order == unsigned priority order
        TopK.LEntry(
          java.lang.Long.divideUnsigned(TextHashes.mix64(id), w)
            ^ Long.MinValue,
          id)
      }
      .agg(bottomk)
      .flatMap { case (src, picks) =>
        picks.iterator.zipWithIndex.map { case (e, i) =>
          (src, e.key, (i + 1).toLong)
        }
      }
      .toDF("source", "doc_id", "rn")
      .orderBy($"source", $"doc_id")
  }

  /** Quality-aware dedup keeper selection — the pipeline stage between
    * near-dup clustering and the training set: instead of keeping the
    * minimum doc_id per cluster ([[Dedup.nearDupClusters]]'s
    * placeholder policy), keep the HIGHEST-QUALITY member (Dolma/
    * RefinedWeb keep longest-or-best; the quality signal here is
    * [[TextAnalysis.qualityScore]]'s blend). Composition of two
    * already-oracle-checked operators: clusters ⋈ quality →
    * `max(struct(quality, −doc_id))` per cluster — lexicographic
    * struct max gives argmax-with-deterministic-tiebreak (quality
    * desc, doc_id asc) in one map-side-combinable aggregate, no
    * window. */
  def dedupKeeper(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clusters = Dedup.nearDupClusters(s, dir)
      .select($"doc_id", $"cluster_id")
    val quality = TextAnalysis.qualityScore(s, dir)
      .select($"doc_id", $"quality")
    clusters.join(quality, "doc_id")
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct($"quality", (-$"doc_id").as("neg_id"))).as("best"))
      .select($"cluster_id",
        (-$"best.neg_id").as("keeper_id"),
        $"n_members",
        $"best.quality".as("keeper_quality"))
      .orderBy($"cluster_id")
  }

  /** Per-source keep quotas (permille of the source's docs) for
    * [[qualityQuota]]: even-numbered sources 400‰, odd 200‰. */
  val QUOTA_EVEN_PM = 400L
  val QUOTA_ODD_PM = 200L

  /** Quality-quota selection — fill a per-source keep quota with the
    * BEST documents (the "mix to a target distribution, quality-first"
    * curation step): docs rank within their source by an exact
    * integer quality score (stopword-hit permille — the
    * [[TextAnalysis]] lexicon), the quota is a per-source permille of
    * its doc count, and the report gives each source's cut line:
    * threshold score, the doc sitting on it, and kept/total token
    * sums. One corpus window (source-partitioned rank under the total
    * order (score DESC, doc_id)) + one aggregate. At 100 TB the rank
    * window becomes the [[operators.Relational]] q45-style
    * distributed rank selection (find the threshold without a global
    * per-source sort); the summary shape and oracle are unchanged —
    * documented trade, same as q29. */
  def qualityQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = split($"text", " ")
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"source", size(words).cast("long").as("n_tok"),
        (size(filter(words,
          w => w.isInCollection(TextAnalysis.STOPWORDS))) * 1000)
          .cast("long").as("hits1k"))
      .select($"doc_id", $"source", $"n_tok",
        expr("hits1k div n_tok").as("score"),
        // srcN convention: parity of the numeric suffix picks the
        // quota. Spark's cast returns null on non-srcN names and
        // null % 2 === 0 is null → ODD quota; the oracle mirrors with
        // TRY_CAST so both engines take the same fallback (r14 advice)
        when(expr("CAST(substring(source, 4, 10) AS BIGINT)") % 2 === 0,
          QUOTA_EVEN_PM).otherwise(QUOTA_ODD_PM).as("quota_pm"))
    val w = Window.partitionBy($"source")
      .orderBy($"score".desc, $"doc_id")
    docs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("quota", expr("n * quota_pm div 1000"))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"), max($"quota").as("quota"),
        max(when($"rn" === $"quota", $"score")).as("thr_score"),
        max(when($"rn" === $"quota", $"doc_id")).as("thr_doc"),
        sum(when($"rn" <= $"quota", $"n_tok").otherwise(0L))
          .as("kept_tokens"),
        sum($"n_tok").as("total_tokens"))
      .orderBy($"source")
  }

  /** Shard count for [[globalShuffle]]. */
  val SHUFFLE_SHARDS = 8L

  /** Deterministic global shuffle — reproducible training-data
    * ordering: every doc gets a shard (splitmix64 bucket) and a
    * position within its shard (rank under the unsigned-mix64 order,
    * doc_id tiebreak), so any worker can reconstruct exactly which
    * examples land in which shard at which offset — no RNG state, no
    * coordination, re-runnable after a crash (the property
    * torch-style data loaders get from seeded epoch permutations,
    * here as a pure function of the key). Physically this IS the
    * write path: one hash-partition exchange on the shard + an
    * in-shard sort, exactly what writing the shuffled shards to disk
    * costs anyway. */
  def globalShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select($"doc_id",
        GraftFunctions.mix64_bucket($"doc_id", SHUFFLE_SHARDS)
          .as("shard"),
        GraftFunctions.mix64($"doc_id")
          .bitwiseXOR(lit(Long.MinValue)).as("hu"))
    docs.select($"doc_id", $"shard",
      row_number().over(
        Window.partitionBy($"shard").orderBy($"hu", $"doc_id"))
        .cast("long").as("pos"))
      .orderBy($"doc_id")
  }

  /** Dataset card — the per-source summary table a released training
    * set ships with, composed from the suite's audited primitives in
    * ONE report: volume (docs, whitespace tokens), language spread,
    * exact-duplicate share (corpus-wide, by raw text — the oracle
    * re-derives it by grouping the text itself), median quality
    * (stopword permille, the q29 rank-selection shape) and code share
    * (the `text_code_detect` routing rule). One corpus scan + one
    * corpus-wide text dedup aggregate + one per-source rank window;
    * the output is |sources| rows at any corpus size. Every metric is
    * exact-integer. */
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = split($"text", " ")
    val base = Tables(s, dir, "documents")
      .select($"doc_id", $"source", $"lang", $"text",
        size(words).cast("long").as("n_tok"),
        (size(filter(words,
          w => w.isInCollection(TextAnalysis.STOPWORDS))) * 1000)
          .cast("long").as("hits1k"),
        length(regexp_replace($"text", "[^{}()=;\\[\\]<>]", ""))
          .cast("long").as("n_sym"),
        size(filter(words, w =>
          w.isInCollection(TextAnalysis.CODE_KEYWORDS)))
          .cast("long").as("kw_hits"))
      .select($"doc_id", $"source", $"lang", $"text", $"n_tok",
        expr("hits1k div n_tok").as("score"),
        (expr("n_sym * 1000 div length(text)") >= 50L ||
          $"kw_hits" >= 3L).as("is_code"))
    val dupTexts = base.groupBy($"text")
      .agg(count(lit(1)).as("tc"))
      .filter($"tc" >= 2L)
      .select($"text", lit(1L).as("is_dup"))
    val w = Window.partitionBy($"source").orderBy($"score", $"doc_id")
    base.join(dupTexts, Seq("text"), "left")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy($"source")))
      .groupBy($"source")
      .agg(max($"n").as("n_docs"),
        sum($"n_tok").as("total_tokens"),
        countDistinct($"lang").as("n_langs"),
        expr("sum(coalesce(is_dup, 0)) * 1000 div max(n)")
          .as("dup_pm"),
        max(when($"rn" === ceil($"n" * 0.5), $"score"))
          .as("p50_quality_pm"),
        expr("sum(CASE WHEN is_code THEN 1 ELSE 0 END) * 1000 " +
          "div max(n)").as("code_pm"))
      .orderBy($"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dataset_card" -> (datasetCard _),
    "sample_global_shuffle" -> (globalShuffle _),
    "sample_quality_quota" -> (qualityQuota _),
    "pipeline_dedup_keeper" -> (dedupKeeper _),
    "pipeline_curation" -> (curatedDocs _),
    "sample_stratified" -> (stratifiedSample _),
    "sample_fixed_k" -> (fixedKSample _),
    "sample_weighted" -> (weightedSample _),
    "pack_sequences" -> (packSequences _),
    "pack_best_fit" -> (packBestFit _),
    "sample_token_budget" -> (tokenBudgetSample _),
    "sample_temperature_mix" -> (temperatureMix _),
    "sample_split_assign" -> (splitAssign _),
    "sample_coreset_fps" -> (coresetFps _),
    "sample_dsir_weights" -> (dsirWeights _),
    "pipeline_data_funnel" -> (dataFunnel _),
    "pipeline_mix_epochs" -> (mixEpochs _),
  )

  /** Per-source token target for [[mixEpochs]]. */
  val EPOCH_BUDGET = 2000L

  /** Epoch-aware source mixing — the UPsampling complement to
    * [[tokenBudgetSample]]'s downsampling: a source smaller than the
    * per-source token budget is repeated for `budget div total` full
    * epochs, and the remainder is filled by a partial epoch whose
    * membership is the same deterministic splitmix64 permille filter
    * (`permille = 1000·rem div total`) — the "epochs over small
    * high-quality sources" knob every published pretraining mix turns
    * (e.g. multiple Wikipedia epochs per web epoch). Output is the
    * per-source mixing manifest: full epochs, partial permille, docs
    * and tokens selected for the partial epoch, and the resulting
    * token estimate — all exact integer arithmetic.
    *
    * Scale shape: one map-side-combined aggregate to |sources| rows,
    * joined back without a hint (AQE broadcasts the tiny totals), then
    * one conditional aggregate — the corpus itself never shuffles. */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
    val totals = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("total_toks"))
      .withColumn("epochs_full", expr(s"$EPOCH_BUDGET div total_toks"))
      .withColumn("permille", expr(
        s"(1000 * ($EPOCH_BUDGET - epochs_full * total_toks))" +
          " div total_toks"))
    docs.join(totals, "source")
      .withColumn("in_partial", graft.functions.GraftFunctions
        .mix64_bucket($"doc_id", 1000L) < $"permille")
      .groupBy($"source", $"n_docs", $"total_toks", $"epochs_full",
        $"permille")
      .agg(
        sum(when($"in_partial", 1L).otherwise(0L)).as("n_partial_docs"),
        sum(when($"in_partial", $"n_tok").otherwise(0L))
          .as("partial_toks"))
      .select($"source", $"n_docs", $"total_toks", $"epochs_full",
        $"permille", $"n_partial_docs",
        ($"epochs_full" * $"total_toks" + $"partial_toks")
          .as("est_tokens"))
      .orderBy($"source")
  }

  /** The pretraining DATA FUNNEL report — the stage-by-stage survival
    * manifest a corpus build publishes before training: cumulative
    * doc / whitespace-token counts after each gate of the standard
    * pipeline (Rae et al. 2021 §A; RefinedWeb table 2 shape):
    *
    *   00_all          → every document
    *   10_quality      → [[qualityOf]] ≥ 0.46
    *   20_lang         → + lang = 'en'
    *   30_exact_dedup  → + md5 keeper (min doc_id per digest, among
    *                     stage-20 survivors — dedup what's left)
    *   40_decontam     → + in the training split (bucket ≥ 100) AND
    *                     sharing no 13-gram with the benchmark fixture
    *                     ([[Decontaminate]]'s convention verbatim)
    *
    * Scale shape: quality/lang are narrow codegen'd flags on ONE scan;
    * the keeper set is one digest-keyed aggregation + one digest-keyed
    * join; contamination reuses the broadcast-benchmark semi-join (the
    * corpus never shuffles for it); the report itself is ONE
    * conditional aggregate producing a single row, stacked to the
    * 5-stage output — bounded regardless of corpus size. */
  def dataFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    val base = Tables(s, dir, "documents")
      .select($"doc_id", $"text", $"lang")
      .withColumn("toks", size(split($"text", " ")).cast("long"))
      .withColumn("q_ok", qualityOf($"text") >= 0.46)
      .withColumn("l_ok", $"lang" === "en")
      .withColumn("h", md5($"text"))
    val keepers = base.filter($"q_ok" && $"l_ok")
      .groupBy($"h").agg(min($"doc_id").as("keeper_id"))
    val grams = Decontaminate.gramSets(s, dir).toDF("doc_id", "grams")
      .withColumn("bucket",
        GraftFunctions.mix64_bucket($"doc_id", Decontaminate.BUCKET_MOD))
      .localCheckpoint() // read twice (benchmark side, corpus side)
    val benchGrams = grams
      .filter($"bucket" < Decontaminate.BENCH_PERMILLE)
      .select(explode($"grams").as("g")).distinct()
    val contaminated = grams
      .filter($"bucket" >= Decontaminate.BENCH_PERMILLE)
      .select($"doc_id", explode($"grams").as("g"))
      .join(broadcast(benchGrams), "g")
      .select($"doc_id").distinct()
      .withColumn("contam", lit(true))
    val flags = base
      .join(keepers, Seq("h"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("k_ok",
        $"q_ok" && $"l_ok" && $"keeper_id" === $"doc_id")
      .withColumn("d_ok", $"k_ok" &&
        GraftFunctions.mix64_bucket($"doc_id", Decontaminate.BUCKET_MOD) >=
          Decontaminate.BENCH_PERMILLE && $"contam".isNull)
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    def tok(c: org.apache.spark.sql.Column) =
      sum(when(c, $"toks").otherwise(0L))
    flags.agg(
        count(lit(1)).as("n0"), sum($"toks").as("t0"),
        cnt($"q_ok").as("n1"), tok($"q_ok").as("t1"),
        cnt($"q_ok" && $"l_ok").as("n2"), tok($"q_ok" && $"l_ok").as("t2"),
        cnt($"k_ok").as("n3"), tok($"k_ok").as("t3"),
        cnt($"d_ok").as("n4"), tok($"d_ok").as("t4"))
      .select(expr("stack(5, " +
        "'00_all', n0, t0, '10_quality', n1, t1, '20_lang', n2, t2, " +
        "'30_exact_dedup', n3, t3, '40_decontam', n4, t4) " +
        "AS (stage, n_docs, ws_tokens)"))
      .orderBy($"stage")
  }

  /** Squared-L2 between two quantized vectors in DuckDB (dim pinned at
    * 64 like the Similarity oracles). */
  private def fpsDistSql(e: String, c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 65), i ->
       |        ($e.q[CAST(i AS INTEGER)] - $c.q[CAST(i AS INTEGER)])
       |        * ($e.q[CAST(i AS INTEGER)] - $c.q[CAST(i AS INTEGER)]))),
       |      (a, b) -> a + b)""".stripMargin

  /** One unrolled greedy round for the FPS oracle. */
  private def fpsIterSql(i: Int): String =
    s"""d$i AS (SELECT e.vec_id, min(${fpsDistSql("e", "c")}) AS d
       |  FROM e, cents${i - 1} c GROUP BY e.vec_id),
       |sel$i AS (SELECT CAST($i AS BIGINT) AS rank, vec_id,
       |    CAST(d AS BIGINT) AS dist_q
       |  FROM d$i ORDER BY d DESC, vec_id LIMIT 1),
       |cents$i AS (SELECT * FROM cents${i - 1}
       |  UNION ALL SELECT s.vec_id, e.q FROM sel$i s
       |  JOIN e ON s.vec_id = e.vec_id)""".stripMargin

  /** Train/val/test split boundaries in percent: bucket < 80 → train,
    * < 90 → val, else test. */
  val SPLIT_TRAIN_PCT = 80L
  val SPLIT_VAL_PCT = 90L

  /** Deterministic train/val/test split assignment — the step between
    * curation and packing in every training-data pipeline. Membership
    * is `mix64(doc_id) mod 100` against fixed percent boundaries, the
    * same splitmix64 primitive as [[stratifiedSample]]: content- and
    * partition-independent (a re-run, a backfill, or a different
    * cluster layout can never move a document across splits — the
    * property a random() split lacks), and replayed bit-exactly by the
    * oracle. One codegen'd scan+projection, no shuffle: the split
    * column is computed WHERE THE DATA IS, the only shape that holds
    * at 100 TB (a split via join against an assignment table would
    * shuffle the corpus). */
  def splitAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang",
        GraftFunctions.mix64_bucket($"doc_id", 100L).as("bucket"))
      .select($"doc_id", $"lang", $"bucket",
        when($"bucket" < SPLIT_TRAIN_PCT, "train")
          .when($"bucket" < SPLIT_VAL_PCT, "val").otherwise("test")
          .as("split"))
      .orderBy($"doc_id")
  }

  /** Coreset size for [[coresetFps]]. */
  val CORESET_K = 8
  /** Milli-unit quantization of embedding coordinates. */
  val CORESET_SCALE = 1000.0

  /** Farthest-point-sampling coreset (greedy k-center, Gonzalez 1985)
    * over the embedding corpus — the diversity-selection pass a
    * data-pruning pipeline runs to pick maximally-spread exemplars
    * (the opposite selection pressure from dedup's
    * nearest-pair removal). Seed = smallest vec_id; each round adds
    * the point FARTHEST from the selected set (squared L2 on
    * milli-quantized integer coordinates; ties → smallest vec_id) and
    * reports its distance — the classic non-increasing coverage-radius
    * sequence, asserted in spec.
    *
    * Scale shape: k rounds × one scan each — the intrinsic greedy
    * cost (a 100 TB deployment samples first or keeps k small). Per
    * round the selected set ships as ≤ k literal arrays inside a
    * columnar `least(zip_with…aggregate…)` expression (no join, no
    * shuffle), and the argmax is one map-side-combinable
    * `max(struct(dist, −vec_id))` — nothing data-proportional ever
    * reaches the driver. All-integer distances make the greedy
    * trajectory partition-independent and oracle-replayable. */
  def coresetFps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables(s, dir, "embeddings")
      .select($"vec_id",
        expr(s"transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          s"x -> CAST(floor(x * $CORESET_SCALE + 0.5) AS BIGINT))")
          .as("q"))
      .localCheckpoint() // read k times; quantize once
    val seed = q.orderBy($"vec_id").select($"vec_id", $"q")
      .as[(Long, Seq[Long])].head()
    var centers = Vector((seed._1, seed._2, 0L)) // (id, q, dist at pick)
    (1 until CORESET_K).foreach { _ =>
      val distExprs = centers.map { case (_, cq, _) =>
        val clit = array(cq.map(lit): _*)
        aggregate(zip_with($"q", clit, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, t) => acc + t)
      }
      val dmin = if (distExprs.size == 1) distExprs.head
        else least(distExprs: _*)
      // r19: the picked vector rides the SAME argmax struct (the
      // (d, −id) prefix is already unique, so q never participates in
      // the comparison) — one job per round instead of two; the
      // collected row stays one (k-bounded) array
      val picked = q
        .select($"vec_id", $"q", dmin.as("d"))
        .agg(max(struct($"d", (-$"vec_id").as("nid"), $"q")).as("m"))
        .select($"m.d", (-$"m.nid").as("vec_id"), $"m.q")
        .as[(Long, Long, Seq[Long])].head() // bounded: one row
      centers :+= ((picked._2, picked._3, picked._1))
    }
    centers.zipWithIndex
      .map { case ((id, _, d), r) => (r.toLong, id, d) }
      .toDF("rank", "vec_id", "dist_q")
      .orderBy($"rank")
  }

  /** The DSIR target domain: documents from this source play the
    * "benchmark-like" corpus whose distribution we want to match. */
  val DSIR_TARGET = "src0"

  /** DSIR importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every document by
    * Σ_tokens [log p_target(t) − log p_raw(t)] so a downstream sampler
    * can resample the raw corpus toward the target domain. Here the
    * log-ratio uses the SAME integer-log2 quantization as the
    * surprisal family — per-token weight = floor(log2(T_raw div c_raw))
    * − floor(log2(T_tgt div c_tgt)), i.e. raw-surprisal minus
    * target-surprisal in whole bits, summed as a Long — so the score
    * is partition-independent and the oracle replays it bit-exactly
    * (`length(conv(x,10,2))` == DuckDB `length(bin(x))`). Tokens
    * absent from either domain's vocabulary contribute nothing
    * (hashed-DSIR's OOV convention); `n_scored` reports coverage so a
    * caller can spot low-overlap documents.
    *
    * Scale shape: BOTH domain LMs build in ONE tokenize scan
    * (conditional aggregation per term, map-side combined); totals are
    * a bounded 1-row collect; scoring is one join keyed on the term
    * (vocabulary-proportional, AQE picks the side) + one per-doc
    * aggregation. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables(s, dir, "documents")
      .select($"doc_id", $"source", explode(split($"text", " ")).as("term"))
    val counts = tok.groupBy($"term")
      .agg(sum(when($"source" === DSIR_TARGET, 1L).otherwise(0L)).as("ct"),
        sum(when($"source" =!= DSIR_TARGET, 1L).otherwise(0L)).as("cs"))
      .localCheckpoint() // read 2× (totals, weights)
    val (tt, ts) = counts.agg(sum($"ct"), sum($"cs"))
      .as[(Long, Long)].head() // bounded: one row
    val w = counts.filter($"ct" > 0 && $"cs" > 0)
      .select($"term",
        ((length(conv(expr(s"${ts}L div cs"), 10, 2)) - 1) -
          (length(conv(expr(s"${tt}L div ct"), 10, 2)) - 1))
          .cast("long").as("wq"))
    val scored = tok.join(w, "term")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_scored"), sum($"wq").as("weight_sum"))
    Tables(s, dir, "documents").select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_scored", lit(0L)).as("n_scored"),
        coalesce($"weight_sum", lit(0L)).as("weight_sum"))
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    // independent re-derivation: dups by grouping the RAW TEXT, the
    // same integer quality/code rules, the same ceil(n/2) rank pick
    "pipeline_dataset_card" -> {
      val sw = TextAnalysis.STOPWORDS.map(x => s"'$x'").mkString(",")
      val kw = TextAnalysis.CODE_KEYWORDS.map(x => s"'$x'").mkString(",")
      s"""WITH b AS (SELECT doc_id, source, lang, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($sw))) AS BIGINT) * 1000 AS hits1k,
         |    CAST(length(regexp_replace(text, '[^{}()=;\\[\\]<>]', '',
         |      'g')) AS BIGINT) AS n_sym,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($kw))) AS BIGINT) AS kw_hits
         |  FROM documents),
         |sc AS (SELECT doc_id, source, lang, text, n_tok,
         |    hits1k // n_tok AS score,
         |    (n_sym * 1000 // length(text) >= 50 OR kw_hits >= 3)
         |      AS is_code
         |  FROM b),
         |dups AS (SELECT text, 1 AS is_dup FROM sc
         |  GROUP BY text HAVING count(*) >= 2),
         |r AS (SELECT sc.*, dups.is_dup,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY score, doc_id) AS BIGINT) AS rn,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM sc LEFT JOIN dups ON sc.text = dups.text)
         |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(coalesce(is_dup, 0)) * 1000 // max(n) AS BIGINT)
         |    AS dup_pm,
         |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
         |    THEN score END) AS p50_quality_pm,
         |  CAST(sum(CASE WHEN is_code THEN 1 ELSE 0 END) * 1000
         |    // max(n) AS BIGINT) AS code_pm
         |FROM r GROUP BY 1 ORDER BY source""".stripMargin
    },
    // HUGEINT splitmix64 replay: same bucket, same unsigned rank order
    "sample_global_shuffle" -> {
      val h = OracleSql.mix64("CAST(doc_id AS HUGEINT)")
      s"""WITH d AS (SELECT doc_id,
         |    CAST(($h) % $SHUFFLE_SHARDS AS BIGINT) AS shard,
         |    ($h) AS hu
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY hu, doc_id) AS BIGINT) AS pos
         |FROM d ORDER BY doc_id""".stripMargin
    },
    // same integer score, same (score DESC, doc_id) rank, same
    // permille quota and conditional cut-line aggregates
    "sample_quality_quota" -> {
      val sw = TextAnalysis.STOPWORDS.map(x => s"'$x'").mkString(",")
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($sw))) AS BIGINT) * 1000 AS hits1k
         |  FROM documents),
         |s AS (SELECT doc_id, source, n_tok,
         |    hits1k // n_tok AS score,
         |    CASE WHEN TRY_CAST(substr(source, 4) AS BIGINT) % 2 = 0
         |      THEN $QUOTA_EVEN_PM ELSE $QUOTA_ODD_PM END AS quota_pm
         |  FROM d),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM s),
         |q AS (SELECT *, n * quota_pm // 1000 AS quota FROM r)
         |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         |  CAST(max(quota) AS BIGINT) AS quota,
         |  max(CASE WHEN rn = quota THEN score END) AS thr_score,
         |  max(CASE WHEN rn = quota THEN doc_id END) AS thr_doc,
         |  CAST(sum(CASE WHEN rn <= quota THEN n_tok ELSE 0 END)
         |    AS BIGINT) AS kept_tokens,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
         |FROM q GROUP BY 1 ORDER BY source""".stripMargin
    },
    // composes the quality replay (pipeline_curation), the md5-keeper
    // rule (dedup_exact), and the 13-gram contamination replay
    // (text_decontaminate) into the same cumulative stage flags
    "pipeline_data_funnel" -> {
      // interpolated, not literal: BENCH_PERMILLE / BUCKET_MOD changes
      // must move engine and oracle together
      val bp = Decontaminate.BENCH_PERMILLE
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")})" +
        s" % ${Decontaminate.BUCKET_MOD}"
      s"""WITH scored AS (
         |  SELECT doc_id, text, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         |   (length(regexp_replace(text, '[^a-z]', '', 'g'))
         |      * 1.0 / length(text)) * 0.5
         |   + (len(list_filter(string_split(text, ' '), w -> w IN
         |      ('the','a','an','and','or','of','to','in','is','it','that',
         |       'for','on','with','as')))
         |      * 1.0 / len(string_split(text, ' '))) * 0.3
         |   + (1.0 / ((length(text) - len(string_split(text, ' ')) + 1)
         |      * 1.0 / len(string_split(text, ' ')) + 1.0)) * 0.2 AS q
         |  FROM documents),
         |f AS (SELECT doc_id, toks, q >= 0.46 AS q_ok,
         |    lang = 'en' AS l_ok, md5(text) AS h FROM scored),
         |k AS (SELECT h, min(doc_id) AS keeper FROM f
         |  WHERE q_ok AND l_ok GROUP BY 1),
         |d AS (SELECT doc_id, text, $bucket AS bkt FROM documents),
         |words AS (SELECT doc_id, bkt, string_split(text, ' ') AS w
         |  FROM d),
         |grams AS (SELECT DISTINCT doc_id, bkt,
         |    unnest(list_transform(range(1, len(w) - 11),
         |      i -> array_to_string(w[i:i+12], ' '))) AS g
         |  FROM words WHERE len(w) >= 13),
         |bench AS (SELECT DISTINCT g FROM grams WHERE bkt < $bp),
         |contam AS (SELECT DISTINCT doc_id FROM grams
         |  WHERE bkt >= $bp AND g IN (SELECT g FROM bench)),
         |fl AS (SELECT f.doc_id, f.toks, f.q_ok, f.l_ok,
         |    coalesce(f.q_ok AND f.l_ok AND k.keeper = f.doc_id, FALSE)
         |      AS k_ok, d.bkt
         |  FROM f LEFT JOIN k ON f.h = k.h
         |  JOIN d ON f.doc_id = d.doc_id),
         |fl2 AS (SELECT doc_id, toks, q_ok, l_ok, k_ok,
         |    k_ok AND bkt >= $bp AND doc_id NOT IN
         |      (SELECT doc_id FROM contam) AS d_ok
         |  FROM fl),
         |st AS (
         |  SELECT '00_all' AS stage, count(*) AS n, sum(toks) AS t
         |  FROM fl2
         |  UNION ALL SELECT '10_quality',
         |    sum(CASE WHEN q_ok THEN 1 ELSE 0 END),
         |    sum(CASE WHEN q_ok THEN toks ELSE 0 END) FROM fl2
         |  UNION ALL SELECT '20_lang',
         |    sum(CASE WHEN q_ok AND l_ok THEN 1 ELSE 0 END),
         |    sum(CASE WHEN q_ok AND l_ok THEN toks ELSE 0 END) FROM fl2
         |  UNION ALL SELECT '30_exact_dedup',
         |    sum(CASE WHEN k_ok THEN 1 ELSE 0 END),
         |    sum(CASE WHEN k_ok THEN toks ELSE 0 END) FROM fl2
         |  UNION ALL SELECT '40_decontam',
         |    sum(CASE WHEN d_ok THEN 1 ELSE 0 END),
         |    sum(CASE WHEN d_ok THEN toks ELSE 0 END) FROM fl2)
         |SELECT stage, CAST(n AS BIGINT) AS n_docs,
         |  CAST(t AS BIGINT) AS ws_tokens
         |FROM st ORDER BY stage""".stripMargin
    },
    // full integer-log2 replay: one conditional count pass per term,
    // whole-bit log-ratio, Long sums
    "sample_dsir_weights" ->
      s"""WITH tok AS (SELECT doc_id, source,
         |    unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |c AS (SELECT term,
         |    sum(CASE WHEN source = '$DSIR_TARGET' THEN 1 ELSE 0 END)
         |      AS ct,
         |    sum(CASE WHEN source <> '$DSIR_TARGET' THEN 1 ELSE 0 END)
         |      AS cs
         |  FROM tok GROUP BY 1),
         |t AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM c),
         |w AS (SELECT term,
         |    CAST((length(bin(ts // cs)) - 1)
         |      - (length(bin(tt // ct)) - 1) AS BIGINT) AS wq
         |  FROM c, t WHERE ct > 0 AND cs > 0),
         |d AS (SELECT tok.doc_id, count(*) AS n, sum(wq) AS sw
         |  FROM tok JOIN w USING (term) GROUP BY 1)
         |SELECT doc_id,
         |  CAST(coalesce(n, 0) AS BIGINT) AS n_scored,
         |  CAST(coalesce(sw, 0) AS BIGINT) AS weight_sum
         |FROM documents LEFT JOIN d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // composes the dedup_clusters recursive-closure oracle with the
    // text_quality_score replay; keeper = window argmax with the same
    // (quality DESC, doc_id ASC) tiebreak
    "pipeline_dedup_keeper" ->
      """WITH RECURSIVE words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
        |  FROM words),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |good AS (SELECT da, db FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
        |edges AS (SELECT da AS a, db AS b FROM good
        |          UNION SELECT db, da FROM good),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
        |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
        |  GROUP BY d.doc_id),
        |q AS (SELECT doc_id,
        |  round((length(regexp_replace(text, '[^a-z]', '', 'g'))
        |      * 1.0 / length(text)) * 0.5
        |    + (len(list_filter(string_split(text, ' '), w -> w IN
        |      ('the','a','an','and','or','of','to','in','is','it','that',
        |       'for','on','with','as')))
        |      * 1.0 / len(string_split(text, ' '))) * 0.3
        |    + (1.0 / ((length(text) - len(string_split(text, ' ')) + 1)
        |      * 1.0 / len(string_split(text, ' ')) + 1.0)) * 0.2, 4)
        |    AS quality
        |  FROM documents),
        |ranked AS (SELECT c.cluster_id, c.doc_id, q.quality,
        |  row_number() OVER (PARTITION BY c.cluster_id
        |    ORDER BY q.quality DESC, c.doc_id) AS rn
        |  FROM comp c JOIN q USING (doc_id)),
        |cs AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1)
        |SELECT CAST(r.cluster_id AS BIGINT) AS cluster_id,
        |  r.doc_id AS keeper_id, CAST(cs.n AS BIGINT) AS n_members,
        |  r.quality AS keeper_quality
        |FROM ranked r JOIN cs USING (cluster_id)
        |WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "sample_weighted" -> {
      val h = OracleSql.mix64("CAST(doc_id AS HUGEINT)")
      s"""SELECT source, doc_id, rn FROM (
         |  SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ($h) // greatest(n_chars, 1), doc_id)
         |      AS BIGINT) AS rn
         |  FROM documents) t
         |WHERE rn <= $WEIGHTED_K
         |ORDER BY source, doc_id""".stripMargin
    },
    "sample_fixed_k" -> {
      val h = OracleSql.mix64("CAST(doc_id AS HUGEINT)")
      s"""SELECT source, doc_id, rn FROM (
         |  SELECT source, doc_id,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ($h), doc_id) AS BIGINT) AS rn
         |  FROM documents) t
         |WHERE rn <= $FIXED_K
         |ORDER BY source, doc_id""".stripMargin
    },
    // same integer epoch/permille arithmetic, same splitmix64 membership
    "pipeline_mix_epochs" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 1000"
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    $bucket AS bkt
         |  FROM documents),
         |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS total_toks FROM d GROUP BY 1),
         |e AS (SELECT source, n_docs, total_toks,
         |    $EPOCH_BUDGET // total_toks AS epochs_full,
         |    (1000 * ($EPOCH_BUDGET
         |      - ($EPOCH_BUDGET // total_toks) * total_toks))
         |      // total_toks AS permille
         |  FROM t),
         |p AS (SELECT d.source,
         |    CAST(sum(CASE WHEN d.bkt < e.permille THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_partial_docs,
         |    CAST(sum(CASE WHEN d.bkt < e.permille THEN d.n_tok
         |      ELSE 0 END) AS BIGINT) AS partial_toks
         |  FROM d JOIN e USING (source) GROUP BY 1)
         |SELECT e.source, e.n_docs, e.total_toks,
         |  CAST(e.epochs_full AS BIGINT) AS epochs_full,
         |  CAST(e.permille AS BIGINT) AS permille,
         |  p.n_partial_docs,
         |  CAST(e.epochs_full * e.total_toks + p.partial_toks AS BIGINT)
         |    AS est_tokens
         |FROM e JOIN p USING (source) ORDER BY e.source""".stripMargin
    },
    "sample_token_budget" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 1000"
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |t AS (SELECT source, sum(n_tok) AS total FROM d GROUP BY 1),
         |p AS (SELECT source, least(1000, (1000 * 500) // total) AS permille
         |  FROM t)
         |SELECT doc_id, d.source, n_tok, CAST(permille AS BIGINT) AS permille
         |FROM d JOIN p ON d.source = p.source
         |WHERE ($bucket) < permille
         |ORDER BY doc_id""".stripMargin
    },
    // same running-sum-then-cut definition via a SQL window; sums of
    // exact integers stay < 2^53 so the floor-over-double division is
    // exact on both engines
    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
        |  FROM d)
        |SELECT doc_id, source, n_tok,
        | CAST(end_tok - n_tok AS BIGINT) AS start_tok,
        | CAST(floor((end_tok - n_tok) / 2048.0) AS BIGINT) AS pack_first,
        | CAST(floor((end_tok - 1) / 2048.0) AS BIGINT) AS pack_last
        |FROM c ORDER BY source, doc_id""".stripMargin,
    // exact FFD replay as a RECURSIVE CTE: state = (source, rank,
    // fills list); each step places the rank-th doc of the
    // (n_tok DESC, doc_id) order into the first bin that fits (the
    // list_filter(range...)[1] argmin — NULL when none fits, which
    // appends a new bin, covering the oversize-doc case too), then
    // per-doc concat spans and both strategies' per-source metrics
    // join back — the same single relation the engine emits
    "pack_best_fit" -> {
      val B = PACK_BUDGET
      s"""WITH RECURSIVE d AS (SELECT source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |r AS (SELECT source, doc_id, n_tok, row_number() OVER (
         |    PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rk
         |  FROM d),
         |st AS (
         |  SELECT source, CAST(0 AS BIGINT) AS rk,
         |    CAST(NULL AS BIGINT) AS doc_id,
         |    CAST(NULL AS BIGINT) AS bin_id,
         |    CAST([] AS BIGINT[]) AS fills
         |  FROM (SELECT DISTINCT source FROM d)
         |  UNION ALL
         |  SELECT source, rk, doc_id,
         |    CASE WHEN fit IS NULL THEN CAST(len(fills) AS BIGINT)
         |      ELSE fit - 1 END AS bin_id,
         |    CASE WHEN fit IS NULL THEN list_append(fills, n_tok)
         |      ELSE fills[1:CAST(fit AS INTEGER) - 1]
         |        || [fills[fit] + n_tok]
         |        || fills[CAST(fit AS INTEGER) + 1:len(fills)]
         |      END AS fills
         |  FROM (SELECT r.source, CAST(r.rk AS BIGINT) AS rk, r.doc_id,
         |      r.n_tok, st.fills,
         |      (list_filter(range(1, len(st.fills) + 1),
         |        i -> st.fills[i] + r.n_tok <= $B))[1] AS fit
         |    FROM st JOIN r ON r.source = st.source
         |      AND r.rk = st.rk + 1)),
         |placed AS (SELECT source, doc_id, bin_id FROM st WHERE rk >= 1),
         |fin AS (SELECT source, fills FROM (SELECT source, fills,
         |    row_number() OVER (PARTITION BY source ORDER BY rk DESC)
         |      AS rn FROM st) WHERE rn = 1),
         |fm AS (SELECT source, CAST(len(fills) AS BIGINT) AS ffd_bins,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(fills,
         |        f -> CAST(greatest(0, $B - f) AS BIGINT))),
         |      (a, b) -> a + b) AS BIGINT) AS ffd_waste_tok
         |  FROM fin),
         |c AS (SELECT source, doc_id, n_tok, sum(n_tok) OVER (
         |    PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS end_tok
         |  FROM d),
         |cm AS (SELECT source,
         |    CAST(count(*) FILTER (WHERE n_tok > $B) AS BIGINT)
         |      AS oversize_docs,
         |    CAST((sum(n_tok) + $B - 1) // $B AS BIGINT)
         |      AS concat_chunks,
         |    CAST(((sum(n_tok) + $B - 1) // $B) * $B - sum(n_tok)
         |      AS BIGINT) AS concat_waste_tok,
         |    CAST(count(*) FILTER (WHERE
         |      (end_tok - n_tok) // $B <> (end_tok - 1) // $B)
         |      AS BIGINT) AS concat_crossings
         |  FROM c GROUP BY source)
         |SELECT c.source, c.doc_id, c.n_tok, p.bin_id,
         |  CAST((c.end_tok - c.n_tok) // $B AS BIGINT) AS concat_first,
         |  CAST((c.end_tok - 1) // $B AS BIGINT) AS concat_last,
         |  fm.ffd_bins, fm.ffd_waste_tok, cm.oversize_docs,
         |  cm.concat_chunks, cm.concat_waste_tok, cm.concat_crossings
         |FROM c
         |JOIN placed p ON p.source = c.source AND p.doc_id = c.doc_id
         |JOIN fm ON fm.source = c.source
         |JOIN cm ON cm.source = c.source
         |ORDER BY c.source, c.doc_id""".stripMargin
    },
    "sample_temperature_mix" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 1000"
      s"""WITH c AS (SELECT source, count(*) AS n_source FROM documents
         |  GROUP BY 1),
         |m AS (SELECT min(n_source) AS n_min FROM c),
         |p AS (SELECT source, n_source,
         |  least(1000, CAST(floor(1000.0 *
         |    sqrt(CAST(n_min AS DOUBLE) / CAST(n_source AS DOUBLE)))
         |    AS BIGINT)) AS permille
         |  FROM c, m)
         |SELECT doc_id, d.source, n_source, permille
         |FROM documents d JOIN p USING (source)
         |WHERE ($bucket) < permille
         |ORDER BY doc_id""".stripMargin
    },
    // full greedy replay: identical milli-quantization, 7 unrolled
    // argmax rounds with the same (dist DESC, vec_id ASC) tiebreak
    "sample_coreset_fps" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * $CORESET_SCALE + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |sel0 AS (SELECT CAST(0 AS BIGINT) AS rank, vec_id,
         |    CAST(0 AS BIGINT) AS dist_q
         |  FROM e ORDER BY vec_id LIMIT 1),
         |cents0 AS (SELECT s.vec_id, e.q FROM sel0 s
         |  JOIN e ON s.vec_id = e.vec_id),
         |${(1 until CORESET_K).map(fpsIterSql).mkString(",\n")}
         |SELECT rank, vec_id, dist_q FROM (
         |  ${(0 until CORESET_K).map(i => s"SELECT * FROM sel$i")
            .mkString("\n  UNION ALL ")})
         |ORDER BY rank""".stripMargin,
    "sample_split_assign" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 100"
      s"""WITH h AS (SELECT doc_id, lang, CAST($bucket AS BIGINT) AS bucket
         |           FROM documents)
         |SELECT doc_id, lang, bucket,
         |  CASE WHEN bucket < $SPLIT_TRAIN_PCT THEN 'train'
         |       WHEN bucket < $SPLIT_VAL_PCT THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin
    },
    "sample_stratified" -> {
      val bucket = s"(${OracleSql.mix64("CAST(doc_id AS HUGEINT)")}) % 1000"
      s"""WITH h AS (SELECT doc_id, $bucket AS bucket FROM documents)
         |SELECT doc_id,
         | CASE WHEN doc_id % 3 = 0 THEN 'image'
         |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         | CAST(bucket AS BIGINT) AS bucket
         |FROM h
         |WHERE bucket < CASE WHEN doc_id % 3 = 0 THEN 500
         |                    WHEN doc_id % 3 = 1 THEN 250 ELSE 100 END
         |ORDER BY doc_id""".stripMargin
    },
    "pipeline_curation" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
        |  FROM words),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |losers AS (SELECT DISTINCT db AS loser FROM pairs
        |  JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
        |scored AS (
        |  SELECT doc_id, text,
        |   (length(regexp_replace(text, '[^a-z]', '', 'g'))
        |      * 1.0 / length(text)) * 0.5
        |   + (len(list_filter(string_split(text, ' '), w -> w IN
        |      ('the','a','an','and','or','of','to','in','is','it','that',
        |       'for','on','with','as')))
        |      * 1.0 / len(string_split(text, ' '))) * 0.3
        |   + (1.0 / ((length(text) - len(string_split(text, ' ')) + 1)
        |      * 1.0 / len(string_split(text, ' ')) + 1.0)) * 0.2 AS quality
        |  FROM documents)
        |SELECT doc_id,
        | cast(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | round(quality, 4) AS quality
        |FROM scored
        |WHERE quality >= 0.46
        |  AND doc_id NOT IN (SELECT loser FROM losers)
        |ORDER BY doc_id""".stripMargin,
  )
}
