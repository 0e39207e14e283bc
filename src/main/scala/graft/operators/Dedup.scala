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
  *  - n-gram Jaccard (exact): the GROUND-TRUTH operator, computed as a
  *    fully distributed inverted-index join — explode shingles, join on
  *    the shingle hash, count per-pair co-occurrences. Near-linear on
  *    natural corpora (low shingle document frequency); no driver
  *    collect, no corpus broadcast.
  *  - MinHash+LSH: the approximate scale path — signatures are 32
  *    aggregated mins (map-side combine), candidates come from 16
  *    band-buckets (2 rows each), and only candidates are verified
  *    exactly. Shuffle volume is O(docs × bands), not O(docs²).
  *  - SimHash: 64-bit bigram fingerprint per doc (native codegen'd
  *    expression); candidates from a 16-bit chunk-pair multi-index
  *    (exact for Hamming ≤ 6 by pigeonhole) with a bucket-size guard,
  *    verify with bit_count(xor) — never a cross join at scale.
  *  - embedding cosine: exact all-pairs (intrinsic at low thresholds —
  *    see [[embeddingCosinePairs]]) via a memory-bounded tiled
  *    self-join grid; sub-quadratic = approximate = [[Similarity]].
  */
object Dedup {


  private[operators] val JACCARD_THRESHOLD = 0.8
  private val MINHASH_K = 32 // 16 bands × 2 rows
  private val BANDS = 16

  /** Distinct, sorted word-bigram shingle hashes per doc, built in a
    * typed map — a plain JVM loop is ~15× faster than interpreted
    * higher-order-function lambdas for this per-doc work, and the
    * hash-sorted order is the fixed total order the prefix filter in
    * [[ngramJaccardPairs]] relies on. */
  private[operators] def shingleSets(s: SparkSession, dir: String,
      probeMax: Option[Long] = None): Dataset[(Long, Array[Long])] = {
    import s.implicits._
    val base = Tables(s, dir, "documents")
      .select($"doc_id", $"text")
    // probe-bounded callers filter BEFORE the shingling map — the
    // predicate pushes to the parquet scan instead of hashing the
    // whole corpus and discarding it
    probeMax.fold(base)(p => base.filter($"doc_id" < p))
      // the table arrives as one parquet split; spread per-doc work
      .transform(Tables.repartitionForCpu(_, col("doc_id")))
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

  /** 1024-bit shingle-set bitmap, packed as [[BM_WORDS]] longs, built
    * in-row (zero exchanges). Bucket of shingle hash g = pmod(g, 1024);
    * word = bucket div 64, bit = bucket mod 64.
    *
    * The EXACT pruning it buys (r20, guide §2.3 — make the cheap test
    * run before the expensive one): every distinct element of a set
    * sets exactly ONE bit, so popcount(bmA | bmB) ≤ |A ∪ B| (distinct
    * elements may collide into one bit, never spread over several),
    * hence inter = na + nb − |A ∪ B| ≤ na + nb − popcount(bmA | bmB)
    * — an UPPER bound on the intersection computable with 16 OR+
    * popcount word ops instead of an array_intersect hash build. On
    * this corpus random candidate pairs intersect in ~3 shingles while
    * the thresholds need ≥ ~41, and ~100 distinct elements in 1024
    * buckets lose only ~5 to collisions — so the bound separates
    * near-perfectly (measured: containment 6.46 M candidates → 10,881
    * survivors, 0 true pairs lost, DuckDB replay). False survivors are
    * re-verified exactly; no false negatives by the bound above. */
  private val BM_WORDS = 16
  private[operators] def shingleBitmap(ssCol: String): org.apache.spark.sql.Column =
    expr(
      s"aggregate($ssCol, array_repeat(0L, $BM_WORDS), (acc, g) -> " +
        "transform(acc, (v, i) -> " +
        "if (i = cast(pmod(g, 1024) div 64 as int), " +
        "v | shiftleft(1L, cast(pmod(g, 1024) % 64 as int)), v)))")

  /** na + nb − popcount(bma | bmb): the exact intersection upper bound
    * of [[shingleBitmap]]. UNROLLED into 16 flat
    * bit_count(element_at|element_at) terms rather than
    * zip_with+aggregate: higher-order functions evaluate their lambdas
    * INTERPRETED per row (no whole-stage codegen), which measured ~25 µs
    * per candidate pair — the flat form is pure codegen'd word ops.
    * (The per-DOC bitmap build keeps its HOF form: docs-sized, not
    * pair-sized.) */
  private def interUpperBound(
      na: String, nb: String, bma: String, bmb: String)
      : org.apache.spark.sql.Column = {
    val pop = (0 until BM_WORDS).map(i => expr(
      s"bit_count(element_at($bma, ${i + 1}) | element_at($bmb, ${i + 1}))"))
      .reduce(_ + _)
    expr(s"$na + $nb").cast("long") - pop.cast("long")
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
    *
    * Fully distributed PREFIX-FILTERED similarity join (AllPairs/PPJoin
    * family — no driver collect, no corpus broadcast): under any fixed
    * total order on shingles, two sets with J ≥ t must share an element
    * within their first ⌊(1-t)·|set|⌋+1 elements, so only those prefix
    * shingles (20% at t = 0.8) enter the inverted-index self-join —
    * ~(1-t)² = 25× less join volume than the full inverted index, which
    * measured 4× slower than even the driver-collect kernel on this
    * corpus's near-uniform shingle frequencies. The hash-sorted shingle
    * arrays give the total order for free. Candidates get length-pruned
    * (J ≥ t forces t·|B| ≤ |A|) and verified exactly with
    * array_intersect. Every shuffle key is a shingle hash or a doc
    * pair — near-linear on natural corpora at any scale. */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = JACCARD_THRESHOLD // 4/5 — prefix/length math uses the exact
    // rational: floor(n·(1-t))+1 via doubles under-counts by one
    // whenever 0.2·n is an integer (1-0.8 = 0.19999…96 in binary),
    // silently losing qualifying pairs from the GROUND-TRUTH output
    val sets = shingleSets(s, dir).toDF("doc_id", "ss")
      .select($"doc_id", $"ss", size($"ss").as("n"),
        shingleBitmap("ss").as("bm")) // r20: verify prefilter
      // materialize ONCE: `sets` feeds the self-joined prefix relation
      // AND both verification re-joins — four consumers whose pruned
      // subplans differ, so ReuseExchange can't dedupe and the per-doc
      // shingle map (hash+sort+dedup, the dominant CPU) would run 4×
      // per invocation (plan-audited round-17; the lpaModularity
      // duplicated-subtree class). One persisted pass beats four
      // recomputes at every scale — same call the graph family makes
      // for its half-edge relation
      .localCheckpoint()
    // prefix length = n - ceil(t·n) + 1 = n - ((4n+4) div 5) + 1, exact
    // r19: posexplode, so the POSITION filter below sees where in the
    // hash-sorted array each match sits
    val pref = sets.select($"doc_id", $"n",
      posexplode(expr(
        "slice(ss, 1, cast(n - ((4*n + 4) div 5) + 1 as int))")))
      .select($"doc_id", $"n", $"pos".as("i"), $"col".as("sh"))
    // PPJoin POSITION filter (r19 optimization, guide §2.3 — shuffle
    // fewer bytes; Xiao et al. 2008): a match at 0-based positions
    // (i, j) of the hash-sorted sets bounds the intersection by
    // min(i, j) + min(na−i, nb−j) — common elements before the match
    // sit in both i/j-prefixes, those from the match on in both
    // suffixes. J ≥ 4/5 needs inter ≥ ceil(4(na+nb)/9) (from
    // 5·inter ≥ 4·(na+nb−inter)), so matches whose bound falls short
    // die INSIDE the join stage, before the candidate exchange +
    // distinct. EXACT: a qualifying pair's first common element (in
    // the shared total order) has zero common elements before it and
    // all `inter` from it on, so its bound ≥ inter ≥ the threshold —
    // that match always survives. On this corpus the filter cuts the
    // candidate relation ~3× (931-shingle vocabulary ⇒ dense inverted
    // index); at any scale it only shrinks the exchange.
    val posBound = (least($"a.i", $"b.i") +
      least($"a.n" - $"a.i", $"b.n" - $"b.i")) * 9 >=
      ($"a.n" + $"b.n") * 4
    // explicit partition counts (r19, guide §2.5): the self-join and
    // verify stages are CPU-bound at small shuffle bytes — AQE's
    // size-based coalescing ran them at 10 tasks (measured ~6.5 of 32
    // cores busy). Explicit counts opt the exchanges out of
    // coalescing; the pref repartition doubles as the join's own
    // exchange (shared via ReuseExchange) and the cands repartition
    // as the distinct's, so no NEW shuffle is added.
    val nP = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val prefP = pref.repartition(nP, $"sh")
    val cands = prefP.as("a")
      .join(prefP.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id" &&
          // length prune n_a ≥ t·n_b, again in exact integers
          $"a.n" * 5 >= $"b.n" * 4 && $"b.n" * 5 >= $"a.n" * 4 &&
          posBound)
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .repartition(nP, $"da", $"db")
      .distinct()
    cands
      .join(sets.select($"doc_id".as("da"), $"ss".as("ssa"), $"n".as("na"),
        $"bm".as("bma")), "da")
      .join(sets.select($"doc_id".as("db"), $"ss".as("ssb"), $"n".as("nb"),
        $"bm".as("bmb")), "db")
      // bitmap UNION upper bound (see [[shingleBitmap]]): J ≥ 4/5 ⇔
      // 9·inter ≥ 4·(na+nb), and inter ≤ the bound — prune before the
      // array_intersect hash build (left-to-right And). Exact.
      .filter(interUpperBound("na", "nb", "bma", "bmb") * 9 >=
        ($"na" + $"nb") * 4)
      .withColumn("inter", size(array_intersect($"ssa", $"ssb")))
      .filter($"inter" / ($"na" + $"nb" - $"inter") >= t)
      .select($"da", $"db")
      .orderBy($"da", $"db")
  }

  /** ASYMMETRIC containment near-dup: ordered pairs (da → db) with
    * |S(da) ∩ S(db)| / |S(da)| ≥ 0.8 — "most of A's shingles appear in
    * B". This is the relation Jaccard dedup is blind to: a short doc
    * quoted inside a long one has high containment but LOW Jaccard
    * (the union is dominated by B), so it never band-collides in
    * MinHash-LSH. Web-scale pipelines run this as the
    * boilerplate/quote-inclusion pass after symmetric near-dup.
    *
    * Scale shape: the prefix filter still applies, but one-sided —
    * C(A→B) ≥ t forces A to share an element within its first
    * ⌊(1−t)·|A|⌋+1 shingles with B (same exact-integer prefix math as
    * [[ngramJaccardPairs]]), while B must be indexed in FULL (the
    * asymmetry is intrinsic: nothing bounds where in B the overlap
    * sits). Join volume = 20% of probe shingles × the full inverted
    * index; candidates verified exactly with array_intersect, and the
    * emitted containment is an exact integer permille
    * (`inter·1000 div |A|`), so the DuckDB replay is bit-identical. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sets = shingleSets(s, dir).toDF("doc_id", "ss")
      .select($"doc_id", $"ss", size($"ss").as("n"),
        shingleBitmap("ss").as("bm")) // r20: verify prefilter, see below
      // materialize ONCE — probe + inverted index + two verify
      // re-joins would otherwise re-run the shingle map 4× (see the
      // ngramJaccardPairs note)
      .localCheckpoint()
    // probe side: t = 4/5 prefix, exact integer length (q.v. the
    // jaccard prefix-math comment — double 0.2·n under-counts)
    val probe = sets.select($"doc_id".as("da"), $"n".as("na"),
      posexplode(expr(
        "slice(ss, 1, cast(n - ((4*n + 4) div 5) + 1 as int))")))
      .select($"da", $"na", $"pos".as("i"), $"col".as("sh"))
    val index = sets.select($"doc_id".as("db"), $"n".as("nb"),
      posexplode($"ss"))
      .select($"db", $"nb", $"pos".as("j"), $"col".as("sh"))
    // one-sided PPJoin POSITION filter (r19 — see the jaccard twin for
    // the per-match bound's proof), TIGHTENED at the group level (r20,
    // guide §2.3, VERDICT r19 item 7): the old shape filtered matches
    // and dedup'd; this shape aggregates the surviving matches per
    // (da, db) over the SAME exchange the distinct paid and applies a
    // second exact bound from the group:
    //   i0 = min(i), j0 = min(j) are the positions of the pair's FIRST
    //   common element — prefix(A) holds A's smallest elements, so the
    //   globally smallest common element is a prefix match; it always
    //   survives the per-match filter (zero common elements before it,
    //   so its bound ≥ inter), and every other survivor has larger i
    //   AND larger j, so the two mins both belong to it. Every common
    //   element is ≥ that first one, hence inter ≤ min(na−i0, nb−j0)
    //   — strictly tighter than the per-match bound at the same
    //   positions (no min(i0,j0) slack term).
    // C(A→B) ≥ 4/5 needs inter ≥ ceil(4·na/5); qualifying pairs always
    // survive (their true inter meets the threshold and the bound is an
    // upper bound on inter). Measured (sf0.1, DuckDB replay): exchange
    // rows unchanged (10.45 M filtered matches), candidates 7.02 M →
    // 6.46 M entering the verify join; true pairs lost: 0.
    val cands = probe
      .join(index, Seq("sh"))
      .filter($"da" =!= $"db" &&
        (least($"i", $"j") + least($"na" - $"i", $"nb" - $"j")) * 5 >=
          $"na" * 4)
      .groupBy($"da", $"na", $"db", $"nb")
      .agg(min($"i").as("i0"), min($"j").as("j0"))
      .filter(least($"na" - $"i0", $"nb" - $"j0") * 5 >= $"na" * 4)
      .select($"da", $"db")
    cands
      .join(sets.select($"doc_id".as("da"), $"ss".as("ssa"), $"n".as("na"),
        $"bm".as("bma")), "da")
      .join(sets.select($"doc_id".as("db"), $"ss".as("ssb"), $"n".as("nb"),
        $"bm".as("bmb")), "db")
      // bitmap UNION upper bound (see [[shingleBitmap]]) — 16 word ops
      // kill the candidate before the array_intersect hash build;
      // And-conjunction evaluates left-to-right, so pruned rows never
      // pay the intersect. Exact: bound ≥ inter always. Measured
      // (sf0.1, DuckDB replay): 6.46 M candidates → 10,881 survivors,
      // 0 true pairs lost.
      .filter(interUpperBound("na", "nb", "bma", "bmb") * 5 >= $"na" * 4)
      .withColumn("inter", size(array_intersect($"ssa", $"ssb")))
      .filter($"inter" * 5 >= $"na" * 4) // inter/na ≥ 4/5, exact
      .select($"da", $"db",
        expr("cast(inter * 1000 div na as bigint)")
          .as("containment_permille"))
      .orderBy($"da", $"db")
  }

  /** MinHash + LSH near-dup: signature of 32 per-family min-hashes,
    * banded into 16 buckets of 2 rows; candidates verified with exact
    * Jaccard. With s ≥ 0.8 the miss probability per pair is
    * (1-s²)¹⁶ ≤ 5e-8, so verified output equals the exact pair set —
    * which is exactly what the oracle checks. */
  /** MinHash band buckets for `docs` shaped (doc_id, shingle_set):
    * 32 min-hashes computed per exploded shingle then aggregated —
    * map-side combine keeps the shuffle at one row per (doc, family) —
    * banded into (doc_id, band, key) rows. Shared by the self-join
    * dedup ([[minhashLshPairs]]) and the batch-vs-corpus incremental
    * dedup ([[Incremental]]). */
  private[operators] def minhashBandBuckets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // r19 optimization (guide §2.4 — remove shuffles outright): each
    // doc's shingles already sit in ONE array cell, so the 32
    // per-family mins are in-row folds (transform + array_min), not an
    // explode + groupBy(doc_id) aggregation. The old shape shuffled one
    // (doc, 33-long) row per doc per map task and paid a hash-aggregate
    // pass; this shape is a narrow codegen'd projection — zero
    // exchanges to produce signatures at ANY corpus size. Values are
    // bit-identical: same xxhash64(i, s) family, same min (shingle
    // sets are non-empty by [[shingleSets]]'s filter, so array_min
    // never sees an empty array).
    val sigCols = (0 until MINHASH_K).map(i =>
      array_min(transform($"shingle_set", x => xxhash64(lit(i), x)))
        .as(s"h$i"))
    val sigs = docs.select(($"doc_id" +: sigCols): _*)

    // band key = hash of the band's rows; explode to (doc, band, key)
    val bandCols = (0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("key"))
    }
    sigs.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
  }

  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = shingleSets(s, dir).toDF("doc_id", "shingle_set")
    // EXPLICIT partition counts around the banded self-join (r19,
    // guide §2.5 / the repartitionForCpu rule): these stages are
    // CPU-bound at tiny shuffle BYTES, so AQE's size-based coalescing
    // collapsed them to 1–10 tasks (measured: the self-join and the
    // verify stage each ran ~2 s on ONE core with 31 idle). An
    // explicit count opts the exchange out of coalescing; both join
    // inputs share one exchange (identical subtrees → ReuseExchange),
    // and the pre-distinct repartition IS the distinct's own exchange
    // (same hash key), so the plan gains no extra shuffle — the
    // partition count rides spark.sql.shuffle.partitions, the
    // scale-adaptive knob, not a local constant.
    val nP = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val buckets = minhashBandBuckets(docs)
      .repartition(nP, $"band", $"key")

    // localCheckpoint: the pair relation feeds THREE consumers below
    // (two candIds branches + the verify join); without materializing
    // it, each consumer re-runs the banded self-join (measured: 74 s
    // of the 300× wall was recompute). The materialized size is
    // O(near-dup pairs) — the small end of this plan.
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"))
      .repartition(nP, $"da", $"db")
      .distinct()
      .localCheckpoint()

    // exact verification of candidates only: re-attach the (sorted)
    // shingle arrays. No broadcast hint anywhere — a duplicate-heavy
    // corpus makes candidates corpus-sized; AQE broadcasts when the
    // measured size is actually small and shuffle-joins when it isn't.
    //
    // r15 scale fix (300× decade triage): once the pair relation
    // outgrows the broadcast threshold the verify join goes
    // sort-merge and shuffles the WIDE shingle-array relation twice.
    // Semi-reducing the wide relation by the candidate ID set first
    // (ids ≤ docs-with-a-dup, dedup'd — broadcastable far beyond
    // where the pair relation is not) keeps the arrays un-shuffled
    // while near-dups are sparse — the 100 TB shape — and the
    // reduced relation is itself small enough for AQE to broadcast
    // into both verify joins. A pathological all-dup corpus degrades
    // to the same SMJ as before; nothing is forced. (Triage note:
    // the REMAINING 300× wall is the banded self-join's shuffle —
    // flipping IT to broadcast via a 256 MB threshold measured
    // 174 → 106-126 s on this box, but a bucket relation grows
    // linearly with the corpus, so that flip is a single-box-only
    // win and is deliberately NOT taken.)
    val sets = docs.select($"doc_id", $"shingle_set",
      size($"shingle_set").as("n"))
    val candIds = candidates.select($"da".as("doc_id"))
      .union(candidates.select($"db".as("doc_id")))
      .distinct()
    val candSets = sets.join(candIds, Seq("doc_id"), "left_semi")
    candidates
      .join(candSets.as("za"), $"da" === $"za.doc_id")
      .join(candSets.as("zb"), $"db" === $"zb.doc_id")
      .withColumn("inter",
        size(array_intersect($"za.shingle_set", $"zb.shingle_set")))
      .filter($"inter" / ($"za.n" + $"zb.n" - $"inter") >= JACCARD_THRESHOLD)
      .select($"da", $"db")
      .orderBy($"da", $"db")
  }

  /** Default cap on SimHash block-bucket size. A bucket this deep means
    * thousands of docs share an identical 16-bit signature slice —
    * i.e. exact/near-identical floods that [[exactDedup]] (which runs
    * first in [[Curation]]-style pipelines) should have collapsed.
    * Dropping such buckets bounds the self-join at
    * O(blocks · buckets · cap²) instead of degrading toward O(N²). */
  val SIMHASH_MAX_BUCKET = 4096L

  /** 16-bit multi-index candidate blocks for SimHash: one block per
    * PAIR of 8-bit chunks — C(8,2) = 28 indexes over 2^16 buckets each.
    * Pigeonhole keeps the guarantee exact: Hamming ≤ 6 touches at most
    * 6 of the 8 chunks, leaving ≥ 2 intact, so some intact pair
    * collides. vs. single-chunk 8-bit blocking this is 3.5× the shuffle
    * rows but 256× more buckets ⇒ ~73× fewer candidate pairs — the
    * difference between surviving and not surviving a 100× corpus. */
  private def simhashBlocks(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val pairIdx = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    docs.select($"doc_id", $"sig",
      explode(array(pairIdx.zipWithIndex.map { case ((i, j), b) =>
        struct(lit(b).as("b"),
          (shiftright($"sig", i * 8).bitwiseAND(lit(0xffL)) * 256L +
            shiftright($"sig", j * 8).bitwiseAND(lit(0xffL))).as("v"))
      }: _*)).as("blk"))
      .select($"doc_id", $"sig", $"blk.b".as("b"), $"blk.v".as("v"))
  }

  /** Candidate pairs from the multi-index blocks, deduped across
    * indexes; buckets deeper than `maxBucket` are dropped (see
    * [[SIMHASH_MAX_BUCKET]]). The oversized-bucket set is tiny by
    * construction (≤ N/maxBucket buckets), so it is resolved EAGERLY on
    * the driver: dropping a bucket is the one place blocked output can
    * diverge from the all-pairs Hamming relation, and it must never
    * happen silently — a warning reports exactly how many buckets were
    * dropped. In the common no-floods case the main plan then skips the
    * anti-join subtree entirely. */
  private[operators] def simhashCandidates(
      docs: DataFrame, maxBucket: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val blocks = simhashBlocks(docs)
    // block key packs (index, 16-bit value) into one long: b*2^16 + v
    val overKeys: Array[Long] = blocks.groupBy($"b", $"v").count()
      .filter($"count" > maxBucket)
      .select(($"b" * 65536L + $"v").as("k")).as[Long].collect()
    if (overKeys.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"simhash blocking dropped ${overKeys.length} bucket(s) deeper " +
          s"than $maxBucket docs; qualifying Hamming<=6 pairs whose " +
          "intact chunk-pairs all land in dropped buckets will be " +
          "MISSED — run exactDedup first to collapse identical-content " +
          "floods, or raise the cap")
    val pruned =
      if (overKeys.isEmpty) blocks
      else blocks.filter(!($"b" * 65536L + $"v").isInCollection(overKeys))
    pruned.as("x")
      .join(pruned.as("y"),
        $"x.b" === $"y.b" && $"x.v" === $"y.v" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("da"), $"y.doc_id".as("db"),
        bit_count($"x.sig".bitwiseXOR($"y.sig")).cast("long").as("hamming"))
      .distinct()
  }

  /** SimHash near-dup: 64-bit bigram fingerprints (native expression),
    * 16-bit multi-index blocking for candidates (exact for Hamming ≤ 6
    * by pigeonhole — the DuckDB oracle checks ALL pairs), Hamming ≤ 6
    * verification via bit_count(xor). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables(s, dir, "documents")
      .transform(Tables.repartitionForCpu(_, col("doc_id")))
      .select($"doc_id", GraftFunctions.simhash64($"text").as("sig"))
    simhashCandidates(docs, SIMHASH_MAX_BUCKET)
      .filter($"hamming" <= 6)
      .orderBy($"da", $"db")
  }

  /** Tile count for the exact cosine self-join grid. Each unordered
    * pair of tiles is one join partition holding ~2N/TILES vectors, so
    * executor memory is bounded regardless of corpus size. */
  val COSINE_TILES = 8

  /** Embedding-cosine near-dup pairs (cos ≥ 0.4 — the synthetic
    * embeddings have no planted copies, max cos ≈ 0.51), computed in
    * double precision via the native dot-product kernel (sequential
    * fold order ⇒ the oracle's double-cast cosine is bit-identical).
    *
    * EXACT all-pairs compute is intrinsic at this threshold: hyperplane
    * LSH candidate generation cannot be exact at cos ≥ 0.4 (per-plane
    * agreement p = 1 - arccos(0.4)/π ≈ 0.63, so an 8-bit bucket match
    * catches only p⁸ ≈ 2.5% of qualifying pairs, and any banded
    * OR-construction wide enough to fix recall exceeds all-pairs cost —
    * sub-quadratic similarity join at low thresholds is approximate by
    * nature; that path is [[Similarity.lshTopK]]). What IS fixable at
    * scale is the memory/topology shape: a tiled self-join grid — each
    * vector replicated to its ~TILES/2 tile-pairs, every unordered pair
    * compared in exactly one tile — instead of collecting or
    * broadcasting the corpus. Shuffle is O(N·TILES); no single task
    * ever needs more than two tiles in memory. */
  def embeddingCosinePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorOps.dot
    val b = COSINE_TILES
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .withColumn("blk", pmod(xxhash64($"vec_id"), lit(b.toLong)).cast("int"))
    // pair with blocks (p ≤ q) meets in exactly tile (p, q)
    val left = emb
      .withColumn("tj", explode(sequence($"blk", lit(b - 1))))
      .withColumnRenamed("blk", "ti")
    val right = emb
      .withColumn("ti", explode(sequence(lit(0), $"blk")))
      .withColumnRenamed("blk", "tj")
    left.as("a")
      .join(right.as("b"),
        $"a.ti" === $"b.ti" && $"a.tj" === $"b.tj" &&
          // off-diagonal tiles pair distinct blocks, so every unordered
          // pair already appears exactly once (block-p doc on the left);
          // only diagonal tiles need the id-order dedup
          ($"a.ti" =!= $"a.tj" || $"a.vec_id" < $"b.vec_id"))
      .withColumn("cosine", dot($"a.v", $"b.v") / ($"a.norm" * $"b.norm"))
      .filter($"cosine" >= 0.4)
      .select(least($"a.vec_id", $"b.vec_id").as("va"),
        greatest($"a.vec_id", $"b.vec_id").as("vb"))
      .orderBy($"va", $"vb")
  }

  /** Near-dup CLUSTERING: connected components over the verified
    * near-dup pair graph, cluster id = min doc_id of the component —
    * what a curation pipeline actually does with pairwise dup hits
    * (keep one canonical doc per cluster, not per pair, so A~B~C
    * collapses to one keeper even when A~C wasn't itself a pair).
    *
    * Iterative min-label propagation to fixpoint: O(component
    * diameter) rounds, and near-dup components are tiny (pairs/
    * triples), so 2-3 rounds converge; each round is one join + one
    * map-side-combined min. `localCheckpoint` truncates the iterative
    * lineage. At extreme scale the loop body swaps for the
    * large-star/small-star contraction — same DataFrame ops, fewer
    * rounds on high-diameter graphs (which near-dup graphs are not). */
  def nearDupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = minhashLshPairs(s, dir)
    val edges = pairs.select($"da".as("a"), $"db".as("b"))
      .union(pairs.select($"db".as("a"), $"da".as("b")))
      .localCheckpoint()
    // propagate ONLY over edge-incident nodes (r19 optimization, guide
    // §2.3/§2.4 — don't shuffle rows whose value cannot change): a doc
    // with no near-dup edge keeps cluster_id = doc_id at every round,
    // yet the previous shape fed the CORPUS-sized identity relation
    // through every round's join + checkpoint + changed-count probe.
    // Restricting labels0 to the dup subgraph (both edge directions are
    // present, so `a` covers every incident node) makes each round's
    // state O(near-dup docs) — at 100 TB that is orders of magnitude
    // below corpus size — and the untouched docs rejoin once at the
    // end via a left join (tiny side broadcast by AQE). Result is
    // bit-identical: propagation among incident nodes never reads a
    // non-incident label, and isolated docs are their own keeper.
    val touched = edges.select($"a".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("cluster_id")).localCheckpoint()
    val prop = labelPropagate(s, edges, touched)
      .select($"doc_id", $"cluster_id".as("cl"))
    Tables(s, dir, "documents").select($"doc_id")
      .join(prop, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"cl", $"doc_id").as("cluster_id"))
      .select($"doc_id", $"cluster_id",
        ($"doc_id" === $"cluster_id").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Per-round driver GC knob for iterative graph floods on a
    * SINGLE-disk box (SCALING.md round-18 1000× anatomy): completed
    * rounds' shuffle files are deleted by the ContextCleaner only
    * after the driver JVM garbage-collects their ShuffleDependency
    * objects, so a long flood retains every round's files (~25 GB
    * each at 1000×) until an incidental full GC. `System.gc()` after
    * each round bounds live scratch to ~one round's working set. Off
    * by default (a full GC per round is wasted milliseconds at gate
    * scale, real seconds of pause on a 48 GB decade heap where it is
    * also the difference between finishing and ENOSPC); decade
    * harness runs export it. */
  private def roundGc: Boolean =
    sys.env.get("SPARK_GRAFT_ROUND_GC").contains("1")

  /** Min-label propagation to fixpoint over a directed edge list
    * (callers pass both directions for undirected graphs). `labels0`
    * is (doc_id, cluster_id), normally cluster_id = doc_id.
    *
    * Convergence probe: count labels that CHANGED this round (one
    * aggregate row to the driver). The r13 shape summed cluster_id
    * and tested the sum for a fixpoint — cheaper-looking, but at
    * ≳10¹⁰ docs with 64-bit ids the running sum can wrap Long, and a
    * wrapped sum coinciding across a real change would terminate
    * early (r14 verdict advisory). The changed-label count has the
    * same 1-row driver cost, is exact at ANY corpus size / id
    * magnitude (it never adds ids, only counts strict decreases — a
    * least() result can't exceed its input, so no arithmetic on ids
    * at all), and reads a flag computed for free inside the same
    * projection. DedupSpec plants ids at Long.MaxValue scale to pin
    * this. */

  private[graft] def labelPropagate(
      s: SparkSession, edges: DataFrame, labels0: DataFrame,
      maxRounds: Int = Int.MaxValue,
      onTruncated: Int => Unit = _ => ()): DataFrame = {
    import s.implicits._
    // pre-partition the edge relation on its join key ONCE (round 19,
    // the 1000× cliff's dominant term): without this every round's
    // join re-shuffles the EDGE-sized side (~25 GB/round at 1000×) to
    // co-locate with the node-sized labels; checkpointed
    // HashPartitioning(b) is preserved by LogicalRDD, so per-round
    // shuffles drop to the labels side + the map-side-combined min
    // aggregate. One-time cost: one edge shuffle + materialization.
    // SERIALIZED storage for the edge-sized cache (round-19 1000×
    // anatomy, second cut): the default deserialized MEMORY_AND_DISK
    // unrolls each partition as an object graph before caching — at
    // 1.17 B edges that is both the task-thread heap OOM (32
    // concurrent ~400 MB unrolls) and, spilled, the ~37 GB
    // uncompressed disk footprint that breached the box. SER stores
    // compact row bytes (LZ4'd on disk under spark.rdd.compress),
    // bounding both; the per-round deserialization cost on a
    // node-bounded join probe is noise against the round's shuffle.
    // EXPLICIT partition count (r19): a keyed repartition without a
    // count is still AQE-coalescible, so the cache landed in ≤8
    // partitions at gate scale and every round's probe ran there —
    // the count pins it (repartitionForCpu rule); same value the
    // implicit exchange would use at production scale, so no change
    // to the 100 TB plan.
    val ebP = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val eb = edges.repartition(ebP, $"b").localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var labels = labels0
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val nbr = eb.join(labels, $"b" === $"doc_id")
        .groupBy($"a").agg(min($"cluster_id").as("nl"))
      // LAZY checkpoint (r20, VERDICT r19 item 4 — cut per-round job
      // count): eager paid TWO driver jobs per round (materialize,
      // then the changed-label probe over the cache); lazy folds the
      // materialization into the probe's job — one job per round —
      // and the next round's joins read the now-populated cache.
      val next = labels.join(nbr, $"doc_id" === $"a", "left")
        .select($"doc_id",
          least($"cluster_id", coalesce($"nl", $"cluster_id"))
            .as("cluster_id"),
          ($"nl".isNotNull && $"nl" < $"cluster_id").as("chg"))
        .localCheckpoint(false)
      // sum() is NULL on an empty table — degrade to an empty clustering
      val chgRow = next.agg(sum(when($"chg", 1L).otherwise(0L))).first()
      converged = chgRow.isNullAt(0) || chgRow.getLong(0) == 0L
      labels = next.select($"doc_id", $"cluster_id")
      // `next` is materialized (the probe above) and the previous
      // round's checkpoint is now unreachable — give the
      // ContextCleaner its GC trigger when scratch is the constraint
      if (roundGc) System.gc()
    }
    // a bounded caller (fixed-R CC) gets to know the flood was cut
    // short — the exact changed-label probe already paid for this
    if (!converged) onTruncated(round)
    labels
  }

  /** Cross-document repeated-span census — the word-level analogue of
    * exact substring dedup (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better"): every [[SPAN_W]]-word span
    * is fingerprinted; a span whose fingerprint occurs in ≥ 2 DISTINCT
    * documents marks each of them. Output: one row per affected doc —
    * (doc_id, n_spans, n_shared) where n_shared counts the doc's
    * distinct spans that some OTHER doc also contains; a downstream
    * trimmer drops or clips exactly those spans.
    *
    * Scale shape (100 TB): spans are distinct per doc, so the span
    * census `count(*) per fingerprint` IS the distinct-doc count — one
    * map-side-combinable aggregation; the rollup is one
    * fingerprint-keyed join back (AQE-planned) + one doc-keyed
    * aggregation. No pair expansion EVER — partner lists are the
    * quadratic trap on boilerplate spans; the df ≥ 2 flag is all the
    * semantics needs, so flood-prone spans cost one counter row, not
    * df² pairs. Output is proportional to the duplicated subset. */
  val SPAN_W = 20

  def spanCrossdoc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Decontaminate.gramSets(s, dir, SPAN_W)
      .toDF("doc_id", "grams")
      .select($"doc_id", size($"grams").cast("long").as("n_spans"),
        explode($"grams").as("g"))
      .localCheckpoint() // read twice (span census, doc rollup)
    val census = grams.groupBy($"g").agg(count(lit(1)).as("nd"))
    grams.join(census.filter($"nd" >= 2), "g")
      .groupBy($"doc_id", $"n_spans")
      .agg(count(lit(1)).as("n_shared"))
      .select($"doc_id", $"n_spans", $"n_shared")
      .orderBy($"doc_id")
  }

  /** Exact duplicate CHUNK groups via a count-min prefilter — the
    * 100 TB shape for "find the duplicates" when duplicates are rare:
    * over the RAG chunking ([[Retrieval.CHUNK_CHARS]]/
    * [[Retrieval.CHUNK_STRIDE]], length-gated like the ingest
    * pipeline), pass 1 builds the bounded d×w CMS of chunk
    * fingerprints (constant-size shuffle, [[Sketches.cmsMatrix]]);
    * pass 2 probes it with broadcast joins and keeps only chunks
    * whose min cell count ≥ 2 — CMS overestimates ONLY, so every true
    * duplicate survives (no false negatives by construction) and the
    * expensive md5 groupBy shuffles just the candidate subset instead
    * of the whole chunk stream. Collision-slipped singletons die at
    * the final `n_copies ≥ 2` filter, so the output EQUALS the exact
    * duplicate-group relation bit-for-bit; keeper = lexicographic min
    * (doc_id, chunk_id), the rag-index rule. */
  def cmsPrefilterDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    val chunks = Tables(s, dir, "documents")
      .select($"doc_id", $"text",
        posexplode(sequence(lit(0),
          greatest(length($"text") - 1, lit(0)),
          lit(Retrieval.CHUNK_STRIDE))))
      .select($"doc_id", $"pos".cast("long").as("chunk_id"),
        expr(s"substring(text, col + 1, ${Retrieval.CHUNK_CHARS})")
          .as("chunk"))
      .filter(length($"chunk") >= Retrieval.RAG_MIN_CHARS)
      .withColumn("hv", GraftFunctions.mix64(
        GraftFunctions.rolling_hash64($"chunk")))
    val matrix = Sketches.cmsMatrix(chunks.select($"hv"))
    val probed = (0 until Sketches.CMS_DEPTH).foldLeft(chunks) { (df, d) =>
      df.withColumn(s"b$d", GraftFunctions.mix64_bucket(
          $"hv" + lit(d.toLong), Sketches.CMS_WIDTH))
        .join(broadcast(matrix.filter($"d" === d)
          .select($"bucket".as(s"b$d"), $"c".as(s"c$d"))), s"b$d")
    }
    probed
      .filter(least(
        (0 until Sketches.CMS_DEPTH).map(d => col(s"c$d")): _*) >= 2)
      .groupBy(md5($"chunk").as("content_hash"))
      .agg(min(struct($"doc_id", $"chunk_id")).as("m"),
        count(lit(1)).as("n_copies"))
      .filter($"n_copies" >= 2)
      .select($"content_hash", $"m.doc_id".as("keeper_doc"),
        $"m.chunk_id".as("keeper_chunk"), $"n_copies")
      .orderBy($"content_hash")
  }

  /** The dedup CASCADE report — the one-row-per-layer summary a
    * corpus build publishes for how much each dedup depth catches:
    * exact copies (docs beyond each group's keeper), MinHash near-dup
    * pairs (J ≥ 0.8, the LSH scale path), and cross-doc shared-span
    * docs (the substring layer Jaccard is blind to). Each layer is an
    * existing oracle-checked relation reduced to a bounded count —
    * the composition itself adds no new shuffle shapes, just the
    * report. */
  def dedupCascade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The three layers are INDEPENDENT jobs; running them from driver
    // threads lets each layer's tail stragglers back-fill with the next
    // layer's tasks instead of leaving the cluster idle (guide §2.6 —
    // FIFO scheduling gives exactly the back-fill behavior). Each count
    // is exact, so overlap cannot change the result; 3 threads = one
    // per layer, bounded at any scale.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fExact = Future(exactDedup(s, dir).filter($"n_copies" >= 2)
      .agg(coalesce(sum($"n_copies" - 1), lit(0L)).as("n"))
      .as[Long].head())
    val fNear = Future(minhashLshPairs(s, dir).count())
    val fSpan = Future(spanCrossdoc(s, dir).count())
    val exact = Await.result(fExact, Duration.Inf)
    val near = Await.result(fNear, Duration.Inf)
    val span = Await.result(fSpan, Duration.Inf)
    Seq(("1_exact_dup_docs", exact), ("2_near_dup_pairs", near),
      ("3_shared_span_docs", span))
      .toDF("layer", "n").orderBy($"layer")
  }

  /** Probe-document cap for [[lshScurve]] — the bounded query set the
    * recall measurement fans out from (the ann_ivf_recall protocol:
    * exact side restricted to a sample, approximate side at corpus
    * scale). */
  val LSH_SCURVE_PROBES = 50L
  /** Replayable minhash families for the curve:
    * h_i(g) = mix64(g ⊕ mix64(i)) — XOR, not addition, so the
    * expression is total under ANSI arithmetic on both engines. The
    * gate LSH ([[minhashLshPairs]]) uses xxhash64 families, which
    * DuckDB cannot replay — the CURVE key swaps in the splitmix
    * family so the whole measurement (hashes, bands, collisions) is
    * oracle-replayed bit-exactly; band structure (16×2) is
    * identical. */
  private def scurveSeed(i: Int): Long = TextHashes.mix64(i.toLong)

  /** MinHash-LSH S-CURVE — the dedup family's measured quality
    * witness (the [[Similarity]] family's `ann_ivf_recall` pattern):
    * per Jaccard DECILE of the exact probe-vs-corpus pair relation,
    * the fraction of pairs whose 16-band/2-row minhash signatures
    * collide in at least one band — the empirical
    * P(candidate | J) ≈ 1−(1−J²)¹⁶ curve every LSH parameter choice
    * is an operating point on. Probes are a bounded sample
    * (doc_id < [[LSH_SCURVE_PROBES]]); the exact side is the
    * one-sided probe⋈inverted-index join (linear in corpus at fixed
    * probe count — the production recall-measurement shape), and the
    * collision test reads the two signatures directly, no bucket
    * self-join. On THIS corpus the J distribution is bimodal
    * (unrelated pairs at deciles 0–1 — the shared 31-word vocabulary
    * noise floor — and planted near-dups at 9+); the mid-decile
    * S-transition is pinned by planted fixtures in LshScurveSpec.
    * All arithmetic integer (decile = 10·inter div union, recall in
    * ppm); signatures ride the replayable splitmix family, so the
    * oracle recomputes hashes, bands, and collisions exactly. */
  def lshScurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    val sets = shingleSets(s, dir).toDF("doc_id", "ss")
      .select($"doc_id", $"ss", size($"ss").as("n"))
      .localCheckpoint() // probe + index + size joins + signature side
    val probe = sets.filter($"doc_id" < LSH_SCURVE_PROBES)
      .select($"doc_id".as("p"), explode($"ss").as("g"))
    val index = sets.select($"doc_id".as("d"), explode($"ss").as("g"))
    val inter = probe.join(index, "g")
      .filter($"p" =!= $"d" &&
        ($"d" >= LSH_SCURVE_PROBES || $"p" < $"d"))
      .groupBy($"p", $"d").agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sets.select($"doc_id".as("p"), $"n".as("np")), "p")
      .join(sets.select($"doc_id".as("d"), $"n".as("nd")), "d")
      .select($"p", $"d",
        expr("(inter * 10) div (np + nd - inter)").as("decile"))
      // three consumers (both ids scans + the collision join) would
      // otherwise each rebuild the probe⋈index join — the r17
      // duplicated-subtree class; the pair relation itself is tiny
      .localCheckpoint()
    // signatures only for docs that appear in a scored pair (semi-
    // reduced like the LSH verify join); min over the SIGNED mixed
    // value — the oracle replays min over toSigned(mix64(·)), so both
    // engines pick the same family minimum on the same total order
    val ids = pairs.select($"p".as("doc_id"))
      .union(pairs.select($"d".as("doc_id"))).distinct()
    // r20 (guide §2.4, the minhashBandBuckets precedent): each doc's
    // shingles already sit in ONE array cell, so the 32 per-family
    // mins are in-row array_min(transform(...)) folds — the old
    // explode + groupBy(doc_id) paid a corpus-sized exchange to
    // aggregate values derivable inside the row. Same min over the
    // same element set, bit-identical signatures, zero exchanges.
    val sigs = sets.join(ids, Seq("doc_id"), "left_semi")
      // r20: the 32-family fold below is the heaviest per-row compute
      // in this operator, and the semi-join's output is AQE-coalesced
      // to ONE partition at gate bytes (probed: a 1.06 s single-task
      // stage) — explicit CPU repartition before it (the pii_scrub
      // rule; compute ≫ shuffle at any scale for this projection)
      .repartition(Tables.cpuTarget(s), $"doc_id")
      .select($"doc_id",
        array((0 until MINHASH_K).map(i =>
          array_min(transform($"ss", g =>
            GraftFunctions.mix64(g.bitwiseXOR(lit(scurveSeed(i))))))
        ): _*).as("sig"))
      .localCheckpoint() // joined on both pair sides
    pairs
      .join(sigs.select($"doc_id".as("p"), $"sig".as("sa")), "p")
      .join(sigs.select($"doc_id".as("d"), $"sig".as("sb")), "d")
      // band-collision predicate UNROLLED over the fixed 16 bands
      // (r20): the `exists(sequence(0,15), …)` higher-order form
      // evaluates its lambda interpreted per pair — the flat OR chain
      // of GetArrayItem comparisons is whole-stage-codegen'd.
      // Identical semantics (same band layout, same equality).
      .select($"decile", (0 until BANDS).map(b =>
        ($"sa"(b * 2) === $"sb"(b * 2)) &&
          ($"sa"(b * 2 + 1) === $"sb"(b * 2 + 1))).reduce(_ || _)
        .as("hit"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_collided"))
      .select($"decile".cast("long").as("jaccard_decile"),
        $"n_pairs", $"n_collided",
        expr("(n_collided * 1000000) div n_pairs").as("recall_ppm"))
      .orderBy($"jaccard_decile")
  }

  /** Subsample-family seed for the PLANTED pair generator — disjoint
    * from the signature seeds `scurveSeed(0..31)` = mix64(0..31). */
  private val SCURVE_SUB_SEED = TextHashes.mix64(0x5eedL)

  /** PLANTED pair families with full decile coverage, derived from
    * the real corpus: for each probe doc A (doc_id <
    * [[LSH_SCURVE_PROBES]]) and each k = 1..9, partner
    * B_k = {g ∈ A : mix64(g ⊕ SUB_SEED) mod 10 < k} — a
    * hash-subsampled SUBSET, so J(A, B_k) = |B_k|/|A| ≈ k/10 exactly
    * where the corpus's bimodal J distribution is empty (verdict r18
    * #3: the committed scurve relation had only deciles {0,1,9}).
    * Nested subsets share one exploded scan; everything is
    * probe-bounded BY CONSTRUCTION (the filter precedes shingling),
    * so corpus scale never enters the plan — the right shape for a
    * quality instrument. Returns (doc_id, k, decile, sa, sb) with
    * 32-hash splitmix signatures on both sides. */
  private def plantedPairSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.GraftFunctions
    val ex = shingleSets(s, dir, probeMax = Some(LSH_SCURVE_PROBES))
      .toDF("doc_id", "ss")
      .select($"doc_id", explode($"ss").as("g"))
      .withColumn("u", GraftFunctions.mix64_bucket(
        $"g".bitwiseXOR(lit(SCURVE_SUB_SEED)), 10L))
      // A-side rollup + the 9-way B-side both consume it: checkpoint
      // so the shingling map runs once (r17 duplicated-subtree class);
      // the relation is probe-bounded, so the materialization is tiny
      .localCheckpoint()
    def minsAs(prefix: String) = (0 until MINHASH_K).map(i =>
      min(GraftFunctions.mix64($"g".bitwiseXOR(lit(scurveSeed(i)))))
        .as(s"$prefix$i"))
    val aSide = ex.groupBy($"doc_id")
      .agg(count(lit(1)).as("na"), minsAs("ha"): _*)
    val ks = s.range(1, 10).select($"id".cast("int").as("k"))
    val bSide = ex.join(broadcast(ks), $"u" < $"k")
      .groupBy($"doc_id", $"k")
      .agg(count(lit(1)).as("nb"), minsAs("hb"): _*)
    aSide.join(bSide, "doc_id")
      .select($"doc_id", $"k", expr("(nb * 10) div na").as("decile"),
        array((0 until MINHASH_K).map(i => col(s"ha$i")): _*).as("sa"),
        array((0 until MINHASH_K).map(i => col(s"hb$i")): _*).as("sb"))
  }

  /** The S-curve over the PLANTED pair families — same output shape
    * as [[lshScurve]] but with every decile populated, so the
    * mid-decile transition (the region banding parameters are chosen
    * on) is itself driver-gated instead of living only in
    * LshScurveSpec's fixtures. Signatures, bands, and the collision
    * predicate are identical to the corpus curve (16×2 on the
    * splitmix family); min-hash collision probability depends only on
    * true Jaccard, so subset pairs measure the same curve real pairs
    * would at the same J. */
  def lshScurvePlanted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedPairSigs(s, dir)
      .select($"decile", expr(
        s"exists(sequence(0, ${BANDS - 1}), b -> sa[b*2] = sb[b*2]" +
          " AND sa[b*2+1] = sb[b*2+1])").as("hit"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_collided"))
      .select($"decile".cast("long").as("jaccard_decile"),
        $"n_pairs", $"n_collided",
        expr("(n_collided * 1000000) div n_pairs").as("recall_ppm"))
      .orderBy($"jaccard_decile")
  }

  /** Candidate banding configurations for the operating-point
    * selector — all spend the same MINHASH_K = 32 hashes; band b is
    * hash positions [b·R, b·R+R), so (16, 2) is bit-identical to the
    * gate banding. The classic 1−(1−J^R)^B thresholds at b·r = 32:
    * (32,1) ≈ 0.03, (16,2) ≈ 0.25, (8,4) ≈ 0.59, (4,8) ≈ 0.84,
    * (2,16) ≈ 0.96. */
  private val OPSEL_CONFIGS = Seq((32, 1), (16, 2), (8, 4), (4, 8), (2, 16))
  /** Pairs at J-decile ≥ this must be caught… */
  val OPSEL_TARGET_DECILE = 8
  /** …at ≥ this pooled recall… */
  val OPSEL_RECALL_FLOOR_PPM = 900000L
  /** …while minimizing collisions on pairs at J-decile ≤ this. */
  val OPSEL_NOISE_DECILE = 3

  /** LSH OPERATING-POINT SELECTOR — closes the measured S-curve into
    * a decision (the way graph_lpa_adaptive closed modularity into a
    * stopping rule): evaluate every [[OPSEL_CONFIGS]] banding over
    * the SAME planted pair relation in one pass, then select the
    * configuration that meets the recall floor at the target decile
    * with the least low-J noise (tie-breaks: fewer bands — fewer
    * bucket tables at production scale — then the per-decile sort
    * key). Emits the full per-config curve with the config-level
    * verdict columns on every row, all-integer so the selection
    * replays bit-exactly in DuckDB. */
  def lshOpSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cfgHits = plantedPairSigs(s, dir)
      .select($"decile", explode(array(OPSEL_CONFIGS.map { case (b, r) =>
        struct(lit(b).as("nb"), lit(r).as("rpb"), expr(
          s"exists(sequence(0, ${b - 1}), bb -> " +
            s"forall(sequence(0, ${r - 1}), " +
            s"rr -> sa[bb*$r+rr] = sb[bb*$r+rr]))").as("hit"))
      }: _*)).as("c"))
      .select($"c.nb".as("n_bands"), $"c.rpb".as("rows_per_band"),
        $"decile", $"c.hit")
    val perDecile = cfgHits
      .groupBy($"n_bands", $"rows_per_band", $"decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_collided"))
      // two consumers (config rollup + the final join); ≤ 55 rows
      .localCheckpoint()
    val cfg = perDecile.groupBy($"n_bands", $"rows_per_band")
      .agg(
        coalesce(sum(when($"decile" >= OPSEL_TARGET_DECILE,
          $"n_collided")), lit(0L)).as("hi_c"),
        coalesce(sum(when($"decile" >= OPSEL_TARGET_DECILE,
          $"n_pairs")), lit(0L)).as("hi_p"),
        coalesce(sum(when($"decile" <= OPSEL_NOISE_DECILE,
          $"n_collided")), lit(0L)).as("lo_c"),
        coalesce(sum(when($"decile" <= OPSEL_NOISE_DECILE,
          $"n_pairs")), lit(0L)).as("lo_p"))
      .select($"n_bands", $"rows_per_band",
        expr("(hi_c * 1000000) div greatest(hi_p, 1)")
          .as("recall_hi_ppm"),
        expr("(lo_c * 1000000) div greatest(lo_p, 1)")
          .as("noise_lo_ppm"))
      .withColumn("meets_floor",
        $"recall_hi_ppm" >= OPSEL_RECALL_FLOOR_PPM)
    // global window over the 5-row config relation — bounded by
    // construction (|OPSEL_CONFIGS|), not by data
    val sel = cfg.withColumn("is_selected",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
        $"meets_floor".desc,
        when($"meets_floor", $"noise_lo_ppm")
          .otherwise(-$"recall_hi_ppm"),
        $"n_bands")) === 1)
    perDecile.join(sel, Seq("n_bands", "rows_per_band"))
      .select($"n_bands".cast("long").as("n_bands"),
        $"rows_per_band".cast("long").as("rows_per_band"),
        $"decile".cast("long").as("jaccard_decile"),
        $"n_pairs", $"n_collided",
        expr("(n_collided * 1000000) div n_pairs").as("recall_ppm"),
        $"recall_hi_ppm", $"noise_lo_ppm",
        $"meets_floor", $"is_selected")
      .orderBy($"n_bands", $"jaccard_decile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_scurve" -> (lshScurve _),
    "dedup_lsh_scurve_planted" -> (lshScurvePlanted _),
    "dedup_lsh_opselect" -> (lshOpSelect _),
    "pipeline_dedup_cascade" -> (dedupCascade _),
    "dedup_cms_prefilter" -> (cmsPrefilterDups _),
    "dedup_span_crossdoc" -> (spanCrossdoc _),
    "dedup_exact" -> (exactDedup _),
    "dedup_ngram_jaccard" -> (ngramJaccardPairs _),
    "dedup_containment" -> (containmentPairs _),
    "dedup_minhash_lsh" -> (minhashLshPairs _),
    "dedup_simhash" -> (simhashPairs _),
    "dedup_embedding_cosine" -> (embeddingCosinePairs _),
    "dedup_clusters" -> (nearDupClusters _),
  )

  /** Shared CTE chain replaying [[plantedPairSigs]] bit-exactly:
    * probe-filtered fnv bigram shingles, the mix64 subsample bucket,
    * per-(doc, k) nested-subset sizes and signed-min splitmix
    * signatures, integer deciles. MATERIALIZED: a/b/pairs each feed
    * multiple consumers in both downstream oracles. */
  private lazy val plantedPairsCte: String = {
    val gh = OracleSql.toSigned(OracleSql.fnv1a64("bigram"))
    val m64 = "18446744073709551616"
    val gu = s"((CAST(g AS HUGEINT) % $m64 + $m64) % $m64)"
    val sub = java.lang.Long.toUnsignedString(SCURVE_SUB_SEED)
    def hexprs(p: String) = (0 until MINHASH_K).map { i =>
      val seed = java.lang.Long.toUnsignedString(scurveSeed(i))
      s"min(${OracleSql.toSigned(OracleSql.mix64(
        s"xor($gu, CAST($seed AS HUGEINT))"))}) AS $p$i"
    }.mkString(",\n      ")
    def arr(p: String) = (0 until MINHASH_K).map(i => s"$p$i")
      .mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE doc_id < $LSH_SCURVE_PROBES),
       |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS bigram
       |  FROM toks WHERE len(t) >= 2),
       |sh AS MATERIALIZED (SELECT DISTINCT doc_id, $gh AS g FROM bg),
       |ex AS MATERIALIZED (SELECT doc_id, g,
       |    (${OracleSql.mix64(s"xor($gu, CAST($sub AS HUGEINT))")}) % 10
       |      AS u
       |  FROM sh),
       |a AS MATERIALIZED (SELECT doc_id, count(*) AS na,
       |      ${hexprs("ha")}
       |    FROM ex GROUP BY 1),
       |b AS MATERIALIZED (SELECT doc_id, kk.k AS k, count(*) AS nb,
       |      ${hexprs("hb")}
       |    FROM ex, (SELECT unnest(range(1, 10)) AS k) kk
       |    WHERE ex.u < kk.k GROUP BY 1, 2),
       |pairs AS MATERIALIZED (SELECT a.doc_id, b.k,
       |    (b.nb * 10) // a.na AS decile,
       |    ${arr("ha")} AS sa, ${arr("hb")} AS sb
       |  FROM a JOIN b USING (doc_id))""".stripMargin
  }

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

  private val spanOracle =
    """WITH words AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(w) - 18),
      |      i -> array_to_string(w[i:i+19], ' '))) AS g
      |  FROM words WHERE len(w) >= 20),
      |c AS (SELECT g, count(*) AS nd FROM grams GROUP BY 1),
      |sizes AS (SELECT doc_id, count(*) AS n_spans
      |  FROM grams GROUP BY 1),
      |sh AS (SELECT doc_id, count(*) AS n_shared
      |  FROM grams JOIN c USING (g) WHERE nd >= 2 GROUP BY 1)
      |SELECT sh.doc_id, CAST(sizes.n_spans AS BIGINT) AS n_spans,
      |  CAST(sh.n_shared AS BIGINT) AS n_shared
      |FROM sh JOIN sizes ON sh.doc_id = sizes.doc_id
      |ORDER BY sh.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // each layer re-derived from its own oracle formulation, reduced
    // to counts (nested WITH subqueries)
    "pipeline_dedup_cascade" ->
      s"""WITH ex AS (SELECT count(*) AS n_copies FROM documents
         |  GROUP BY md5(text)),
         |nn AS ($jaccardOracle),
         |sp AS ($spanOracle)
         |SELECT '1_exact_dup_docs' AS layer,
         |  CAST(coalesce(sum(n_copies - 1)
         |    FILTER (WHERE n_copies >= 2), 0) AS BIGINT) AS n FROM ex
         |UNION ALL SELECT '2_near_dup_pairs',
         |  CAST(count(*) AS BIGINT) FROM nn
         |UNION ALL SELECT '3_shared_span_docs',
         |  CAST(count(*) AS BIGINT) FROM sp
         |ORDER BY layer""".stripMargin,
    // the prefilter is lossless by construction, so the oracle is the
    // plain exact duplicate-chunk relation (same chunking as the rag
    // pipeline) — agreeing with it IS the proof the CMS pass dropped
    // nothing
    "dedup_cms_prefilter" ->
      s"""WITH idx AS (SELECT doc_id, text,
         |    unnest(range(0, greatest(length(text), 1),
         |      ${Retrieval.CHUNK_STRIDE})) AS s
         |  FROM documents),
         |chunks AS (SELECT doc_id,
         |    s // ${Retrieval.CHUNK_STRIDE} AS chunk_id,
         |    substring(text, CAST(s AS INTEGER) + 1,
         |      ${Retrieval.CHUNK_CHARS}) AS chunk
         |  FROM idx),
         |r AS (SELECT md5(chunk) AS h, doc_id, chunk_id,
         |    row_number() OVER (PARTITION BY md5(chunk)
         |      ORDER BY doc_id, chunk_id) AS rn,
         |    count(*) OVER (PARTITION BY md5(chunk)) AS n
         |  FROM chunks WHERE length(chunk) >= ${Retrieval.RAG_MIN_CHARS})
         |SELECT h AS content_hash, doc_id AS keeper_doc,
         |  CAST(chunk_id AS BIGINT) AS keeper_chunk,
         |  CAST(n AS BIGINT) AS n_copies
         |FROM r WHERE rn = 1 AND n >= 2
         |ORDER BY content_hash""".stripMargin,
    // joins on the raw 20-word span STRINGS (no hash) — an independent
    // re-derivation; a Spark-side fingerprint collision would show up
    // as a count mismatch here
    "dedup_span_crossdoc" -> spanOracle,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardOracle,
    // ordered pairs, full inverted index on the containing side, exact
    // integer permille — the string shingles replay the hashed sets
    // (same equivalence the jaccard oracle leans on)
    "dedup_containment" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS s
        |  FROM words),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db,
        |  CAST((inter * 1000) // sa.n AS BIGINT) AS containment_permille
        |FROM pairs JOIN sizes sa ON da = sa.doc_id
        |WHERE inter * 5 >= sa.n * 4
        |ORDER BY da, db""".stripMargin,
    // LSH with 16 bands × 2 rows has miss prob ≤ 5e-8 at s ≥ 0.8 and the
    // candidates are exactly verified, so the output equals the exact set.
    "dedup_minhash_lsh" -> jaccardOracle,
    // clustering oracle: transitive closure of the exact pair graph via
    // a recursive CTE, component id = min reachable doc_id
    "dedup_clusters" ->
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
        |  GROUP BY d.doc_id)
        |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
        |  doc_id = cluster_id AS is_keeper
        |FROM comp ORDER BY doc_id""".stripMargin,
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
    // 8-bit chunks untouched). Known regime limit: SIMHASH_MAX_BUCKET
    // only binds on >4096-deep identical-slice floods, which the
    // documented exact-dedup-first pipeline removes; inside that
    // contract (and at every test SF) blocked output == all-pairs.
    // full measurement replay: the same fnv bigram-hash shingles, the
    // same splitmix minhash families (signed-min total order), the
    // same 16×2 band-collision predicate, the same integer deciles —
    // MATERIALIZED because sh/sig feed multiple consumers
    "dedup_lsh_scurve_planted" ->
      s"""$plantedPairsCte
         |, hits AS (SELECT decile,
         |    (len(list_filter(range(0, $BANDS),
         |      b -> sa[CAST(b * 2 + 1 AS INTEGER)]
         |             = sb[CAST(b * 2 + 1 AS INTEGER)]
         |        AND sa[CAST(b * 2 + 2 AS INTEGER)]
         |             = sb[CAST(b * 2 + 2 AS INTEGER)])) > 0) AS hit
         |  FROM pairs)
         |SELECT CAST(decile AS BIGINT) AS jaccard_decile,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_collided,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS recall_ppm
         |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-config collision arms unrolled with LITERAL (bands, rows)
    // (no lambda-capturing-outer-column dependence), the same pooled
    // hi/lo rollups, and the selection ordering replayed as a window
    // over the 5-row config relation
    "dedup_lsh_opselect" -> {
      val arms = OPSEL_CONFIGS.map { case (b, r) =>
        s"""SELECT $b AS n_bands, $r AS rows_per_band, decile,
           |    (len(list_filter(range(0, $b),
           |      bb -> len(list_filter(range(0, $r),
           |        rr -> sa[CAST(bb * $r + rr + 1 AS INTEGER)]
           |            = sb[CAST(bb * $r + rr + 1 AS INTEGER)])) = $r))
           |      > 0) AS hit
           |  FROM pairs""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$plantedPairsCte
         |, ch AS MATERIALIZED (
         |$arms),
         |pd AS MATERIALIZED (SELECT n_bands, rows_per_band, decile,
         |    count(*) AS n_pairs,
         |    sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_collided
         |  FROM ch GROUP BY 1, 2, 3),
         |cfg AS (SELECT n_bands, rows_per_band,
         |    coalesce(sum(CASE WHEN decile >= $OPSEL_TARGET_DECILE
         |        THEN n_collided END), 0) * 1000000
         |      // greatest(coalesce(sum(CASE WHEN decile >=
         |        $OPSEL_TARGET_DECILE THEN n_pairs END), 0), 1)
         |      AS recall_hi_ppm,
         |    coalesce(sum(CASE WHEN decile <= $OPSEL_NOISE_DECILE
         |        THEN n_collided END), 0) * 1000000
         |      // greatest(coalesce(sum(CASE WHEN decile <=
         |        $OPSEL_NOISE_DECILE THEN n_pairs END), 0), 1)
         |      AS noise_lo_ppm
         |  FROM pd GROUP BY 1, 2),
         |sel AS (SELECT n_bands, rows_per_band, recall_hi_ppm,
         |    noise_lo_ppm,
         |    recall_hi_ppm >= $OPSEL_RECALL_FLOOR_PPM AS meets_floor,
         |    row_number() OVER (ORDER BY
         |      (recall_hi_ppm >= $OPSEL_RECALL_FLOOR_PPM) DESC,
         |      CASE WHEN recall_hi_ppm >= $OPSEL_RECALL_FLOOR_PPM
         |           THEN noise_lo_ppm ELSE -recall_hi_ppm END,
         |      n_bands) = 1 AS is_selected
         |  FROM cfg)
         |SELECT CAST(pd.n_bands AS BIGINT) AS n_bands,
         |  CAST(pd.rows_per_band AS BIGINT) AS rows_per_band,
         |  CAST(pd.decile AS BIGINT) AS jaccard_decile,
         |  CAST(pd.n_pairs AS BIGINT) AS n_pairs,
         |  CAST(pd.n_collided AS BIGINT) AS n_collided,
         |  CAST(pd.n_collided * 1000000 // pd.n_pairs AS BIGINT)
         |    AS recall_ppm,
         |  CAST(sel.recall_hi_ppm AS BIGINT) AS recall_hi_ppm,
         |  CAST(sel.noise_lo_ppm AS BIGINT) AS noise_lo_ppm,
         |  sel.meets_floor AS meets_floor,
         |  sel.is_selected AS is_selected
         |FROM pd JOIN sel ON pd.n_bands = sel.n_bands
         |  AND pd.rows_per_band = sel.rows_per_band
         |ORDER BY n_bands, jaccard_decile""".stripMargin
    },
    "dedup_lsh_scurve" -> {
      val gh = OracleSql.toSigned(OracleSql.fnv1a64("bigram"))
      val m64 = "18446744073709551616"
      val gu = s"((CAST(g AS HUGEINT) % $m64 + $m64) % $m64)"
      val hexprs = (0 until MINHASH_K).map { i =>
        val seed = java.lang.Long.toUnsignedString(scurveSeed(i))
        s"min(${OracleSql.toSigned(OracleSql.mix64(
          s"xor($gu, CAST($seed AS HUGEINT))"))}) AS h$i"
      }.mkString(",\n      ")
      val sigList = (0 until MINHASH_K).map(i => s"h$i")
        .mkString("[", ", ", "]")
      val P = LSH_SCURVE_PROBES
      s"""WITH toks AS (SELECT doc_id,
         |    string_split(text, ' ') AS t
         |  FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i+1])) AS bigram
         |  FROM toks WHERE len(t) >= 2),
         |sh AS MATERIALIZED (SELECT DISTINCT doc_id, $gh AS g FROM bg),
         |sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh
         |  GROUP BY 1),
         |inter AS MATERIALIZED (SELECT a.doc_id AS p, b.doc_id AS d,
         |    count(*) AS inter
         |  FROM sh a JOIN sh b ON a.g = b.g
         |  WHERE a.doc_id < $P AND a.doc_id <> b.doc_id
         |    AND (b.doc_id >= $P OR a.doc_id < b.doc_id)
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (SELECT p, d,
         |    (inter * 10) // (sa.n + sb.n - inter) AS decile
         |  FROM inter JOIN sizes sa ON p = sa.doc_id
         |             JOIN sizes sb ON d = sb.doc_id),
         |sig AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM (
         |  SELECT doc_id,
         |      $hexprs
         |    FROM sh GROUP BY doc_id)),
         |hits AS (SELECT decile,
         |    (len(list_filter(range(0, $BANDS),
         |      b -> sa.sig[CAST(b * 2 + 1 AS INTEGER)]
         |             = sb.sig[CAST(b * 2 + 1 AS INTEGER)]
         |        AND sa.sig[CAST(b * 2 + 2 AS INTEGER)]
         |             = sb.sig[CAST(b * 2 + 2 AS INTEGER)])) > 0)
         |      AS hit
         |  FROM pairs JOIN sig sa ON p = sa.doc_id
         |             JOIN sig sb ON d = sb.doc_id)
         |SELECT CAST(decile AS BIGINT) AS jaccard_decile,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_collided,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS recall_ppm
         |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin
    },
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
