package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token counting, quality scoring, language ID, and
  * document fingerprinting. Everything is a narrow projection over the
  * scan — codegen'd string functions, no shuffle except final ordering
  * — so the plan is scan-bound at any scale.
  */
object TextAnalysis {

  private val STOPWORDS = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as")

  /** Whitespace tokens + a BPE-ish regex segmentation (letters runs,
    * digit runs, single other chars). */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        size(split($"text", " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all($"text",
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
          .cast("long").as("bpeish_tokens"),
        length($"text").cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: alpha ratio, space ratio, stopword ratio, mean
    * word length — the standard cheap pre-filter features. The score
    * is a fixed linear blend, computed with the same expression shape
    * as the oracle so doubles match bit-for-bit. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = split($"text", " ")
    val alphaRatio =
      length(regexp_replace($"text", "[^a-z]", "")) / length($"text")
    val stopRatio =
      size(filter(words, w => w.isInCollection(STOPWORDS))) / size(words)
    val meanWordLen =
      (length($"text") - size(words) + 1) / size(words)
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        round(alphaRatio, 4).as("alpha_ratio"),
        round(stopRatio, 4).as("stop_ratio"),
        round(meanWordLen, 4).as("mean_word_len"),
        round(alphaRatio * 0.5d + stopRatio * 0.3d +
          (lit(1.0d) / (meanWordLen + 1.0d)) * 0.2d, 4).as("quality"))
      .orderBy($"doc_id")
  }

  /** Language ID by stopword-set voting (n-gram-free heuristic): count
    * hits from per-language function-word sets, argmax with
    * deterministic tie-break. The synthetic corpus text is English word
    * salad with a random `lang` label, so this checks the machinery,
    * not real-world accuracy. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sets = Map(
      "en" -> Seq("the", "a", "and", "of", "to", "is"),
      "es" -> Seq("el", "la", "y", "de", "que", "es"),
      "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
      "fr" -> Seq("le", "la", "et", "de", "est", "un"))
    val words = split($"text", " ")
    val scores = sets.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(words, w => w.isInCollection(ws))).as("hits"),
        lit(lang).as("lang"))
    }
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang".as("labeled_lang"),
        greatest(scores: _*).getField("lang").as("predicted_lang"),
        greatest(scores: _*).getField("hits").cast("long").as("hits"))
      .orderBy($"doc_id")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * a portable definition the oracle reproduces exactly. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val normalized = regexp_replace(lower($"text"), "[^a-z0-9 ]", "")
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        md5(regexp_replace(normalized, " +", " ")).as("md5_fingerprint"))
      .orderBy($"doc_id")
  }

  /** Engine-native 64-bit rolling-hash fingerprint (codegen'd Catalyst
    * expression; oracle recomputes the full hash in DuckDB SQL via
    * [[OracleSql.rollingHash]]). */
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", GraftFunctions.rolling_hash64($"text").as("rolling_fp"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> (tokenCount _),
    "text_quality_score" -> (qualityScore _),
    "text_langid" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "text_rolling_fingerprint" -> (rollingFingerprint _),
  )

  val oracles: Map[String, String] = Map(
    "text_token_count" ->
      """SELECT doc_id,
        | cast(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        | cast(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |   AS BIGINT) AS bpeish_tokens,
        | cast(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_score" ->
      """SELECT doc_id,
        | round(length(regexp_replace(text, '[^a-z]', '', 'g'))
        |   * 1.0 / length(text), 4) AS alpha_ratio,
        | round(len(list_filter(string_split(text, ' '), w -> w IN
        |   ('the','a','an','and','or','of','to','in','is','it','that',
        |    'for','on','with','as')))
        |   * 1.0 / len(string_split(text, ' ')), 4) AS stop_ratio,
        | round((length(text) - len(string_split(text, ' ')) + 1)
        |   * 1.0 / len(string_split(text, ' ')), 4) AS mean_word_len,
        | round((length(regexp_replace(text, '[^a-z]', '', 'g'))
        |     * 1.0 / length(text)) * 0.5
        |   + (len(list_filter(string_split(text, ' '), w -> w IN
        |     ('the','a','an','and','or','of','to','in','is','it','that',
        |      'for','on','with','as')))
        |     * 1.0 / len(string_split(text, ' '))) * 0.3
        |   + (1.0 / ((length(text) - len(string_split(text, ' ')) + 1)
        |     * 1.0 / len(string_split(text, ' ')) + 1.0)) * 0.2, 4)
        |   AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |   ' +', ' ', 'g')) AS md5_fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // argmax via list_max over (hits, lang) structs — DuckDB struct
    // ordering is lexicographic by field, identical to Spark's
    // greatest() over struct(hits, lang).
    "text_langid" -> {
      def hits(ws: Seq[String]) =
        s"len(list_filter(w, x -> x IN (${ws.map("'" + _ + "'").mkString(",")})))"
      val structs = Seq(
        "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
        "en" -> Seq("the", "a", "and", "of", "to", "is"),
        "es" -> Seq("el", "la", "y", "de", "que", "es"),
        "fr" -> Seq("le", "la", "et", "de", "est", "un"))
        .map { case (l, ws) => s"{'hits': ${hits(ws)}, 'lang': '$l'}" }
        .mkString(", ")
      s"""WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |m AS (SELECT doc_id, lang, list_max([$structs]) AS best FROM s)
         |SELECT doc_id, lang AS labeled_lang, best.lang AS predicted_lang,
         |  CAST(best.hits AS BIGINT) AS hits
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "text_rolling_fingerprint" ->
      s"""SELECT doc_id, ${OracleSql.toSigned(OracleSql.rollingHash("text"))} AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
