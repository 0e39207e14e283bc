package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video are opaque `binary`
  * columns with typed metadata; decode / feature-extract run as
  * batched partition-local transforms (the Scala analogue of
  * `mapInPandas` — same batch shape, schema contract, and partitioning
  * story; on PySpark this exact pipeline is a pandas-UDF).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB ([[FakeDecoder]]) — clearly marked — while all
  * Spark-side plumbing is real: binary payload column, metadata struct,
  * fixed-size batching, typed feature output (`Array[Float]`), and a
  * downstream aggregation to prove the schema survives.
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end;
  * the transform is narrow (no shuffle); batch size bounds peak memory
  * per task exactly like Arrow batches do for pandas UDFs.
  */
object Multimodal {

  val BATCH_SIZE = 64

  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: a real deployment would call an image/audio codec
    * here (per batch, amortizing model/codec init). This fake derives
    * deterministic pseudo-metadata and an 8-dim feature from the MD5 of
    * the payload bytes — a hash DuckDB can recompute, so the whole
    * batched-decode pipeline is ORACLE-checked end to end (the point is
    * the plumbing: binary column in, typed features out, per-batch
    * init amortization). */
  object FakeDecoder {
    def md5Hex(bytes: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val sb = new java.lang.StringBuilder(32)
      d.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
      // codec/model init would happen once per batch here
      batch.map { m =>
        val hex = md5Hex(m.payload)
        // 60-bit positive metadata seed = first 15 hex chars
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        // feature i = hex byte 8+i scaled to [0,1) — exact in Float
        val feature = Array.tabulate(8) { i =>
          Integer.parseInt(hex.substring(16 + 2 * i, 18 + 2 * i), 16) / 256.0f
        }
        MediaFeatures(
          doc_id = m.doc_id,
          modality = m.modality,
          byte_len = m.payload.length.toLong,
          width = (16 + h % 240L).toInt,
          height = (16 + (h >> 8) % 240L).toInt,
          n_frames = if (m.modality == "video")
            (1 + (h >> 16) % 32L).toInt else 1,
          feature = feature)
      }
    }
  }

  /** Documents → opaque binary payload column (UTF-8 bytes stand in for
    * media bytes; the schema/pipeline is what matters). */
  def binaryPayloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(
        $"doc_id",
        when($"doc_id" % 3 === 0, lit("image"))
          .when($"doc_id" % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("modality"),
        encode($"text", "UTF-8").as("payload"))
  }

  /** Checkable query: payload byte length + content checksum survive the
    * binary round trip. */
  def binaryStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryPayloads(s, dir)
      .select($"doc_id", $"modality",
        length($"payload").cast("long").as("byte_len"),
        md5($"payload").as("checksum"))
      .orderBy($"doc_id")
  }

  /** Batched decode/feature-extract over the binary column — the
    * mapInPandas-shaped stage (oracle: DuckDB re-derives the stub's
    * md5-based metadata/features). feature_sum is a sum of exact binary
    * fractions (k/256) folded sequentially inside the already-typed
    * batch transform (NOT an `aggregate()` higher-order function —
    * Spark HOF lambdas are interpreted, not codegen'd), so the
    * unrounded double matches the oracle bit-for-bit. */
  def featureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryPayloads(s, dir)
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BATCH_SIZE).flatMap { batch =>
          FakeDecoder.decodeBatch(batch).map { m =>
            var sum = 0.0d
            m.feature.foreach(f => sum += f.toDouble)
            (m.doc_id, m.modality, m.byte_len, m.width.toLong,
              m.height.toLong, m.n_frames.toLong, sum)
          }
        }
      }
      .toDF("doc_id", "modality", "byte_len", "width", "height",
        "n_frames", "feature_sum")
      .orderBy($"doc_id")
  }

  case class Frame(
      doc_id: Long, frame_idx: Int, offset_ms: Long,
      width: Int, height: Int, thumb: Array[Byte])

  /** Frame sampling: videos explode into one row per sampled frame
    * (every ~1 s of fake duration), stills pass through as a single
    * frame — the one-to-many batched transform shape (mapInPandas with
    * different output cardinality). "Resize" is the stubbed thumbnail:
    * the first 8 MD5 bytes of "docId:frameIdx" standing in for resized
    * pixels — md5-derived so DuckDB recomputes it for the oracle. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryPayloads(s, dir)
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BATCH_SIZE).flatMap { batch =>
          FakeDecoder.decodeBatch(batch).flatMap { m =>
            (0 until m.n_frames).map { f =>
              val digest = java.security.MessageDigest.getInstance("MD5")
                .digest(s"${m.doc_id}:$f"
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              Frame(m.doc_id, f, f * 1000L,
                math.max(16, m.width / 4), math.max(16, m.height / 4),
                java.util.Arrays.copyOf(digest, 8))
            }
          }
        }
      }
      .toDF()
      .select($"doc_id",
        $"frame_idx".cast("long").as("frame_idx"),
        $"offset_ms",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        hex(col("thumb")).as("thumb_hex"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Target shard size for [[shardManifest]] (small so the gate SF
    * produces a real multi-shard layout; production uses ~1 GB). */
  val SHARD_BYTES = 4096L

  /** WebDataset-style SHARD MANIFEST — the layout pass that turns a
    * curated media corpus into the fixed-size shard files a training
    * dataloader streams: per modality stream, payloads are laid out in
    * doc_id order and each doc is assigned to the shard where its
    * byte offset starts (`start_off div SHARD_BYTES` — assign-by-
    * start, so a shard may overflow by at most one payload; the
    * deterministic, prefix-sum-expressible form of greedy packing,
    * same discipline as [[Curation.packSequences]] in tokens).
    *
    * Scale shape: one shuffle on the stream key + a running-sum
    * window per stream; a production mix has thousands of
    * source×modality streams as the parallelism unit — a window never
    * sees more than one stream. The manifest (doc → shard, offset) is
    * exactly what the shard-writer job consumes; writing the actual
    * tar bytes is a partition-local pass over this manifest with no
    * further shuffle. */
  def shardManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"modality").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binaryPayloads(s, dir)
      .select($"doc_id", $"modality",
        length($"payload").cast("long").as("byte_len"))
      .withColumn("end_off", sum($"byte_len").over(w))
      .select($"modality", $"doc_id", $"byte_len",
        ($"end_off" - $"byte_len").as("start_off"),
        expr(s"(end_off - byte_len) div $SHARD_BYTES").as("shard_id"))
      .orderBy($"modality", $"doc_id")
  }

  /** Modality-aware semantic dedup — the CLIP-embedding near-dup pass
    * a multimodal corpus runs per modality (an image is never a
    * duplicate of an audio clip, whatever their embeddings say):
    * [[Similarity.cellAssignedOn]]'s IVF coarse quantizer shards the
    * corpus, and candidate pairs are restricted to the SAME
    * (modality, cell), so the join key gains the modality — pairwise
    * work drops below even the unimodal Σ|cell|²/2 and the shard unit
    * stays one executor's working set at 100 TB. Same seeded
    * centroids and cosine ≥ 0.4 predicate as the rest of the IVF
    * family; embeddings align to documents by id, and modality is the
    * shared doc_id mod 3 convention of [[binaryPayloads]]. */
  def embeddingDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorOps.dot
    val emb = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val assigned = Similarity.cellAssignedOn(emb)
      .withColumn("modality",
        when($"vec_id" % 3 === 0, lit("image"))
          .when($"vec_id" % 3 === 1, lit("audio"))
          .otherwise(lit("video")))
    assigned.as("a")
      .join(assigned.as("b"),
        $"a.modality" === $"b.modality" && $"a.cell" === $"b.cell" &&
          $"a.vec_id" < $"b.vec_id")
      .withColumn("cosine",
        dot($"a.v", $"b.v") / ($"a.norm" * $"b.norm"))
      .filter($"cosine" >= 0.4)
      .select($"a.modality".as("modality"), $"a.vec_id".as("va"),
        $"b.vec_id".as("vb"))
      .orderBy($"va", $"vb")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_embedding_dedup" -> (embeddingDedup _),
    "mm_binary_stats" -> (binaryStats _),
    "mm_feature_extract" -> (featureExtract _),
    "mm_frame_sample" -> (frameSample _),
    "mm_shard_manifest" -> (shardManifest _),
  )

  val oracles: Map[String, String] = Map(
    // same assignment re-derivation as the Similarity IVF oracles,
    // with the modality restriction on the pair join
    "mm_embedding_dedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e
         |  WHERE vec_id < ${Similarity.KMEANS_K}),
         |d AS (SELECT e.vec_id, c.cid,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(1, len(e.v) + 1),
         |      i -> (e.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)])
         |         * (e.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]))),
         |    (a, x) -> a + x) AS dist2
         |  FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist2, cid) AS rn
         |  FROM d) WHERE rn = 1)
         |SELECT CASE WHEN a.vec_id % 3 = 0 THEN 'image'
         |       WHEN a.vec_id % 3 = 1 THEN 'audio' ELSE 'video' END
         |    AS modality,
         |  a.vec_id AS va, b.vec_id AS vb
         |FROM asg a JOIN asg b ON a.cell = b.cell
         |  AND a.vec_id % 3 = b.vec_id % 3 AND a.vec_id < b.vec_id
         |JOIN e ea ON ea.vec_id = a.vec_id
         |JOIN e eb ON eb.vec_id = b.vec_id
         |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
         |ORDER BY va, vb""".stripMargin,
    "mm_shard_manifest" ->
      s"""WITH p AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
         |    AS modality,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
         |  FROM documents),
         |c AS (SELECT *, sum(byte_len) OVER (PARTITION BY modality
         |  ORDER BY doc_id) AS end_off FROM p)
         |SELECT modality, doc_id, byte_len,
         |  CAST(end_off - byte_len AS BIGINT) AS start_off,
         |  CAST((end_off - byte_len) // $SHARD_BYTES AS BIGINT)
         |    AS shard_id
         |FROM c ORDER BY modality, doc_id""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        | cast(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The stub decoder's outputs are md5-derived, so DuckDB recomputes
    // them exactly: h = first 15 md5 hex chars as a 60-bit int,
    // features = hex bytes 8..15 scaled by 1/256 (exact doubles).
    "mm_feature_extract" ->
      s"""WITH d AS (SELECT doc_id, text, md5(text) AS hx,
         |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  CAST(16 + h % 240 AS BIGINT) AS width,
         |  CAST(16 + (h // 256) % 240 AS BIGINT) AS height,
         |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + (h // 65536) % 32
         |       ELSE 1 END AS BIGINT) AS n_frames,
         |  (${(0 until 8).map(i =>
              s"CAST(concat('0x', substr(hx, ${17 + 2 * i}, 2)) AS BIGINT)")
              .mkString(" + ")}) / 256.0 AS feature_sum
         |FROM d ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |meta AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 1 + (h // 65536) % 32 ELSE 1 END AS n_frames,
        |  16 + h % 240 AS w, 16 + (h // 256) % 240 AS ht
        |  FROM d),
        |f AS (SELECT doc_id, unnest(range(n_frames)) AS frame_idx, w, ht FROM meta)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_idx * 1000 AS BIGINT) AS offset_ms,
        |  CAST(greatest(16, w // 4) AS BIGINT) AS width,
        |  CAST(greatest(16, ht // 4) AS BIGINT) AS height,
        |  upper(substr(md5(doc_id || ':' || frame_idx), 1, 16)) AS thumb_hex
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
