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
    * deterministic pseudo-metadata and an 8-dim feature from payload
    * bytes so the pipeline is testable end to end. */
  object FakeDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
      // codec/model init would happen once per batch here
      batch.map { m =>
        val h = graft.functions.TextHashes.mix64(
          java.util.Arrays.hashCode(m.payload).toLong)
        val feature = Array.tabulate(8) { i =>
          val hi = graft.functions.TextHashes.mix64(h + i)
          ((hi % 1000L).toFloat) / 1000.0f
        }
        MediaFeatures(
          doc_id = m.doc_id,
          modality = m.modality,
          byte_len = m.payload.length.toLong,
          width = (16 + math.floorMod(h, 240L)).toInt,
          height = (16 + math.floorMod(h >> 8, 240L)).toInt,
          n_frames = if (m.modality == "video")
            (1 + math.floorMod(h >> 16, 32L)).toInt else 1,
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
    * mapInPandas-shaped stage (rows-only check: decoder is a stub). */
  def featureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryPayloads(s, dir)
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BATCH_SIZE).flatMap(batch => FakeDecoder.decodeBatch(batch))
      }
      .toDF()
      .select($"doc_id", $"modality", $"byte_len", $"width", $"height",
        $"n_frames",
        round(aggregate($"feature".cast("array<double>"), lit(0.0d),
          (acc, x) => acc + x), 4).as("feature_sum"))
      .orderBy($"doc_id")
  }

  case class Frame(
      doc_id: Long, frame_idx: Int, offset_ms: Long,
      width: Int, height: Int, thumb: Array[Byte])

  /** Frame sampling: videos explode into one row per sampled frame
    * (every ~1 s of fake duration), stills pass through as a single
    * frame — the one-to-many batched transform shape (mapInPandas with
    * different output cardinality). "Resize" is the stubbed thumbnail:
    * deterministic 8-byte digest standing in for resized pixels. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    binaryPayloads(s, dir)
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(BATCH_SIZE).flatMap { batch =>
          FakeDecoder.decodeBatch(batch).flatMap { m =>
            (0 until m.n_frames).map { f =>
              val h = graft.functions.TextHashes.mix64(m.doc_id * 31L + f)
              val thumb = new Array[Byte](8)
              var i = 0
              while (i < 8) { thumb(i) = ((h >>> (8 * i)) & 0xff).toByte; i += 1 }
              Frame(m.doc_id, f, f * 1000L,
                math.max(16, m.width / 4), math.max(16, m.height / 4), thumb)
            }
          }
        }
      }
      .toDF()
      .select($"doc_id", $"frame_idx", $"offset_ms", $"width", $"height",
        hex(col("thumb")).as("thumb_hex"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_stats" -> (binaryStats _),
    "mm_feature_extract" -> (featureExtract _),
    "mm_frame_sample" -> (frameSample _),
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_stats" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image'
        |      WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        | cast(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_feature_extract: stubbed decoder → rows-only.
  )
}
