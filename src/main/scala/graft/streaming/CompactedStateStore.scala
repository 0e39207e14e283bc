package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Bounded-read materialization of the WFRun snapshot stream — the
  * parquet analogue of the reference's RocksDB-compacted state store
  * (scheduler/SchedulerTopology.java:130-146, where Kafka Streams keeps
  * only the latest value per key and compacts the changelog).
  *
  * The plain [[Scheduler.parquetStateSink]] appends EVERY snapshot
  * forever, so [[StateTable.latest]] windows over the whole history —
  * read cost grows with (runs × snapshots-per-run), not with live
  * state. This store fixes that contract:
  *
  *  - the streaming sink ([[streamingSink]]) appends snapshot batches
  *    to `log/` via foreachBatch (plain parquet appends — deliberately
  *    NO `_spark_metadata` commit log, so compaction owns file
  *    lifecycle without corrupting a streaming-sink manifest);
  *  - [[compact]] folds base ∪ unconsumed-log into a NEW VERSIONED
  *    base (`base_v<K+1>`, one row per run, latest by the scheduler's
  *    emit `seq`) and publishes it by atomically advancing a version
  *    pointer — never an in-place swap, so a reader that planned its
  *    scan against version K still finds every file;
  *  - files superseded by version K+1 (the K-1 base and the log files
  *    folded into K) are deleted one GENERATION later, giving in-flight
  *    readers a full compaction interval of grace — the same
  *    snapshot-isolation-plus-deferred-vacuum contract Delta/Iceberg
  *    implement, re-expressed over plain parquet;
  *  - [[read]] serves base ∪ log-minus-consumed through the same
  *    [[StateTable.latest]] fold, so answers are byte-identical to
  *    folding the full history while the files touched stay
  *    O(live runs + delta since last compaction).
  *
  * Crash contract (at-least-once, idempotent): foreachBatch may replay
  * a batch after recovery, appending duplicate (wfRunId, seq) rows —
  * harmless, `latest` keeps one of the identical copies. A crash
  * anywhere inside [[compact]] before the version-pointer move leaves
  * the published version untouched (orphan tmp/next-version dirs are
  * re-created on the next run); after the pointer move, deferred
  * deletions simply happen at the next compaction.
  */
final class CompactedStateStore(dir: String) extends Serializable {

  private def logDir: Path = Paths.get(dir, "log")
  private def baseDir(v: Long): Path = Paths.get(dir, s"base_v$v")
  private def versionFile: Path = Paths.get(dir, "_version")
  private def consumedFile(v: Long): Path = Paths.get(dir, s"_consumed_v$v")
  private def formatFile: Path = Paths.get(dir, "_format")

  /** On-disk format guard. Format 2 = enriched serving schema (no
    * `topic` column; `wfSpecName`/`status`/`aliases` materialized at
    * append time). A log written before the enrichment change holds
    * raw-schema files; appending enriched files beside them would give
    * spark.read.parquet (no mergeSchema) a mixed-schema footprint that
    * resolves to whichever file it samples — a silent wrong-schema
    * read. So: a store directory that already has data but no (or a
    * different) `_format` marker is REJECTED, not read; a fresh store
    * stamps the marker on first touch. */
  private def ensureFormat(): Unit = this.synchronized {
    val existing =
      if (Files.exists(formatFile))
        Some(new String(Files.readAllBytes(formatFile),
          StandardCharsets.UTF_8).trim)
      else None
    existing match {
      case Some(f) if f == CompactedStateStore.FORMAT =>
      case Some(f) => throw new IllegalStateException(
        s"CompactedStateStore at $dir has on-disk format '$f' but this " +
          s"code writes '${CompactedStateStore.FORMAT}' — migrate " +
          "(read old store, append rows into a fresh one) instead of " +
          "mixing schemas in one log")
      case None =>
        val hasData = parquetFiles(logDir).nonEmpty ||
          Files.exists(versionFile)
        if (hasData) throw new IllegalStateException(
          s"CompactedStateStore at $dir holds pre-format-marker data — " +
            "its files predate the enriched serving schema (format " +
            s"'${CompactedStateStore.FORMAT}'); migrate it instead of " +
            "appending a second schema into the same log")
        Files.createDirectories(Paths.get(dir))
        writeAtomic(formatFile, CompactedStateStore.FORMAT)
    }
  }

  private def parquetFiles(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Nil
    else graft.util.Dirs.listDir(p)(
      _.filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq.sorted)

  /** Currently-published compaction version (0 = never compacted). */
  def version: Long =
    if (Files.exists(versionFile))
      new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8)
        .trim.toLong
    else 0L

  private def readLines(p: Path): Set[String] =
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).toSet
    else Set.empty

  private def writeAtomic(p: Path, content: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append one micro-batch of snapshot rows to the log, enriched to
    * the serving schema ([[CompactedStateStore.enrich]]): scheduler
    * frames pass through, raw bus frames pay their one-time decode
    * HERE instead of on every query. */
  def append(batch: DataFrame): Unit = {
    ensureFormat()
    CompactedStateStore.enrich(batch)
      .write.mode("append").parquet(logDir.toString)
  }

  /** Streaming sink for the scheduler's snapshot rows; `compactEvery`
    * > 0 runs [[compact]] inline after every N-th batch (the reference
    * compacts continuously inside RocksDB; a cluster deployment would
    * schedule it out-of-band instead of on the micro-batch path). */
  def streamingSink(
      outputs: Dataset[SchedulerOut], checkpoint: String,
      compactEvery: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] = {
    val snaps = outputs.toDF().filter(col("kind") === SchedulerOut.SNAPSHOT)
    snaps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          compact(batch.sparkSession)
          ()
        }
      }
  }

  /** Files a [[read]] at the current version touches: the published
    * base plus log files not yet folded into it (read-cost
    * observability — tests assert this stays bounded). */
  def readFootprint: Seq[String] = {
    val v = version
    val consumed = readLines(consumedFile(v))
    parquetFiles(baseDir(v)) ++
      parquetFiles(logDir).filterNot(consumed.contains)
  }

  /** Fold base ∪ unconsumed-log into version v+1 and publish it.
    * Returns the number of log files folded in (0 = nothing to do). */
  def compact(spark: SparkSession): Long = this.synchronized {
    ensureFormat()
    val v = version
    // snapshot the input set BEFORE reading: appends that land during
    // the compaction keep their files and stay in the next delta
    val prevConsumed = readLines(consumedFile(v))
    val newlyConsumed =
      parquetFiles(logDir).filterNot(prevConsumed.contains)
    if (newlyConsumed.isEmpty) return 0L
    val baseFiles = parquetFiles(baseDir(v))

    val next = baseDir(v + 1)
    deleteRecursively(next)
    StateTable.latest(
      spark.read.parquet(newlyConsumed ++ baseFiles: _*), keepSeq = true)
      // one row per run: live state is small relative to history, and
      // a single file per compaction keeps the read file count O(1)
      // (a cluster deployment would coalesce to size-targeted files)
      .coalesce(1)
      .write.mode("overwrite").parquet(next.toString)

    // publish v+1: manifest first, then the version pointer (readers
    // resolve the pointer before the manifest, so they never see a
    // version without its manifest)
    writeAtomic(consumedFile(v + 1),
      (prevConsumed ++ newlyConsumed).mkString("\n"))
    writeAtomic(versionFile, (v + 1).toString)

    // deferred vacuum: delete what version v superseded — in-flight
    // readers of v planned against v's files, which all still exist
    deleteRecursively(baseDir(v - 1))
    prevConsumed.foreach(f => Files.deleteIfExists(Paths.get(f)))
    Files.deleteIfExists(consumedFile(v - 1))
    newlyConsumed.length.toLong
  }

  /** Latest snapshot per run over base ∪ unconsumed log — same answers
    * as [[StateTable.latest]] over the full history, reading only
    * compacted state + delta. */
  def read(spark: SparkSession): DataFrame = {
    ensureFormat()
    val files = readFootprint
    require(files.nonEmpty, s"CompactedStateStore at $dir is empty")
    StateTable.latest(spark.read.parquet(files: _*))
  }

  private def deleteRecursively(p: Path): Unit =
    graft.util.Dirs.deleteRecursively(p)
}

object CompactedStateStore {

  /** On-disk format id stamped into `_format` — bump when the stored
    * row schema changes incompatibly (see [[CompactedStateStore#append]]). */
  val FORMAT = "graft-state-v2-enriched"

  /** Ensure a snapshot frame carries the SERVING columns the scheduler
    * sink materializes (`wfSpecName`, `status`, columnar `aliases`) so
    * a store built from raw bus topics serves alias search through the
    * columnar branch of [[StateTable.searchByVariable]] instead of the
    * per-row JSON-decode fallback, and point lookups resolve their spec
    * without a decode. The decode happens HERE, once per snapshot, at
    * append/compaction time — never on the query path (a per-request
    * full-corpus decode would not survive 100× state cardinality).
    *
    * A frame that already has the columns (scheduler-written) passes
    * through untouched apart from dropping the bus `topic` column,
    * whose information lands in `wfSpecName`. Distributed: one typed
    * map over the frame, no driver materialization.
    */
  def enrich(snapshots: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.engine.StateCodec
    val cols = snapshots.columns.toSet
    if (cols.contains("aliases") && cols.contains("wfSpecName"))
      snapshots.drop("topic")
    else {
      val spark = snapshots.sparkSession
      import spark.implicits._
      // spec-name source that needs no decode, when one exists
      val fromTopic = !cols.contains("wfSpecName") && cols.contains("topic")
      val specCol =
        if (cols.contains("wfSpecName")) col("wfSpecName")
        else if (fromTopic) col("topic")
        else lit(null).cast("string")
      snapshots
        .select(col("wfRunId"), col("seq"), col("json"),
          specCol.as("specSrc"))
        .as[(String, Long, String, Option[String])]
        .map { case (id, seq, json, specSrc) =>
          val st = StateCodec.decode(json)
          val spec = specSrc match {
            case Some(s) if fromTopic =>
              s.stripPrefix(Scheduler.STATE_TOPIC_PREFIX)
            case Some(s) => s
            case None => st.wfSpecName
          }
          (id, spec, st.status, json, seq, st.aliasMap)
        }
        .toDF("wfRunId", "wfSpecName", "status", "json", "seq", "aliases")
    }
  }
}
