package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit secondary-index table with the reference's offset
  * bookkeeping (api/metadata/IndexEntryCollection.java:9-43,
  * IndexEntry.java: objectId/firstOffset/mostRecentOffset,
  * ResourceIndexProcessor.java:82-120): per (aliasKey, aliasValue) an
  * entry per currently-matching object, where CREATE stamps
  * firstOffset, every update HEARTBEATs mostRecentOffset, and removal
  * DELETEs the entry — i.e. firstOffset is the start of the alias's
  * LATEST CONTIGUOUS presence streak and mostRecentOffset its latest
  * confirmation.
  *
  * The reference maintains this imperatively in RocksDB from an index
  * event stream; here the same table is derived relationally from the
  * append-only snapshot log (which is the Spark-native equivalent of
  * replaying the index topic — and recoverable from scratch, which the
  * reference's store is not without a replay).
  *
  * Offset note: the reference stamps the ID-topic partition offset; the
  * snapshot log's `seq` is per-run monotonic, so offsets order entries
  * WITHIN a run exactly and [[latestEntry]] breaks cross-run ties by
  * objectId (documented delta — the reference's cross-run order is
  * partition-offset arrival order, which Spark does not totalize).
  */
object IndexTable {

  /** One row per IndexEntry: (k, v, objectId, firstOffset,
    * mostRecentOffset), for aliases present in each run's LATEST
    * snapshot (deleted aliases drop out, like IndexOperation.DELETE). */
  def fromSnapshots(snapshots: DataFrame): DataFrame = {
    // exploded presence facts: (run, seq, k, v)
    val present = snapshots
      .select(col("wfRunId"), col("seq"),
        explode(col("aliases")).as(Seq("k", "vs")))
      .select(col("wfRunId"), col("seq"), col("k"), explode(col("vs")).as("v"))
      .distinct()
    val latest = snapshots.groupBy(col("wfRunId"))
      .agg(max(col("seq")).as("latestSeq"))
    // an alias is indexed iff it appears in the run's latest snapshot
    val current = present.join(latest, "wfRunId")
      .filter(col("seq") === col("latestSeq"))
      .select(col("wfRunId"), col("k"), col("v"))
    // presence grid of each current alias across its run's snapshots
    val snapSeqs = snapshots.select(col("wfRunId"), col("seq"))
    val grid = current.join(snapSeqs, "wfRunId")
    val flagged = grid.join(
      present.withColumn("hit", lit(1)), Seq("wfRunId", "k", "v", "seq"), "left")
    val bounds = flagged.groupBy(col("wfRunId"), col("k"), col("v"))
      .agg(
        max(when(col("hit").isNull, col("seq"))).as("lastAbsent"),
        max(col("seq")).as("mostRecentOffset"))
    // firstOffset = earliest presence AFTER the last absence (the
    // reference deletes + re-creates the entry across a gap, resetting
    // firstOffset — ResourceIndexProcessor CREATE/DELETE handling)
    flagged.filter(col("hit").isNotNull)
      .join(bounds, Seq("wfRunId", "k", "v"))
      .filter(col("lastAbsent").isNull || col("seq") > col("lastAbsent"))
      .groupBy(col("k"), col("v"), col("wfRunId").as("objectId"),
        col("mostRecentOffset"))
      .agg(min(col("seq")).as("firstOffset"))
      .select(col("k"), col("v"), col("objectId"),
        col("firstOffset"), col("mostRecentOffset"))
  }

  /** IndexEntryCollection.getLatestEntry (:21-24): last entry in
    * creation order = max firstOffset (objectId breaks cross-run ties,
    * see class doc). */
  def latestEntry(index: DataFrame, key: String, value: String): DataFrame =
    index.filter(col("k") === key && col("v") === value)
      .orderBy(col("firstOffset").desc, col("objectId").desc)
      .limit(1)

  /** Q2/Q9 answered from the index: all objectIds for (key, value) —
    * must agree with [[StateTable.searchByVariable]]. */
  def search(index: DataFrame, key: String, value: String): DataFrame =
    index.filter(col("k") === key && col("v") === value)
      .select(col("objectId").as("wfRunId"))
}
