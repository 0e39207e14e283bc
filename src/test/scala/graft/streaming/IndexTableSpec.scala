package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity checks for the explicit alias index
  * (IndexEntryCollection semantics): firstOffset restarts when an alias
  * is deleted and re-created, mostRecentOffset heartbeats on every
  * confirming snapshot, deleted aliases drop out, getLatestEntry is
  * last-by-firstOffset, and Q2 answered from the index agrees with
  * StateTable.searchByVariable.
  */
class IndexTableSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  private def snapshots = {
    import spark.implicits._
    // (run, seq, aliases) — alias churn for r1's "who": present at 1-2,
    // DELETED at 3, re-created at 4, heartbeat at 5
    Seq(
      ("r1", 1L, Map("who" -> Seq("A"))),
      ("r1", 2L, Map("who" -> Seq("A"), "seg" -> Seq("X"))),
      ("r1", 3L, Map("seg" -> Seq("X"))),
      ("r1", 4L, Map("who" -> Seq("A"), "seg" -> Seq("X"))),
      ("r1", 5L, Map("who" -> Seq("A"), "seg" -> Seq("X"))),
      // r2: alias existed, then gone in the latest snapshot → DELETE
      ("r2", 1L, Map("who" -> Seq("A"))),
      ("r2", 2L, Map.empty[String, Seq[String]]),
      // r3: stable alias since seq 1
      ("r3", 1L, Map("who" -> Seq("A"))),
      ("r3", 2L, Map("who" -> Seq("A"))))
      .toDF("wfRunId", "seq", "aliases")
  }

  test("index entries carry reference offset semantics") {
    val idx = IndexTable.fromSnapshots(snapshots)
    val rows = idx.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set(
      // firstOffset restarted at 4 by the delete at 3; heartbeat to 5
      ("who", "A", "r1", 4L, 5L),
      ("seg", "X", "r1", 2L, 5L),
      // r2's alias is deleted (absent from latest snapshot): no entry
      ("who", "A", "r3", 1L, 2L)))
  }

  test("getLatestEntry = last by firstOffset; index search matches Q2") {
    val idx = IndexTable.fromSnapshots(snapshots)
    val latest = IndexTable.latestEntry(idx, "who", "A").collect()
    assert(latest.length == 1 && latest(0).getString(2) == "r1")

    val viaIndex = IndexTable.search(idx, "who", "A")
      .collect().map(_.getString(0)).toSet
    val viaState = StateTable.searchByVariable(
      StateTable.latest(snapshots), "who", "A")
      .collect().map(_.getString(0)).toSet
    assert(viaIndex == Set("r1", "r3"))
    assert(viaIndex == viaState)
  }
}
