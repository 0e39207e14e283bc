package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 24/7 variant of q38's session windows: watermark + APPEND mode,
  * the deployment shape the q38 docstring promises (StreamBatch.scala —
  * complete mode is the oracle-checkable batch-drain variant; a
  * long-running stream flips to append and pays bounded state).
  *
  * What append mode buys and costs, asserted here across a REAL
  * multi-batch drain:
  *  - a session is emitted exactly once, only after the watermark
  *    passes its end (closed sessions — no retraction, sink-friendly);
  *  - sessions still inside the watermark horizon are withheld (the
  *    reason an AvailableNow drain can't be hash-checked in append
  *    mode: the final horizon holds back a data-dependent tail);
  *  - state is BOUNDED: closed sessions leave the state store, so
  *    state rows track open sessions, not emitted history — the
  *    O(open) vs O(all-sessions) difference that makes 24/7 viable.
  */
class SessionAppendSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  private def t(min: Long) = new Timestamp(86400000L + min * 60000L)

  test("append-mode session windows emit closed sessions with bounded state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")

    val table = "graft_session_append"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(table)
      .start()

    def emitted(): Seq[(Long, Timestamp, Timestamp, Long)] =
      spark.table(table)
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2.getTime))
    def stateRows(): Long =
      q.recentProgress.reverseIterator
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        .nextOption().getOrElse(-1L)

    try {
      // batch 1: user 1 opens a 2-event session, user 2 a 1-event one.
      // Watermark (max ts - 10 min) is far below both session ends —
      // NOTHING may emit yet, both sessions are open state.
      input.addData((t(0), 1L), (t(5), 1L), (t(3), 2L))
      q.processAllAvailable()
      assert(emitted().isEmpty, "sessions emitted before watermark closed them")
      assert(stateRows() == 2, s"expected 2 open sessions, got ${stateRows()}")

      // batch 2: user 1 reappears at t+120min. The new watermark
      // (t110) passes both earlier session ends (t35, t33): they emit
      // exactly once and LEAVE the state store; the new session stays.
      input.addData((t(120), 1L))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, t(0), t(35), 2L),
        (2L, t(3), t(33), 1L)))
      assert(stateRows() == 1,
        s"closed sessions must leave state; got ${stateRows()} rows")

      // batch 3: t+240min closes the t120 session (watermark t230);
      // the t240 session is withheld — inside the horizon forever
      // unless more data arrives, which is the documented reason the
      // oracle-checked q38 uses complete mode for a bounded drain.
      input.addData((t(240), 1L))
      q.processAllAvailable()
      assert(emitted() == Seq(
        (1L, t(0), t(35), 2L),
        (1L, t(120), t(150), 1L),
        (2L, t(3), t(33), 1L)))
      assert(stateRows() == 1,
        s"exactly the in-horizon session should remain, got ${stateRows()}")
    } finally {
      q.stop()
      spark.catalog.dropTempView(table)
    }
  }

  test("a late event merges two open sessions before the watermark closes them") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "40 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")

    val table = "graft_session_merge"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(table)
      .start()

    try {
      // two sessions 50 min apart — distinct (gap > 30)
      input.addData((t(0), 7L), (t(50), 7L))
      q.processAllAvailable()
      // a LATE bridging event at t25 (inside the 40-min allowance)
      // extends [t0,t30) to [t0,t55), which now overlaps [t50,t80):
      // the MERGING-state property — two open sessions fuse into one
      input.addData((t(25), 7L))
      q.processAllAvailable()
      // advance the watermark past the merged end (t80): one session
      // emits, spanning all three events
      input.addData((t(130), 7L))
      q.processAllAvailable()
      val got = spark.table(table)
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSeq
      assert(got == Seq((7L, t(0), t(80), 3L)),
        s"expected ONE merged session over three events, got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView(table)
    }
  }
}
