package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream LEFT OUTER interval join — the join mode q26's inner
  * join deliberately avoids in the oracle-checked suite, because its
  * output is watermark-gated: an unmatched left row emits its
  * null-padded result only when the watermark proves no match can
  * still arrive, so an AvailableNow drain's final horizon withholds a
  * data-dependent tail (same reason the append-mode session variant
  * is spec-checked rather than oracle-checked). This spec pins the
  * semantics across a real multi-batch feed:
  *
  *  - a matched pair emits as soon as both rows arrive (inner-join
  *    behavior embedded in the outer join);
  *  - an unmatched view emits (view, null) ONLY after the watermark
  *    passes its join window — never earlier, exactly once;
  *  - join state expires: rows outside the watermark horizon leave
  *    the state store, so state is O(rate × window) on a 24/7 run.
  */
class StreamOuterJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.session

  private def t(min: Long) = new Timestamp(86400000L + min * 60000L)

  test("left-outer interval join: null rows emit on watermark, state expires") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "user_id", "kind")
    def side(kind: String, prefix: String) =
      events.filter($"kind" === kind)
        .select($"user_id".as(s"${prefix}_user"), $"ts".as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "10 minutes")

    val joined = side("view", "view").join(side("buy", "buy"),
      expr("""view_user = buy_user AND
             |buy_ts >= view_ts AND
             |buy_ts <= view_ts + INTERVAL 1 HOUR""".stripMargin),
      "leftOuter")

    val table = "graft_stream_louter"
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(table)
      .start()

    def rows(): Seq[(Long, Option[Long])] =
      spark.table(table)
        .select($"view_user", $"buy_user")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq.sortBy(r => (r._1, r._2.isEmpty))
    def stateRows(): Long =
      q.recentProgress.reverseIterator
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        .nextOption().getOrElse(-1L)

    try {
      // batch 1: user 1 view+buy inside the hour (match), user 2 view
      // with no buy. The match emits now; user 2 must NOT emit yet —
      // a buy could still arrive inside its window.
      input.addData((t(0), 1L, "view"), (t(10), 1L, "buy"),
        (t(0), 2L, "view"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some(1L))),
        s"expected only the matched pair, got ${rows()}")

      // batch 2: far-future rows on BOTH sides (the global watermark
      // is the min across inputs — advancing only the view side would
      // hold the join watermark at the stale buy side) push the
      // watermark (t180-10=t170) past user 2's join window (view t0 +
      // 1h + 10min allowance): the null-padded row emits exactly once,
      // and the expired join state leaves the store.
      input.addData((t(180), 9L, "view"), (t(180), 8L, "buy"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some(1L)), (2L, None)),
        s"expected the null row for user 2, got ${rows()}")
      // remaining state: user 9's open view + user 8's buy — the
      // t0-t10 rows are gone
      assert(stateRows() <= 4,
        s"join state did not expire: ${stateRows()} rows")

      // the null row never re-emits; user 9's own window closing emits
      // its null row (and only then)
      input.addData((t(400), 9L, "view"), (t(400), 8L, "buy"))
      q.processAllAvailable()
      assert(rows().count(_ == (2L, None)) == 1, "null row re-emitted")
      assert(rows().count(_ == (9L, None)) == 1,
        s"user 9's closed window should have emitted once: ${rows()}")
    } finally {
      q.stop()
      spark.catalog.dropTempView(table)
    }
  }
}
