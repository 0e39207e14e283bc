package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Read-your-writes barrier for the streaming run-state surface —
  * parity with the reference API's offset bookkeeping
  * (APIStreamsContext.waitForProcessing:168-222, OffsetInfo.java:13-39):
  * a POST there blocks until the scheduler's state store has consumed
  * the event log through the POSTed record's offset, so an immediate
  * GET sees the write.
  *
  * Spark surface: the producer keeps the source offset it wrote at
  * (MemoryStream.addData returns it; a Kafka producer gets it from
  * RecordMetadata), then [[awaitProcessed]] polls the query's progress
  * until a COMPLETED batch's end offset covers it. Progress entries are
  * published only after a batch commits, so once covered, every sink
  * write derived from the event — snapshot rows, TSRs — is visible.
  *
  * Polls progress rather than calling `processAllAvailable()` — that
  * call can block forever under a ProcessingTime trigger on this Spark
  * build even when the stream is quiescent.
  */
object ReadYourWrites {

  /** Block until `query` has committed a batch whose end offset for
    * source `sourceIdx` is ≥ `offset`. Long-valued offsets cover
    * MemoryStream/file sources; Kafka's JSON offset maps would need a
    * per-partition compare (same polling skeleton). */
  def awaitProcessed(
      query: StreamingQuery,
      offset: Long,
      sourceIdx: Int = 0,
      timeoutMs: Long = 30000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      val covered = query.recentProgress.exists { p =>
        p.sources.lift(sourceIdx).exists { s =>
          Option(s.endOffset).flatMap(parseLongOffset).exists(_ >= offset)
        }
      }
      if (covered) return
      Thread.sleep(25L)
    }
    throw new java.util.concurrent.TimeoutException(
      s"stream did not process source offset $offset within ${timeoutMs}ms " +
        s"(lastProgress=${Option(query.lastProgress).fold("none")(_.json)})")
  }

  /** MemoryStream / LongOffset-style offsets serialize as a bare JSON
    * number. */
  private def parseLongOffset(json: String): Option[Long] =
    try Some(json.trim.toLong)
    catch { case _: NumberFormatException => None }
}
