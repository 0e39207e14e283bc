package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream/batch equivalence through the driver's correctness gate: this
  * query computes its answer by actually EXECUTING a Structured
  * Streaming job — file source → event-time windowed aggregation →
  * memory sink, drained with Trigger.AvailableNow — and the DuckDB
  * oracle checks it against the equivalent batch SQL. Same windowed
  * plan a 24/7 deployment would run with a watermark; AvailableNow is
  * the batch-drain mode (used for backfills in production), which is
  * what makes a synchronous, hash-checkable driver query possible.
  */
object StreamBatch {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Daily event counts per type, computed by a streaming query. */
  def streamingDailyAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.Tables
    // the events file carries TIMESTAMP(NANOS): the long-read +
    // truncate-to-micros convention is owned by graft.sources.Tables
    Tables.ensureNanosFlag(s)
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema

    val windowed = Tables.eventsTsFromNanos(
      s.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("day"), $"event_type", $"n_events")

    val table = s"graft_stream_daily_${nameCounter.incrementAndGet()}"
    val q = windowed.writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      // a timed-out drain must ERROR, not silently return a partial sink
      if (!q.awaitTermination(120000L))
        throw new java.util.concurrent.TimeoutException(
          "streaming drain did not finish within 120s")
    } finally q.stop()

    // materialize the (tiny: days × types) result locally, then drop
    // the memory-sink table so repeated invocations don't accumulate
    // cached sinks in the driver catalog
    val rows = s.table(table)
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    s.catalog.dropTempView(table)
    rows.toDF("day", "event_type", "n_events")
      .orderBy($"day", $"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_streaming_daily_agg" -> (streamingDailyAgg _),
  )

  val oracles: Map[String, String] = Map(
    "q23_streaming_daily_agg" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
  )
}
