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
    // the events file carries TIMESTAMP(NANOS): same long-read +
    // truncate-to-micros handling as graft.sources.Tables
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema

    val windowed = s.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
    try q.awaitTermination(120000L)
    finally q.stop()

    s.table(table)
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
