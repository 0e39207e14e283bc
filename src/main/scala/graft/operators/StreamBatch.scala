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
      Tables.eventsReadStream(s, dir, rawSchema))
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

  /** Stream-stream interval join, executed by a real Structured
    * Streaming job: each `view` event joins the same user's `purchase`
    * events within the following hour. Both sides carry a watermark
    * and the join condition bounds `buy_ts` to a closed interval after
    * `view_ts`, which is exactly what lets Spark expire join state —
    * on an unbounded 24/7 stream each side retains only ~1 hour + late
    * allowance of events per user, so state is O(rate × window), not
    * O(history). Append mode: inner-join matches emit as soon as both
    * rows arrive. The DuckDB oracle replays the identical interval
    * join as batch SQL (stream/batch equivalence, like q23).
    */
  def streamingIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.Tables
    Tables.ensureNanosFlag(s)
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema

    def side(tpe: String, prefix: String) =
      Tables.eventsTsFromNanos(
        Tables.eventsReadStream(s, dir, rawSchema))
        .filter($"event_type" === tpe)
        .select($"event_id".as(s"${prefix}_id"),
          $"user_id".as(s"${prefix}_user"), $"ts".as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = side("view", "view").join(side("purchase", "buy"),
      expr("""view_user = buy_user AND
             |buy_ts >= view_ts AND
             |buy_ts <= view_ts + INTERVAL 1 HOUR""".stripMargin))

    val table = s"graft_stream_join_${nameCounter.incrementAndGet()}"
    val q = joined.writeStream
      .format("memory")
      .queryName(table)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(120000L))
        throw new java.util.concurrent.TimeoutException(
          "streaming drain did not finish within 120s")
    } finally q.stop()

    // result is bounded by purchases × views-in-preceding-hour — at
    // sf0.1 a few thousand rows; collect to detach from the dropped
    // memory sink, exactly as streamingDailyAgg does
    val rows = s.table(table)
      .select($"view_user".as("user_id"), $"view_id", $"buy_id",
        $"view_ts", $"buy_ts")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSeq
    s.catalog.dropTempView(table)
    rows.toDF("user_id", "view_id", "buy_id", "view_ts", "buy_ts")
      .orderBy($"view_id", $"buy_id")
  }

  /** Streaming deduplication — the third stateful-operator family
    * next to the windowed aggregate (q23) and the stream-stream join
    * (q26): GLOBAL `dropDuplicates` over the (user_id, event_type)
    * key. Global (no watermark) is the variant with exact,
    * batching-independent semantics — `dropDuplicatesWithinWatermark`
    * re-emits a key whose duplicates span beyond the horizon as soon
    * as the source splits into multiple micro-batches, so its output
    * depends on file batching, which no batch oracle can replay. The
    * cost is state that never expires: O(distinct keys), the
    * documented tradeoff for an exact effectively-once guarantee (the
    * scheduler's bounded-window guid dedupe is the other point on
    * that dial). Output is the KEY SET only — which duplicate arrives
    * first is execution-order-dependent, keys alone are deterministic
    * — so the oracle is a plain DISTINCT. */
  def streamingDedupKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.Tables
    Tables.ensureNanosFlag(s)
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema

    val deduped = Tables.eventsTsFromNanos(
      Tables.eventsReadStream(s, dir, rawSchema))
      .select($"user_id", $"event_type")
      .dropDuplicates("user_id", "event_type")

    val table = s"graft_stream_dedup_${nameCounter.incrementAndGet()}"
    val q = deduped.writeStream
      .format("memory")
      .queryName(table)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(120000L))
        throw new java.util.concurrent.TimeoutException(
          "streaming drain did not finish within 120s")
    } finally q.stop()

    val rows = s.table(table).as[(Long, String)].collect().toSeq
    s.catalog.dropTempView(table)
    rows.toDF("user_id", "event_type")
      .orderBy($"user_id", $"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_streaming_daily_agg" -> (streamingDailyAgg _),
    "q26_stream_stream_join" -> (streamingIntervalJoin _),
    "q31_streaming_dedup_keys" -> (streamingDedupKeys _),
  )

  val oracles: Map[String, String] = Map(
    "q23_streaming_daily_agg" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q26_stream_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS buy_id,
        | v.ts AS view_ts, p.ts AS buy_ts
        |FROM events v JOIN events p
        | ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, buy_id""".stripMargin,
    "q31_streaming_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
