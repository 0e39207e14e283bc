package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Interval/range join — the second "missing-in-Spark" operator class
  * (alongside [[AsofJoin]]): joining points to containing intervals
  * with only range predicates makes Spark plan a broadcast-nested-loop
  * or cartesian product, O(points × intervals).
  *
  * Implementation: INTERVAL BINNING. Each interval explodes into the
  * fixed-width time bins it covers (here 1-hour bins over 2-hour
  * windows → 2 rows per interval); each point computes its single bin;
  * the join becomes an EQUI-join on (key, bin) — shuffle-hash-joinable,
  * partition-prunable — followed by the exact containment filter.
  * Join volume is O(points + intervals × bins_per_interval), and the
  * bin width is the skew/selectivity dial (match it to median interval
  * length). This is how Spark engines (and DuckDB's own IEJoin
  * alternative) make range joins scale; PlanSpec asserts no
  * nested-loop/cartesian node survives in the physical plan.
  */
object RangeJoin {

  /** Maintenance-window analytics: count events falling inside each
    * 2-hour window opening at hours divisible by 6, per event type —
    * windows themselves derived from the data (deterministic). */
  def eventsInWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables(s, dir, "events")
      .select($"event_type", $"ts")
    val windows = events
      .filter(hour($"ts") % 6 === 0)
      .select($"event_type", date_trunc("hour", $"ts").as("wstart"))
      .distinct()
      .withColumn("wend", $"wstart" + expr("INTERVAL 2 HOURS"))
    // one row per covered hour-bin; points join on their own bin
    val binned = windows.withColumn("bin",
      explode(sequence($"wstart", $"wend" - expr("INTERVAL 1 HOUR"),
        expr("INTERVAL 1 HOUR"))))
    val pointed = events.withColumn("bin", date_trunc("hour", $"ts"))
    pointed.as("e")
      .join(binned.as("w"),
        $"e.event_type" === $"w.event_type" && $"e.bin" === $"w.bin" &&
          $"e.ts" >= $"w.wstart" && $"e.ts" < $"w.wend")
      .groupBy($"w.event_type".as("event_type"), $"w.wstart".as("wstart"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"event_type", $"wstart")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_range_join_binned" -> (eventsInWindows _),
  )

  val oracles: Map[String, String] = Map(
    // the oracle states the SEMANTICS directly as a range join —
    // DuckDB's optimizer handles the small scale; the Spark side's
    // binning must produce the identical relation
    "q22_range_join_binned" ->
      """WITH w AS (
        |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS wstart
        |  FROM events WHERE extract(hour FROM ts) % 6 = 0)
        |SELECT w.event_type, w.wstart, CAST(count(*) AS BIGINT) AS n_events
        |FROM w JOIN events e
        |  ON e.event_type = w.event_type
        |  AND e.ts >= w.wstart AND e.ts < w.wstart + INTERVAL 2 HOUR
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
