package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All reads go through here so that
  * column pruning / predicate pushdown are applied uniformly and a
  * future switch to a catalog (bucketed tables, Delta, …) is one-line.
  *
  * Scale notes: at 100 TB these would be partitioned/bucketed tables
  * (e.g. lineitem bucketed by l_orderkey, orders by o_orderkey) so the
  * big fact-fact joins below co-locate without a shuffle. Parquet scans
  * here still exercise the same pushdown surface.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** CONDITIONAL parallelism fix-up in front of compute-bound narrow
    * stages. The driver test data ships each table as ONE parquet
    * split, so without help a per-document map runs on one core; at
    * 100 TB the scan's own input splits already supply parallelism and
    * an unconditional repartition would be a pure extra full shuffle
    * of the corpus (the avoidable-exchange anti-pattern). So: shuffle
    * ONLY when the input's physical partition count is below the
    * target — i.e. this is a no-op exactly where it would be waste.
    *
    * Why an EXPLICIT partition count (not AQE): AQE's shuffle-SIZE-
    * based coalescing sees the tiny shuffle payload of a compute-bound
    * stage (150k keys ≈ 2 MB) and would collapse it to 1-2 partitions
    * — serializing work that should use every core. An explicit count
    * opts the exchange out of coalescing. */
  def repartitionForCpu(
      df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Estimate the scan's split count from LOGICAL stats (leaf relation
    // bytes / maxPartitionBytes) — deliberately NOT df.rdd
    // .getNumPartitions, which forces physical planning + whole-stage
    // codegen compilation and costs 100-500 ms per query build (round-6
    // measured: the probe alone pushed sub-second queries toward their
    // 2x gate). The estimate errs LOW for many-small-files layouts
    // (ignores open-cost packing), which errs toward repartitioning —
    // safe locally, and at scale the bytes dwarf the threshold anyway.
    val maxPartBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val scanBytes = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    val estSplits = (scanBytes / maxPartBytes).toLong max 1L
    if (estSplits >= target) df
    else df.repartition(target, key)
  }

  /** The session's explicit shuffle-partition target — the count the
    * CPU-parallelism fix-ups pin coalescible exchanges to. */
  def cpuTarget(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Ensure the session can read parquet TIMESTAMP(NANOS) as long —
    * ideally set at session build (Verify/Bench/TestSpark); this
    * idempotent fallback covers caller-built sessions. */
  def ensureNanosFlag(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The NTZ→TimestampType cast in [[eventsTsFromNanos]] interprets
    * naive wall-clocks in the SESSION timezone, so it is only correct
    * under UTC. Verify/Bench/TestSpark pin UTC at session build; this
    * idempotent fallback (mirror of [[ensureNanosFlag]]) covers any
    * caller-built session — on a non-UTC host a silent offset shift is
    * a wrong-answer mode, not a rendering nit. */
  def ensureUtcSession(spark: SparkSession): Unit =
    if (spark.conf.get("spark.sql.session.timeZone", "") != "UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")

  /** The events `ts` normalization, ADAPTIVE to what the parquet
    * actually ships (the driver has regenerated this table across
    * rounds with different physical types):
    *   - TIMESTAMP(NANOS) read as long (nanosAsLong) → microsecond
    *     timestamp via exact INTEGER division (`/` would round-trip
    *     through DOUBLE, whose 53-bit mantissa cannot hold epoch
    *     nanos);
    *   - timestamp[us] with isAdjustedToUTC=false (pandas-written) →
    *     read as TIMESTAMP_NTZ, cast to TimestampType. The cast
    *     interprets the naive wall-clock in the SESSION timezone;
    *     Verify/Bench/tests all run UTC sessions, so the resulting
    *     instants equal the pre-drift nanos-derived ones bit-for-bit
    *     (and match what DuckDB's naive TIMESTAMP arithmetic computes
    *     for the oracle);
    *   - timestamp[us] adjusted to UTC (already TimestampType) →
    *     pass-through.
    * Shared by the batch loader below and the streaming reader so the
    * convention cannot diverge. */
  def eventsTsFromNanos(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        ensureUtcSession(df.sparkSession)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — extend the " +
          "normalization in Tables.eventsTsFromNanos")
    }
  }

  /** Streaming reader for the events table, owning the layout quirk:
    * the driver test data ships `events.parquet` as a FLAT FILE (the
    * file-stream source rejects a file as its basePath), while
    * BenchScale replicas — and any production table — are a DIRECTORY
    * of part files. Resolve whichever layout is present; ts
    * normalization stays with the caller via [[eventsTsFromNanos]]. */
  def eventsReadStream(
      spark: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    tableReadStream(spark, dir, "events", schema)

  /** Streaming reader for any table, same layout resolution as
    * [[eventsReadStream]] (which delegates here). */
  def tableReadStream(
      spark: SparkSession,
      dir: String,
      name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // optional admission throttle (files per micro-batch) — the knob a
    // 24/7 deployment uses to bound batch size, and what
    // MultiBatchSpec uses to prove the streaming queries' results are
    // batching-INDEPENDENT rather than single-drain artifacts
    val r0 = spark.conf.getOption("graft.stream.maxFilesPerTrigger")
      .foldLeft(spark.readStream.schema(schema))(
        (r, n) => r.option("maxFilesPerTrigger", n))
    val p = new java.io.File(s"$dir/$name.parquet")
    if (p.isDirectory) r0.parquet(p.getPath)
    else r0.option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }

  /** On-disk bytes of the events table (flat file or directory of
    * part files) — the input-volume estimate streaming state sizing
    * keys off (StreamBatch.withStatePartitions). */
  def eventsInputBytes(dir: String): Long = {
    val f = new java.io.File(s"$dir/events.parquet")
    if (f.isDirectory)
      f.listFiles().iterator.filter(_.isFile).map(_.length).sum
    else f.length
  }

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      ensureNanosFlag(spark)
      eventsTsFromNanos(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (used by tests / SQL surface). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
