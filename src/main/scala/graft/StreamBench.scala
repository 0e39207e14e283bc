package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

import graft.engine._
import graft.streaming.{Scheduler, SchedulerOut}
import graft.streaming.bus.GraftBus

/** BASELINE.md `speedtest_wallclock_N` through the STREAMING engine:
  * N concurrent `speed_test`-shaped WFRuns (50 sequential task
  * round-trips each — reference examples/workflows/
  * speed_test_50_tasks.py:12-15) driven through the real
  * flatMapGroupsWithState scheduler with a loopback worker, measured
  * first-event → last COMPLETED snapshot.
  *
  * This is the closest Spark analogue of the reference's canonical
  * workload (Kafka round-trip per task + 10 ms worker poll floor,
  * DepInjContext.java:348-354).
  *
  * Two transports, selected by the 2nd arg:
  *  - `memory` (default): MemoryStream in, foreachBatch loopback out —
  *    measures the engine + scheduler with no transport I/O
  *    (`graft.FoldBench` is the same workload through the batch fold:
  *    the engine ceiling with no micro-batch latency at all);
  *  - `bus`: the full S1/S2/S3 topology over `format("graft-bus")`
  *    file-backed topics — WF events consumed from a real by-name
  *    connector, TSRs landing on the per-TaskDef topic, a polling
  *    worker thread (reference TaskWorker.java:102-145 shape)
  *    producing TASK_EVENTs back, snapshots on the per-spec state
  *    topic. Adds one file create+rename per record on every hop, so
  *    the delta vs `memory` QUANTIFIES the per-record transport cost
  *    instead of asserting it.
  *
  * Usage: runMain graft.StreamBench [nRuns] [memory|bus] — prints one
  * JSON line.
  */
object StreamBench {

  private def speedTestSpec(nTasks: Int): WFSpec = {
    val nodes = (0 until nTasks).map { i =>
      i.toString -> Node(name = i.toString, nodeType = NodeType.TASK,
        taskDefName = Some("echo_task"),
        variables = ListMap("thing" -> VariableAssignment(
          literalValue = s"task-$i")))
    }
    val edges = (0 until nTasks - 1)
      .map(i => Edge(i.toString, (i + 1).toString)).toVector
    SpecCodec.validate(WFSpec("speed_test", "speed_test-id", "main",
      ListMap("main" -> ThreadSpec("main", null,
        nodes = ListMap.from(nodes), edges = edges))))
  }

  private def now() = System.currentTimeMillis()

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    args.lift(1).getOrElse("memory") match {
      case "bus" => busMain(n)
      case _ => memoryMain(n)
    }
  }

  // ===== memory transport: engine + scheduler, no transport I/O =====

  private def memoryMain(n: Int): Unit = {
    val spec = speedTestSpec(50)
    val spark = session()
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[WFEvent]
    val outputs = Scheduler(input.toDS(), Map(spec.name -> spec))
    val completed = TrieMap.empty[String, Boolean]

    // Loopback worker: answers every TSR within the same micro-batch
    // cycle (the reference's worker is a separate Kafka consumer with a
    // 10 ms poll floor per task). The driver-side collect() here is the
    // bench harness STANDING IN for the reference's external workers —
    // TSR batches are bounded by in-flight runs — it is not an engine
    // code path (the engine's own outputs flow through the streaming
    // sink unchanged; see `busMain` for the same loop over real topics).
    val query = outputs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SchedulerOut], _: Long) =>
        val events = Vector.newBuilder[WFEvent]
        batch.collect().foreach {
          case r if r.kind == SchedulerOut.TSR =>
            val tsr = EventCodec.decodeTsr(r.json)
            val t = now()
            val stdout = LHJson.render(
              tsr.variableSubstitutions.getOrElse("thing", null))
            events += WFEvent(spec.objectId, spec.name, tsr.wfRunId, t,
              tsr.threadId, WFEventType.TASK_EVENT,
              EventCodec.encodeTaskRunEvent(TaskRunEvent(
                tsr.threadId, tsr.taskRunPosition, t, 0,
                Some(TaskRunStartedPayload("bench-worker", None)), None)))
            events += WFEvent(spec.objectId, spec.name, tsr.wfRunId, t + 1,
              tsr.threadId, WFEventType.TASK_EVENT,
              EventCodec.encodeTaskRunEvent(TaskRunEvent(
                tsr.threadId, tsr.taskRunPosition, t + 1, 0, None,
                Some(TaskRunEndedPayload(TaskRunResult(
                  Some(stdout), None, success = true, 0))))))
          case r if r.status == Status.COMPLETED =>
            completed.put(r.wfRunId, true)
          case _ => ()
        }
        val evs = events.result()
        if (evs.nonEmpty) { input.addData(evs); () }
      }
      .start()

    val t0 = System.nanoTime()
    input.addData((0 until n).map(i =>
      WFEvent(spec.objectId, spec.name, s"speed-$i", now(), 0,
        WFEventType.WF_RUN_STARTED,
        EventCodec.encodeRunRequest(WFRunRequest(
          ListMap.empty, spec.objectId, Some(s"speed-$i"))))))

    val deadline = now() + 600000
    while (completed.size < n && now() < deadline) Thread.sleep(50)
    val wallSec = (System.nanoTime() - t0) / 1e9
    query.stop()
    require(completed.size == n, s"only ${completed.size}/$n completed")
    println(f"""{"metric":"speedtest_streaming_wallclock_$n","value":$wallSec%.2f,"unit":"sec","runs_per_sec":${n / wallSec}%.0f,"task_roundtrips_per_sec":${n * 50 / wallSec}%.0f}""")
    spark.stop()
  }

  // ===== bus transport: full S1/S2/S3 over graft-bus topics =====

  private def busMain(n: Int): Unit = {
    val spec = speedTestSpec(50)
    val spark = session()
    val root = java.nio.file.Files
      .createTempDirectory("graft-streambench-bus").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-streambench-ckpt").toString
    val eventsTopic = s"wfEvents__${spec.name}"
    val stateTopic = s"${Scheduler.STATE_TOPIC_PREFIX}${spec.name}"

    val events = Scheduler.busEventSource(spark, root, "wfEvents__.*")
    val outputs = Scheduler(events, Map(spec.name -> spec))
    val query = Scheduler.busWireSink(outputs, root, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()

    // Polling worker over the per-TaskDef topic — the reference
    // TaskWorker shape (poll, execute, produce result events).
    @volatile var stop = false
    val worker = new Thread(() => {
      var cursor = Map.empty[Int, Long]
      while (!stop) {
        for (p <- GraftBus.partitions(root, "echo_task")) {
          val from = cursor.getOrElse(p, 0L)
          val until = GraftBus.nextOffset(root, "echo_task", p)
          GraftBus.read(root, "echo_task", p, from, until).foreach { rec =>
            val tsr = EventCodec.decodeTsr(rec.value)
            val stdout = LHJson.render(
              tsr.variableSubstitutions.getOrElse("thing", null))
            val t = now()
            val guid = s"w-${tsr.wfRunId}-${tsr.taskRunPosition}"
            Seq(
              WFEvent(spec.objectId, spec.name, tsr.wfRunId, t,
                tsr.threadId, WFEventType.TASK_EVENT,
                EventCodec.encodeTaskRunEvent(TaskRunEvent(
                  tsr.threadId, tsr.taskRunPosition, t, 0,
                  Some(TaskRunStartedPayload("bus-worker", None)), None)),
                guid = s"$guid-started"),
              WFEvent(spec.objectId, spec.name, tsr.wfRunId, t + 1,
                tsr.threadId, WFEventType.TASK_EVENT,
                EventCodec.encodeTaskRunEvent(TaskRunEvent(
                  tsr.threadId, tsr.taskRunPosition, t + 1, 0, None,
                  Some(TaskRunEndedPayload(TaskRunResult(
                    Some(stdout), None, success = true, 0))))),
                guid = s"$guid-ended")
            ).foreach(ev => GraftBus.send(root, eventsTopic, ev.wfRunId,
              EventCodec.encodeWFEvent(ev)))
          }
          cursor += p -> until
        }
        Thread.sleep(10) // the reference's default worker poll interval
      }
    })
    worker.setDaemon(true)
    worker.start()

    // Completion tracker: incremental cursors over the state topic;
    // per poll round decode only the NEWEST snapshot per run (earlier
    // ones in the same batch are superseded), so decode cost is
    // O(poll rounds × active runs), not O(total snapshots).
    val completed = TrieMap.empty[String, Boolean]
    val tracker = new Thread(() => {
      var cursor = Map.empty[Int, Long]
      while (!stop) {
        for (p <- GraftBus.partitions(root, stateTopic)) {
          val from = cursor.getOrElse(p, 0L)
          val until = GraftBus.nextOffset(root, stateTopic, p)
          if (until > from) {
            GraftBus.read(root, stateTopic, p, from, until)
              .groupBy(_.key).values.map(_.maxBy(_.offset))
              .foreach { rec =>
                val st = StateCodec.decode(rec.value)
                if (st.status == Status.COMPLETED)
                  completed.put(st.objectId, true)
              }
            cursor += p -> until
          }
        }
        Thread.sleep(100)
      }
    })
    tracker.setDaemon(true)
    tracker.start()

    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val ev = WFEvent(spec.objectId, spec.name, s"speed-$i", now(), 0,
        WFEventType.WF_RUN_STARTED,
        EventCodec.encodeRunRequest(WFRunRequest(
          ListMap.empty, spec.objectId, Some(s"speed-$i"))))
      GraftBus.send(root, eventsTopic, ev.wfRunId,
        EventCodec.encodeWFEvent(ev))
    }

    val deadline = now() + 600000
    while (completed.size < n && now() < deadline) Thread.sleep(50)
    val wallSec = (System.nanoTime() - t0) / 1e9
    stop = true
    query.stop()
    require(completed.size == n, s"only ${completed.size}/$n completed")
    println(f"""{"metric":"speedtest_streaming_bus_$n","value":$wallSec%.2f,"unit":"sec","runs_per_sec":${n / wallSec}%.0f,"task_roundtrips_per_sec":${n * 50 / wallSec}%.0f}""")
    if (sys.env.contains("SPARK_GRAFT_SERVE_BENCH")) serveBench(spark, spec, root, n)
    spark.stop()
  }

  /** Serving-layer latency over the state the speed test just wrote
    * (n runs × 51 snapshots each on the bus state topic) — BASELINE.md
    * `query_latency`, measured instead of asserted:
    *
    *  - `serve_point_lookup_bus`: `GET /WFRun/{id}` through [[
    *    graft.streaming.GraftApi]] — key-pruned distributed bus scan +
    *    SDK export, the uncompacted worst case (reads grow with
    *    history);
    *  - `serve_alias_search_bus`: `GET /WFRunAlias` — full predicate
    *    scan of latest snapshots;
    *  - `serve_point_lookup_compacted`: the same point lookup against
    *    [[graft.streaming.CompactedStateStore]] base∪delta — the
    *    24/7 deployment's read path, O(live runs) not O(history).
    *
    * p50 of `reps` timed calls after 2 warmups, printed as one JSON
    * line per metric. */
  private def serveBench(
      spark: SparkSession, spec: WFSpec, root: String, n: Int): Unit = {
    import graft.streaming.{CompactedStateStore, GraftApi, MetadataStore,
      StateTable}
    val metaRoot = java.nio.file.Files
      .createTempDirectory("graft-servebench-meta").toString
    val store = new MetadataStore(spark, metaRoot)
    store.postWfSpec(SpecCodec.encode(spec))
    val api = new GraftApi(spark, store, root)

    def p50ms(reps: Int)(body: => Unit): Double = {
      (1 to 2).foreach(_ => body) // plan/codegen warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      times(times.length / 2)
    }
    val ids = (0 until 9).map(i => s"speed-${i * (n - 1) / 8}")
    var cursor = 0
    def nextId(): String = { cursor = (cursor + 1) % ids.length; ids(cursor) }

    // The raw-bus serve paths are history-proportional BY DESIGN (the
    // documented worst case the compacted store replaces); at large n
    // each rep costs tens of seconds and measures nothing new. The
    // decade protocol skips them past the n they were characterized at
    // (SPARK_GRAFT_SERVE_SKIP_BUS=1) and decades the compacted/cached
    // paths — the ones whose flat-in-history claim is under test.
    val skipBus = sys.env.contains("SPARK_GRAFT_SERVE_SKIP_BUS")
    val pointBus = if (skipBus) -1.0 else p50ms(9) {
      require(api.statusOf(api.getWfRun(nextId())) == api.RpcStatus.OK)
    }
    val aliasBus = if (skipBus) -1.0 else
      p50ms(5)(api.getWfRunAlias("thing", "task-1"))

    // compacted base: fold the state topic into one base file, then
    // point-lookup against base∪delta (here delta = empty)
    val compDir = java.nio.file.Files
      .createTempDirectory("graft-servebench-comp").toString
    val comp = new CompactedStateStore(compDir)
    comp.append(api.snapshotFrame())
    comp.compact(spark)
    val pointCompacted = p50ms(9) {
      require(StateTable.byId(comp.read(spark), nextId())
        .select("json").collect().length == 1)
    }
    // the FULL route (snapshot + spec lookup + SDK export) served from
    // the compacted base — the 24/7 deployment's configuration
    val apiComp = new GraftApi(spark, store, root, Some(comp))
    val pointApiComp = p50ms(9) {
      require(apiComp.statusOf(apiComp.getWfRun(nextId()))
        == apiComp.RpcStatus.OK)
    }
    val aliasComp = p50ms(5)(apiComp.getWfRunAlias("thing", "task-1"))
    // the FULL route answered from the driver-side ServingCache (warm):
    // no Spark job per request — the reference's local-RocksDB read
    // analogue, expected ~1000× below the distributed p50
    val apiCached = new GraftApi(spark, store, root, Some(comp),
      servingCache = Some(new graft.streaming.ServingCache(comp)))
    val pointApiCached = p50ms(9) {
      require(apiCached.statusOf(apiCached.getWfRun(nextId()))
        == apiCached.RpcStatus.OK)
    }
    println(f"""{"metric":"serve_point_lookup_bus_$n","p50_ms":$pointBus%.1f,"reps":9}""")
    println(f"""{"metric":"serve_alias_search_bus_$n","p50_ms":$aliasBus%.1f,"reps":5}""")
    println(f"""{"metric":"serve_point_lookup_compacted_$n","p50_ms":$pointCompacted%.1f,"reps":9}""")
    println(f"""{"metric":"serve_point_lookup_api_compacted_$n","p50_ms":$pointApiComp%.1f,"reps":9}""")
    println(f"""{"metric":"serve_alias_search_api_compacted_$n","p50_ms":$aliasComp%.1f,"reps":5}""")
    println(f"""{"metric":"serve_point_lookup_api_cached_$n","p50_ms":$pointApiCached%.3f,"reps":9}""")
  }
}
