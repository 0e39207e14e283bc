package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

import graft.engine._
import graft.streaming.{Scheduler, SchedulerOut}

/** BASELINE.md `speedtest_wallclock_N` through the STREAMING engine:
  * N concurrent `speed_test`-shaped WFRuns (50 sequential task
  * round-trips each — reference examples/workflows/
  * speed_test_50_tasks.py:12-15) driven through the real
  * flatMapGroupsWithState scheduler with a loopback foreachBatch
  * worker, measured first-event → last COMPLETED snapshot.
  *
  * This is the closest Spark analogue of the reference's canonical
  * workload (Kafka round-trip per task + 10 ms worker poll floor,
  * DepInjContext.java:348-354); `graft.FoldBench` measures the same
  * workload through the batch fold instead (engine ceiling, no
  * micro-batch latency). MemoryStream is used rather than the
  * file-backed bus so the number measures the engine + scheduler, not
  * file-per-record I/O.
  *
  * Usage: runMain graft.StreamBench [nRuns] — prints one JSON line.
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

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spec = speedTestSpec(50)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[WFEvent]
    val outputs = Scheduler(input.toDS(), Map(spec.name -> spec))
    val completed = TrieMap.empty[String, Boolean]

    def now() = System.currentTimeMillis()

    // loopback worker: answers every TSR within the same micro-batch
    // cycle (the reference's worker is a separate Kafka consumer with a
    // 10 ms poll floor per task)
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
}
