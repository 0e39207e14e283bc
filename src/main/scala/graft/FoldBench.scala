package graft

import org.apache.spark.sql.SparkSession
import graft.engine._
import scala.collection.immutable.ListMap

/** Measures the BASELINE.md engine targets:
  *  - `fold_events_per_sec`: WFEvents folded per second through the
  *    state function (single-threaded micro-bench, no Spark);
  *  - `speedtest_wallclock_N`: wall-clock for N complete
  *    `speed_test`-shaped WFRuns (50 sequential task round-trips each,
  *    reference examples/workflows/speed_test_50_tasks.py:12-15) driven
  *    end-to-end with the loopback worker, distributed over local[*].
  *
  * Prints one JSON line per metric.
  */
object FoldBench {

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
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spec = speedTestSpec(50)

    // --- single-threaded fold throughput (warm up, then measure) ---
    def runOnce(): Int = {
      val (st, tsrs) = Simulator.run(spec)
      require(st.status == Status.COMPLETED && tsrs.length == 50)
      // events folded: 1 start + 50 × (started + ended) = 101
      101
    }
    (1 to 50).foreach(_ => runOnce())
    val warmT0 = System.nanoTime()
    var events = 0L
    val reps = 200
    (1 to reps).foreach(_ => events += runOnce())
    val foldSec = (System.nanoTime() - warmT0) / 1e9
    println(f"""{"metric":"fold_events_per_sec","value":${events / foldSec}%.0f,"unit":"events/sec"}""")

    // --- N concurrent speed_test runs end-to-end, distributed ---
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val completed = spark.range(n).repartition(cpus.toInt).as[Long]
      .map { i =>
        val (st, _) = Simulator.run(spec, runId = s"run-$i")
        if (st.status == Status.COMPLETED) 1 else 0
      }
      .reduce(_ + _)
    val wallSec = (System.nanoTime() - t0) / 1e9
    require(completed == n, s"only $completed/$n completed")
    println(f"""{"metric":"speedtest_wallclock_$n","value":$wallSec%.2f,"unit":"sec","runs_per_sec":${n / wallSec}%.0f,"task_roundtrips_per_sec":${n * 50 / wallSec}%.0f}""")
    spark.stop()
  }
}
