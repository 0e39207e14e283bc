package graft.streaming

import scala.collection.immutable.ListMap

import graft.engine.{EventCodec, LHJson, Simulator, TaskRunEndedPayload,
  TaskRunEvent, TaskRunResult, TaskRunStartedPayload, WFEvent, WFEventType}
import graft.streaming.bus.GraftBus

/** Serve-mode loopback task worker: polls the per-TaskDef bus topics
  * the scheduler fans TSRs out to, executes each request, and produces
  * the started+ended TASK_EVENT pair back onto the run's event topic —
  * the reference TaskWorker's poll/execute/produce loop
  * (TaskWorker.java:58-207, lhctl/executor/worker.py) as one daemon
  * thread over the file-backed bus.
  *
  * Task behavior is [[Simulator.sharedTasks]] keyed by the LAST dash
  * segment of the taskDefName — the reference's Python task-def naming
  * convention `{module}-{function}` (lh_sdk/utils.get_task_def_name /
  * parse_task_def_name), so a workflow compiled by the Python SDK from
  * `def echo_task(thing: str)` in any module resolves to the
  * `echo_task` behavior here, exactly as the reference's
  * DockerTaskWorker resolves the function named in deployMetadata.
  */
object BusTaskWorker {

  /** Start the polling daemon. `topics` is the TaskDef-name set to
    * poll (one bus topic per TaskDef — S2); new TSRs are answered in
    * offset order. Returns the thread; flip `stop` to end the loop. */
  def start(root: String, topics: Seq[String], stop: () => Boolean)
      : Thread = {
    val t = new Thread(() => loop(root, topics, stop), "graft-task-worker")
    t.setDaemon(true)
    t.start()
    t
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def loop(
      root: String, topics: Seq[String], stop: () => Boolean): Unit = {
    var cursor = Map.empty[(String, Int), Long]
    // per-(wfRunId, taskDefName) invocation counter — feeds
    // Simulator.sharedTasks's deterministic retry stand-ins
    // (unreliable_task fails only its FIRST attempt within a run)
    val calls = scala.collection.mutable.Map.empty[(String, String), Int]
    while (!stop()) {
      for (topic <- topics; p <- GraftBus.partitions(root, topic)) {
        val from = cursor.getOrElse((topic, p), 0L)
        val until = GraftBus.nextOffset(root, topic, p)
        // per-record isolation: one malformed TSR or an unknown task
        // name must not kill the daemon (serve would keep running with
        // no worker, hanging every client until its poll deadline) —
        // log, skip the poison record, keep polling. The cursor
        // advances to `until` below either way, so a poison record is
        // skipped, not retried forever.
        GraftBus.read(root, topic, p, from, until).foreach { rec =>
          try answer(root, rec.value, calls)
          catch { case e: Exception =>
            log.warn(s"task worker: skipping poison record on " +
              s"$topic/$p (offset range $from..$until): $e")
          }
        }
        cursor += (topic, p) -> until
      }
      Thread.sleep(50)
    }
  }

  /** Decode one TaskScheduleRequest, run its simulated behavior, and
    * produce the started+ended TASK_EVENT pair back onto the run's
    * event topic. */
  private def answer(root: String, value: String,
      calls: scala.collection.mutable.Map[(String, String), Int]): Unit = {
    val tsr = EventCodec.decodeTsr(value)
    val funcName = tsr.taskDefName.split('-').last
    // bound the counter map: a long-lived daemon must not leak one
    // entry per finished run (only retry-shaped behaviors read it,
    // and a run's retries arrive within its own lifetime)
    if (calls.size > 65536) calls.clear()
    val invocation = calls.getOrElse((tsr.wfRunId, funcName), 0)
    calls((tsr.wfRunId, funcName)) = invocation + 1
    val behavior = Simulator.sharedTasks(
      funcName, ListMap.from(tsr.variableSubstitutions), invocation)
    val result = behavior match {
      case Simulator.Ok(value, _) =>
        TaskRunResult(Some(LHJson.render(value)), None,
          success = true, 0)
      case Simulator.Fail(stderr, _) =>
        TaskRunResult(None, Some(stderr), success = false, 1)
      case Simulator.NoResponse =>
        null // leave the task pending (timeout-path behavior)
    }
    if (result != null) {
      val now = System.currentTimeMillis()
      // guid must key the FULL task identity (threadId included:
      // positions restart per thread, and the scheduler's dedupe
      // window drops a repeated guid — a child thread's task 0
      // would silently alias the entrypoint's task 0)
      val guid = s"w-${tsr.wfRunId}-${tsr.threadId}-" +
        s"${tsr.taskRunPosition}"
      val pair = Seq(
        WFEvent(tsr.wfSpecId, tsr.wfSpecName, tsr.wfRunId, now,
          tsr.threadId, WFEventType.TASK_EVENT,
          EventCodec.encodeTaskRunEvent(TaskRunEvent(
            tsr.threadId, tsr.taskRunPosition, now, 0,
            Some(TaskRunStartedPayload("serve-worker", None)), None)),
          guid = s"$guid-started"),
        WFEvent(tsr.wfSpecId, tsr.wfSpecName, tsr.wfRunId, now + 1,
          tsr.threadId, WFEventType.TASK_EVENT,
          EventCodec.encodeTaskRunEvent(TaskRunEvent(
            tsr.threadId, tsr.taskRunPosition, now + 1, 0, None,
            Some(TaskRunEndedPayload(result)))),
          guid = s"$guid-ended"))
      pair.foreach(ev => GraftBus.send(root,
        s"wfEvents__${tsr.wfSpecName}", ev.wfRunId,
        EventCodec.encodeWFEvent(ev)))
    }
  }
}
