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

  private def loop(
      root: String, topics: Seq[String], stop: () => Boolean): Unit = {
    var cursor = Map.empty[(String, Int), Long]
    while (!stop()) {
      for (topic <- topics; p <- GraftBus.partitions(root, topic)) {
        val from = cursor.getOrElse((topic, p), 0L)
        val until = GraftBus.nextOffset(root, topic, p)
        GraftBus.read(root, topic, p, from, until).foreach { rec =>
          val tsr = EventCodec.decodeTsr(rec.value)
          val funcName = tsr.taskDefName.split('-').last
          val behavior = Simulator.sharedTasks(
            funcName, ListMap.from(tsr.variableSubstitutions))
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
        cursor += (topic, p) -> until
      }
      Thread.sleep(50)
    }
  }
}
