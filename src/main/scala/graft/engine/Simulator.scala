package graft.engine

import scala.collection.mutable
import scala.collection.immutable.ListMap

/** Discrete-event simulation of one workflow run: drives events through
  * [[Engine.processEvent]], re-injects timers at maturation, and plays
  * the task worker (reference: TaskWorker.java:58-207 +
  * lhctl/executor/worker.py) by answering TaskScheduleRequests with
  * TASK_EVENT started/ended pairs.
  *
  * Fully deterministic (virtual clock, no wall time, no randomness), so
  * it can run per-row inside Spark tasks: folding N independent runs is
  * embarrassingly parallel — `orders.mapPartitions(_.map(simulate))` —
  * with zero shuffle. The streaming layer uses the same Engine via
  * flatMapGroupsWithState instead.
  */
object Simulator {

  sealed trait TaskBehavior
  /** Worker returns; stdout is the JSON-rendered return value. */
  case class Ok(value: Any, duration: Long = 50) extends TaskBehavior
  case class Fail(stderr: String, duration: Long = 50) extends TaskBehavior
  /** Worker never responds (for timeout paths). */
  case object NoResponse extends TaskBehavior

  /** Standard task functions (reference:
    * lhctl/lh_test_harness/tests/shared_tasks.py:1-48). `invocation`
    * counts prior calls of the SAME task within the run — it
    * deterministically replaces the two nondeterministic reference
    * tasks: `unreliable_task` (reference: `assert random.random() >
    * 0.5` — here: fail the first attempt, succeed the retry, so the
    * retry corpus folds the same HALTED→COMPLETED task-run sequence
    * every run) and `slow_task` (reference: `time.sleep(5)` past the
    * 1 s timeout — here: the worker never answers, which is
    * indistinguishable from too-slow to a timeout-armed engine). */
  def sharedTasks(name: String, stdin: ListMap[String, Any],
      invocation: Int = 0): TaskBehavior =
    name match {
      case "echo_task" => Ok(stdin.getOrElse("thing", null))
      case "hello_there" => Ok(s"Hello there, ${stdin.getOrElse("name", null)}!")
      case "increment" => Ok(Mutations.toInt(stdin("foo")) + 1)
      case "echo_int" => Ok(stdin("foo"))
      case "echo_float" => Ok(stdin("foo"))
      case "big_blob_task" => Ok(ListMap(
        "some_blob" -> ListMap(
          "some_int" -> 1, "some_float" -> 2.5, "some_bool" -> false),
        "some_list" -> Vector(1, 2, 3, 4),
        "some_str" -> "Hello, there!"))
      case "unreliable_task" =>
        if (invocation == 0)
          Fail("AssertionError: deterministic stand-in for " +
            "random.random() > 0.5 (shared_tasks.py:23-25)")
        else Ok("We would be honored if you would join us!")
      case "slow_task" => NoResponse
      case other => Fail(s"unknown task $other")
    }

  case class ExternalInput(
      time: Long, eventDefName: String, content: Any, threadId: Int = -1)

  case class StopResume(time: Long, stop: Boolean, threadId: Int = 0)

  /** Run one workflow to quiescence. `tasks(taskDefName, stdin,
    * invocationIdx)` decides worker behavior (invocationIdx counts calls
    * per taskDefName within the run). */
  def run(
      spec: WFSpec,
      inputVars: Map[String, Any] = Map.empty,
      externals: Seq[ExternalInput] = Nil,
      stopResumes: Seq[StopResume] = Nil,
      tasks: (String, ListMap[String, Any], Int) => TaskBehavior =
        (n, in, i) => sharedTasks(n, in, i),
      runId: String = "run-1",
      startTime: Long = 1000L): (WFRunState, Vector[TaskScheduleRequest]) = {

    implicit val ord: Ordering[(Long, Long, WFEvent)] =
      Ordering.by[(Long, Long, WFEvent), (Long, Long)](x => (x._1, x._2)).reverse
    val queue = mutable.PriorityQueue.empty[(Long, Long, WFEvent)]
    var seq = 0L
    def push(time: Long, ev: WFEvent): Unit = {
      queue.enqueue((time, seq, ev)); seq += 1
    }

    def mkEvent(tpe: String, time: Long, threadId: Int, content: String): WFEvent =
      WFEvent(spec.objectId, spec.name, runId, time, threadId, tpe, content)

    push(startTime, mkEvent(WFEventType.WF_RUN_STARTED, startTime, 0,
      EventCodec.encodeRunRequest(WFRunRequest(
        ListMap.from(inputVars), spec.objectId, Some(runId)))))

    externals.foreach { e =>
      push(e.time, mkEvent(WFEventType.EXTERNAL_EVENT, e.time, e.threadId,
        EventCodec.encodeExternalEvent(ExternalEventPayload(
          e.eventDefName, e.eventDefName, e.content, e.time))))
    }
    stopResumes.foreach { s =>
      val tpe = if (s.stop) WFEventType.WF_RUN_STOP_REQUEST
        else WFEventType.WF_RUN_RESUME_REQUEST
      push(s.time, mkEvent(tpe, s.time, s.threadId, ""))
    }

    var state: Option[WFRunState] = None
    val allTsrs = Vector.newBuilder[TaskScheduleRequest]
    val invocations = mutable.HashMap.empty[String, Int]

    while (queue.nonEmpty) {
      val (time, _, ev) = queue.dequeue()
      val result = Engine.processEvent(spec, state, ev)
      state = result.state.orElse(state)

      result.timers.foreach { timer =>
        push(timer.maturationTimestamp,
          mkEvent(WFEventType.TIMER_EVENT, timer.maturationTimestamp,
            timer.threadRunId, EventCodec.encodeTimer(timer)))
      }

      result.toSchedule.foreach { tsr =>
        allTsrs += tsr
        val idx = invocations.getOrElse(tsr.taskDefName, 0)
        invocations(tsr.taskDefName) = idx + 1
        tasks(tsr.taskDefName, tsr.variableSubstitutions, idx) match {
          case NoResponse => ()
          case behavior =>
            val startT = time + 10
            push(startT, mkEvent(WFEventType.TASK_EVENT, startT, tsr.threadId,
              EventCodec.encodeTaskRunEvent(TaskRunEvent(
                tsr.threadId, tsr.taskRunPosition, startT, 0,
                Some(TaskRunStartedPayload("sim-worker",
                  Some(LHJson.render(tsr.variableSubstitutions)))),
                None))))
            val (res, dur) = behavior match {
              case Ok(v, d) =>
                (TaskRunResult(Some(LHJson.render(v)), None, success = true, 0), d)
              case Fail(err, d) =>
                (TaskRunResult(None, Some(err), success = false, 1), d)
              case NoResponse => throw new IllegalStateException
            }
            val endT = startT + dur
            push(endT, mkEvent(WFEventType.TASK_EVENT, endT, tsr.threadId,
              EventCodec.encodeTaskRunEvent(TaskRunEvent(
                tsr.threadId, tsr.taskRunPosition, endT, 0, None,
                Some(TaskRunEndedPayload(res))))))
        }
      }
    }
    (state.getOrElse(throw new IllegalStateException("no state produced")),
      allTsrs.result())
  }
}
