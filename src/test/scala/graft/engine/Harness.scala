package graft.engine

import scala.collection.mutable
import scala.collection.immutable.VectorMap

/** Discrete-event simulator for engine tests: drives WF_RUN_STARTED /
  * external events through [[Engine.processEvent]], re-injects timers at
  * their maturation time, and plays the role of the task worker
  * (reference: TaskWorker.java + lhctl/executor/worker.py) by answering
  * TaskScheduleRequests with TASK_EVENT started/ended pairs.
  */
object Harness {

  sealed trait TaskBehavior
  /** Worker returns; stdout is the JSON-rendered return value. */
  case class Ok(value: Any, duration: Long = 50) extends TaskBehavior
  case class Fail(stderr: String, duration: Long = 50) extends TaskBehavior
  /** Worker never responds (for timeout tests). */
  case object NoResponse extends TaskBehavior

  /** Standard task functions (reference:
    * lhctl/lh_test_harness/tests/shared_tasks.py:1-48). stdin is the
    * TSR's variableSubstitutions map. */
  def sharedTasks(name: String, stdin: VectorMap[String, Any]): TaskBehavior =
    name match {
      case "echo_task" => Ok(stdin.getOrElse("thing", null))
      case "hello_there" => Ok(s"Hello there, ${stdin.getOrElse("name", null)}!")
      case "increment" => Ok(Mutations.toInt(stdin("foo")) + 1)
      case "echo_int" => Ok(stdin("foo"))
      case "echo_float" => Ok(stdin("foo"))
      case "big_blob_task" => Ok(VectorMap(
        "some_blob" -> VectorMap(
          "some_int" -> 1, "some_float" -> 2.5, "some_bool" -> false),
        "some_list" -> Vector(1, 2, 3, 4),
        "some_str" -> "Hello, there!"))
      case other => Fail(s"unknown task $other")
    }

  case class ExternalInput(
      time: Long, eventDefName: String, content: Any, threadId: Int = -1)

  case class StopResume(time: Long, stop: Boolean, threadId: Int = 0)

  /** Run one workflow to quiescence; returns the final state and every
    * TSR emitted. `tasks(taskDefName, stdin, invocationIdx)` decides the
    * worker behavior (invocationIdx counts calls per taskDefName). */
  def run(
      spec: WFSpec,
      inputVars: Map[String, Any] = Map.empty,
      externals: Seq[ExternalInput] = Nil,
      stopResumes: Seq[StopResume] = Nil,
      tasks: (String, VectorMap[String, Any], Int) => TaskBehavior =
        (n, in, _) => sharedTasks(n, in),
      startTime: Long = 1000L): (WFRunState, Vector[TaskScheduleRequest]) = {

    implicit val ord: Ordering[(Long, Long, WFEvent)] =
      Ordering.by[(Long, Long, WFEvent), (Long, Long)](x => (x._1, x._2)).reverse
    val queue = mutable.PriorityQueue.empty[(Long, Long, WFEvent)]
    var seq = 0L
    def push(time: Long, ev: WFEvent): Unit = { queue.enqueue((time, seq, ev)); seq += 1 }

    def mkEvent(tpe: String, time: Long, threadId: Int, content: String): WFEvent =
      WFEvent(spec.objectId, spec.name, "run-1", time, threadId, tpe, content)

    push(startTime, mkEvent(WFEventType.WF_RUN_STARTED, startTime, 0,
      EventCodec.encodeRunRequest(WFRunRequest(
        VectorMap.from(inputVars), spec.objectId, Some("run-1")))))

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
                Some(TaskRunStartedPayload("test-worker",
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

  // ---- spec-building helpers (shapes mirror the SDK compiler output,
  // lhctl/lh_sdk/thread_spec_builder.py) ----

  def lit(v: Any): VariableAssignment = VariableAssignment(literalValue = v)
  def varRef(name: String, jsonPath: String = null): VariableAssignment =
    VariableAssignment(wfRunVariableName = Some(name),
      jsonPath = Option(jsonPath))

  def cond(l: VariableAssignment, cmp: String, r: VariableAssignment): EdgeCondition =
    EdgeCondition(l, r, cmp)

  def task(name: String, taskDef: String,
      vars: (String, VariableAssignment)*): Node =
    Node(name = name, nodeType = NodeType.TASK, taskDefName = Some(taskDef),
      variables = VectorMap.from(vars))

  def nop(name: String): Node = Node(name = name, nodeType = NodeType.NOP)

  /** Attach mutations to a node (SDK `_mutate`). */
  def mutate(n: Node, muts: (String, VariableMutation)*): Node =
    n.copy(variableMutations = VectorMap.from(muts))

  def mut(op: String, jsonPath: String = null, literal: Any = null,
      source: VariableAssignment = null): VariableMutation =
    VariableMutation(op, Option(jsonPath), literal, Option(source))

  def thread(
      name: String,
      vars: Map[String, WFRunVariableDef],
      nodes: Seq[Node],
      edges: Seq[Edge],
      interrupts: Map[String, String] = Map.empty): ThreadSpec =
    ThreadSpec(
      name = name,
      entrypointNodeName = null, // computed by validation
      variableDefs = VectorMap.from(vars),
      interruptDefs = VectorMap.from(interrupts.map { case (k, v) =>
        k -> InterruptDef(v) }),
      nodes = VectorMap.from(nodes.map(n => n.name -> n)),
      edges = edges.toVector)

  def wfSpec(name: String, entrypoint: String, threads: ThreadSpec*): WFSpec =
    SpecCodec.validate(WFSpec(
      name = name, objectId = s"$name-id",
      entrypointThreadName = entrypoint,
      threadSpecs = VectorMap.from(threads.map(t => t.name -> t))))

  def edge(from: String, to: String, c: EdgeCondition = null): Edge =
    Edge(from, to, Option(c))

  // ---- assertion helpers ----

  def mainThread(s: WFRunState): ThreadRunState = s.threadRuns(0)

  def taskNodesOf(s: WFRunState, spec: WFSpec, tid: Int = 0): Seq[TaskRunState] =
    s.threadRuns(tid).taskRuns.toSeq.filter { tr =>
      spec.threadSpecs(s.threadRuns(tid).threadSpecName)
        .nodes(tr.nodeName).nodeType == NodeType.TASK
    }
}
