package graft.engine

import scala.collection.mutable
import scala.collection.immutable.ListMap

/** Result of folding one event into a run's state. `state` is None when
  * the event referenced an unknown run (reference drops those with a
  * log — SchedulerProcessor.java:142-148). */
case class StepResult(
    state: Option[WFRunState],
    toSchedule: Vector[TaskScheduleRequest],
    timers: Vector[WFRunTimer])

/** The event-sourced fold at the heart of the engine (SURVEY.md §2.2 R1):
  * per `wfRunId`, incorporate one `WFEvent` into the `WFRunState`
  * aggregate, advance every thread to fixpoint, and emit the
  * TaskScheduleRequests + timers that result.
  *
  * This is a faithful re-expression of the reference's scheduler
  * (scheduler/SchedulerProcessor.java:133-232, common/objects/rundata/
  * WFRun.java:202-299 and ThreadRun.java) as pure-ish Scala: the state
  * object is mutated in place but nothing outside it is touched, so the
  * caller can use it inside `flatMapGroupsWithState` or a plain batch
  * fold. No Spark imports here — unit-testable exactly like the
  * reference's Python harness checks.
  *
  * Deliberate deltas from the reference, documented:
  *  - timeout/sleep deadlines are computed from the *event* timestamp,
  *    not `Calendar.getInstance()` wall clock (ThreadRun.java:770-791),
  *    so folds are deterministic and replayable;
  *  - mutation iteration follows spec-document order, not Java HashMap
  *    hash order (ThreadRun.java:416-438);
  *  - an out-of-range thread id on STOP/RESUME is ignored rather than
  *    crashing the fold.
  */
object Engine {

  /** Reference: SchedulerProcessor.processHelper + error containment in
    * SchedulerProcessor.process (:63-86): any unexpected exception
    * HALTs the run with INTERNAL_LITTLEHORSE_ERROR instead of killing
    * the pipeline. */
  def processEvent(
      spec: WFSpec,
      stateOpt: Option[WFRunState],
      event: WFEvent): StepResult = {
    try {
      processHelper(spec, stateOpt, event)
    } catch {
      case e: Exception =>
        stateOpt match {
          case None => StepResult(None, Vector.empty, Vector.empty)
          case Some(st) =>
            st.status = Status.HALTED
            st.errorCode = Some(FailureReason.INTERNAL_LITTLEHORSE_ERROR)
            st.errorMessage = Some("Had an unexpected error: " + e.toString)
            StepResult(Some(st), Vector.empty, Vector.empty)
        }
    }
  }

  private def processHelper(
      spec: WFSpec,
      stateOpt: Option[WFRunState],
      event: WFEvent): StepResult = {
    val ctx = new EngineCtx(spec)

    val wfRun: WFRunState = stateOpt match {
      case None =>
        if (event.eventType == WFEventType.WF_RUN_STARTED) {
          ctx.newRun(event.wfRunId, event)
        } else {
          // Unknown run: drop (reference logs "Couldn't find wfRun").
          return StepResult(None, Vector.empty, Vector.empty)
        }
      case Some(st) =>
        ctx.wfRun = st
        ctx.incorporateEvent(event)
        st
    }
    ctx.wfRun = wfRun
    ctx.updateStatuses(event)

    // Advance-to-fixpoint loop (SchedulerProcessor.java:174-187). The
    // leading updateStatuses inside the loop is load-bearing: without it
    // a parent never notices a completed exception-handler thread.
    var shouldAdvance = true
    while (shouldAdvance) {
      ctx.updateStatuses(event)
      var didAdvance = false
      var i = 0
      while (i < wfRun.threadRuns.length) {
        didAdvance = ctx.advance(wfRun.threadRuns(i), event) || didAdvance
        i += 1
      }
      shouldAdvance = didAdvance
      ctx.updateStatuses(event)
    }

    StepResult(Some(wfRun), ctx.toSchedule.toVector, ctx.timers.toVector)
  }

  /** Fold a full (ordered) event sequence for one run, firing matured
    * timers between events — the batch/test harness entry point. Timer
    * events synthesized here mirror SchedulerProcessor.clearTimers
    * (:88-126). */
  def foldRun(spec: WFSpec, events: Seq[WFEvent]): (Option[WFRunState], Vector[TaskScheduleRequest]) = {
    var state: Option[WFRunState] = None
    val allTsrs = Vector.newBuilder[TaskScheduleRequest]
    val pendingTimers = mutable.PriorityQueue.empty[WFRunTimer](
      Ordering.by[WFRunTimer, Long](_.maturationTimestamp).reverse)

    def fire(now: Long): Unit = {
      while (pendingTimers.nonEmpty &&
        pendingTimers.head.maturationTimestamp <= now) {
        val t = pendingTimers.dequeue()
        val te = WFEvent(
          wfSpecId = spec.objectId, wfSpecName = spec.name,
          wfRunId = t.wfRunId, timestamp = t.maturationTimestamp,
          threadId = t.threadRunId, eventType = WFEventType.TIMER_EVENT,
          content = EventCodec.encodeTimer(t))
        val r = processEvent(spec, state, te)
        state = r.state.orElse(state)
        allTsrs ++= r.toSchedule
        r.timers.foreach(pendingTimers.enqueue(_))
      }
    }

    events.foreach { e =>
      fire(e.timestamp)
      val r = processEvent(spec, state, e)
      state = r.state.orElse(state)
      allTsrs ++= r.toSchedule
      r.timers.foreach(pendingTimers.enqueue(_))
    }
    // Drain any timers that mature after the last event.
    fire(Long.MaxValue)
    (state, allTsrs.result())
  }
}

/** Per-event working context: the spec, the run being folded, and the
  * output buffers. Methods are the ThreadRun/WFRun operations. */
private final class EngineCtx(val spec: WFSpec) {
  var wfRun: WFRunState = _
  val toSchedule: mutable.ArrayBuffer[TaskScheduleRequest] = mutable.ArrayBuffer.empty
  val timers: mutable.ArrayBuffer[WFRunTimer] = mutable.ArrayBuffer.empty

  private def threadSpecOf(t: ThreadRunState): ThreadSpec =
    spec.threadSpecs(t.threadSpecName)

  private def nodeOf(t: ThreadRunState, name: String): Node =
    threadSpecOf(t).nodes(name)

  private def nodeOfTask(t: ThreadRunState, tr: TaskRunState): Node =
    nodeOf(t, tr.nodeName)

  private def eventTopic: String = s"wfEvents__${spec.name}"

  // ===== WFRun-level (reference: WFRun.java) =====

  /** Reference: WFSpec.newRun (WFSpec.java:222-251). */
  def newRun(id: String, event: WFEvent): WFRunState = {
    val req = EventCodec.decodeRunRequest(event.content)
    val st = new WFRunState(id, event.wfSpecId, event.wfSpecName)
    st.status = Status.RUNNING
    st.startTime = Some(event.timestamp)
    wfRun = st
    st.threadRuns += createThread(spec.entrypointThreadName, req.variables, None)
    st
  }

  /** Reference: WFRun.createThreadClientAdds (WFRun.java:81-140). */
  def createThread(
      threadName: String,
      variables: scala.collection.Map[String, Any],
      parent: Option[ThreadRunState]): ThreadRunState = {
    val tspec = spec.threadSpecs(threadName)
    val t = new ThreadRunState(wfRun.threadRuns.length, threadName)
    t.status = parent.map(_.status).getOrElse(Status.RUNNING)
    tspec.variableDefs.foreach { case (vn, vd) =>
      t.variables(vn) = variables.get(vn) match {
        case Some(v) if v != null => v
        case _ => vd.defaultValue
      }
    }
    // entrypoint is reached through a fake edge (WFRun.java:117-120)
    t.upNext += new UpNextPair(0,
      Edge(sourceNodeName = "", sinkNodeName = tspec.entrypointNodeName))
    parent.foreach { p =>
      p.childThreadIds += t.id
      t.parentThreadId = Some(p.id)
      if (p.status == Status.HALTED || p.status == Status.HALTING)
        t.haltReasons += HaltReason.PARENT_STOPPED
    }
    t
  }

  /** Reference: WFRun.incorporateEvent (WFRun.java:202-248). */
  def incorporateEvent(event: WFEvent): Unit = event.eventType match {
    case WFEventType.WF_RUN_STARTED =>
      throw new RuntimeException("WF_RUN_STARTED on existing run")
    case WFEventType.EXTERNAL_EVENT =>
      handleExternalEvent(event)
    case WFEventType.TASK_EVENT =>
      val thread = wfRun.threadRuns(event.threadId)
      incorporateTaskEvent(thread, event)
    case WFEventType.WF_RUN_STOP_REQUEST =>
      if (event.threadId == 0 && wfRun.status == Status.RUNNING)
        wfRun.status = Status.HALTING
      val tid = math.max(event.threadId, 0)
      if (tid < wfRun.threadRuns.length)
        halt(wfRun.threadRuns(tid), HaltReason.MANUAL_STOP,
          "Manual halt of this thread requested by system admin.")
    case WFEventType.WF_RUN_RESUME_REQUEST =>
      if (event.threadId == 0 && wfRun.status != Status.COMPLETED)
        wfRun.status = Status.RUNNING
      val tid = math.max(event.threadId, 0)
      if (tid < wfRun.threadRuns.length)
        removeHaltReason(wfRun.threadRuns(tid), HaltReason.MANUAL_STOP)
    case WFEventType.TIMER_EVENT =>
      val timer = EventCodec.decodeTimer(event.content)
      handleTimer(wfRun.threadRuns(timer.threadRunId), timer)
    case other =>
      throw new RuntimeException(s"Unknown event type $other")
  }

  /** Reference: WFRun.handleExternalEvent (WFRun.java:156-200). */
  private def handleExternalEvent(event: WFEvent): Unit = {
    val payload =
      try EventCodec.decodeExternalEvent(event.content)
      catch { case _: Exception => return } // "nothing we can do"

    if (spec.interruptEvents.contains(payload.externalEventDefName)) {
      if (event.threadId != -1)
        handleInterrupt(wfRun.threadRuns(event.threadId), payload)
      else
        propagateInterrupt(wfRun.threadRuns(0), payload)
    } else {
      val correl = new EventCorrel(payload, event.timestamp)
      correl.assignedThreadId = event.threadId
      val buf = wfRun.correlatedEvents.getOrElseUpdate(
        payload.externalEventDefName, mutable.ArrayBuffer.empty)
      buf += correl
    }
  }

  /** Reference: WFRun.updateStatuses (WFRun.java:267-299). */
  def updateStatuses(event: WFEvent): Unit = {
    wfRun.threadRuns.foreach(updateStatus)

    if (wfRun.status == Status.HALTING) {
      val allHalted = wfRun.threadRuns.forall(_.status != Status.HALTING)
      if (allHalted) wfRun.status = Status.HALTED
    } else if (wfRun.status == Status.RUNNING) {
      val allTerminated = wfRun.threadRuns.forall(_.isTerminated)
      val allCompleted = wfRun.threadRuns.forall(_.isCompleted)
      if (allCompleted) {
        wfRun.endTime = Some(event.timestamp)
        wfRun.status = Status.COMPLETED
      } else if (allTerminated) {
        wfRun.status = Status.HALTED
      }
    }
  }

  // ===== ThreadRun-level (reference: ThreadRun.java) =====

  /** Reference: ThreadRun.getVariableDefinition (ThreadRun.java:134-155):
    * walk up the parent chain to find the defining thread. */
  private def getVariableDefinition(
      t: ThreadRunState, varName: String): Option[(WFRunVariableDef, ThreadRunState, Any)] = {
    threadSpecOf(t).variableDefs.get(varName) match {
      case Some(vd) => Some((vd, t, t.variables.getOrElse(varName, null)))
      case None => t.parentThreadId match {
        case Some(pid) => getVariableDefinition(wfRun.threadRuns(pid), varName)
        case None => None
      }
    }
  }

  /** Reference: ThreadRun.assignVariable (ThreadRun.java:175-228). */
  def assignVariable(t: ThreadRunState, va: VariableAssignment): Any = {
    if (va.literalValue != null) return va.literalValue

    var dataToParse: Any = null
    va.wfRunVariableName match {
      case Some(name) =>
        val lookup = getVariableDefinition(t, name).getOrElse(
          throw new RuntimeException(s"variable $name not in scope"))
        if (lookup._3 == null)
          throw new VarSubError(
            s"No variable named $name in context or $name was null at time " +
              "of access.")
        dataToParse = lookup._3
      case None =>
        va.wfRunMetadata.foreach {
          case "WF_RUN_GUID" => return wfRun.objectId
          case "WF_SPEC_GUID" => return wfRun.wfSpecDigest
          case "WF_SPEC_NAME" => return wfRun.wfSpecName
          case "THREAD_GUID" => return s"${t.id}-${wfRun.objectId}"
          case "THREAD_ID" => return t.id
          case _ => ()
        }
    }

    if (dataToParse == null) return va.defaultValue
    va.jsonPath match {
      case None => dataToParse
      case Some(path) =>
        try JsonPath.read(LHJson.objToString(dataToParse), path)
        catch {
          case e: Exception =>
            throw new VarSubError(
              s"Specified jsonpath $path failed to resolve on " +
                s"${LHJson.objToString(dataToParse)}:\n${e.getMessage}", e)
        }
    }
  }

  /** Reference: ThreadRun.getMutationRHS (ThreadRun.java:158-172). */
  private def getMutationRHS(
      t: ThreadRunState, mut: VariableMutation, tr: TaskRunState): Any =
    mut.jsonPath match {
      case Some(p) => JsonPath.read(LHJson.objToString(tr.stdout), p)
      case None => mut.sourceVariable match {
        case Some(sv) => assignVariable(t, sv)
        case None =>
          if (mut.literalValue != null) mut.literalValue else tr.stdout
      }
    }

  /** Reference: ThreadRun.createNewTaskRun (ThreadRun.java:241-269). */
  private def createNewTaskRun(
      t: ThreadRunState, node: Node, attemptNumber: Int = 0): TaskRunState = {
    val number =
      if (t.taskRuns.isEmpty) 0
      else if (attemptNumber != 0) t.taskRuns.last.number
      else t.taskRuns.last.number + 1
    new TaskRunState(t.taskRuns.length, number, t.id, node.name, attemptNumber)
  }

  /** Reference: ThreadRun.incorporateEvent (:271-301) + handleTaskEnded
    * (:374-398) incl. the ignore-after-TIMEOUT race check.
    *
    * DELIBERATE DELTA — at-least-once idempotency (SURVEY §7.4-4): the
    * reference's worker commits the consumed TSR offset and the emitted
    * TASK_EVENT in one Kafka transaction (TaskWorker.java:102-145), so
    * it never sees duplicates and its handlers fall through on them.
    * This deployment is at-least-once (no producer txns from Spark
    * sinks), so redelivered task events — keyed by (wfRunId, threadId,
    * taskRunPosition); each retry attempt occupies its own position —
    * are DROPPED here: a started-event for a task no longer SCHEDULED,
    * or an ended-event for a task already terminal, is a duplicate.
    * Under exactly-once delivery the guards never fire, so reference
    * parity holds on every non-duplicated history. */
  private def incorporateTaskEvent(t: ThreadRunState, wfEvent: WFEvent): Unit = {
    val event = EventCodec.decodeTaskRunEvent(wfEvent.content)
    event.startedEvent match {
      case Some(started) =>
        val tr = t.taskRuns(event.taskRunPosition)
        // duplicate-delivery guard (backstop — the scheduler's
        // recentEventHashes window drops byte-identical redeliveries
        // before they get here) — but a started-event for a
        // TIMEOUT-halted task must still apply: the reference's
        // handleTaskStarted has no guard, so a worker answering after
        // a timeout RESURRECTS the task to RUNNING and its result then
        // lands (that is how runs recover when the scheduler was down
        // past the task timeout). Only a genuinely terminal non-timeout
        // task marks the event as a redelivery.
        if (tr.status == Status.COMPLETED ||
          (tr.status == Status.HALTED &&
            !tr.failureReason.contains(FailureReason.TIMEOUT))) return
        tr.status = Status.RUNNING
        tr.startTime = Some(event.timestamp)
        tr.workerId = started.workerId
        tr.taskDefVersionNumber = event.taskDefVersionNumber
        tr.stdin = started.stdin.orNull
      case None => event.endedEvent.foreach { ended =>
        val tr = t.taskRuns(event.taskRunPosition)
        // reference order: the version field updates BEFORE the ignore
        // check (handleTaskEnded:379-386), so ignored late results
        // still leave it on the snapshot
        tr.taskDefVersionNumber = event.taskDefVersionNumber
        if (tr.status == Status.COMPLETED || tr.status == Status.HALTED)
          return // duplicate delivery (incl. the reference's
                 // late-result-after-TIMEOUT ignore)
        val taskStatus =
          if (ended.result.success) Status.COMPLETED else Status.HALTED
        completeTask(t, tr, taskStatus, ended.result, event.timestamp)
      }
    }
  }

  /** Reference: ThreadRun.completeTask (ThreadRun.java:324-372). */
  private def completeTask(
      t: ThreadRunState,
      task: TaskRunState,
      taskStatus: String,
      result: TaskRunResult,
      endTime: Long,
      reason: String = FailureReason.TASK_FAILURE): Unit = {
    task.endTime = Some(endTime)
    task.stdout = result.stdout.map(LHJson.stringToObj).orNull
    task.stderr = result.stderr.map(LHJson.stringToObj).orNull
    task.status = taskStatus
    task.returnCode = result.returncode

    unlockVariables(t, nodeOfTask(t, task))
    t.upNext = mutable.ArrayBuffer.empty

    if (taskStatus == Status.COMPLETED) {
      try mutateVariables(t, task)
      catch {
        case e: VarSubError =>
          failTask(t, task, FailureReason.VARIABLE_LOOKUP_ERROR,
            "Failed mutating variables after task: " + e.getMessage)
      }
    } else {
      failTask(t, task, reason,
        s"thread failed on node ${task.nodeName}: ${result.stderr.orNull}")
    }

    if (t.upNext.isEmpty) {
      // only add next edges if we didn't enqueue a retry
      threadSpecOf(t).outgoingEdges(task.nodeName).foreach(e =>
        t.upNext += new UpNextPair(0, e))
    }
  }

  /** Reference: ThreadRun.mutateVariables (:400-438) — two-phase: dry
    * run against pre-state validates everything, then the wet run
    * applies in order. */
  private def mutateVariables(t: ThreadRunState, tr: TaskRunState): Unit = {
    mutateVariablesHelper(t, tr, dryRun = true)
    mutateVariablesHelper(t, tr, dryRun = false)
  }

  private def mutateVariablesHelper(
      t: ThreadRunState, tr: TaskRunState, dryRun: Boolean): Unit = {
    nodeOfTask(t, tr).variableMutations.foreach { case (varName, mutSchema) =>
      val lookup = getVariableDefinition(t, varName).getOrElse(
        throw new RuntimeException(s"variable $varName not in scope"))
      val (varDef, owner, lhs) = lookup
      val rhs = getMutationRHS(t, mutSchema, tr)
      // Java-style cast/parse failures get wrapped with the variable
      // name (Mutation.execute, Mutation.java:40-54); explicit
      // VarSubOrzDash'es pass through unwrapped.
      val newVal =
        try Mutations.apply(lhs, rhs, mutSchema.operation, varDef.varType)
        catch {
          case v: VarSubError => throw v
          case e: Exception =>
            throw new VarSubError(
              s"Had an unexpected error mutating variable $varName, lhs: " +
                s"${LHJson.objToString(lhs)}, rhs: ${LHJson.objToString(rhs)}:\n" +
                e.getMessage, e)
        }
      if (!dryRun) owner.variables(varName) = newVal
    }
  }

  /** Reference: ThreadRun.handleException (:441-452). */
  private def handleException(
      t: ThreadRunState, handlerSpecName: String, tr: TaskRunState,
      reason: String, msg: String): Unit = {
    tr.status = Status.HALTED
    tr.failureMessage = Some(msg)
    tr.failureReason = Some(reason)
    addAndStartInterruptThread(t, handlerSpecName, Map.empty, isException = true)
  }

  /** Reference: ThreadRun.failTask (:455-484). */
  private def failTask(
      t: ThreadRunState, tr: TaskRunState, reason: String, message: String): Unit = {
    tr.status = Status.HALTED
    tr.failureMessage = Some(message)
    tr.failureReason = Some(reason)

    val node = nodeOfTask(t, tr)
    if (FailureReason.isRetryable(reason) && tr.attemptNumber < node.numRetries) {
      t.upNext += new UpNextPair(tr.attemptNumber + 1,
        Edge(sourceNodeName = "", sinkNodeName = node.name))
    } else if (node.baseExceptionhandler.isDefined) {
      handleException(t, node.baseExceptionhandler.get.handlerThreadSpecName,
        tr, reason, message)
    } else {
      halt(t, HaltReason.FAILED,
        s"Thread ${t.id} failed on task ${tr.nodeName}: $reason: $message")
    }
  }

  /** Reference: ThreadRun.evaluateEdge (:487-503). Note the non-SQL
    * null semantics: EQUALS and NOT_EQUALS are both false on null LHS.
    * `.equals` (not `==`) is deliberate: Java `Object.equals` parity —
    * Scala's cooperative equality would make Int 5 equal Long 5L,
    * which the reference treats as unequal. */
  @scala.annotation.nowarn("msg=cooperative equality")
  def evaluateEdge(t: ThreadRunState, cond: Option[EdgeCondition]): Boolean =
    cond match {
      case None => true
      case Some(c) =>
        val lhs = assignVariable(t, c.leftSide)
        val rhs = assignVariable(t, c.rightSide)
        c.comparator match {
          case "LESS_THAN" => Mutations.compare(lhs, rhs) < 0
          case "LESS_THAN_EQ" => Mutations.compare(lhs, rhs) <= 0
          case "GREATER_THAN" => Mutations.compare(lhs, rhs) > 0
          case "GREATER_THAN_EQ" => Mutations.compare(lhs, rhs) >= 0
          case "EQUALS" => lhs != null && lhs.equals(rhs)
          case "NOT_EQUALS" => lhs != null && !lhs.equals(rhs)
          case "IN" => Mutations.contains(rhs, lhs)
          case "NOT_IN" => !Mutations.contains(rhs, lhs)
          case _ => false
        }
    }

  /** Reference: ThreadRun.updateStatus (:505-549). */
  def updateStatus(t: ThreadRunState): Unit = {
    if (t.isCompleted) return

    if (t.status == Status.RUNNING) {
      if (t.upNext.isEmpty) {
        val lastTr = t.taskRuns.lastOption
        if (lastTr.forall(_.isTerminated)) t.status = Status.COMPLETED
      }
    } else if (t.status == Status.HALTED) {
      var i = t.activeInterruptThreadIds.length - 1
      while (i >= 0) {
        val tid = t.activeInterruptThreadIds(i)
        if (tid < wfRun.threadRuns.length) {
          val handler = wfRun.threadRuns(tid)
          if (handler.isCompleted) {
            t.activeInterruptThreadIds.remove(i)
            t.handledInterruptThreadIds += handler.id
          }
        }
        i -= 1
      }
      if (t.haltReasons.contains(HaltReason.INTERRUPT) &&
        t.activeInterruptThreadIds.isEmpty)
        removeHaltReason(t, HaltReason.INTERRUPT)
    } else if (t.status == Status.HALTING) {
      if (t.taskRuns.isEmpty || t.taskRuns.last.isTerminated)
        t.status = Status.HALTED
    }
  }

  // ----- variable locks (reference: ThreadRun.java:551-604) -----

  private def isLocked(t: ThreadRunState, varName: String, threadId: Int): Boolean =
    if (t.variables.contains(varName)) {
      t.variableLocks.get(varName).exists(_ != threadId)
    } else t.parentThreadId match {
      case Some(pid) => isLocked(wfRun.threadRuns(pid), varName, threadId)
      case None => throw new RuntimeException(s"undefined variable $varName")
    }

  private def lock(t: ThreadRunState, varName: String, threadId: Int): Unit =
    if (t.variables.contains(varName)) t.variableLocks(varName) = threadId
    else t.parentThreadId match {
      case Some(pid) => lock(wfRun.threadRuns(pid), varName, threadId)
      case None => throw new RuntimeException(s"undefined variable $varName")
    }

  private def unlock(t: ThreadRunState, varName: String): Unit =
    if (t.variables.contains(varName)) t.variableLocks.remove(varName)
    else t.parentThreadId.foreach(pid => unlock(wfRun.threadRuns(pid), varName))

  private def lockVariables(t: ThreadRunState, n: Node, threadId: Int): Boolean = {
    val needed = n.neededVars
    if (needed.exists(v => isLocked(t, v, threadId))) false
    else { needed.foreach(v => lock(t, v, threadId)); true }
  }

  private def unlockVariables(t: ThreadRunState, n: Node): Unit =
    n.neededVars.foreach(v => unlock(t, v))

  // ----- advance + node activation (reference: ThreadRun.java:606-1073) -----

  /** Reference: ThreadRun.advance (:606-668). */
  def advance(t: ThreadRunState, event: WFEvent): Boolean = {
    if (t.status != Status.RUNNING || t.upNext.isEmpty) return false

    var shouldClear = true
    var activatedNode: Node = null
    var activatedPair: UpNextPair = null
    val it = t.upNext.iterator
    while (activatedNode == null && it.hasNext) {
      val pair = it.next()
      try {
        if (evaluateEdge(t, pair.edge.condition)) {
          val n = nodeOf(t, pair.edge.sinkNodeName)
          if (lockVariables(t, n, t.id)) {
            activatedNode = n
            activatedPair = pair
          } else {
            shouldClear = false
          }
        }
      } catch {
        case e: VarSubError =>
          if (t.taskRuns.isEmpty)
            throw new RuntimeException(
              "condition failed before any task ran: " + e.getMessage)
          failTask(t, t.taskRuns.last, FailureReason.VARIABLE_LOOKUP_ERROR,
            "Failed substituting variable when processing if condition: " +
              e.getMessage)
          return true
      }
    }

    if (activatedNode == null && shouldClear) {
      t.upNext = mutable.ArrayBuffer.empty
      return true
    }
    if (activatedNode == null) return false // blocked, nothing changed

    activateNode(t, activatedNode, event, activatedPair)
  }

  /** Reference: ThreadRun.activateNode (:670-706). */
  private def activateNode(
      t: ThreadRunState, node: Node, event: WFEvent, pair: UpNextPair): Boolean =
    node.nodeType match {
      case NodeType.TASK => activateTaskNode(t, node, event, pair.attemptNumber)
      case NodeType.EXTERNAL_EVENT => activateExternalEventNode(t, node, event, pair)
      case NodeType.SPAWN_THREAD => activateSpawnThreadNode(t, node, event, pair.attemptNumber)
      case NodeType.WAIT_FOR_THREAD => activateWaitForThreadNode(t, node, event, pair.attemptNumber)
      case NodeType.THROW_EXCEPTION => activateThrowExceptionNode(t, node, event, pair.attemptNumber)
      case NodeType.SLEEP => activateSleepNode(t, node, event, pair.attemptNumber)
      case NodeType.NOP => activateNopNode(t, node, event)
      case other => throw new RuntimeException(s"invalid node type: $other")
    }

  /** Reference: activateNopNode (:708-718). */
  private def activateNopNode(t: ThreadRunState, node: Node, event: WFEvent): Boolean = {
    t.upNext = mutable.ArrayBuffer.empty
    val tr = createNewTaskRun(t, node)
    t.taskRuns += tr
    completeTask(t, tr, Status.COMPLETED,
      TaskRunResult(Some(""), None, success = true, 0), event.timestamp)
    true
  }

  /** Reference: activateThrowExceptionNode (:720-733). */
  private def activateThrowExceptionNode(
      t: ThreadRunState, node: Node, event: WFEvent, attemptNumber: Int): Boolean = {
    val tr = createNewTaskRun(t, node, attemptNumber)
    t.taskRuns += tr
    t.exceptionName = node.exceptionToThrow
    completeTask(t, tr, Status.HALTED,
      TaskRunResult(None,
        Some(s"Throwing exception ${node.exceptionToThrow.orNull}"),
        success = false, -1),
      event.timestamp)
    true
  }

  /** Reference: getTimeoutTime (:770-791); deadline base is the event
    * timestamp (see class doc). Value must be a non-negative Int. */
  private def getTimeoutMillis(
      t: ThreadRunState, node: Node, event: WFEvent): Option[Long] =
    node.timeoutSeconds.map { assn =>
      assignVariable(t, assn) match {
        case i: Int if i >= 0 => event.timestamp + i * 1000L
        case i: Int => throw new VarSubError(s"java.lang.Integer with val: $i")
        case null => throw new VarSubError("null pointer")
        case other => throw new VarSubError(other.getClass.getCanonicalName)
      }
    }

  /** Reference: activateSleepNode (:735-768). */
  private def activateSleepNode(
      t: ThreadRunState, node: Node, event: WFEvent, attemptNumber: Int): Boolean = {
    val tr = createNewTaskRun(t, node, attemptNumber)
    t.taskRuns += tr
    try {
      val mat = getTimeoutMillis(t, node, event).getOrElse(
        throw new VarSubError("SLEEP node without timeoutSeconds"))
      timers += WFRunTimer(wfRun.objectId, t.id, tr.position, None, mat)
    } catch {
      case e: VarSubError =>
        failTask(t, tr, FailureReason.INVALID_WF_SPEC_ERROR,
          "Failed calculating sleep seconds: " + e.getMessage)
    }
    t.upNext = mutable.ArrayBuffer.empty
    true
  }

  /** Reference: activateTaskNode (:793-857). */
  private def activateTaskNode(
      t: ThreadRunState, node: Node, event: WFEvent, attemptNumber: Int): Boolean = {
    t.upNext = mutable.ArrayBuffer.empty
    val tr = createNewTaskRun(t, node, attemptNumber)
    tr.scheduleTime = Some(event.timestamp)
    t.taskRuns += tr

    var subs = ListMap.empty[String, Any]
    node.variables.foreach { case (varName, assn) =>
      try subs = subs.updated(varName, assignVariable(t, assn))
      catch { case _: VarSubError => () } // reference swallows (:827-829)
    }

    try {
      getTimeoutMillis(t, node, event).foreach { mat =>
        timers += WFRunTimer(wfRun.objectId, t.id, tr.position, Some(node.name), mat)
      }
      // schedule only if the timeout calculation didn't fail (:844-846)
      toSchedule += TaskScheduleRequest(
        taskDefId = node.taskDefName.getOrElse(""),
        taskDefName = node.taskDefName.getOrElse(""),
        wfRunId = wfRun.objectId,
        wfSpecId = wfRun.wfSpecDigest,
        wfSpecName = wfRun.wfSpecName,
        threadId = t.id,
        taskRunPosition = tr.position,
        variableSubstitutions = subs,
        kafkaTopic = eventTopic)
    } catch {
      case e: VarSubError =>
        failTask(t, tr, FailureReason.INVALID_WF_SPEC_ERROR,
          "Failed calculating timeout: " + e.getMessage)
    }
    true
  }

  /** Reference: activateSpawnThreadNode (:859-896). */
  private def activateSpawnThreadNode(
      t: ThreadRunState, node: Node, event: WFEvent, attemptNumber: Int): Boolean = {
    t.upNext = mutable.ArrayBuffer.empty
    val tr = createNewTaskRun(t, node, attemptNumber)
    val inputVars = mutable.LinkedHashMap.empty[String, Any]
    try {
      node.variables.foreach { case (k, v) =>
        inputVars(k) = assignVariable(t, v)
      }
    } catch {
      case e: VarSubError =>
        failTask(t, tr, FailureReason.VARIABLE_LOOKUP_ERROR,
          "Failed creating variables for subthread: " + e.getMessage)
        return true
    }

    val child = createThread(node.threadSpawnThreadSpecName.get, inputVars, Some(t))
    wfRun.threadRuns += child

    val meta = ListMap[String, Any](
      "threadId" -> child.id,
      "parentThreadId" -> tr.threadId,
      "threadSpecName" -> t.threadSpecName,
      "sourceNodeName" -> tr.nodeName,
      "sourceNodeId" -> null)
    t.taskRuns += tr
    completeTask(t, tr, Status.COMPLETED,
      TaskRunResult(Some(LHJson.render(meta)), None, success = true, 0),
      event.timestamp)
    true
  }

  /** Reference: activateExternalEventNode (:898-978) — per-key buffered
    * stream-stream join: the LAST unassigned buffered event wins; the
    * timeout timer is armed exactly once per edge activation. */
  private def activateExternalEventNode(
      t: ThreadRunState, node: Node, event: WFEvent, pair: UpNextPair): Boolean = {
    val relevantEdge = t.upNext.find(_.edge.sinkNodeName == node.name).orNull
    if (relevantEdge == null) {
      halt(t, HaltReason.FAILED, "Somehow there was no relevant edge")
      return true
    }

    if (!relevantEdge.alreadyActivated) {
      relevantEdge.alreadyActivated = true
      try {
        getTimeoutMillis(t, node, event).foreach { mat =>
          timers += WFRunTimer(
            wfRun.objectId, t.id, t.taskRuns.length, Some(node.name), mat)
        }
      } catch {
        case e: VarSubError =>
          val tr = createNewTaskRun(t, node, pair.attemptNumber)
          t.taskRuns += tr
          failTask(t, tr, FailureReason.INVALID_WF_SPEC_ERROR,
            "Failed to determine timeout: " + e.getMessage)
          return true
      }
    }

    val relevantEvents = wfRun.correlatedEvents.getOrElseUpdate(
      node.externalEventDefName.get, mutable.ArrayBuffer.empty)
    // the reference's candidate loop has no break (ThreadRun.java:
    // 950-957), so the LAST unassigned buffered event wins
    val correl = relevantEvents.findLast(c =>
      c.event != null && c.assignedNodeName.isEmpty).orNull
    if (correl == null) return false // still waiting

    val tr = createNewTaskRun(t, node, pair.attemptNumber)
    t.taskRuns += tr
    correl.assignedNodeName = Some(node.name)
    correl.assignedTaskRunExecutionNumber = tr.position
    correl.assignedThreadId = tr.threadId

    completeTask(t, tr, Status.COMPLETED,
      TaskRunResult(Some(LHJson.objToString(correl.event.content)), None,
        success = true, 0),
      correl.event.timestamp)
    t.upNext = mutable.ArrayBuffer.empty
    threadSpecOf(t).outgoingEdges(node.name).foreach(e =>
      t.upNext += new UpNextPair(0, e))
    true
  }

  /** Reference: activateWaitForThreadNode (:980-1073). */
  private def activateWaitForThreadNode(
      t: ThreadRunState, node: Node, event: WFEvent, attemptNumber: Int): Boolean = {
    val tr = createNewTaskRun(t, node, attemptNumber)

    val threadId: Int =
      try {
        assignVariable(t, node.threadWaitThreadId.get) match {
          case i: Int => i
          case other => throw new VarSubError(
            s"Cannot cast ${if (other == null) "null" else other.getClass} to Integer")
        }
      } catch {
        case e: VarSubError =>
          failTask(t, tr, FailureReason.VARIABLE_LOOKUP_ERROR,
            "Failed determining ID of thread to wait for: " + e.getMessage)
          return true
      }

    val failureMessage: Option[String] =
      if (threadId < 0 || threadId >= wfRun.threadRuns.length)
        Some(s"Supposed to wait for thread $threadId but that thread " +
          "doesn't exist yet!")
      else if (threadId == t.id)
        Some(s"Tried to wait for id ${t.id} but that is id of the running thread!")
      else None

    failureMessage match {
      case Some(msg) =>
        t.taskRuns += tr
        failTask(t, tr, FailureReason.INVALID_WF_SPEC_ERROR, msg)
        return true
      case None => ()
    }

    val toWaitFor = wfRun.threadRuns(threadId)
    if (!toWaitFor.isTerminated) return false // still waiting

    if (toWaitFor.isCompleted) {
      t.taskRuns += tr
      completeTask(t, tr, Status.COMPLETED,
        TaskRunResult(Some(LHJson.render(ListMap.from(toWaitFor.variables))),
          None, success = true, 0),
        event.timestamp)
      return true
    }

    // Parity quirk: the reference only adds the TaskRun to taskRuns on
    // the COMPLETED and invalid-spec branches; on subthread-failure
    // branches the TaskRun is mutated but never recorded
    // (ThreadRun.java:1044-1070 — completeTask doesn't add), so failed
    // waits leave no TaskRun in the snapshot. Mirrored exactly.
    node.handlerSpec(toWaitFor.exceptionName) match {
      case None =>
        val msg = s"Tried to wait for thread ${toWaitFor.id} but it failed " +
          "rather than succeeded!"
        tr.stdout = ""
        tr.stderr = msg
        completeTask(t, tr, Status.HALTED,
          TaskRunResult(None, Some(msg), success = false, 1),
          event.timestamp, FailureReason.SUBTHREAD_FAILURE)
      case Some(hspec) =>
        val msg = s"TaskRun on ${tr.nodeName} Failed with exception " +
          s"${hspec.handlerThreadSpecName}, so we are handling it."
        completeTask(t, tr, Status.HALTED,
          TaskRunResult(None, Some(msg), success = false, 1),
          event.timestamp)
        handleException(t, hspec.handlerThreadSpecName, tr,
          FailureReason.TASK_FAILURE, msg)
    }
    true
  }

  /** Reference: ThreadRun.handleTimer (:1075-1140). */
  def handleTimer(t: ThreadRunState, timer: WFRunTimer): Unit = {
    val taskRun: TaskRunState =
      if (timer.taskRunId < t.taskRuns.length) t.taskRuns(timer.taskRunId)
      else null

    if (taskRun == null) {
      // EXTERNAL_EVENT node that didn't fire in time.
      if (t.upNext.isEmpty) {
        halt(t, HaltReason.FAILED, "Somehow a phantom timer got sent out.")
        return
      }
      var timedOut: TaskRunState = null
      t.upNext.foreach { p =>
        if (timer.nodeName.contains(p.edge.sinkNodeName)) {
          timedOut = createNewTaskRun(t, nodeOf(t, p.edge.sinkNodeName))
          t.taskRuns += timedOut
          failTask(t, timedOut, FailureReason.TIMEOUT,
            "External event didnt come in time.")
        }
      }
      if (timedOut == null)
        halt(t, HaltReason.FAILED, "Somehow a phantom timer got sent out.")
    } else if (taskRun.isTerminated) {
      () // already complete; nothing to do
    } else {
      val nodeType = nodeOfTask(t, taskRun).nodeType
      if (nodeType == NodeType.SLEEP) {
        completeTask(t, taskRun, Status.COMPLETED,
          TaskRunResult(None, None, success = true, 0),
          timer.maturationTimestamp)
      } else if (nodeType == NodeType.TASK || nodeType == NodeType.WAIT_FOR_THREAD) {
        failTask(t, taskRun, FailureReason.TIMEOUT, "taskRun Timed out!")
      } else {
        throw new RuntimeException("Shouldn't have timer in this case.")
      }
    }
  }

  // ----- halt lattice + interrupts (reference: ThreadRun.java:1167-1285) -----

  private def children(t: ThreadRunState): Seq[ThreadRunState] =
    t.childThreadIds.map(wfRun.threadRuns(_)).toSeq

  /** Reference: ThreadRun.halt (:1167-1186). */
  def halt(t: ThreadRunState, reason: String, message: String): Unit = {
    if (t.status == Status.RUNNING) {
      t.status = Status.HALTING
      t.errorMessage += message + "\n"
    }
    t.haltReasons += reason
    children(t).foreach { kid =>
      if (!(kid.isInterruptThread && reason == HaltReason.INTERRUPT))
        halt(kid, HaltReason.PARENT_STOPPED, "Parent thread was halted.")
    }
  }

  /** Reference: ThreadRun.removeHaltReason (:1188-1214). */
  def removeHaltReason(t: ThreadRunState, reason: String): Unit = {
    t.haltReasons -= reason
    if (t.haltReasons.isEmpty) {
      if (t.status == Status.HALTED || t.status == Status.HALTING) {
        t.status = Status.RUNNING
        t.errorMessage = ""
      }
      children(t).foreach(kid => removeHaltReason(kid, HaltReason.PARENT_STOPPED))
    } else if (t.haltReasons.size == 1 &&
      t.haltReasons.contains(HaltReason.INTERRUPT)) {
      children(t).foreach { kid =>
        if (kid.isInterruptThread)
          removeHaltReason(kid, HaltReason.PARENT_INTERRUPTED)
      }
    }
  }

  /** Reference: ThreadRun.handleInterrupt (:1217-1227). */
  def handleInterrupt(t: ThreadRunState, payload: ExternalEventPayload): Unit = {
    val idef = threadSpecOf(t).interruptDefs(payload.externalEventDefName)
    addAndStartInterruptThread(t, idef.handlerThreadName,
      LHJson.unsplat(payload.content), isException = false)
  }

  /** Reference: addAndStartInterruptThread (:1230-1249) — create the
    * handler thread BEFORE halting so the new thread doesn't inherit
    * the PARENT_STOPPED reason. */
  private def addAndStartInterruptThread(
      t: ThreadRunState, tspecName: String,
      inputs: scala.collection.Map[String, Any], isException: Boolean): Unit = {
    val trun = createThread(tspecName, inputs, Some(t))
    trun.isInterruptThread = true
    wfRun.threadRuns += trun
    t.activeInterruptThreadIds += trun.id
    halt(t, HaltReason.INTERRUPT,
      if (isException) "Halted to handle Exception" else "Halted for interrupt")
  }

  /** Reference: ThreadRun.propagateInterrupt (:1274-1285). */
  def propagateInterrupt(t: ThreadRunState, payload: ExternalEventPayload): Unit = {
    if (threadSpecOf(t).interruptDefs.contains(payload.externalEventDefName))
      handleInterrupt(t, payload)
    else
      children(t).foreach(kid => propagateInterrupt(kid, payload))
  }
}
