package graft.engine

import scala.collection.immutable.ListMap

/** Test-side facade over [[Simulator]]: spec-building helpers that
  * mirror the SDK compiler's output shapes
  * (lhctl/lh_sdk/thread_spec_builder.py) plus assertion helpers.
  */
object Harness {
  // re-exports so specs read naturally
  type TaskBehavior = Simulator.TaskBehavior
  val Ok = Simulator.Ok
  val Fail = Simulator.Fail
  val NoResponse = Simulator.NoResponse
  val ExternalInput = Simulator.ExternalInput
  val StopResume = Simulator.StopResume
  def sharedTasks(name: String, stdin: ListMap[String, Any]): TaskBehavior =
    Simulator.sharedTasks(name, stdin)

  def run(
      spec: WFSpec,
      inputVars: Map[String, Any] = Map.empty,
      externals: Seq[Simulator.ExternalInput] = Nil,
      stopResumes: Seq[Simulator.StopResume] = Nil,
      tasks: (String, ListMap[String, Any], Int) => Simulator.TaskBehavior =
        (n, in, _) => Simulator.sharedTasks(n, in),
      startTime: Long = 1000L): (WFRunState, Vector[TaskScheduleRequest]) =
    Simulator.run(spec, inputVars, externals, stopResumes, tasks,
      startTime = startTime)

  // ---- spec-building helpers ----

  def lit(v: Any): VariableAssignment = VariableAssignment(literalValue = v)
  def varRef(name: String, jsonPath: String = null): VariableAssignment =
    VariableAssignment(wfRunVariableName = Some(name),
      jsonPath = Option(jsonPath))

  def cond(l: VariableAssignment, cmp: String, r: VariableAssignment): EdgeCondition =
    EdgeCondition(l, r, cmp)

  def task(name: String, taskDef: String,
      vars: (String, VariableAssignment)*): Node =
    Node(name = name, nodeType = NodeType.TASK, taskDefName = Some(taskDef),
      variables = ListMap.from(vars))

  def nop(name: String): Node = Node(name = name, nodeType = NodeType.NOP)

  def mutate(n: Node, muts: (String, VariableMutation)*): Node =
    n.copy(variableMutations = ListMap.from(muts))

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
      variableDefs = ListMap.from(vars),
      interruptDefs = ListMap.from(interrupts.map { case (k, v) =>
        k -> InterruptDef(v) }),
      nodes = ListMap.from(nodes.map(n => n.name -> n)),
      edges = edges.toVector)

  def wfSpec(name: String, entrypoint: String, threads: ThreadSpec*): WFSpec =
    SpecCodec.validate(WFSpec(
      name = name, objectId = s"$name-id",
      entrypointThreadName = entrypoint,
      threadSpecs = ListMap.from(threads.map(t => t.name -> t))))

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
