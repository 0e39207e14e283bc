package graft.engine

import scala.collection.immutable.ListMap

/** Programmatic WFSpec construction helpers mirroring the SDK
  * compiler's output shapes (lhctl/lh_sdk/thread_spec_builder.py).
  * Shared by the engine-parity queries and the test harness — one
  * definition so production folds and unit tests build identical specs.
  */
trait SpecBuilders {
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

  /** Attach mutations to a node (SDK `_mutate`). */
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
}

object SpecBuilders extends SpecBuilders
