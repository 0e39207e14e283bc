package graft.engine

import scala.collection.immutable.ListMap

/** Test-side facade over [[Simulator]]: spec-building helpers that
  * mirror the SDK compiler's output shapes
  * (lhctl/lh_sdk/thread_spec_builder.py) plus assertion helpers.
  */
object Harness extends SpecBuilders {
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

  // spec builders inherited from graft.engine.SpecBuilders

  // ---- assertion helpers ----

  def mainThread(s: WFRunState): ThreadRunState = s.threadRuns(0)

  def taskNodesOf(s: WFRunState, spec: WFSpec, tid: Int = 0): Seq[TaskRunState] =
    s.threadRuns(tid).taskRuns.toSeq.filter { tr =>
      spec.threadSpecs(s.threadRuns(tid).threadSpecName)
        .nodes(tr.nodeName).nodeType == NodeType.TASK
    }
}
