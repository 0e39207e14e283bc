package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import Harness._

/** lhctl-compatible run-state export: [[StateCodec.encodeSdk]] renders
  * a folded run in the reference SDK's serialized `WFRunSchema` shape
  * (wf_run_schema.py:130-146 and nested models) — camelCase aliases,
  * model-declaration field ORDER, enum strings, ISO-8601 UTC
  * datetimes, `returncode` one-word, per-taskRun `nodeType` looked up
  * from the spec. A reference-tooling consumer must be able to read
  * this engine's state without modification; field order is asserted
  * literally because pydantic emits it deterministically and diffs of
  * exported documents should be stable across engines.
  */
class WfRunExportSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/wirespecs/$name.json")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def keysOf(v: Any): Seq[String] =
    v.asInstanceOf[ListMap[String, Any]].keys.toSeq

  test("basic_wf run exports in the SDK WFRunSchema wire shape") {
    val spec = SpecCodec.decode(fixture("basic_wf"))
    val (s, _) = Harness.run(spec,
      externals = Seq(ExternalInput(2000L, "my-name", "GENERAL KENOBI")),
      tasks = (name, stdin, _) => name match {
        case "basic_wf-ask_for_name" => Ok("Hey what's your name?")
        case _ => Ok(s"Hello there, ${stdin.getOrElse("name", null)}!")
      })
    assert(s.status == Status.COMPLETED)

    val doc = LHJson.parse(StateCodec.encodeSdk(s, spec))
      .asInstanceOf[ListMap[String, Any]]

    // WFRunSchema model field order (wf_run_schema.py:130-146)
    assert(keysOf(doc) == Seq("created", "objectId", "wfSpecName",
      "wfSpecDigest", "threadRuns", "status", "startTime", "endTime",
      "errorCode", "errorMessage", "correlatedEvents",
      "pendingInterrupts"))
    assert(doc("objectId") != null && doc("wfSpecName") == "my_workflow")
    assert(doc("status") == "COMPLETED")
    // pydantic datetime rendering: ISO-8601, tz-aware UTC
    assert(doc("startTime").asInstanceOf[String]
      .matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}\+00:00"""))

    val thr = doc("threadRuns").asInstanceOf[Vector[Any]].head
    // ThreadRunSchema order (wf_run_schema.py:80-98)
    assert(keysOf(thr) == Seq("threadSpecName", "upNext", "status",
      "variables", "id", "parentThreadId", "childThreadIds",
      "activeInterruptThreadIds", "handledInterruptThreadIds",
      "taskRuns", "errorMessage", "isInterruptThread", "variableLocks",
      "haltReasons"))
    val vars = thr.asInstanceOf[ListMap[String, Any]]("variables")
      .asInstanceOf[ListMap[String, Any]]
    assert(vars("my_name_var") == "GENERAL KENOBI")

    val tasks = thr.asInstanceOf[ListMap[String, Any]]("taskRuns")
      .asInstanceOf[Vector[Any]]
    assert(tasks.length == 3)
    // TaskRunSchema order (wf_run_schema.py:43-70), incl. the
    // one-word `returncode` and the spec-derived `nodeType`
    assert(keysOf(tasks.head) == Seq("position", "number", "wfSpecId",
      "wfSpecName", "threadId", "attemptNumber", "taskDefVersionNumber",
      "nodeName", "workerId", "stdin", "stdout", "stderr", "returncode",
      "scheduleTime", "startTime", "endTime", "failureReason",
      "failureMessage", "nodeType", "status"))
    val types = tasks.map(_.asInstanceOf[ListMap[String, Any]]("nodeType"))
    assert(types == Vector("TASK", "EXTERNAL_EVENT", "TASK"))
    assert(tasks.forall(
      _.asInstanceOf[ListMap[String, Any]]("status") == "COMPLETED"))

    // the external event correlation exports in SDK shape too:
    // assignedThreadId is a STRING on the wire (SDK model quirk)
    val correls = doc("correlatedEvents")
    if (correls != null) {
      val c = correls.asInstanceOf[ListMap[String, Any]]
        .values.head.asInstanceOf[Vector[Any]].head
      assert(keysOf(c) == Seq("event", "assignedTaskRunExecutionNumber",
        "assignedNodeName", "assignedThreadId", "arrivalTime"))
      val tid = c.asInstanceOf[ListMap[String, Any]]("assignedThreadId")
      assert(tid == null || tid.isInstanceOf[String])
    }
  }

  test("StateTable.sdkExport renders snapshots distributed, SDK shape") {
    val spark = graft.TestSpark.session
    import spark.implicits._
    val spec = SpecCodec.decode(fixture("basic_wf"))
    val (s, _) = Harness.run(spec,
      externals = Seq(ExternalInput(2000L, "my-name", "Obi-Wan")),
      tasks = (name, stdin, _) => name match {
        case "basic_wf-ask_for_name" => Ok("Hey what's your name?")
        case _ => Ok(s"Hello there, ${stdin.getOrElse("name", null)}!")
      })
    val snaps = Seq((s.objectId, StateCodec.encode(s), 1L))
      .toDF("wfRunId", "json", "seq")
    val latest = graft.streaming.StateTable.latest(snaps)
    val out = graft.streaming.StateTable
      .sdkExport(latest, Map(spec.name -> spec)).collect()
    assert(out.length == 1)
    val doc = LHJson.parse(out.head.getString(1))
      .asInstanceOf[ListMap[String, Any]]
    assert(doc("status") == "COMPLETED")
    assert(keysOf(doc).take(4) ==
      Seq("created", "objectId", "wfSpecName", "wfSpecDigest"))
  }

  test("export labels every node type from the spec (threads fixture)") {
    val spec = SpecCodec.decode(fixture("basic_threads"))
    val (s, _) = Harness.run(spec, Map("parent_var" -> "boo"),
      tasks = (name, stdin, _) => name match {
        case "basic_threads-parent_task" =>
          Ok(s"""Called parent_task() with input "${stdin("input_str")}"!""")
        case _ =>
          Ok(s"""Called child_task() with input "${stdin("input_str")}"""")
      })
    assert(s.status == Status.COMPLETED)
    val doc = LHJson.parse(StateCodec.encodeSdk(s, spec))
      .asInstanceOf[ListMap[String, Any]]
    val allTypes = doc("threadRuns").asInstanceOf[Vector[Any]]
      .flatMap(_.asInstanceOf[ListMap[String, Any]]("taskRuns")
        .asInstanceOf[Vector[Any]])
      .map(_.asInstanceOf[ListMap[String, Any]]("nodeType")).toSet
    // the threads workflow exercises spawn/wait alongside tasks
    assert(allTypes.contains("SPAWN_THREAD"))
    assert(allTypes.contains("WAIT_FOR_THREAD"))
    assert(allTypes.contains("TASK"))
  }
}
