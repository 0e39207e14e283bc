package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import Harness._
import Mutations.{Op => M}

/** Ports of the reference's end-to-end harness checks
  * (lhctl/lh_test_harness/tests, see FIXTURES.md §2) against the pure
  * engine fold. Each test compiles the same workflow shape the SDK
  * produces and asserts the same properties as the Python `check_*`
  * functions.
  *
  * COVERAGE CHECKLIST — every module in
  * /root/reference/lhctl/lh_test_harness/tests/ mapped to its spec
  * (round-12 audit, VERDICT item 6; keep this current when the
  * reference harness grows):
  *  - basic.py                    → EngineSpec "basic: *"
  *  - conditionals_basic.py       → EngineSpec "conditionals_basic: *"
  *  - conditionals_edge_1.py      → EngineSpec "conditionals_edge_1: *"
  *      incl. launch_conditionals_edge_2 (:71-91, bad-typed input) →
  *      "conditionals_edge_2: bad-typed input halts with
  *      VARIABLE_LOOKUP_ERROR"
  *  - var_assign_jsonpath_happy.py→ EngineSpec "var_assign_jsonpath_happy: *"
  *  - var_adds.py                 → EngineSpec "var_adds case 1/2"
  *  - var_mutations.py            → EngineSpec "var_mutations case 1/2/3"
  *  - external_event_basic.py     → EngineSpec2 "external_event_basic case 0/1"
  *  - threads_basic.py            → EngineSpec2 "threads_basic: *" +
  *      "wait_for_thread on a failed child *"
  *  - interrupts.py               → EngineSpec2 "interrupts case 0/1"
  *  - interrupts_with_payload.py  → EngineSpec2 "interrupts_with_payload:
  *      payload unsplats into handler variables"
  *  - interrupts_multiple.py      → EngineSpec2 "interrupts_multiple: *"
  *  - retries_task.py             → EngineSpec2 "retries: *"
  *  - retries_task_timeout.py     → EngineSpec2 "retries_task_timeout: *" +
  *      "late task result after timeout is ignored"
  *  - shared_tasks.py             → not a test module: the task-function
  *      library the others import (echo/slow/unreliable/increment/
  *      big_blob/echo_int/echo_float); its behaviors are exercised via
  *      the simulators inside the tests above.
  */
class EngineSpec extends AnyFunSuite {

  private val HELLO = "Hello, there!"

  // ===== basic.py =====

  private val basicSpec = wfSpec("basic", "basic",
    thread("basic", Map.empty,
      nodes = Seq(task("0-echo", "echo_task", "thing" -> lit(HELLO))),
      edges = Nil))

  test("basic: one task completes with stdout") {
    val (s, tsrs) = Harness.run(basicSpec)
    assert(s.status == Status.COMPLETED)
    assert(s.threadRuns.length == 1)
    val thr = mainThread(s)
    assert(thr.taskRuns.length == 1)
    assert(thr.taskRuns(0).status == Status.COMPLETED)
    assert(thr.taskRuns(0).stdout == HELLO)
    assert(tsrs.length == 1)
    assert(tsrs(0).taskDefName == "echo_task")
    assert(tsrs(0).variableSubstitutions("thing") == HELLO)
  }

  test("basic: spec JSON decode round-trips through SpecCodec") {
    val json =
      """{"name": "basic", "entrypointThreadName": "basic",
        | "threadSpecs": {"basic": {"nodes": {
        |   "0-echo": {"nodeType": "TASK", "taskDefName": "echo_task",
        |     "variables": {"thing": {"literalValue": "Hello, there!"}}}},
        |  "edges": []}}}""".stripMargin
    val spec = SpecCodec.decode(json)
    assert(spec.threadSpecs("basic").entrypointNodeName == "0-echo")
    val (s, _) = Harness.run(spec)
    assert(s.status == Status.COMPLETED)
    assert(mainThread(s).taskRuns(0).stdout == HELLO)
  }

  // ===== conditionals_basic.py =====

  private val ENTRY = "This is entrypoint task"
  private val UNDER_TEN = "Its under 10!"
  private val TEN_OR_MORE = "Its 10 or more!"
  private val LUCKY = "You feeling lucky, punk?"
  private val MERGER = "This task should execute on all WFRun's."
  private val COLT = "This is colt's grad year!"

  private val condBasicSpec = {
    val my = varRef("my_int")
    wfSpec("conditionals_basic", "main",
      thread("main", Map("my_int" -> WFRunVariableDef(VarType.INT)),
        nodes = Seq(
          task("n0", "echo_task", "thing" -> lit(ENTRY)),
          nop("n1"),
          task("n2", "echo_task", "thing" -> lit(UNDER_TEN)),
          task("n3", "echo_task", "thing" -> lit(TEN_OR_MORE)),
          nop("n4"),
          task("n5", "echo_task", "thing" -> lit(LUCKY)),
          nop("n6"),
          task("n7", "echo_task", "thing" -> lit(MERGER)),
          task("n8", "echo_task", "thing" -> lit(COLT)),
          nop("n9")),
        edges = Seq(
          edge("n0", "n1", cond(my, "GREATER_THAN", lit(0))),
          edge("n0", "n6", cond(my, "LESS_THAN_EQ", lit(0))),
          edge("n1", "n2", cond(my, "LESS_THAN", lit(10))),
          edge("n1", "n3", cond(my, "GREATER_THAN_EQ", lit(10))),
          edge("n2", "n4"),
          edge("n3", "n4"),
          edge("n4", "n5", cond(my, "IN", lit(Vector(42, 137)))),
          edge("n4", "n6", cond(my, "NOT_IN", lit(Vector(42, 137)))),
          edge("n5", "n6"),
          edge("n6", "n7"),
          edge("n7", "n8", cond(my, "EQUALS", lit(20))),
          edge("n7", "n9", cond(my, "NOT_EQUALS", lit(20))),
          edge("n8", "n9"))))
  }

  test("conditionals_basic: branch coverage over all launch inputs") {
    for (i <- Seq(-10, 0, 2, 10, 15, 42, 20, 137, 1888)) {
      val (s, _) = Harness.run(condBasicSpec, Map("my_int" -> i))
      assert(s.status == Status.COMPLETED, s"input $i")
      assert(s.threadRuns.length == 1)
      val outs = taskNodesOf(s, condBasicSpec).map(_.stdout)
      val expected: Seq[Any] =
        if (i <= 0) Seq(ENTRY, MERGER)
        else if (i < 10) Seq(ENTRY, UNDER_TEN, MERGER)
        else if (i == 20) Seq(ENTRY, TEN_OR_MORE, MERGER, COLT)
        else if (i == 42 || i == 137) Seq(ENTRY, TEN_OR_MORE, LUCKY, MERGER)
        else Seq(ENTRY, TEN_OR_MORE, MERGER)
      assert(outs == expected, s"input $i")
      assert(mainThread(s).variables("my_int") == i)
    }
  }

  // ===== conditionals_edge_1.py =====

  private val condEdgeSpec = {
    val my = varRef("my_int")
    wfSpec("conditionals_edge_1", "main",
      thread("main", Map("my_int" -> WFRunVariableDef(VarType.INT)),
        nodes = Seq(
          nop("n0"),
          task("n1", "echo_task", "thing" -> lit(TEN_OR_MORE)),
          nop("n2"),
          task("n3", "echo_task", "thing" -> lit(MERGER))),
        edges = Seq(
          edge("n0", "n1", cond(my, "GREATER_THAN", lit(10))),
          edge("n0", "n2", cond(my, "LESS_THAN_EQ", lit(10))),
          edge("n1", "n2"),
          edge("n2", "n3"))))
  }

  test("conditionals_edge_1: 11 takes branch, 9 skips it") {
    for (i <- Seq(9, 11)) {
      val (s, _) = Harness.run(condEdgeSpec, Map("my_int" -> i))
      assert(s.status == Status.COMPLETED, s"input $i")
      val tasks = taskNodesOf(s, condEdgeSpec)
      if (i > 10) {
        assert(tasks.map(_.stdout) == Seq(TEN_OR_MORE, MERGER))
      } else {
        assert(tasks.map(_.stdout) == Seq(MERGER))
      }
    }
  }

  test("conditionals_edge_2: bad-typed input halts with VARIABLE_LOOKUP_ERROR") {
    val (s, _) = Harness.run(condEdgeSpec, Map("my_int" -> "not an int"))
    assert(s.status == Status.HALTED)
    val thr = mainThread(s)
    assert(thr.taskRuns.length == 1)
    val tr = thr.taskRuns(0)
    assert(tr.status == Status.HALTED)
    assert(tr.nodeName == "n0") // the NOP entrypoint node
    assert(tr.failureReason.contains(FailureReason.VARIABLE_LOOKUP_ERROR))
  }

  // ===== var_assign_jsonpath_happy.py =====

  private val strResult = "this is some str"

  private val jsonpathHappySpec = wfSpec("var_assign_jsonpath_happy", "main",
    thread("main",
      Map(
        "my_int" -> WFRunVariableDef(VarType.INT),
        "my_bool" -> WFRunVariableDef(VarType.BOOLEAN),
        "my_list" -> WFRunVariableDef(VarType.ARRAY),
        "my_str" -> WFRunVariableDef(VarType.STRING),
        "my_float" -> WFRunVariableDef(VarType.FLOAT),
        "my_obj" -> WFRunVariableDef(VarType.OBJECT),
        "my_second_obj" -> WFRunVariableDef(VarType.OBJECT)),
      nodes = Seq(
        mutate(task("n0", "big_blob_task"),
          "my_list" -> mut(M.ASSIGN, jsonPath = "$.some_list"),
          "my_int" -> mut(M.ASSIGN, jsonPath = "$.some_blob.some_int"),
          "my_bool" -> mut(M.ASSIGN, jsonPath = "$.some_blob.some_bool"),
          "my_obj" -> mut(M.ASSIGN),
          "my_second_obj" -> mut(M.ASSIGN, jsonPath = "$.some_blob"),
          "my_str" -> mut(M.ASSIGN, literal = strResult)),
        mutate(task("n1", "echo_task", "thing" -> lit("hello there!")),
          "my_float" -> mut(M.ASSIGN,
            source = varRef("my_second_obj", "$.some_float")))),
      edges = Seq(edge("n0", "n1"))))

  test("var_assign_jsonpath_happy: all jsonpath assignments land") {
    val (s, _) = Harness.run(jsonpathHappySpec)
    val thr = mainThread(s)
    assert(thr.status == Status.COMPLETED)
    assert(thr.taskRuns.length == 2)
    assert(thr.taskRuns.forall(_.status == Status.COMPLETED))

    val bigBlob = ListMap[String, Any](
      "some_blob" -> ListMap[String, Any](
        "some_int" -> 1, "some_float" -> 2.5, "some_bool" -> false),
      "some_list" -> Vector(1, 2, 3, 4),
      "some_str" -> HELLO)
    val vars = thr.variables
    assert(vars("my_list") == Vector(1, 2, 3, 4))
    assert(vars("my_int") == 1)
    assert(vars("my_bool") == false)
    assert(vars("my_obj") == bigBlob)
    assert(vars("my_second_obj") == bigBlob("some_blob"))
    assert(vars("my_str") == strResult)
    assert(vars("my_float") == 2.5)
  }

  // ===== var_adds.py =====

  private val varAddsSpec = wfSpec("var_adds", "main",
    thread("main",
      Map(
        "counter" -> WFRunVariableDef(VarType.INT, defaultValue = -1),
        "arr" -> WFRunVariableDef(VarType.ARRAY, defaultValue = Vector.empty[Any])),
      nodes = Seq(
        mutate(task("n0", "big_blob_task"),
          "arr" -> mut(M.EXTEND, jsonPath = "$.some_list"),
          "counter" -> mut(M.ADD, jsonPath = "$.some_list[1]")),
        mutate(task("n1", "echo_task", "thing" -> lit(HELLO)),
          "counter" -> mut(M.ADD, literal = 1),
          "arr" -> mut(M.REMOVE_IF_PRESENT, literal = 4))),
      edges = Seq(edge("n0", "n1"))))

  test("var_adds case 1: defaults") {
    val (s, _) = Harness.run(varAddsSpec)
    assert(s.status == Status.COMPLETED)
    val vars = mainThread(s).variables
    assert(vars("arr") == Vector(1, 2, 3))
    assert(vars("counter") == 2)
  }

  test("var_adds case 2: explicit inputs") {
    val (s, _) = Harness.run(varAddsSpec,
      Map("arr" -> Vector(5, 4, 3, 2), "counter" -> 0))
    assert(s.status == Status.COMPLETED)
    val vars = mainThread(s).variables
    assert(vars("arr") == Vector(5, 3, 2, 1, 2, 3))
    assert(vars("counter") == 3)
  }

  // ===== var_mutations.py =====

  private val DUMMY = "dummy"

  // Node n2 carries my_list REMOVE_IF_PRESENT, not the earlier
  // remove_idx(2): the SDK's `_mutate` keys mutations by variable name on
  // the node (thread_spec_builder.py:237-240), so the later
  // remove_if_present("asdf") OVERWRITES remove_idx(2) — the observable
  // end state ([[1,2,3]] untouched) is the same either way since the
  // reference's REMOVE_INDEX is actually remove-by-value (see
  // Mutations.scala).
  private val varMutationsSpec = wfSpec("var_mutations", "main",
    thread("main",
      Map(
        "my_int" -> WFRunVariableDef(VarType.INT),
        "my_bool" -> WFRunVariableDef(VarType.BOOLEAN),
        "my_list" -> WFRunVariableDef(VarType.ARRAY),
        "my_str" -> WFRunVariableDef(VarType.STRING),
        "my_float" -> WFRunVariableDef(VarType.FLOAT),
        "my_obj" -> WFRunVariableDef(VarType.OBJECT)),
      nodes = Seq(
        mutate(task("n0", "echo_task", "thing" -> lit(DUMMY)),
          "my_int" -> mut(M.ASSIGN, source = varRef("my_obj", "$.my_int")),
          "my_str" -> mut(M.ADD)),
        mutate(task("n1", "echo_int", "foo" -> lit(3)),
          "my_int" -> mut(M.SUBTRACT),
          "my_list" -> mut(M.ADD, source = varRef("my_obj", "$.some_thing"))),
        mutate(task("n2", "echo_float", "foo" -> lit(-2.5)),
          "my_float" -> mut(M.ADD),
          "my_list" -> mut(M.REMOVE_IF_PRESENT, literal = "asdf"),
          "my_bool" -> mut(M.ASSIGN, source = varRef("my_obj", "$.my_bool")),
          "my_obj" -> mut(M.REMOVE_KEY, literal = 1234))),
      edges = Seq(edge("n0", "n1"), edge("n1", "n2"))))

  private val varMutObj1: ListMap[String, Any] = ListMap(
    "some_thing" -> Vector(1, 2, 3),
    "my_bool" -> true,
    "my_int" -> 50,
    "1234" -> "not in the thing")

  test("var_mutations case 1: happy path") {
    val (s, _) = Harness.run(varMutationsSpec,
      Map("my_obj" -> varMutObj1, "my_list" -> Vector.empty[Any],
        "my_float" -> 3.2))
    assert(s.status == Status.COMPLETED, s.errorMessage)
    val vars = mainThread(s).variables
    assert(vars("my_int") == 47)
    assert(vars("my_bool") == true)
    assert(vars("my_list") == Vector(Vector(1, 2, 3)))
    assert(vars("my_str") == DUMMY)
    assert(vars("my_float") == 3.2 - 2.5) // 0.7000000000000002
    // Java map.remove(Integer) on string keys: silent no-op — key stays.
    assert(vars("my_obj").asInstanceOf[ListMap[String, Any]]
      .contains("1234"))
  }

  test("var_mutations case 2: missing jsonpath halts with VARIABLE_LOOKUP_ERROR") {
    val (s, _) = Harness.run(varMutationsSpec,
      Map("my_obj" -> varMutObj1.removed("my_int"),
        "my_list" -> Vector.empty[Any], "my_float" -> 3.2))
    assert(s.status == Status.HALTED)
    val thr = mainThread(s)
    assert(thr.errorMessage.contains("jsonpath"))
    val tr = thr.taskRuns(0)
    assert(tr.status == Status.HALTED)
    assert(tr.failureReason.contains(FailureReason.VARIABLE_LOOKUP_ERROR))
  }

  test("var_mutations case 3: bad-typed value mentions variable name") {
    val (s, _) = Harness.run(varMutationsSpec,
      Map("my_obj" -> ListMap[String, Any]("my_int" -> "not a real int"),
        "my_list" -> Vector.empty[Any], "my_float" -> 3.2))
    assert(s.status == Status.HALTED)
    val thr = mainThread(s)
    assert(thr.errorMessage.contains("my_int"))
    val tr = thr.taskRuns(0)
    assert(tr.status == Status.HALTED)
    assert(tr.failureReason.contains(FailureReason.VARIABLE_LOOKUP_ERROR))
  }

  test("SpecCodec decodes the full SDK document shape (FIXTURES.md §1.1)") {
    val json =
      """{
        | "name": "basic", "entrypointThreadName": "basic",
        | "threadSpecs": {
        |  "basic": {
        |   "name": "basic",
        |   "entrypointNodeName": "0-task-echo-ab12c",
        |   "variableDefs": {
        |     "my_name_var": {"type": "STRING", "defaultValue": null},
        |     "my_int": {"type": "INT", "defaultValue": 5}},
        |   "interruptDefs": {
        |     "some-event": {"handlerThreadName": "interrupt_handler_thread"}},
        |   "nodes": {
        |    "0-task-echo-ab12c": {
        |      "nodeType": "TASK", "taskDefName": "echo_task",
        |      "numRetries": 2,
        |      "timeoutSeconds": {"literalValue": 3},
        |      "variables": {"thing": {"literalValue": "Hello, there!"}},
        |      "variableMutations": {
        |        "my_name_var": {"operation": "ASSIGN", "jsonPath": null}}},
        |    "1-next": {"nodeType": "NOP"}},
        |   "edges": [
        |     {"sourceNodeName": "0-task-echo-ab12c", "sinkNodeName": "1-next",
        |      "condition": {
        |        "leftSide": {"wfRunVariableName": "my_int"},
        |        "rightSide": {"literalValue": 10},
        |        "comparator": "GREATER_THAN"}}]},
        |  "interrupt_handler_thread": {
        |   "nodes": {"h0": {"nodeType": "TASK", "taskDefName": "echo_task",
        |     "variables": {"thing": {"literalValue": "hi"}}}},
        |   "edges": []}}}""".stripMargin
    val spec = SpecCodec.decode(json)
    val t = spec.threadSpecs("basic")
    assert(t.entrypointNodeName == "0-task-echo-ab12c")
    assert(t.variableDefs("my_int").defaultValue == 5)
    assert(t.interruptDefs("some-event").handlerThreadName ==
      "interrupt_handler_thread")
    assert(spec.interruptEvents == Set("some-event"))
    val n0 = t.nodes("0-task-echo-ab12c")
    assert(n0.numRetries == 2)
    assert(n0.timeoutSeconds.get.literalValue == 3)
    assert(n0.variableMutations("my_name_var").operation == "ASSIGN")
    val e = t.edges.head
    assert(e.condition.get.comparator == "GREATER_THAN")
    assert(e.condition.get.leftSide.wfRunVariableName.contains("my_int"))
  }

  // ===== state snapshot codec round trip =====

  test("StateCodec round-trips a completed run") {
    val (s, _) = Harness.run(jsonpathHappySpec)
    val json = StateCodec.encode(s)
    val back = StateCodec.decode(json)
    assert(StateCodec.encode(back) == json)
    assert(back.status == s.status)
    assert(back.threadRuns.length == s.threadRuns.length)
    assert(back.threadRuns(0).variables == s.threadRuns(0).variables)
  }
}
