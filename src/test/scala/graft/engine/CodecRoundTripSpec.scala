package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import scala.util.Random
import Harness._
import Mutations.{Op => M}

/** `decode ∘ encode` round-trips: the encoder emits the reference
  * SDK's serialized shape (Spec.scala `SpecCodec.encode`), and decoding
  * its output must reproduce the exact spec — over every committed
  * wire fixture AND over randomized specs covering all node types,
  * handlers, interrupts, conditions, and mutation forms. A divergence
  * here means one direction of the codec mis-handles some field, which
  * single-direction tests (decode-only over fixtures) cannot see.
  */
class CodecRoundTripSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/wirespecs/$name.json")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("every committed wire fixture round-trips decode -> encode -> decode") {
    for (name <- Seq("basic_wf", "conditionals", "interrupts",
        "basic_threads", "basic_exceptions", "conditionals_else",
        "throw_exception")) {
      val first = SpecCodec.decode(fixture(name))
      val again = SpecCodec.decode(SpecCodec.encode(first))
      assert(again == first, s"fixture $name diverged after round-trip")
    }
  }

  test("TaskDef fixture round-trips and decodes field-exactly") {
    val json = fixture("taskdef_greet")
    val td = ResourceCodec.decodeTaskDef(json)
    assert(td.name == "basic_wf-greet")
    assert(td.objectId == "basic_wf-greet") // TaskDef.getObjectId = name
    assert(td.kafkaTopic == "basic_wf-greet") // per-TaskDef queue topic
    assert(td.versionNumber == 0 && td.partitions == 3)
    assert(td.status == "RUNNING" && td.statusMessage.isEmpty)
    assert(td.requiredVars == ListMap(
      "name" -> WFRunVariableDef(VarType.STRING)))
    // deployMetadata is an opaque JSON *string* (compile.py:103-106)
    assert(td.deployMetadata.exists(_.contains("\"taskType\": \"PYTHON\"")))
    val again = ResourceCodec.decodeTaskDef(ResourceCodec.encodeTaskDef(td))
    assert(again == td, "TaskDef diverged after round-trip")
  }

  test("ExternalEventDef fixture round-trips") {
    val ed = ResourceCodec.decodeExternalEventDef(
      fixture("externaleventdef_my_name"))
    assert(ed == ExternalEventDef("my-name", "RUNNING"))
    val again = ResourceCodec.decodeExternalEventDef(
      ResourceCodec.encodeExternalEventDef(ed))
    assert(again == ed)
  }

  test("malformed resource documents are rejected") {
    intercept[SpecValidationError](ResourceCodec.decodeTaskDef("{}"))
    intercept[SpecValidationError](ResourceCodec.decodeTaskDef(
      """{"name": "t", "requiredVars": {"x": {"type": "NOT_A_TYPE"}}}"""))
    intercept[SpecValidationError](ResourceCodec.decodeTaskDef(
      """{"name": "t", "status": "NOT_A_STATUS"}"""))
    intercept[SpecValidationError](
      ResourceCodec.decodeExternalEventDef("""{"status": "RUNNING"}"""))
  }

  test("WFEvent fixtures decode: SDK ISO timestamps, string content") {
    // the worker-produced TASK_EVENT envelope (executor/worker.py:190-203):
    // naive-ISO timestamps read as UTC, content is the TaskRunEvent JSON
    val taskEv = EventCodec.decodeWFEvent(fixture("wfevent_task_event"))
    assert(taskEv.wfSpecId == "my_workflow" && taskEv.wfSpecName == "")
    assert(taskEv.eventType == WFEventType.TASK_EVENT)
    assert(taskEv.timestamp ==
      java.time.Instant.parse("2022-02-22T12:00:00.200Z").toEpochMilli)
    val tre = EventCodec.decodeTaskRunEvent(taskEv.content)
    assert(tre.taskRunPosition == 2)
    assert(tre.timestamp ==
      java.time.Instant.parse("2022-02-22T12:00:00.123Z").toEpochMilli)
    assert(tre.endedEvent.exists(_.result.stdout.contains("Hello, Obi-Wan!")))

    // the EXTERNAL_EVENT envelope: tz-aware ISO, payload content string
    val extEv = EventCodec.decodeWFEvent(fixture("wfevent_external_event"))
    assert(extEv.eventType == WFEventType.EXTERNAL_EVENT)
    assert(extEv.threadId == -1)
    val payload = EventCodec.decodeExternalEvent(extEv.content)
    assert(payload.externalEventDefName == "my-name")
    assert(payload.content == "Obi-Wan")
    assert(payload.timestamp ==
      java.time.Instant.parse("2022-02-22T12:00:00.100Z").toEpochMilli)
  }

  private def randomSpec(rnd: Random): WFSpec = {
    val nNodes = 2 + rnd.nextInt(4)
    val types = Vector(NodeType.TASK, NodeType.TASK, NodeType.NOP,
      NodeType.SLEEP, NodeType.THROW_EXCEPTION, NodeType.EXTERNAL_EVENT)
    val nodes = (0 until nNodes).map { i =>
      val base = Node(name = s"n$i", nodeType = types(rnd.nextInt(types.length)))
      base.nodeType match {
        case NodeType.TASK => base.copy(
          taskDefName = Some(s"task_$i"),
          numRetries = rnd.nextInt(3),
          timeoutSeconds =
            if (rnd.nextBoolean()) Some(lit(1 + rnd.nextInt(3))) else None,
          variables = ListMap(
            "a" -> lit(Vector(1, 2, rnd.nextInt(9))),
            "b" -> varRef("counter"),
            "c" -> VariableAssignment(
              wfRunMetadata = Some("WF_RUN_GUID"),
              jsonPath = Some("$.x"), defaultValue = "dflt")),
          variableMutations = rnd.nextInt(3) match {
            case 0 => ListMap.empty
            case 1 => ListMap("counter" -> mut(M.ADD, literal = 1))
            case _ => ListMap("counter" ->
              VariableMutation(M.ASSIGN, jsonPath = Some("$.y"),
                sourceVariable = Some(varRef("counter"))))
          },
          baseExceptionhandler =
            if (rnd.nextBoolean()) Some(ExceptionHandlerSpec("handler"))
            else None,
          customExceptionHandlers =
            if (rnd.nextBoolean())
              Map("e1" -> ExceptionHandlerSpec("handler"),
                "e0" -> ExceptionHandlerSpec("handler"))
            else Map.empty)
        case NodeType.SLEEP => base.copy(timeoutSeconds = Some(lit(2)))
        case NodeType.THROW_EXCEPTION =>
          base.copy(exceptionToThrow = Some("boom"))
        case NodeType.EXTERNAL_EVENT => base.copy(
          externalEventDefName = Some("evt"),
          timeoutSeconds = Some(lit(3)))
        case _ => base
      }
    }
    val chain = (1 until nNodes).map(i => edge(s"n${i - 1}", s"n$i"))
    val conds = (1 until nNodes).filter(_ => rnd.nextBoolean()).map { i =>
      edge(s"n${i - 1}", s"n$i",
        cond(varRef("counter"), "GREATER_THAN_EQ", lit(rnd.nextInt(5))))
    }
    wfSpec("fuzz_codec", "main",
      thread("main",
        Map("counter" -> WFRunVariableDef(VarType.INT, defaultValue = 0),
          "obj" -> WFRunVariableDef(VarType.OBJECT,
            defaultValue = ListMap("k" -> Vector(1, "two", false)))),
        nodes = nodes, edges = chain ++ conds,
        interrupts =
          if (rnd.nextBoolean()) Map("int-evt" -> "handler") else Map.empty),
      thread("handler", Map.empty,
        nodes = Seq(task("h0", "echo_task", "thing" -> lit("h"))),
        edges = Nil))
  }

  test("randomized specs round-trip exactly (150 seeds)") {
    for (seed <- 0 until 150) {
      val spec = randomSpec(new Random(7000 + seed))
      val again = SpecCodec.decode(SpecCodec.encode(spec))
      // the SDK document shape carries no objectId; decode defaults it
      // to the name — the one field that legitimately normalizes
      assert(again == spec.copy(objectId = spec.name),
        s"seed $seed diverged after round-trip")
    }
  }
}
