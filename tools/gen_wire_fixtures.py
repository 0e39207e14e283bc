#!/usr/bin/env python3
"""Generate WFSpec wire-format fixtures in the reference SDK's exact
serialized shape.

The reference's Python SDK compiles a workflow function into a
WFSpecSchema pydantic model and serializes it with
``spec.json(by_alias=True)`` (lhctl/lh_sdk/thread_spec_builder.py:380).
That serialization:

- camelCases every field (LHBaseModel, lhctl/lh_sdk/utils.py:23-27);
- KEEPS unset Optional fields as explicit ``null`` (pydantic v1
  default: no exclude_none);
- emits fields in model-declaration order
  (lhctl/lh_lib/schema/wf_spec_schema.py);
- renders enums as their string values;
- names nodes ``{index}-{human}-{sha256(thread_name)[:5]}``
  (thread_spec_builder.py:156-193) where the human name is the
  taskDefName for TASK, ``WAIT-EVENT-{event}`` for EXTERNAL_EVENT and
  ``SLEEP`` for SLEEP nodes;
- names taskDefs ``{module-with-dashes}-{function}``
  (lh_sdk/utils.py get_task_def_name).

This script re-derives the documents the SDK would emit for three of
the reference's example workflows (examples/workflows/basic_wf.py,
conditionals.py, interrupts.py) by replaying the builder's node/edge
bookkeeping for those exact call sequences:

- basic_wf.py: execute(ask_for_name); wait_for_event("my-name");
  my_name_var.assign(event); execute(greet, my_name_var).
- conditionals.py: execute(dummy); with my_int.less_than(10).is_true():
  my_int.assign(execute(multiply, my_int));
  with my_int.greater_than(15).is_true(): execute(dummy);
  execute(dummy). The if-contexts leave reverse-condition edges from
  the feeder nodes (condition_utils.py:122-150), so the final dummy has
  THREE incoming edges: unconditional from the inner body, LESS_THAN_EQ
  15 from the multiply node, GREATER_THAN_EQ 10 from node 0.
- interrupts.py: handle_interrupt("some-event", handler);
  execute(hello_there, "General Kenobi"); sleep_for(10);
  execute(hello_there, "R2-D2"); handler thread =
  execute(hello_there, "from the interrupt thread").

Plus one malformed document (edge to a nonexistent node) for the
validation-rejection path (WFSpec.java:307-362 / ThreadSpec edge
validation).
"""
import hashlib
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "wirespecs")


def tag(thread_name):
    return hashlib.sha256(thread_name.encode()).hexdigest()[:5]


def var_assign(wf_run_variable_name=None, literal_value=None,
               wf_run_metadata=None, json_path=None, default_value=None):
    # field order: wf_spec_schema.py VariableAssignmentSchema
    return {
        "wfRunVariableName": wf_run_variable_name,
        "literalValue": literal_value,
        "wfRunMetadata": wf_run_metadata,
        "jsonPath": json_path,
        "defaultValue": default_value,
    }


def node(node_type="TASK", task_def_name=None, variables=None,
         external_event_def_name=None, timeout_seconds=None,
         variable_mutations=None):
    # field order: wf_spec_schema.py NodeSchema
    return {
        "timeoutSeconds": timeout_seconds,
        "numRetries": 0,
        "nodeType": node_type,
        "outgoingEdges": [],
        "variables": variables,
        "externalEventDefName": external_event_def_name,
        "threadWaitThreadId": None,
        "threadSpawnThreadSpecName": None,
        "variableMutations": variable_mutations if variable_mutations is not None else {},
        "taskDefName": task_def_name,
        "exceptionToThrow": None,
        "baseExceptionhandler": None,
        "customExceptionHandlers": None,
    }


def edge(src, sink, condition=None):
    return {"sourceNodeName": src, "sinkNodeName": sink,
            "condition": condition}


def cond(left, comparator, right):
    return {"leftSide": left, "rightSide": right, "comparator": comparator}


def thread_spec(name, variable_defs=None, interrupt_defs=None,
                nodes=None, edges=None):
    # field order: wf_spec_schema.py ThreadSpecSchema; the SDK never
    # sets entrypointNodeName (the server derives it)
    return {
        "name": name,
        "entrypointNodeName": None,
        "variableDefs": variable_defs or {},
        "interruptDefs": interrupt_defs,
        "nodes": nodes or {},
        "edges": edges or [],
    }


def wf_spec(name, entrypoint, threads):
    # field order: wf_spec_schema.py WFSpecSchema
    return {
        "created": None,
        "name": name,
        "status": "STOPPED",
        "statusMessage": None,
        "desiredStatus": "RUNNING",
        "threadSpecs": threads,
        "interruptEvents": None,
        "entrypointThreadName": entrypoint,
        "wfDeployerClassName": None,
        "deployMetadata": None,
    }


def basic_wf():
    t = tag("my_workflow")  # b76f3
    n0, n1, n2 = (f"0-basic_wf-ask_for_name-{t}",
                  f"1-WAIT-EVENT-my-name-{t}",
                  f"2-basic_wf-greet-{t}")
    thread = thread_spec(
        "my_workflow",
        variable_defs={"my_name_var": {"type": "STRING",
                                       "defaultValue": None}},
        nodes={
            # execute_task_func sets variables = {} even with no args
            n0: node(task_def_name="basic_wf-ask_for_name", variables={}),
            # wait_for_event leaves variables = None; the .assign() on
            # the event output mutates THIS node
            n1: node(node_type="EXTERNAL_EVENT",
                     external_event_def_name="my-name",
                     variable_mutations={
                         "my_name_var": {"operation": "ASSIGN",
                                         "jsonPath": None,
                                         "literalValue": None,
                                         "sourceVariable": None}}),
            n2: node(task_def_name="basic_wf-greet",
                     variables={"name": var_assign(
                         wf_run_variable_name="my_name_var")}),
        },
        edges=[edge(n0, n1), edge(n1, n2)])
    return wf_spec("my_workflow", "my_workflow", {"my_workflow": thread})


def conditionals():
    t = tag("conditionals")  # 2ebbc
    n0, n1, n2, n3 = (f"0-conditionals-dummy-{t}",
                      f"1-conditionals-multiply-{t}",
                      f"2-conditionals-dummy-{t}",
                      f"3-conditionals-dummy-{t}")
    my_int = lambda: var_assign(wf_run_variable_name="my_int")
    lt10 = cond(my_int(), "LESS_THAN", var_assign(literal_value=10))
    ge10 = cond(my_int(), "GREATER_THAN_EQ", var_assign(literal_value=10))
    gt15 = cond(my_int(), "GREATER_THAN", var_assign(literal_value=15))
    le15 = cond(my_int(), "LESS_THAN_EQ", var_assign(literal_value=15))
    thread = thread_spec(
        "conditionals",
        variable_defs={"my_int": {"type": "INT", "defaultValue": None}},
        nodes={
            n0: node(task_def_name="conditionals-dummy", variables={}),
            n1: node(task_def_name="conditionals-multiply",
                     variables={"some_number": my_int()},
                     variable_mutations={
                         "my_int": {"operation": "ASSIGN",
                                    "jsonPath": None,
                                    "literalValue": None,
                                    "sourceVariable": None}}),
            n2: node(task_def_name="conditionals-dummy", variables={}),
            n3: node(task_def_name="conditionals-dummy", variables={}),
        },
        # edge order = builder emission order: the body edges as nodes
        # are added, then the two reverse-condition edges the final
        # _add_node drains from the accumulated feeder map
        edges=[
            edge(n0, n1, lt10),
            edge(n1, n2, gt15),
            edge(n2, n3),
            edge(n1, n3, le15),
            edge(n0, n3, ge10),
        ])
    return wf_spec("conditionals", "conditionals", {"conditionals": thread})


def interrupts():
    tw = tag("my_workflow")          # b76f3
    th = tag("interrupt_handler_thread")  # c7a3a
    n0, n1, n2 = (f"0-interrupts-hello_there-{tw}",
                  f"1-SLEEP-{tw}",
                  f"2-interrupts-hello_there-{tw}")
    h0 = f"0-interrupts-hello_there-{th}"
    main = thread_spec(
        "my_workflow",
        interrupt_defs={"some-event":
                        {"handlerThreadName": "interrupt_handler_thread"}},
        nodes={
            n0: node(task_def_name="interrupts-hello_there",
                     variables={"name": var_assign(
                         literal_value="General Kenobi")}),
            n1: node(node_type="SLEEP",
                     timeout_seconds=var_assign(literal_value=10)),
            n2: node(task_def_name="interrupts-hello_there",
                     variables={"name": var_assign(literal_value="R2-D2")}),
        },
        edges=[edge(n0, n1), edge(n1, n2)])
    handler = thread_spec(
        "interrupt_handler_thread",
        nodes={h0: node(task_def_name="interrupts-hello_there",
                        variables={"name": var_assign(
                            literal_value="from the interrupt thread")})},
        edges=[])
    # threadSpecs insertion order: entrypoint compiled first
    return wf_spec("my_workflow", "my_workflow",
                   {"my_workflow": main,
                    "interrupt_handler_thread": handler})


def basic_threads():
    # basic_threads.py: execute(parent_task, parent_var);
    # child = spawn_thread(subthread); wait_for_thread(child).
    # spawn_thread adds a temp variable named after the SPAWN node and
    # assigns it "$.threadId" of the spawn output
    # (thread_spec_builder.py:265-289); wait_for_thread reads it back.
    tw = tag("my_workflow")   # b76f3
    ts = tag("subthread")     # f21e8
    n0 = f"0-basic_threads-parent_task-{tw}"
    n1 = f"1-SPAWN-subthread-{tw}"
    n2 = f"2-WAIT-THREAD-{tw}"
    temp_var = f"temp-{n1}"
    s0 = f"0-basic_threads-child_task-{ts}"
    main = thread_spec(
        "my_workflow",
        variable_defs={
            "parent_var": {"type": "STRING", "defaultValue": None},
            temp_var: {"type": "INT", "defaultValue": None},
        },
        nodes={
            n0: node(task_def_name="basic_threads-parent_task",
                     variables={"input_str": var_assign(
                         wf_run_variable_name="parent_var")}),
            n1: {**node(node_type="SPAWN_THREAD",
                        variable_mutations={
                            temp_var: {"operation": "ASSIGN",
                                       "jsonPath": "$.threadId",
                                       "literalValue": None,
                                       "sourceVariable": None}}),
                 "threadSpawnThreadSpecName": "subthread"},
            n2: {**node(node_type="WAIT_FOR_THREAD"),
                 "threadWaitThreadId": var_assign(
                     wf_run_variable_name=temp_var)},
        },
        edges=[edge(n0, n1), edge(n1, n2)])
    sub = thread_spec(
        "subthread",
        nodes={s0: node(task_def_name="basic_threads-child_task",
                        variables={"input_str": var_assign(
                            wf_run_variable_name="parent_var")},
                        variable_mutations={
                            "parent_var": {"operation": "ASSIGN",
                                           "jsonPath": None,
                                           "literalValue": "child value",
                                           "sourceVariable": None}})},
        edges=[])
    return wf_spec("my_workflow", "my_workflow",
                   {"my_workflow": main, "subthread": sub})


def basic_exceptions():
    # basic_exceptions.py: execute(unreliable_task)
    # .catch_exception(exception_handler); my_var.assign(output);
    # execute(dummy_task). catch_exception sets baseExceptionhandler
    # (node_output.py:79-99); the handler thread re-assigns my_var from
    # its own dummy_task output.
    tw = tag("my_workflow")          # b76f3
    th = tag("exception_handler")    # 81bfa
    n0 = f"0-basic_exceptions-unreliable_task-{tw}"
    n1 = f"1-basic_exceptions-dummy_task-{tw}"
    h0 = f"0-basic_exceptions-dummy_task-{th}"
    main = thread_spec(
        "my_workflow",
        variable_defs={"my_var": {"type": "INT", "defaultValue": 137}},
        nodes={
            n0: {**node(task_def_name="basic_exceptions-unreliable_task",
                        variables={},
                        variable_mutations={
                            "my_var": {"operation": "ASSIGN",
                                       "jsonPath": None,
                                       "literalValue": None,
                                       "sourceVariable": None}}),
                 "baseExceptionhandler":
                     {"handlerThreadSpecName": "exception_handler"}},
            n1: node(task_def_name="basic_exceptions-dummy_task",
                     variables={}),
        },
        edges=[edge(n0, n1)])
    handler = thread_spec(
        "exception_handler",
        nodes={h0: node(task_def_name="basic_exceptions-dummy_task",
                        variables={},
                        variable_mutations={
                            "my_var": {"operation": "ASSIGN",
                                       "jsonPath": None,
                                       "literalValue": None,
                                       "sourceVariable": None}})},
        edges=[])
    return wf_spec("my_workflow", "my_workflow",
                   {"my_workflow": main, "exception_handler": handler})


def conditionals_else():
    # conditionals_else.py adds the is_false() branch: the Else context
    # pops the if-block's last node from the feeder map, emits the else
    # body against the remaining reverse-condition feeders, then re-adds
    # the popped node and closes BOTH paths through a NOP
    # (condition_utils.py:152-182).
    t = tag("conditionals_else")  # caa8c
    n0 = f"0-conditionals_else-dummy-{t}"
    n1 = f"1-conditionals_else-multiply-{t}"
    n2 = f"2-conditionals_else-happy-{t}"
    n3 = f"3-conditionals_else-false_dummy-{t}"
    n4 = f"4-NOP-{t}"
    n5 = f"5-conditionals_else-dummy-{t}"
    my_int = lambda: var_assign(wf_run_variable_name="my_int")
    lt10 = cond(my_int(), "LESS_THAN", var_assign(literal_value=10))
    ge10 = cond(my_int(), "GREATER_THAN_EQ", var_assign(literal_value=10))
    gt5 = cond(my_int(), "GREATER_THAN", var_assign(literal_value=5))
    le5 = cond(my_int(), "LESS_THAN_EQ", var_assign(literal_value=5))
    thread = thread_spec(
        "conditionals_else",
        variable_defs={"my_int": {"type": "INT", "defaultValue": None}},
        nodes={
            n0: node(task_def_name="conditionals_else-dummy", variables={}),
            n1: node(task_def_name="conditionals_else-multiply",
                     variables={"some_number": my_int()},
                     variable_mutations={
                         "my_int": {"operation": "ASSIGN",
                                    "jsonPath": None,
                                    "literalValue": None,
                                    "sourceVariable": None}}),
            n2: node(task_def_name="conditionals_else-happy", variables={}),
            n3: node(task_def_name="conditionals_else-false_dummy",
                     variables={}),
            n4: node(node_type="NOP"),
            n5: node(task_def_name="conditionals_else-dummy", variables={}),
        },
        edges=[
            edge(n0, n1, lt10),
            edge(n1, n2, gt5),
            edge(n1, n3, le5),
            edge(n0, n3, ge10),
            edge(n3, n4),
            edge(n2, n4),
            edge(n4, n5),
        ])
    return wf_spec("conditionals_else", "conditionals_else",
                   {"conditionals_else": thread})


def throw_exception():
    # SYNTHETIC (no reference example uses throw_exception) but
    # builder-faithful: thread.execute(step_one)
    # .catch_exception(order_fixer, exc_name="some-exc");
    # thread.throw_exception("order-failed"). throw_exception emits a
    # THROW-{exc} node (thread_spec_builder.py:313-318); a named
    # catch_exception fills custom_exception_handlers
    # (node_output.py:79-99). Covers the last node family's wire shape.
    tw = tag("my_workflow")   # b76f3
    th = tag("order_fixer")   # 18fa2
    n0 = f"0-thrower-step_one-{tw}"
    n1 = f"1-THROW-order-failed-{tw}"
    h0 = f"0-thrower-fix_it-{th}"
    main = thread_spec(
        "my_workflow",
        nodes={
            n0: {**node(task_def_name="thrower-step_one", variables={}),
                 "customExceptionHandlers":
                     {"some-exc": {"handlerThreadSpecName": "order_fixer"}}},
            n1: {**node(node_type="THROW_EXCEPTION"),
                 "exceptionToThrow": "order-failed"},
        },
        edges=[edge(n0, n1)])
    handler = thread_spec(
        "order_fixer",
        nodes={h0: node(task_def_name="thrower-fix_it", variables={})},
        edges=[])
    return wf_spec("my_workflow", "my_workflow",
                   {"my_workflow": main, "order_fixer": handler})


def malformed():
    # conditionals with one edge pointing at a node that does not exist
    # -> must be REJECTED (ThreadSpec edge validation)
    doc = conditionals()
    doc["threadSpecs"]["conditionals"]["edges"][2]["sinkNodeName"] = \
        "99-conditionals-dummy-zzzzz"
    return doc


# ---- resource + event envelope wire shapes ----------------------------
#
# The WFSpec fixtures above pin the biggest wire seam; these pin the
# remaining ones: the TaskDef / ExternalEventDef resource documents the
# SDK POSTs to the API (compiled by lh_sdk/compile.py:68-107 into
# TaskDefSchema / ExternalEventDefSchema, wf_spec_schema.py:186-213)
# and the WFEvent envelope a real producer puts on the event topic
# (WFEventSchema, task_run_event_schema.py:69-76; produced at
# executor/worker.py:145-152,190-203 with `.json(by_alias=True)`).
# Same serialization rules as the WFSpec fixtures: camelCase aliases,
# explicit nulls for unset optionals, model-declaration field order,
# enums as string values. pydantic v1 renders datetime as ISO-8601
# (naive datetime.now() -> no UTC offset, which is what the reference
# worker actually produces) — NOT the epoch millis the Java engine's
# Jackson emits, so the Scala decoder must accept both.


def taskdef_greet():
    # the SDK's compiled TaskDef for examples/workflows/basic_wf.py's
    # greet(name: str) task (compile.py:68-107: requiredVars from the
    # function signature, deployMetadata a JSON *string* of
    # DockerTaskDeployMetadata, wf_spec_schema.py:222-231)
    deploy_meta = {
        "dockerImage": "lh-task-basic_wf-greet:latest",
        "metadata": "",
        "customValidatorClassName": None,
        "taskExecutorClassName": None,
        "taskType": "PYTHON",
        "env": {},
        "pythonModule": "basic_wf",
        "pythonFunction": "greet",
    }
    # field order: wf_spec_schema.py TaskDefSchema (186-204)
    return {
        "created": None,
        "versionNumber": 0,
        "requiredVars": {
            "name": {"type": "STRING", "defaultValue": None},
        },
        "partitions": 3,
        "name": "basic_wf-greet",
        "status": "RUNNING",
        "statusMessage": None,
        "taskDeployerClassName": None,
        "deployMetadata": json.dumps(deploy_meta),
    }


def externaleventdef_my_name():
    # field order: wf_spec_schema.py ExternalEventDefSchema (207-213)
    return {
        "created": None,
        "name": "my-name",
        "status": "RUNNING",
    }


def wfevent_task_event():
    # the exact envelope the Python worker produces for a completed
    # greet task (worker.py:183-203): wfSpecName is never set by the
    # worker -> explicit null; content is the TaskRunEventSchema JSON
    # *string*; timestamps are naive-ISO from datetime.now()
    ended = {
        # TaskRunEventSchema field order (task_run_event_schema.py:37-43)
        "taskDefVersionNumber": 0,
        "threadId": 0,
        "taskRunPosition": 2,
        "timestamp": "2022-02-22T12:00:00.123456",
        "startedEvent": None,
        "endedEvent": {
            # TaskRunEndedEvent order (:29-34); result first
            "result": {
                "stdout": "Hello, Obi-Wan!",
                "stderr": None,
                "success": True,
                "returncode": 0,
            },
            "threadId": 0,
            "taskRunPosition": 2,
            "reason": None,
            "message": None,
        },
    }
    # WFEventSchema field order (task_run_event_schema.py:69-76)
    return {
        "wfSpecId": "my_workflow",
        "wfSpecName": None,
        "wfRunId": "wire-run-1",
        "timestamp": "2022-02-22T12:00:00.200000",
        "threadId": 0,
        "type": "TASK_EVENT",
        "content": json.dumps(ended),
    }


def wfevent_external_event():
    # EXTERNAL_EVENT envelope: content is the ExternalEventPayloadSchema
    # JSON string (wf_run_schema.py:107-112); tz-aware ISO timestamp (a
    # producer using datetime.now(timezone.utc) emits the +00:00 form)
    payload = {
        "externalEventDefId": "my-name",
        "externalEventDefName": "my-name",
        "content": "Obi-Wan",
        "timestamp": "2022-02-22T12:00:00.100000+00:00",
    }
    return {
        "wfSpecId": "my_workflow",
        "wfSpecName": "my_workflow",
        "wfRunId": "wire-run-1",
        "timestamp": "2022-02-22T12:00:00.150000+00:00",
        "threadId": -1,
        "type": "EXTERNAL_EVENT",
        "content": json.dumps(payload),
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in [("basic_wf", basic_wf), ("conditionals", conditionals),
                     ("interrupts", interrupts),
                     ("basic_threads", basic_threads),
                     ("basic_exceptions", basic_exceptions),
                     ("conditionals_else", conditionals_else),
                     ("throw_exception", throw_exception),
                     ("malformed_missing_node", malformed),
                     ("taskdef_greet", taskdef_greet),
                     ("externaleventdef_my_name", externaleventdef_my_name),
                     ("wfevent_task_event", wfevent_task_event),
                     ("wfevent_external_event", wfevent_external_event)]:
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(fn(), f, indent=1)
            f.write("\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
