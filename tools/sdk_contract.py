#!/usr/bin/env python3
"""Python-SDK end-to-end contract check.

Closes the reference's §5 harness pattern on the LAST user-visible
residual: a Python user COMPILES decorated workflow functions with
``sdk/graft_sdk.py`` (the thread_spec_builder-shaped compile slice),
deploys the compiled WFSpec/TaskDef/ExternalEventDef documents through
the process boundary, runs them end-to-end against the live engine
(``Ctl serve`` + loopback task worker), and asserts the FOLDED WFRun —
statuses, per-branch task sequences, and variable arithmetic — exactly
like the reference's lh_test_harness checks. All 14 reference test
modules (lhctl/lh_test_harness/tests/) have a twin here: basic,
conditionals_basic, conditionals_edge_1, external_event_basic (both
cases), threads_basic, var_assign_jsonpath_happy, var_mutations,
var_adds, retries_task, retries_task_timeout, interrupts,
interrupts_multiple, interrupts_with_payload (shared_tasks is the
task corpus, mirrored in Simulator.sharedTasks).

Usage: sdk_contract.py <java-classpath> <work-root> <fixture-dir>
Exit code 0 = contract held.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sdk"))

from ctl_contract import Ctl, check            # noqa: E402
from graft_sdk import Workflow                 # noqa: E402


# ---- task functions (signatures match Simulator.sharedTasks, which
# resolves the LAST dash segment of {module}-{function}) ----

def echo_task(thing: str) -> str:
    raise NotImplementedError("executed by the engine worker, not here")


def increment(foo: int) -> int:
    raise NotImplementedError("executed by the engine worker, not here")


def hello_there(name: str) -> str:
    raise NotImplementedError("executed by the engine worker, not here")


def unreliable_task() -> str:
    """Reference shared_tasks.py:23-25 (assert random.random() > 0.5);
    engine worker runs the deterministic stand-in: first attempt per
    run fails with an AssertionError, the retry succeeds."""
    raise NotImplementedError("executed by the engine worker, not here")


def slow_task() -> str:
    """Reference shared_tasks.py:18-20 (sleeps past the timeout);
    engine worker never answers, so the armed task timeout fires."""
    raise NotImplementedError("executed by the engine worker, not here")


# ---- workflows: the reference test corpus's shapes ----

HELLO = "Hello, there!"
ENTRYPOINT = "This is entrypoint task"
UNDER_TEN = "Its under 10!"
TEN_OR_MORE = "Its 10 or more!"
FEELING_LUCKY = "You feeling lucky, punk?"
MERGER = "This task should execute on all WFRun's."
COLT = "This is colt's grad year!"
PAYLOAD = "GENERAL KENOBI"


def basic(thread):
    """reference tests/basic.py: one task call."""
    thread.execute(echo_task, HELLO)


def conditionals_basic(thread):
    """reference tests/conditionals_basic.py: nested if, if/else,
    membership test, trailing guarded task."""
    my_int = thread.add_variable("my_int", int)
    thread.execute(echo_task, ENTRYPOINT)
    greater_than_zero = my_int.greater_than(0)
    with greater_than_zero.is_true():
        under_ten = my_int.less_than(10)
        with under_ten.is_true():
            thread.execute(echo_task, UNDER_TEN)
        with under_ten.is_false():
            thread.execute(echo_task, TEN_OR_MORE)
        is_lucky = my_int.is_in([42, 137])
        with is_lucky.is_true():
            thread.execute(echo_task, FEELING_LUCKY)
    thread.execute(echo_task, MERGER)
    is_colts_number = my_int.equals(20)
    with is_colts_number.is_true():
        thread.execute(echo_task, COLT)


def subthread(st):
    """reference tests/threads_basic.py subthread: += increment(12)."""
    parent_var = st.get_parent_var("parent_var")
    parent_var.add(st.execute(increment, 12))


def bigger_subthread(st):
    st.execute(increment, 123456)
    parent_var = st.get_parent_var("parent_var")
    parent_var.subtract(st.execute(increment, 4))


def threads_basic(thread):
    """reference tests/threads_basic.py: 3 spawns, 3 waits, then a
    divide — final parent_var == (22 + input) // 3."""
    input_var = thread.add_variable("input_var", int)
    parent_var = thread.add_variable("parent_var", int)
    parent_var.assign(thread.execute(increment, input_var))
    child1 = thread.spawn_thread(subthread)
    child2 = thread.spawn_thread(subthread)
    child3 = thread.spawn_thread(bigger_subthread)
    thread.wait_for_thread(child1)
    thread.wait_for_thread(child2)
    thread.wait_for_thread(child3)
    parent_var.divide(thread.execute(increment, 2))


def external_event_basic(thread):
    """reference tests/external_event_basic.py happy path (generous
    timeout keeps the contract deterministic)."""
    my_name = thread.add_variable("my_name", str)
    event = thread.wait_for_event("my-name").with_timeout(300)
    my_name.assign(event)
    thread.execute(hello_there, my_name)


def big_blob_task() -> dict:
    raise NotImplementedError("executed by the engine worker, not here")


BLOB = {"some_blob": {"some_int": 1, "some_float": 2.5,
                      "some_bool": False},
        "some_list": [1, 2, 3, 4],
        "some_str": "Hello, there!"}
STR_RESULT = "this is some str"


def var_assign_jsonpath_happy(thread):
    """reference tests/var_assign_jsonpath_happy.py: jsonpath reads of
    a task's object output into typed variables, variable-jsonpath
    reads, and a literal assign; with_retries compiles on the node."""
    my_int = thread.add_variable("my_int", int)
    my_bool = thread.add_variable("my_bool", bool)
    my_list = thread.add_variable("my_list", list)
    my_str = thread.add_variable("my_str", str)
    my_float = thread.add_variable("my_float", float)
    my_obj = thread.add_variable("my_obj", dict)
    my_second_obj = thread.add_variable("my_second_obj", dict)

    big_blob = thread.execute(big_blob_task).with_retries(2)
    my_list.assign(big_blob.jsonpath("$.some_list"))
    my_int.assign(big_blob.jsonpath("$.some_blob.some_int"))
    my_bool.assign(big_blob.jsonpath("$.some_blob.some_bool"))
    my_obj.assign(big_blob)
    my_second_obj.assign(big_blob.jsonpath("$.some_blob"))
    my_str.assign(STR_RESULT)

    thread.execute(echo_task, "hello there!")
    my_float.assign(my_second_obj.jsonpath("$.some_float"))


def echo_int(foo: int) -> int:
    raise NotImplementedError("executed by the engine worker, not here")


def echo_float(foo: float) -> float:
    raise NotImplementedError("executed by the engine worker, not here")


DUMMY = "dummy"


def var_mutations(thread):
    """reference tests/var_mutations.py VERBATIM — exercises the full
    mutation verb sweep including the two Java-semantics quirks the
    engine pins (Mutations.scala REMOVE_INDEX = remove-by-equality,
    silent no-op when absent; REMOVE_KEY with a numeric key = silent
    no-op against string JSON keys)."""
    my_int = thread.add_variable("my_int", int)
    my_bool = thread.add_variable("my_bool", bool)
    my_list = thread.add_variable("my_list", list)
    my_str = thread.add_variable("my_str", str)
    my_float = thread.add_variable("my_float", float)
    my_obj = thread.add_variable("my_obj", dict)

    dummy_str = thread.execute(echo_task, DUMMY)
    my_int.assign(my_obj.jsonpath("$.my_int"))
    my_str.add(dummy_str)

    return_3_output = thread.execute(echo_int, 3)
    my_int.subtract(return_3_output)
    my_list.add(my_obj.jsonpath("$.some_thing"))

    float_mut_output = thread.execute(echo_float, -2.5)
    my_float.add(float_mut_output)
    my_list.remove_idx(2)
    my_bool.assign(my_obj.jsonpath("$.my_bool"))
    my_obj.remove_key(1234)
    my_list.remove_if_present("asdf")


INTERRUPT_GREETING = "from the interrupt thread"


def interrupt_handler_thread(thread):
    thread.execute(hello_there, INTERRUPT_GREETING)


def interrupts(thread):
    """reference tests/interrupts.py: handler registration + a sleep
    window the interrupt can land in."""
    thread.handle_interrupt("some-event", interrupt_handler_thread)
    thread.execute(hello_there, "General Kenobi")
    thread.sleep_for(3)
    thread.execute(hello_there, "R2-D2")


OBI_GREETING = "Hello, there!"
VADER_GREETING = "We would be honored if you would join us!"
GRIEVOUS_GREETING = "GENERAL KENOBI!"


def retries_task(thread):
    """reference tests/retries_task.py: a failing task with retries
    between two reliable ones."""
    thread.execute(echo_task, OBI_GREETING)
    thread.execute(unreliable_task).with_retries(2)
    thread.execute(echo_task, GRIEVOUS_GREETING)


def retries_task_timeout(thread):
    """reference tests/retries_task_timeout.py: a too-slow task with a
    1 s timeout and one retry — both attempts must TIMEOUT."""
    thread.execute(slow_task).with_timeout(1).with_retries(1)


def external_event_timeout(thread):
    """reference tests/external_event_basic.py case 0: nobody sends the
    event, the 2 s wait times out and the run halts."""
    my_name = thread.add_variable("my_name", str)
    event = thread.wait_for_event("my-name").with_timeout(2)
    my_name.assign(event)
    thread.execute(hello_there, my_name)


def var_adds(thread):
    """reference tests/var_adds.py: defaulted variables, EXTEND from a
    node-output jsonpath, ADD from an INDEXED jsonpath, and the
    all-occurrences REMOVE_IF_PRESENT — the add-verb arithmetic corpus."""
    counter = thread.add_variable("counter", int, default_val=-1)
    arr = thread.add_variable("arr", list, default_val=[])

    big_blob = thread.execute(big_blob_task)
    arr.extend(big_blob.jsonpath("$.some_list"))
    counter.add(big_blob.jsonpath("$.some_list[1]"))

    thread.execute(echo_task, OBI_GREETING)
    counter.add(1)
    arr.remove_if_present(4)


OBI = "General Kenobi"
R2 = "R2-D2"
AHSOKA = "Padawan"
INTERRUPT_PAYLOAD = {"Jedi": "Obi-Wan", "Sith": "Vader"}


def some_event_handler(thread):
    """reference tests/interrupts_multiple.py handler #1."""
    thread.execute(hello_there, OBI)


def another_event_handler(thread):
    """reference tests/interrupts_multiple.py handler #2."""
    thread.execute(hello_there, AHSOKA)


def interrupts_multiple(thread):
    """reference tests/interrupts_multiple.py: TWO interrupt handlers
    registered on one thread; whichever event arrives picks its own
    handler (the reference's stacked-interrupt case 2 is commented out
    there — 'we can't stack interrupts yet' — so here too)."""
    thread.handle_interrupt("some-event", some_event_handler)
    thread.handle_interrupt("another-event", another_event_handler)
    thread.execute(hello_there, R2)
    thread.sleep_for(3)


def payload_handler_thread(thread):
    """reference tests/interrupts_with_payload.py interrupt_handler_thread:
    the event payload unsplats into the handler thread's declared
    variables, and a task reads one of them."""
    thread.add_variable("Sith", str)
    jedi = thread.add_variable("Jedi", str)
    thread.execute(hello_there, jedi)


def interrupts_with_payload(thread):
    """reference tests/interrupts_with_payload.py: handler vars fed by
    the interrupt event's JSON-object payload."""
    thread.handle_interrupt("some-event", payload_handler_thread)
    thread.execute(hello_there, OBI)
    thread.sleep_for(3)
    thread.execute(hello_there, R2)


TEN_OR_MORE_EDGE = "Its 10 or more!"
MERGER_EDGE = "This task should execute on all WFRun's."


def conditionals_edge_1(thread):
    """reference tests/conditionals_edge_1.py: a single is_true guard
    whose FIRST executable node is the condition NOP — also the
    vehicle for edge_2's bad-typed-input check."""
    my_int = thread.add_variable("my_int", int)
    greater_than_ten = my_int.greater_than(10)
    with greater_than_ten.is_true():
        thread.execute(echo_task, TEN_OR_MORE_EDGE)
    thread.execute(echo_task, MERGER_EDGE)


# ---- driver ----

def compile_and_deploy(ctl, fixdir, wf_fn):
    wf = Workflow(wf_fn)
    deployed = []
    for kind, docs in [
            ("TaskDef", wf.task_defs()),
            ("ExternalEventDef", wf.external_event_defs()),
            ("WFSpec", [wf.spec])]:
        for doc in docs:
            path = os.path.join(
                fixdir, "%s_%s.json" % (kind, doc["name"].replace("-", "_")))
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)
            r = ctl.call("deploy %s %s" % (kind, path))
            check(r.get("status") == "OK",
                  "deploy %s %s" % (kind, doc["name"]), r)
            deployed.append((kind, doc["name"]))
    return wf


def poll_wfrun(ctl, run_id, want_status, deadline_s=30):
    deadline = time.time() + deadline_s
    doc = None
    while time.time() < deadline:
        r = ctl.call("get WFRun " + run_id)
        if r.get("status") == "OK":
            doc = r["result"]
            if doc.get("status") == want_status:
                return doc
        time.sleep(0.25)
    raise AssertionError(
        "WFRun %s never reached %s; last: %r" % (run_id, want_status, doc))


def non_nop_stdouts(doc):
    thr = doc["threadRuns"][0]
    return [t["stdout"] for t in thr["taskRuns"]
            if t["nodeType"] not in ("NOP",)]


def run_wf(ctl, name, **vars_):
    # single-quote each pair: repl tokenize groups quoted segments, so
    # JSON values may carry spaces (compact separators keep objects
    # themselves tight)
    parts = ["run", name] + [
        "'%s=%s'" % (k, json.dumps(v, separators=(",", ":")))
        for k, v in vars_.items()]
    r = ctl.call(" ".join(parts))
    check(r.get("status") == "OK", "run " + name, r)
    return r["objectId"]


def check_basic(ctl):
    run_id = run_wf(ctl, "basic")
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    check(len(doc["threadRuns"]) == 1, "basic thread count", doc)
    outs = non_nop_stdouts(doc)
    check(outs == [HELLO], "basic stdout", outs)


def check_conditionals(ctl):
    # same input sweep as the reference launcher
    inputs = [-10, 0, 2, 10, 15, 42, 20, 137, 1888]
    runs = [(i, run_wf(ctl, "conditionals_basic", my_int=i))
            for i in inputs]
    for my_int, run_id in runs:
        doc = poll_wfrun(ctl, run_id, "COMPLETED")
        thr = doc["threadRuns"][0]
        check(thr["variables"]["my_int"] == my_int, "my_int kept", thr)
        outs = non_nop_stdouts(doc)
        if my_int <= 0:
            want = [ENTRYPOINT, MERGER]
        elif my_int < 10:
            want = [ENTRYPOINT, UNDER_TEN, MERGER]
        elif my_int == 20:
            want = [ENTRYPOINT, TEN_OR_MORE, MERGER, COLT]
        elif my_int in (42, 137):
            want = [ENTRYPOINT, TEN_OR_MORE, FEELING_LUCKY, MERGER]
        else:
            want = [ENTRYPOINT, TEN_OR_MORE, MERGER]
        check(outs == want,
              "conditionals my_int=%d branch" % my_int, outs)


def check_threads(ctl):
    for input_var in (5, -20, 17):
        run_id = run_wf(ctl, "threads_basic", input_var=input_var)
        doc = poll_wfrun(ctl, run_id, "COMPLETED")
        check(len(doc["threadRuns"]) == 4, "4 threads", doc["threadRuns"])
        for thr in doc["threadRuns"]:
            check(thr["status"] == "COMPLETED", "thread completed", thr)
        parent = doc["threadRuns"][0]["variables"]["parent_var"]
        answer = int((1 + input_var + 26 - 5) / 3)  # reference check math
        check(parent == answer,
              "threads_basic answer for input %d" % input_var,
              (parent, answer))


def check_jsonpath(ctl):
    run_id = run_wf(ctl, "var_assign_jsonpath_happy")
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check(len(tasks) == 2 and
          all(t["status"] == "COMPLETED" for t in tasks),
          "jsonpath task runs", tasks)
    v = thr["variables"]
    want = {"my_int": 1, "my_bool": False, "my_list": [1, 2, 3, 4],
            "my_str": STR_RESULT, "my_float": 2.5, "my_obj": BLOB,
            "my_second_obj": BLOB["some_blob"]}
    for k, expect in want.items():
        check(v.get(k) == expect,
              "jsonpath var %s" % k, (v.get(k), expect))


def check_interrupts(ctl):
    # happy path: no event, the sleep just elapses
    run_id = run_wf(ctl, "interrupts")
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check([t["stdout"] for t in tasks] ==
          ["Hello there, General Kenobi!", "Hello there, R2-D2!"],
          "interrupts happy path", tasks)

    # interrupted: the event lands in the sleep window; the handler
    # thread runs and the main thread still completes
    run_id = run_wf(ctl, "interrupts")
    poll_wfrun(ctl, run_id, "RUNNING", deadline_s=20)
    r = ctl.call("send-event some-event %s '%s'"
                 % (run_id, json.dumps("YOU ARE A BOLD ONE!")))
    check(r.get("status") == "OK", "send interrupt", r)
    doc = poll_wfrun(ctl, run_id, "COMPLETED", deadline_s=45)
    check(len(doc["threadRuns"]) == 2, "interrupt spawned a thread",
          [t["threadSpecName"] for t in doc["threadRuns"]])
    handler = doc["threadRuns"][1]
    check(handler["threadSpecName"] == "interrupt_handler_thread" and
          handler["status"] == "COMPLETED",
          "handler thread completed", handler)
    check(handler["taskRuns"][0]["stdout"] ==
          "Hello there, %s!" % INTERRUPT_GREETING,
          "handler task ran", handler["taskRuns"])


def check_var_mutations(ctl):
    # case 1 (happy path): the reference's expected variable state,
    # including both pinned quirks
    run_id = run_wf(
        ctl, "var_mutations",
        my_obj={"some_thing": [1, 2, 3], "my_bool": True,
                "my_int": 50, "1234": "not in the thing"},
        my_list=[], my_float=3.2)
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    v = doc["threadRuns"][0]["variables"]
    check(v["my_int"] == 47, "my_int", v)
    check(v["my_bool"] is True, "my_bool", v)
    check(v["my_list"] == [[1, 2, 3]], "my_list (remove_idx no-op)", v)
    check(v["my_str"] == DUMMY, "my_str (null + ADD)", v)
    check(v["my_float"] == 3.2 + -2.5, "my_float", v)
    check("1234" in v["my_obj"],
          "numeric remove_key is a no-op on string JSON keys", v)

    # case 2: jsonpath miss -> HALTED with VARIABLE_LOOKUP_ERROR
    run_id = run_wf(
        ctl, "var_mutations",
        my_obj={"some_thing": [1, 2, 3], "my_bool": True,
                "1234": "x"},
        my_list=[], my_float=3.2)
    doc = poll_wfrun(ctl, run_id, "HALTED")
    tr = doc["threadRuns"][0]["taskRuns"][0]
    check(tr["failureReason"] == "VARIABLE_LOOKUP_ERROR",
          "jsonpath miss reason", tr)

    # case 3: wrong type -> HALTED with VARIABLE_LOOKUP_ERROR
    run_id = run_wf(
        ctl, "var_mutations",
        my_obj={"my_int": "not a real int"},
        my_list=[], my_float=3.2)
    doc = poll_wfrun(ctl, run_id, "HALTED")
    tr = doc["threadRuns"][0]["taskRuns"][0]
    check(tr["failureReason"] == "VARIABLE_LOOKUP_ERROR",
          "type coercion reason", tr)


def check_external_event(ctl):
    run_id = run_wf(ctl, "external_event_basic")
    poll_wfrun(ctl, run_id, "RUNNING", deadline_s=20)
    r = ctl.call("send-event my-name %s '%s'" % (run_id,
                                                 json.dumps(PAYLOAD)))
    check(r.get("status") == "OK", "send-event", r)
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    thr = doc["threadRuns"][0]
    check(thr["variables"]["my_name"] == PAYLOAD, "event var folded", thr)
    outs = non_nop_stdouts(doc)
    check(outs[-1] == "Hello there, %s!" % PAYLOAD, "task saw event", outs)


def check_retries(ctl):
    """reference check_retries_task, deterministic branch: attempt 0
    HALTED with an AssertionError on stderr, attempt 1 COMPLETED."""
    run_id = run_wf(ctl, "retries_task")
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    thr = doc["threadRuns"][0]
    check(thr["status"] == "COMPLETED", "retries thread status", thr)
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check(len(tasks) == 4, "retries task-run count", tasks)
    check(tasks[0]["stdout"] == OBI_GREETING, "retries first echo", tasks)
    first, retry = tasks[1], tasks[2]
    check(first["number"] == retry["number"],
          "retry reruns the SAME node number", (first, retry))
    check(first["status"] == "HALTED" and
          first["attemptNumber"] == 0 and
          "AssertionError" in str(first["stderr"]),
          "first attempt halted with error reporting", first)
    check(retry["status"] == "COMPLETED" and
          retry["attemptNumber"] == 1 and
          retry["stdout"] == VADER_GREETING,
          "retry attempt completed", retry)
    check(tasks[3]["stdout"] == GRIEVOUS_GREETING, "retries last echo",
          tasks)


def check_retries_timeout(ctl):
    """reference check_retries_task_timeout: both attempts TIMEOUT,
    the run halts."""
    run_id = run_wf(ctl, "retries_task_timeout")
    doc = poll_wfrun(ctl, run_id, "HALTED", deadline_s=45)
    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check(len(tasks) == 2, "timeout should have retried once", tasks)
    for i, t in enumerate(tasks):
        check(t["status"] == "HALTED" and
              t["failureReason"] == "TIMEOUT" and
              t["attemptNumber"] == i,
              "timeout attempt %d" % i, t)


def check_conditionals_edge(ctl):
    # edge_1 launcher: the 9/11 sweep around the >10 boundary
    for my_int in (9, 11):
        run_id = run_wf(ctl, "conditionals_edge_1", my_int=my_int)
        doc = poll_wfrun(ctl, run_id, "COMPLETED")
        thr = doc["threadRuns"][0]
        check(thr["variables"]["my_int"] == my_int, "edge my_int", thr)
        outs = non_nop_stdouts(doc)
        want = ([TEN_OR_MORE_EDGE, MERGER_EDGE] if my_int > 10
                else [MERGER_EDGE])
        check(outs == want, "edge_1 branch my_int=%d" % my_int, outs)

    # edge_2 launcher: bad typed input — the condition NOP fails with
    # VARIABLE_LOOKUP_ERROR and the run halts before ANY task runs
    run_id = run_wf(ctl, "conditionals_edge_1", my_int="not an int")
    doc = poll_wfrun(ctl, run_id, "HALTED")
    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check(tasks == [], "no TASK may run on bad input", thr["taskRuns"])
    failed = thr["taskRuns"][-1]
    check(failed["nodeType"] == "NOP" and
          failed["status"] == "HALTED" and
          failed["failureReason"] == "VARIABLE_LOOKUP_ERROR",
          "bad input fails the NOP with VARIABLE_LOOKUP_ERROR", failed)


def check_external_event_timeout(ctl):
    """reference check_external_event_basic_0: no event sent, the
    EXTERNAL_EVENT node times out and the run halts."""
    run_id = run_wf(ctl, "external_event_timeout")
    doc = poll_wfrun(ctl, run_id, "HALTED", deadline_s=45)
    thr = doc["threadRuns"][0]
    waits = [t for t in thr["taskRuns"]
             if t["nodeType"] == "EXTERNAL_EVENT"]
    check(len(waits) == 1 and
          waits[0]["status"] == "HALTED" and
          waits[0]["failureReason"] == "TIMEOUT",
          "external event wait timed out", thr["taskRuns"])


def check_var_adds(ctl):
    """reference check_var_adds_1/2: default-seeded and input-seeded
    add-chain arithmetic, EXTEND from jsonpath, indexed-jsonpath ADD,
    all-occurrences REMOVE_IF_PRESENT."""
    # case 1: defaults (counter=-1, arr=[])
    run_id = run_wf(ctl, "var_adds")
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    check(len(doc["threadRuns"]) == 1, "var_adds one thread", doc)
    v = doc["threadRuns"][0]["variables"]
    check(v["arr"] == [1, 2, 3], "var_adds case1 arr", v)
    check(v["counter"] == 2, "var_adds case1 counter", v)

    # case 2: launcher inputs arr=[5, 4, 3, 2], counter=0 — BOTH 4s
    # must go (REMOVE_IF_PRESENT removes every equal element)
    run_id = run_wf(ctl, "var_adds", arr=[5, 4, 3, 2], counter=0)
    doc = poll_wfrun(ctl, run_id, "COMPLETED")
    v = doc["threadRuns"][0]["variables"]
    check(v["arr"] == [5, 3, 2, 1, 2, 3], "var_adds case2 arr", v)
    check(v["counter"] == 3, "var_adds case2 counter", v)


def _check_one_interrupt(ctl, event_name, handler_name, handler_stdout):
    """Shared body for the interrupts_multiple cases: launch, land
    `event_name` in the sleep window, then assert the reference's
    check_interrupts_multiple_{0,1} shape — main thread's task ran
    before the sleep, exactly one handler thread ran, and it is the
    one registered for THAT event."""
    run_id = run_wf(ctl, "interrupts_multiple")
    poll_wfrun(ctl, run_id, "RUNNING", deadline_s=20)
    r = ctl.call("send-event %s %s '%s'"
                 % (event_name, run_id, json.dumps("hola")))
    check(r.get("status") == "OK", "send " + event_name, r)
    doc = poll_wfrun(ctl, run_id, "COMPLETED", deadline_s=45)
    check(len(doc["threadRuns"]) == 2,
          "interrupts_multiple thread count",
          [t["threadSpecName"] for t in doc["threadRuns"]])

    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check([t["stdout"] for t in tasks] == ["Hello there, %s!" % R2],
          "interrupts_multiple main task", tasks)
    for t in thr["taskRuns"]:
        check(t["status"] == "COMPLETED",
              "interrupts_multiple main node status", t)

    handler = doc["threadRuns"][1]
    check(handler["threadSpecName"] == handler_name and
          handler["status"] == "COMPLETED",
          "handler %s completed" % handler_name, handler)
    check(len(handler["taskRuns"]) == 1 and
          handler["taskRuns"][0]["status"] == "COMPLETED" and
          handler["taskRuns"][0]["stdout"] == handler_stdout,
          "handler %s task" % handler_name, handler["taskRuns"])


def check_interrupts_multiple(ctl):
    """reference check_interrupts_multiple_0/1: each registered event
    routes to ITS handler."""
    _check_one_interrupt(ctl, "some-event", "some_event_handler",
                         "Hello there, %s!" % OBI)
    _check_one_interrupt(ctl, "another-event", "another_event_handler",
                         "Hello there, %s!" % AHSOKA)


def check_interrupts_with_payload(ctl):
    # case 0 (reference check_interrupts_with_payload_0): no event,
    # the run just completes — 1 thread, both hellos in order
    run_id = run_wf(ctl, "interrupts_with_payload")
    doc = poll_wfrun(ctl, run_id, "COMPLETED", deadline_s=45)
    check(len(doc["threadRuns"]) == 1, "payload case0 threads", doc)
    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check([t["stdout"] for t in tasks] ==
          ["Hello there, %s!" % OBI, "Hello there, %s!" % R2],
          "payload case0 stdouts", tasks)
    for t in thr["taskRuns"]:
        check(t["status"] == "COMPLETED", "payload case0 status", t)

    # case 1: the JSON-object payload lands in the sleep window and
    # unsplats into the handler thread's variables
    run_id = run_wf(ctl, "interrupts_with_payload")
    poll_wfrun(ctl, run_id, "RUNNING", deadline_s=20)
    r = ctl.call("send-event some-event %s '%s'"
                 % (run_id, json.dumps(INTERRUPT_PAYLOAD,
                                       separators=(",", ":"))))
    check(r.get("status") == "OK", "send payload", r)
    doc = poll_wfrun(ctl, run_id, "COMPLETED", deadline_s=45)
    check(len(doc["threadRuns"]) == 2, "payload case1 threads",
          [t["threadSpecName"] for t in doc["threadRuns"]])

    thr = doc["threadRuns"][0]
    tasks = [t for t in thr["taskRuns"] if t["nodeType"] == "TASK"]
    check([t["stdout"] for t in tasks] ==
          ["Hello there, %s!" % OBI, "Hello there, %s!" % R2],
          "payload case1 main stdouts", tasks)
    for t in thr["taskRuns"]:
        check(t["status"] == "COMPLETED", "payload case1 main status", t)

    handler = doc["threadRuns"][1]
    check(handler["threadSpecName"] == "payload_handler_thread" and
          handler["status"] == "COMPLETED",
          "payload handler completed", handler)
    check(len(handler["taskRuns"]) == 1 and
          handler["taskRuns"][0]["status"] == "COMPLETED" and
          handler["taskRuns"][0]["stdout"] ==
          "Hello there, %s!" % INTERRUPT_PAYLOAD["Jedi"],
          "payload handler greets the Jedi", handler["taskRuns"])
    check(handler["variables"] == INTERRUPT_PAYLOAD,
          "payload unsplat into handler vars", handler["variables"])


def main():
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    classpath, root, fixdir = sys.argv[1], sys.argv[2], sys.argv[3]
    ctl = Ctl(classpath, root)
    try:
        for wf_fn in (basic, conditionals_basic, threads_basic,
                      external_event_basic, var_assign_jsonpath_happy,
                      interrupts, var_mutations, retries_task,
                      retries_task_timeout, conditionals_edge_1,
                      external_event_timeout, var_adds,
                      interrupts_multiple, interrupts_with_payload):
            compile_and_deploy(ctl, fixdir, wf_fn)

        r = ctl.call("serve 240000 worker")
        check(r.get("status") == "SERVING", "serve", r)

        check_basic(ctl)
        check_conditionals(ctl)
        check_threads(ctl)
        check_jsonpath(ctl)
        check_var_mutations(ctl)
        check_var_adds(ctl)
        check_retries(ctl)
        check_retries_timeout(ctl)
        check_conditionals_edge(ctl)
        check_external_event_timeout(ctl)
        check_interrupts(ctl)
        check_interrupts_multiple(ctl)
        check_interrupts_with_payload(ctl)
        check_external_event(ctl)

        r = ctl.call("exit")
        check(r.get("status") == "BYE", "exit", r)
    finally:
        rc = ctl.close()
    check(rc == 0, "Ctl exit code", rc)
    print("sdk contract OK")


if __name__ == "__main__":
    main()
