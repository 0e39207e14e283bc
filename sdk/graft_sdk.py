"""Python workflow SDK for the graft engine — the compile slice.

Compiles a decorated workflow FUNCTION (a Python callable that drives a
``ThreadSpecBuilder``) into the WFSpec JSON wire document that graft's
``SpecCodec.decode``/``validate`` accepts, plus the TaskDef and
ExternalEventDef documents the workflow needs.  This is the graft-side
re-expression of the reference SDK surface
(``lhctl/lh_sdk/thread_spec_builder.py:42-325``,
``wf_run_variable.py``, ``condition_utils.py``, ``node_output.py``,
``compile.py``): same user-facing API, same wire-visible conventions
(node naming ``{idx}-{human}-{sha256(thread)[:5]}``, edge/condition
structure, task-def naming ``{module}-{function}``), independent
implementation on the Python stdlib only.

Usage::

    def greet_flow(thread):
        name = thread.add_variable("name", str)
        out = thread.execute(echo_task, name)
        name.assign(out)

    wf = Workflow(greet_flow)
    wf.payload          # WFSpec JSON string (deployable via Ctl)
    wf.task_defs()      # TaskDef JSON documents for executed functions
    wf.external_event_defs()

The deliberate deltas from the reference (all compile-time, none
wire-visible): no pydantic/humps dependency (plain dicts, camelCase
written directly), null-valued optional fields are omitted rather than
serialized (graft's decoder treats absent and null identically), and
error messages differ.
"""
import hashlib
import inspect
import json

# Exact-type literal admission (reference ACCEPTABLE_TYPES_LIST):
# type(x) checks, not isinstance, so bool is not swallowed by int.
LITERAL_TYPES = (str, float, bool, int, dict, list)

# Python annotation -> engine VarType (reference utils.get_lh_var_type).
LH_TYPE_BY_PY = {
    str: "STRING", float: "FLOAT", bool: "BOOLEAN",
    int: "INT", dict: "OBJECT", list: "ARRAY",
}

# reference wf_spec_schema.CONDITION_INVERSES:76-85
CONDITION_INVERSES = {
    "LESS_THAN": "GREATER_THAN_EQ", "GREATER_THAN": "LESS_THAN_EQ",
    "LESS_THAN_EQ": "GREATER_THAN", "GREATER_THAN_EQ": "LESS_THAN",
    "EQUALS": "NOT_EQUALS", "NOT_EQUALS": "EQUALS",
    "IN": "NOT_IN", "NOT_IN": "IN",
}


def task_def_name_of(func):
    """reference utils.get_task_def_name: ``{module}-{function}`` with
    dots dashed; the engine-side worker recovers the function as the
    LAST dash segment (utils.parse_task_def_name)."""
    return "%s-%s" % (func.__module__.replace(".", "-"), func.__name__)


def _var_assignment(entity, required_type=None):
    """Literal or WFRunVariable -> VariableAssignment dict
    (reference thread_spec_builder.construct_var_assign:76-103)."""
    if isinstance(entity, WFRunVariable):
        if required_type is not None:
            if LH_TYPE_BY_PY.get(required_type) != entity.var_type:
                raise TypeError(
                    "variable %s is %s, parameter wants %s"
                    % (entity.name, entity.var_type, required_type))
        out = {"wfRunVariableName": entity.name}
        if entity.get_jsonpath() is not None:
            out["jsonPath"] = entity.get_jsonpath()
        return out
    if type(entity) not in LITERAL_TYPES:
        raise TypeError("cannot assign from %r" % (type(entity),))
    if required_type is not None and required_type is not type(entity):
        raise TypeError("literal %r is not a %s" % (entity, required_type))
    return {"literalValue": entity}


class NodeOutput:
    """Handle on the node just added; the reference forbids touching it
    once any later node exists (node_output.py:30-35) and so do we."""

    def __init__(self, node_name, thread, output_type=None, jsonpath=None):
        self._node_name = node_name
        self._thread = thread
        self._output_type = output_type
        self._jsonpath = jsonpath

    def _check_live(self):
        if self._thread._last_node_name != self._node_name:
            raise RuntimeError(
                "accessing node output after other nodes executed")

    @property
    def node_name(self):
        self._check_live()
        return self._node_name

    @property
    def node(self):
        return self._thread._nodes[self.node_name]

    def jsonpath(self, path):
        self._check_live()
        if self._jsonpath is not None:
            raise RuntimeError("jsonpath already set on this output")
        return NodeOutput(self._node_name, self._thread,
                          output_type=self._output_type, jsonpath=path)

    def get_jsonpath(self):
        self._check_live()
        return self._jsonpath

    def with_retries(self, num_retries):
        if self.node["nodeType"] != "TASK":
            raise RuntimeError("can only retry a TASK node")
        self.node["numRetries"] = num_retries
        return self

    def with_timeout(self, timeout_seconds):
        self.node["timeoutSeconds"] = _var_assignment(timeout_seconds)
        return self

    def catch_exception(self, handler, exc_name=None):
        """Attach an exception-handler thread to this node
        (node_output.py:77-97): base handler when ``exc_name`` is None,
        else a custom handler for that exception name."""
        self._check_live()
        thread_name = self._thread._wf.add_subthread(handler)
        spec = {"handlerThreadSpecName": thread_name}
        if exc_name is None:
            self.node["baseExceptionhandler"] = spec
        else:
            self.node.setdefault("customExceptionHandlers", {})[exc_name] = spec
        return self


class ThreadSpawnOutput(NodeOutput):
    """Output of spawn_thread; carries the temp variable holding the
    spawned threadId (threadspawn_utils.py:12-24)."""

    def __init__(self, node_name, thread):
        NodeOutput.__init__(self, node_name, thread)
        self._var = None

    def get_var(self):
        assert self._var is not None
        return self._var


class WFRunVariable:
    """A workflow variable handle: mutation verbs attach a
    VariableMutation to the thread's LAST node; comparison verbs open
    if/else conditions (wf_run_variable.py)."""

    def __init__(self, name, var_type, thread, jsonpath=None):
        self.name = name
        self.var_type = var_type
        self.thread = thread
        self._jsonpath = jsonpath

    def jsonpath(self, path):
        return WFRunVariable(self.name, self.var_type, self.thread, path)

    def get_jsonpath(self):
        return self._jsonpath

    # -- mutations (reference wf_run_variable.py:66-131) --

    def _mutation(self, op, target):
        out = {"operation": op}
        if type(target) in LITERAL_TYPES:
            out["literalValue"] = target
        elif isinstance(target, WFRunVariable):
            src = {"wfRunVariableName": target.name}
            if target.get_jsonpath() is not None:
                src["jsonPath"] = target.get_jsonpath()
            out["sourceVariable"] = src
        elif isinstance(target, NodeOutput):
            # RHS = (jsonpath over) the node's own output
            jp = target.get_jsonpath()
            if jp is not None:
                out["jsonPath"] = jp
        else:
            raise TypeError("cannot mutate from %r" % (type(target),))
        self.thread._mutate(self.name, out)

    def assign(self, target):
        self._mutation("ASSIGN", target)

    def add(self, target):
        self._mutation("ADD", target)

    def extend(self, target):
        self._mutation("EXTEND", target)

    def subtract(self, target):
        self._mutation("SUBTRACT", target)

    def multiply(self, target):
        self._mutation("MULTIPLY", target)

    def divide(self, target):
        self._mutation("DIVIDE", target)

    def remove_if_present(self, target):
        self._mutation("REMOVE_IF_PRESENT", target)

    def remove_idx(self, target):
        self._mutation("REMOVE_INDEX", target)

    def remove_key(self, target):
        self._mutation("REMOVE_KEY", target)

    # -- conditions (reference wf_run_variable.py:136-199) --

    def less_than(self, target):
        return IfElseCondition(self.thread, self, target, "LESS_THAN")

    def greater_than(self, target):
        return IfElseCondition(self.thread, self, target, "GREATER_THAN")

    def less_than_eq(self, target):
        return IfElseCondition(self.thread, self, target, "LESS_THAN_EQ")

    def greater_than_eq(self, target):
        return IfElseCondition(self.thread, self, target, "GREATER_THAN_EQ")

    def equals(self, target):
        return IfElseCondition(self.thread, self, target, "EQUALS")

    def not_equals(self, target):
        return IfElseCondition(self.thread, self, target, "NOT_EQUALS")

    def is_in(self, target):
        return IfElseCondition(self.thread, self, target, "IN")

    def is_not_in(self, target):
        return IfElseCondition(self.thread, self, target, "NOT_IN")


class IfElseCondition:
    """One comparison, usable as ``with cond.is_true(): ...`` then
    OPTIONALLY ``with cond.is_false(): ...`` immediately after
    (condition_utils.py:26-106). The else-arm is only valid directly
    after the if-arm closes: any node added in between cancels it."""

    _seq = 0

    def __init__(self, thread, lhs, rhs, comparator):
        self.thread = thread
        self.lhs = lhs
        self.rhs = rhs
        self.comparator = comparator
        IfElseCondition._seq += 1
        self._id = "ifelse-%d" % IfElseCondition._seq
        self._cancelled = False

    def _side(self, entity):
        if isinstance(entity, WFRunVariable):
            out = {"wfRunVariableName": entity.name}
            if entity.get_jsonpath() is not None:
                out["jsonPath"] = entity.get_jsonpath()
            return out
        return {"literalValue": entity}

    def condition(self):
        return {"leftSide": self._side(self.lhs),
                "rightSide": self._side(self.rhs),
                "comparator": self.comparator}

    def reverse_condition(self):
        return {"leftSide": self._side(self.lhs),
                "rightSide": self._side(self.rhs),
                "comparator": CONDITION_INVERSES[self.comparator]}

    def is_true(self):
        return _IfContext(self)

    def is_false(self):
        if self._cancelled:
            raise RuntimeError(
                "is_false() must directly follow the end of is_true()")
        return _ElseContext(self)


class _IfContext:
    """Context manager for the true-arm (condition_utils.py:109-148):
    on entry every pending feeder edge picks up the condition (NOP
    padding where a feeder already carries one), and the pre-if node is
    remembered with the REVERSE condition so whatever follows the arm
    becomes the false-branch target."""

    def __init__(self, parent):
        self.parent = parent
        self._feeders = {}

    def __enter__(self):
        t = self.parent.thread
        cond = self.parent.condition()
        if not t._nodes:
            t.add_nop_node()
        if any(c is not None for c in t._feeder_nodes.values()):
            # a feeder already carries a condition: pad with a NOP so
            # conditions never stack on one edge
            t.add_nop_node()
        for name in t._feeder_nodes:
            t._feeder_nodes[name] = cond
        self._feeders.update(t._feeder_nodes)
        if t._last_node_name is None:
            t.add_nop_node()
        self._feeders[t._last_node_name] = self.parent.reverse_condition()

    def __exit__(self, exc_type, exc_value, tb):
        t = self.parent.thread
        t._feeder_nodes.update(self._feeders)
        t._between_if_elses[self.parent._id] = self.parent


class _ElseContext:
    """Context manager for the false-arm (condition_utils.py:151-180):
    entry hides the if-arm's last node from the feeders while the else
    nodes chain off the reversed edge; exit restores it unconditioned
    and closes the diamond with a NOP merge node."""

    def __init__(self, parent):
        self.parent = parent
        self._popped = None

    def __enter__(self):
        t = self.parent.thread
        del t._between_if_elses[self.parent._id]
        self._popped = t._last_node_name
        assert self._popped is not None
        assert self._popped in t._feeder_nodes
        del t._feeder_nodes[self._popped]
        assert t._feeder_nodes, "else-arm with no feeder"

    def __exit__(self, exc_type, exc_value, tb):
        t = self.parent.thread
        t._feeder_nodes[self._popped] = None
        t.add_nop_node()


class ThreadSpecBuilder:
    """Records one thread's nodes/edges/variables as the user's thread
    function executes (thread_spec_builder.py:42-325)."""

    def __init__(self, name, wf):
        self.name = name
        self._wf = wf
        self._nodes = {}
        self._edges = []
        self._variable_defs = {}
        self._interrupt_defs = {}
        self._last_node_name = None
        # node name -> edge condition for the NEXT node added
        self._feeder_nodes = {}
        self._between_if_elses = {}

    # -- node factory --

    def _add_node(self, node, human_name):
        # adding any node cancels a pending is_false() arm
        for cond in list(self._between_if_elses.values()):
            cond._cancelled = True
            del self._between_if_elses[cond._id]
        tag = hashlib.sha256(self.name.encode()).hexdigest()[:5]
        node_name = "%d-%s-%s" % (len(self._nodes), human_name, tag)
        self._nodes[node_name] = node
        for source, cond in self._feeder_nodes.items():
            edge = {"sourceNodeName": source, "sinkNodeName": node_name}
            if cond is not None:
                edge["condition"] = cond
            self._edges.append(edge)
        self._feeder_nodes = {node_name: None}
        self._last_node_name = node_name
        return node_name

    def add_nop_node(self):
        self._add_node({"nodeType": "NOP"}, "NOP")

    # -- the user-facing verbs --

    def execute(self, task, *args, **kwargs):
        if callable(task):
            return self._execute_func(task, *args)
        return self._execute_name(task, **kwargs)

    def _execute_func(self, func, *args):
        sig = inspect.signature(func)
        params = list(sig.parameters.values())
        if len(args) != len(params):
            raise TypeError("%s takes %d args, got %d"
                            % (func.__name__, len(params), len(args)))
        variables = {}
        for param, arg in zip(params, args):
            if param.annotation is inspect.Signature.empty:
                raise TypeError(
                    "annotate parameter %s of %s"
                    % (param.name, func.__name__))
            variables[param.name] = _var_assignment(
                arg, required_type=param.annotation)
        td_name = task_def_name_of(func)
        node = {"nodeType": "TASK", "taskDefName": td_name}
        if variables:
            node["variables"] = variables
        node_name = self._add_node(node, td_name)
        self._wf._register_task_func(func)
        out_type = (None if sig.return_annotation is inspect.Signature.empty
                    else sig.return_annotation)
        return NodeOutput(node_name, self, output_type=out_type)

    def _execute_name(self, td_name, **kwargs):
        node = {"nodeType": "TASK", "taskDefName": td_name}
        if kwargs:
            node["variables"] = {
                k: _var_assignment(v) for k, v in kwargs.items()}
        node_name = self._add_node(node, td_name)
        return NodeOutput(node_name, self)

    def wait_for_event(self, event_name):
        node = {"nodeType": "EXTERNAL_EVENT",
                "externalEventDefName": event_name}
        node_name = self._add_node(node, "WAIT-EVENT-" + event_name)
        return NodeOutput(node_name, self)

    def sleep_for(self, sleep_time):
        node = {"nodeType": "SLEEP",
                "timeoutSeconds": _var_assignment(sleep_time,
                                                  required_type=int)}
        self._add_node(node, "SLEEP")

    def throw_exception(self, exc_name):
        self._add_node({"nodeType": "THROW_EXCEPTION",
                        "exceptionToThrow": exc_name},
                       "THROW-" + exc_name)

    def add_variable(self, name, var_type, default_val=None):
        lh_type = (var_type if isinstance(var_type, str)
                   else LH_TYPE_BY_PY[var_type])
        if name in self._wf._var_defs:
            raise RuntimeError("variable %s already defined" % name)
        var_def = {"type": lh_type}
        if default_val is not None:
            var_def["defaultValue"] = default_val
        self._variable_defs[name] = var_def
        out = WFRunVariable(name, lh_type, self)
        self._wf._var_defs[name] = out
        return out

    def get_parent_var(self, var_name):
        tmpl = self._wf._var_defs.get(var_name)
        if tmpl is None:
            raise RuntimeError("no such parent variable: %s" % var_name)
        # rebind to THIS thread so mutations land on our nodes; the
        # engine's scope walk finds the defining ancestor at run time
        return WFRunVariable(tmpl.name, tmpl.var_type, self)

    def _mutate(self, var_name, mutation):
        assert self._last_node_name is not None, \
            "execute a node before mutating variables"
        node = self._nodes[self._last_node_name]
        node.setdefault("variableMutations", {})[var_name] = mutation

    def add_subthread(self, thread_func):
        return self._wf.add_subthread(thread_func)

    def spawn_thread(self, thread_func):
        """SPAWN_THREAD node + a temp INT variable capturing the
        spawned threadId (thread_spec_builder.py:272-297), so a later
        wait_for_thread(handle) can reference it."""
        thread_name = self.add_subthread(thread_func)
        node = {"nodeType": "SPAWN_THREAD",
                "threadSpawnThreadSpecName": thread_name}
        node_name = self._add_node(node, "SPAWN-" + thread_name)
        output = ThreadSpawnOutput(node_name, self)
        var = self.add_variable("temp-" + node_name, int)
        var.assign(output.jsonpath("$.threadId"))
        output._var = var
        return output

    def wait_for_thread(self, thread):
        node = {"nodeType": "WAIT_FOR_THREAD"}
        node_name = self._add_node(node, "WAIT-THREAD")
        if isinstance(thread, ThreadSpawnOutput):
            assign = _var_assignment(thread.get_var())
        elif isinstance(thread, (int, WFRunVariable)) \
                and type(thread) is not bool:
            assign = _var_assignment(thread)
        else:
            raise TypeError("invalid thread handle: %r" % (thread,))
        node["threadWaitThreadId"] = assign
        return NodeOutput(node_name, self)

    def handle_interrupt(self, event_name, handler):
        handler_name = self.add_subthread(handler)
        self._interrupt_defs[event_name] = {
            "handlerThreadName": handler_name}

    # -- serialization --

    def spec(self):
        out = {"name": self.name}
        if self._variable_defs:
            out["variableDefs"] = self._variable_defs
        if self._interrupt_defs:
            out["interruptDefs"] = self._interrupt_defs
        out["nodes"] = self._nodes
        out["edges"] = self._edges
        return out


class Workflow:
    """Compile a workflow entrypoint function (plus every subthread it
    registers, transitively) into the WFSpec wire document
    (thread_spec_builder.py:328-387). The workflow name IS the
    function's name, and so is the entrypoint thread's."""

    def __init__(self, entrypoint_function):
        self._entrypoint = entrypoint_function
        self.name = entrypoint_function.__name__
        self._funcs = {}
        self._var_defs = {}
        self._task_funcs = {}
        self._thread_specs = {}
        self.add_subthread(entrypoint_function)
        self._compile()

    def add_subthread(self, thread_func):
        self._funcs[thread_func.__name__] = thread_func
        return thread_func.__name__

    def _register_task_func(self, func):
        self._task_funcs[task_def_name_of(func)] = func

    def _compile(self):
        seen = set()
        # threads can register more threads while compiling: iterate to
        # the fixpoint, preserving discovery order
        while True:
            before = len(self._funcs)
            for fname in list(self._funcs):
                if fname in seen:
                    continue
                seen.add(fname)
                builder = ThreadSpecBuilder(fname, self)
                self._funcs[fname](builder)
                self._thread_specs[fname] = builder.spec()
            if before == len(self._funcs):
                break

    @property
    def spec(self):
        return {"name": self.name,
                "entrypointThreadName": self.name,
                "threadSpecs": self._thread_specs}

    @property
    def payload(self):
        return json.dumps(self.spec, indent=1)

    def task_defs(self):
        """TaskDef wire documents for every task FUNCTION executed
        (string-named executes are assumed already deployed —
        reference compile.py:38-48 skip logic)."""
        out = []
        for td_name, func in sorted(self._task_funcs.items()):
            required = {}
            for param in inspect.signature(func).parameters.values():
                required[param.name] = {
                    "type": LH_TYPE_BY_PY[param.annotation]}
            out.append({"name": td_name, "requiredVars": required})
        return out

    def external_event_defs(self):
        """ExternalEventDef documents: every EXTERNAL_EVENT node's
        event plus every interrupt event (compile.py:51-61)."""
        names = set()
        for tspec in self._thread_specs.values():
            for node in tspec["nodes"].values():
                if node["nodeType"] == "EXTERNAL_EVENT":
                    names.add(node["externalEventDefName"])
            for ev in tspec.get("interruptDefs", {}):
                names.add(ev)
        return [{"name": n} for n in sorted(names)]
