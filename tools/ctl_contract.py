#!/usr/bin/env python3
"""Cross-language lhctl-contract check.

Drives `graft.Ctl` — the JVM CLI — from Python over a pipe (one
subprocess, stdin repl mode) and asserts the lhctl-shaped JSON envelope
at every step of the reference README demo sequence:

    launch (serve) -> deploy -> run -> get WFRun (the export) -> search

This is the executable form of the wire-parity claim: a Python client
that only ever sees the process boundary (argv in, JSON out) completes
the same lifecycle the reference's `lhctl` drives against its API.

Usage: ctl_contract.py <java-classpath> <work-root> <fixture-dir>

The fixture dir must contain basic_wf.json, taskdef_greet.json and
externaleventdef_my_name.json (the wirespecs test fixtures).
Exit code 0 = contract held; any assertion failure exits non-zero with
a message on stderr.
"""
import json
import os
import subprocess
import sys
import time

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

SENTINEL = "###END###"


class Ctl:
    def __init__(self, classpath, root):
        cmd = ["java"]
        for p in ADD_OPENS:
            cmd += ["--add-opens", p + "=ALL-UNNAMED"]
        cmd += [
            "-Xmx4g",
            "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", classpath, "graft.Ctl", root, "repl",
        ]
        env = dict(os.environ, SPARK_GRAFT_CPUS="4")
        self.stderr_path = os.path.join(root, "ctl_stderr.log")
        self.stderr_file = open(self.stderr_path, "w")
        self.proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self.stderr_file, text=True, env=env)

    def call(self, line):
        """Send one verb line, return the parsed JSON envelope."""
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        lines = []
        while True:
            out = self.proc.stdout.readline()
            if not out:
                tail = open(self.stderr_path).read()[-2000:]
                raise AssertionError(
                    "Ctl subprocess died on %r; stderr tail:\n%s"
                    % (line, tail))
            if out.rstrip("\n") == SENTINEL:
                break
            lines.append(out)
        return json.loads("".join(lines))

    def close(self):
        try:
            self.proc.stdin.close()
        except Exception:
            pass
        self.proc.wait(timeout=120)
        self.stderr_file.close()
        return self.proc.returncode


def check(cond, what, got):
    if not cond:
        raise AssertionError("contract violated at %s; got: %r"
                             % (what, got))


def main():
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    classpath, root, fixdir = sys.argv[1], sys.argv[2], sys.argv[3]
    ctl = Ctl(classpath, root)
    try:
        # -- deploy: file-sourced resources, OK envelope with objectId --
        for kind, fix in [("WFSpec", "basic_wf"),
                          ("TaskDef", "taskdef_greet"),
                          ("ExternalEventDef", "externaleventdef_my_name")]:
            r = ctl.call("deploy %s %s" % (kind, os.path.join(
                fixdir, fix + ".json")))
            check(r.get("status") == "OK", "deploy " + kind, r)
            check(isinstance(r.get("objectId"), str), "deploy id", r)

        # -- launch: the deployed engine as a background streaming query --
        r = ctl.call("serve 30000")
        check(r.get("status") == "SERVING", "serve", r)

        # -- run: name-or-id resolution; objectId is the wfRunId --
        r = ctl.call("run my_workflow some_var=42")
        check(r.get("status") == "OK", "run", r)
        run_id = r.get("objectId")
        check(isinstance(run_id, str) and run_id, "run objectId", r)

        # -- get WFRun: poll until the scheduler folds the run; the OK
        #    result is the exported lhctl-shaped WFRun document --
        deadline = time.time() + 25
        doc = None
        while time.time() < deadline:
            r = ctl.call("get WFRun " + run_id)
            if r.get("status") == "OK":
                doc = r["result"]
                if doc.get("status") == "RUNNING":
                    break
            time.sleep(0.3)
        check(doc is not None and doc.get("status") == "RUNNING",
              "get WFRun reaching RUNNING", doc)
        check(doc.get("objectId") == run_id, "WFRun export objectId", doc)
        check(isinstance(doc.get("threadRuns"), list) and doc["threadRuns"],
              "WFRun export threadRuns", doc)

        # -- send-event: unknown def rejected, known def accepted --
        r = ctl.call("send-event ghost_def %s '\"x\"'" % run_id)
        check(r.get("status") == "OBJECT_NOT_FOUND", "send-event ghost", r)
        r = ctl.call("send-event my-name %s '\"Obi-Wan\"'" % run_id)
        check(r.get("status") == "OK", "send-event", r)

        # -- search: variable-index search and metadata alias search
        #    both answer the OK/result-list envelope --
        r = ctl.call("search my_name_var Obi-Wan")
        check(r.get("status") == "OK" and isinstance(r.get("result"), list),
              "search", r)
        r = ctl.call("search-alias WFSpec name my_workflow")
        check(r.get("result") == ["my_workflow"], "search-alias", r)

        # -- get-all: the deployed-spec listing --
        r = ctl.call("get-all WFSpec")
        check(r.get("result") == ["my_workflow"], "get-all", r)

        r = ctl.call("exit")
        check(r.get("status") == "BYE", "exit", r)
    finally:
        rc = ctl.close()
    check(rc == 0, "Ctl exit code", rc)
    print("ctl contract OK")


if __name__ == "__main__":
    main()
