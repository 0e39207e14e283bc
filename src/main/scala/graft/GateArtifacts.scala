package graft

/** Shared constants for the committed gate-run artifacts.
  *
  * The driver's own artifact capture has failed repeatedly
  * (BENCH_rN.json self-parsed to null six rounds running;
  * CORRECTNESS_r18.json arrived as an empty `{}`), so gate-shaped runs
  * of both mains write their OWN record to a committed path. These
  * constants are the single source of truth for "which SF dir is the
  * gate" — advice r18: a hardcoded literal in one main drifted from
  * the other, and a path-spelling change silently stopped refreshes.
  */
object GateArtifacts {
  /** The driver benches at sf0.1. */
  val BenchGateSfDir = "/root/testdata/sf0.1"
  /** The driver's DuckDB correctness compare runs at sf0.01. */
  val VerifyGateSfDir = "/root/testdata/sf0.01"
  val BenchGateFile = "BENCH_gate_latest.json"
  /** Written by tools/check_oracle.py after a gate-shaped Verify run
    * (all keys, sf0.01) — per-key rows/schema/hash verdicts. */
  val CorrectnessGateFile = "CORRECTNESS_gate_latest.json"
}
