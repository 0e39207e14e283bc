package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Restore correctness AT VOLUME (VERDICT r14 item 6):
  * RocksDbStateSpec proves the RocksDB provider works on one run;
  * this spec drives [[graft.BenchState]] — 1,000,000 WFRuns folded
  * into parked state under RocksDBStateStoreProvider, query restarted
  * from the checkpoint, 16 probe runs completed — in its own JVM
  * (local[32], like the bench context) and asserts the probes all
  * folded the exact payload after restore. BenchState exits non-zero
  * on any probe mismatch, so exit 0 IS the correctness assertion;
  * the throughput/restore numbers land in SCALING.md. */
class RocksDbVolumeSpec extends AnyFunSuite {

  test("1M parked runs restore correctly under RocksDB") {
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      (Seq("java") ++
        Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
          "java.io", "java.net", "java.nio", "java.util",
          "java.util.concurrent", "java.util.concurrent.atomic",
          "sun.nio.ch", "sun.nio.cs", "sun.security.action",
          "sun.util.calendar")
          .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED")) ++
        Seq("-Xmx8g", "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC",
          "-cp", cp, "graft.BenchState", "1000000", "rocksdb")): _*)
    pb.environment().put("SPARK_GRAFT_CPUS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out =
      try scala.io.Source.fromInputStream(
        proc.getInputStream, "UTF-8").mkString
      finally proc.getInputStream.close()
    // Cap sizing (r20, VERDICT r19 item 1): the fold takes ~47 s on
    // this box run alone, but the r19 driver gate saw it exceed the
    // old 480 s cap when the shared host was contended (external load
    // 1-12 during that round) — a load-sensitive flake on an untouched
    // path. 1800 s keeps ~38× headroom over the measured wall so host
    // contention cannot redden the gate, while a genuinely hung
    // subprocess still fails deterministically.
    val exited = proc.waitFor(1800, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) proc.destroyForcibly()
    assert(exited, "BenchState did not finish in 1800 s")
    val tail = out.linesIterator.filter(_.contains("state_volume"))
      .mkString("\n")
    assert(proc.exitValue() == 0,
      s"BenchState failed (exit ${proc.exitValue()}): $tail")
    assert(tail.contains("\"probe_failures\":0"), tail)
    assert(tail.contains("\"n_runs\":1000000"), tail)
  }
}
